"""On-device synthetic training-scene generator.

The reference generates training data offline (pybullet recording /
BlenderProc PBR, SURVEY.md §2.7); for in-framework training smoke/bench and
fast iteration we also provide a fully on-device generator: random object,
random pose in the camera frustum, rendered with the on-chip rasterizer over
a randomized background. Everything is jax.random-driven and jit-safe.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.rotations import quat_to_rotmat
from happypose_tpu.lib3d.transforms import make_T
from happypose_tpu.meshes.database import RenderAssets
from happypose_tpu.ops.rasterizer import render_batch
from happypose_tpu.ops.rasterizer_pallas import render_batch_pallas
from happypose_tpu.training.forward_loss import PoseTrainingBatch


def random_rotations(key: jax.Array, n: int) -> jax.Array:
    """Uniform random rotations via normalized 4D gaussians -> quats."""
    q = jax.random.normal(key, (n, 4))
    return quat_to_rotmat(q)


@partial(
    jax.jit,
    static_argnames=("batch_size", "resolution", "renderer", "n_objects"),
)
def make_synth_batch(
    rng: jax.Array,
    assets: RenderAssets,
    K1: jax.Array,  # [3, 3] shared intrinsics
    n_objects: int,
    batch_size: int,
    resolution: Tuple[int, int] = (120, 160),
    z_range: Tuple[float, float] = (0.35, 0.8),
    xy_extent: float = 0.08,
    renderer: str = "reference",
) -> PoseTrainingBatch:
    """Random single-object scenes. Returns a PoseTrainingBatch."""
    k_obj, k_rot, k_xy, k_z, k_bg, k_noise = jax.random.split(rng, 6)
    B = batch_size
    obj_ids = jax.random.randint(k_obj, (B,), 0, n_objects)
    R = random_rotations(k_rot, B)
    xy = jax.random.uniform(k_xy, (B, 2), minval=-xy_extent, maxval=xy_extent)
    z = jax.random.uniform(k_z, (B, 1), minval=z_range[0], maxval=z_range[1])
    TCO_gt = make_T(R, jnp.concatenate([xy, z], axis=-1))
    K = jnp.broadcast_to(K1, (B, 3, 3))

    render = render_batch_pallas if renderer == "pallas" else render_batch
    out = render(assets, obj_ids, TCO_gt, K, resolution=resolution)

    H, W = resolution
    bg = jax.random.uniform(k_bg, (B, H, W, 3), minval=0.0, maxval=1.0)
    # low-frequency-ish background: blur by 2x2 average pooling up-down
    bg = jax.image.resize(
        jax.image.resize(bg, (B, H // 8, W // 8, 3), "linear"),
        (B, H, W, 3),
        "linear",
    )
    rgb = jnp.where(out.mask[..., None], out.rgb, bg)
    rgb = jnp.clip(
        rgb + 0.02 * jax.random.normal(k_noise, rgb.shape), 0.0, 1.0
    )
    images = jnp.moveaxis(rgb, -1, 1)  # [B, 3, H, W]
    return PoseTrainingBatch(images=images, K=K, obj_ids=obj_ids, TCO_gt=TCO_gt)
