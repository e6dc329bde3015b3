"""Additional-viewpoint camera generation for render-and-compare (pure JAX).

Parity target: /root/reference/happypose/toolbox/lib3d/multiview.py:166-251
(`make_TCO_multiview`) — the reference implements the look-at math with
panda3d NodePaths *per sample on CPU* (flagged in SURVEY.md as a pipeline
stall); here it is closed-form batched matrix math.

Conventions (OpenCV-style camera): x right, y down, z forward. The extra
cameras sit at offsets (scaled by |tCR|) expressed in the frame of a camera
at the origin looking at the reference point, and each looks at the
reference point with camera-0's up vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.transforms import invert_transforms, make_T

# Offsets in the look-at frame, CV convention (x right, y down, z forward).
# The reference specifies them in panda3d axes (x right, y fwd, z up):
# (x, y, z)_panda -> (x, -z, y)_cv.
_OFFSETS = {
    "TCO": jnp.zeros((0, 3)),
    "front_1view": jnp.asarray([[0.0, 0.0, 0.0]]),
    "front_3views": jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]]),
    "front_5views": jnp.asarray(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0],
         [0.0, -1.0, 0.0], [0.0, 1.0, 0.0]]
    ),
}


def _sphere_26_offsets() -> jax.Array:
    """26-point grid around the reference point (panda y in {0,1,2} scaled by
    radius; skips the position coincident with the reference point)."""
    out = []
    for y in (0, 1, 2):
        for x in (0, -1, 1):
            for z in (0, 1, -1):
                if (x, y, z) == (0, 1, 0):
                    continue
                out.append((x, -z, y))  # panda -> cv
    return jnp.asarray(out, jnp.float32)


_OFFSETS["sphere_26views"] = _sphere_26_offsets()


def look_at_R(eye: jax.Array, target: jax.Array, up: jax.Array) -> jax.Array:
    """Rotation of a camera at `eye` looking at `target` (batched [.., 3]).

    Returns R [..., 3, 3] whose columns are the camera axes expressed in the
    parent frame (CV convention: z toward target, y roughly opposite `up`).
    """
    f = target - eye
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-9)
    x = jnp.cross(f, up)
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
    # degenerate (looking along up): fall back to a fixed right axis
    fallback = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], f.dtype), f.shape)
    x = jnp.where(xn > 1e-6, x / jnp.maximum(xn, 1e-9), fallback)
    y = jnp.cross(f, x)
    return jnp.stack([x, y, f], axis=-1)


def make_TCO_multiview(
    TCO: jax.Array,
    tCR: jax.Array,
    multiview_type: str = "front_3views",
    remove_TCO_rendering: bool = False,
    views_inplane_rotations: bool = False,
) -> jax.Array:
    """Build object poses in every additional rendered view's camera frame.

    Args:
      TCO: [B, 4, 4]; tCR: [B, 3] reference point in camera-0 frame.
      multiview_type: "TCO" (only the input view), "front_1view",
        "front_3views", "front_5views", "sphere_26views" — extra views,
        prefixed by the TCO view itself unless remove_TCO_rendering.
      views_inplane_rotations: additionally rotate every view by
        {90, 180, 270} degrees in-plane (x4 views).
    Returns:
      TCV_O: [B, n_views, 4, 4].
    """
    B = TCO.shape[0]
    dtype = TCO.dtype
    up = jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0], dtype), (B, 3))

    views = []
    if not remove_TCO_rendering or multiview_type == "TCO":
        views.append(jnp.broadcast_to(jnp.eye(4, dtype=dtype), (B, 4, 4)))

    offsets = _OFFSETS[multiview_type]
    n_extra = offsets.shape[0]
    if n_extra > 0:
        radius = jnp.linalg.norm(tCR, axis=-1, keepdims=True)  # [B, 1]
        zero = jnp.zeros((B, 3), dtype)
        R_c2r = look_at_R(zero, tCR, up)  # [B, 3, 3]
        for k in range(n_extra):
            p_v = jnp.einsum("bij,j->bi", R_c2r, offsets[k]) * radius
            R_v = look_at_R(p_v, tCR, up)
            views.append(make_T(R_v, p_v, dtype=dtype))

    TC0_CV = jnp.stack(views, axis=1)  # [B, V, 4, 4]
    TCV_O = jnp.einsum("bvij,bjk->bvik", invert_transforms(TC0_CV), TCO)

    if views_inplane_rotations:
        rots = [jnp.eye(3, dtype=dtype)]
        for ang in (jnp.pi / 2, jnp.pi, 3 * jnp.pi / 2):
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            rots.append(
                jnp.asarray([[ca, -sa, 0.0], [sa, ca, 0.0], [0.0, 0.0, 1.0]], dtype)
            )
        expanded = []
        for Rz in rots:
            R_new = jnp.einsum("ij,bvjk->bvik", Rz, TCV_O[..., :3, :3])
            t_new = TCV_O[..., :3, 3]
            expanded.append(
                make_T(R_new.reshape(-1, 3, 3), t_new.reshape(-1, 3)).reshape(
                    B, -1, 4, 4
                )
            )
        # order: per view, the 4 in-plane rotations contiguous
        TCV_O = jnp.stack(expanded, axis=2).reshape(B, -1, 4, 4)

    return TCV_O
