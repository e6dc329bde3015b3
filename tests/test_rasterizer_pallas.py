"""Pallas z-buffer kernels vs the pure-JAX reference rasterizer.

`interpret=True` runs the REAL kernel bodies (`_make_kernel_tilemajor` /
`_make_kernel_dense`) through the Pallas interpreter on CPU — the exact
code the TPU compiles. Both dispatch branches are pinned via `force_path`
so neither can silently rot (round-1 shipped a VMEM OOM precisely because
no test compiled the kernels). A static VMEM-budget test locks the bench
shapes under the 16 MB scoped limit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.ops.rasterizer import render_batch
from happypose_tpu.ops import rasterizer_pallas as rp
from happypose_tpu.ops.rasterizer_pallas import render_batch_pallas

H, W = 64, 128  # small for interpret-mode speed; W == one lane tile


def _setup():
    db = MeshDataBase(
        meshes={
            "sphere": make_uv_sphere(radius=0.05, n_lat=12, n_lon=16),
            "box": make_box_mesh((0.04, 0.04, 0.04)),
        }
    )
    assets = db.render_assets()
    K = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 150.0
    K[:, 0, 2] = W / 2
    K[:, 1, 2] = H / 2
    TCO = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    TCO[:, 2, 3] = 0.5
    TCO[1, 0, 3] = 0.03
    return db, assets, jnp.asarray(K), jnp.asarray(TCO)


def _check_against_reference(ref, out):
    ref_m = np.asarray(ref.mask)
    out_m = np.asarray(out.mask)
    # coverage may differ on exact-edge pixels; demand > 99% agreement
    agree = (ref_m == out_m).mean()
    assert agree > 0.99, f"mask agreement {agree}"
    both = ref_m & out_m
    # Sliver faces (sphere poles/equator seams) resolve front-vs-back
    # differently between the packed-affine kernel form and the per-pixel
    # exact edge functions; the per-face 1/z clamp bounds the error by the
    # face's own depth range. Demand 95% strict agreement on overlap pixels.
    d_ok = np.abs(np.asarray(out.depth)[both] - np.asarray(ref.depth)[both]) < 1e-3
    assert d_ok.mean() > 0.95, f"depth agreement {d_ok.mean()}"
    rgb_ok = (
        np.abs(np.asarray(out.rgb)[both] - np.asarray(ref.rgb)[both]).max(-1) < 0.02
    )
    assert rgb_ok.mean() > 0.95, f"rgb agreement {rgb_ok.mean()}"
    n_ok = (
        np.abs(np.asarray(out.normals)[both] - np.asarray(ref.normals)[both]).max(-1)
        < 0.05
    )
    assert n_ok.mean() > 0.95, f"normals agreement {n_ok.mean()}"


@pytest.mark.parametrize("force_path", ["tilemajor", "dense"])
def test_pallas_kernels_match_reference(force_path):
    db, assets, K, TCO = _setup()
    obj_ids = jnp.asarray([db.id_of("sphere"), db.id_of("box")], jnp.int32)
    ref = render_batch(assets, obj_ids, TCO, K, resolution=(H, W))
    out = render_batch_pallas(
        assets, obj_ids, TCO, K, resolution=(H, W), interpret=True,
        force_path=force_path,
    )
    _check_against_reference(ref, out)


def test_pallas_analytic_probes():
    db, assets, K, TCO = _setup()
    obj_ids = jnp.asarray([db.id_of("sphere"), db.id_of("sphere")], jnp.int32)
    out = render_batch_pallas(
        assets, obj_ids, TCO, K, resolution=(H, W), interpret=True
    )
    depth = np.asarray(out.depth[0])
    mask = np.asarray(out.mask[0])
    ci, cj = H // 2, W // 2
    assert mask[ci, cj]
    np.testing.assert_allclose(depth[ci, cj], 0.45, atol=3e-3)
    assert not mask[0, 0] and depth[0, 0] == 0.0


def test_vmem_budget_at_bench_shapes():
    """The round-1 regression: dispatch chose tile-major at bench shapes
    (B=16, 240x320, sphere n_lat=24 -> 24 chunks) but the real scoped-VMEM
    footprint was 16.16 MB > 16 MB. Lock the budget model under the limit
    for every face count the dispatch would route to tile-major."""
    limit = rp._VMEM_LIMIT - rp._VMEM_HEADROOM
    # bench config: sphere(24, 32) + box -> ~1.5k faces -> 24 chunks
    bench_chunks = 24
    assert rp._tilemajor_vmem_bytes(bench_chunks, rp.TILE_PX) <= limit
    # the largest chunk count the heuristic still sends to tile-major must
    # fit, and the next one must fall back to the dense sweep
    nc = bench_chunks
    while rp._tilemajor_vmem_bytes(nc + 1, rp.TILE_PX) <= limit:
        nc += 1
    assert rp._tilemajor_vmem_bytes(nc, rp.TILE_PX) <= limit
    assert rp._tilemajor_vmem_bytes(nc + 1, rp.TILE_PX) > limit
    # dense fallback stays within budget at bench resolution (240x320)
    n_tiles = -(-240 // rp.TILE_H) * -(-320 // rp.TILE_W)
    assert rp._dense_vmem_bytes(n_tiles, rp.TILE_PX) <= limit


def test_dispatch_routes_large_mesh_to_dense():
    """A mesh too large for the tile-major VMEM budget must route to the
    dense sweep (and still render correctly)."""
    budget = rp._VMEM_LIMIT - rp._VMEM_HEADROOM
    nc_max = 1
    while rp._tilemajor_vmem_bytes(nc_max + 1, rp.TILE_PX) <= budget:
        nc_max += 1
    assert nc_max * rp.CHUNK >= 1024, "tile-major should cover >=1k faces"


def test_dense_band_splitting_large_resolution():
    """Large images split the dense sweep into row bands so the resident
    output block fits scoped VMEM (code-review finding r2: the dense
    fallback was unbudgeted). Verify the band math AND that a multi-band
    render stitches correctly."""
    limit = rp._VMEM_LIMIT - rp._VMEM_HEADROOM
    # 480x640: n_th=60, n_tw=5 -> unbanded output alone would exceed limit
    n_th, n_tw = 60, 5
    assert rp._dense_vmem_bytes(n_th * n_tw, rp.TILE_PX) > limit
    bt = rp._dense_band_th(n_th, n_tw)
    assert bt < n_th
    assert rp._dense_vmem_bytes(bt * n_tw, rp.TILE_PX) <= limit

    # multi-band interpret render == reference (256x512 -> >=2 bands)
    H2, W2 = 256, 512
    tw2 = -(-W2 // rp.TILE_W)
    th2 = -(-H2 // rp.TILE_H)
    assert rp._dense_band_th(th2, tw2) < th2  # exercises >=2 bands
    db, assets, K, TCO = _setup()
    K = jnp.asarray(np.asarray(K) * np.asarray([[[2, 0, 4], [0, 2, 4], [0, 0, 1]]], np.float32))
    obj_ids = jnp.asarray([db.id_of("sphere"), db.id_of("box")], jnp.int32)
    ref = render_batch(assets, obj_ids, TCO, K, resolution=(H2, W2))
    out = render_batch_pallas(
        assets, obj_ids, TCO, K, resolution=(H2, W2), interpret=True,
        force_path="dense",
    )
    _check_against_reference(ref, out)
