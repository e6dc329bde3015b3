"""Pallas TPU rasterizer — fused z-buffer + attribute interpolation.

Same outputs as `rasterizer.render_batch` (rgb/normals/depth/mask), built
for the MXU with zero per-pixel gathers:

- Host-XLA side reduces every face to TEN affine functions of the pixel
  coordinate: 3 normalized edge functions (coverage), affine 1/z, and six
  attribute*(1/z) channels (rgb, camera-frame normal) — perspective-correct
  interpolation is `(affine attr*iz) / (affine iz)`.
- The kernel evaluates a 64-face chunk against a pixel tile with one
  [10*CHUNK, 3] @ [3, TILE_PX] matmul (faces in sublanes, pixels in lanes),
  does the coverage test + z-compare on the VPU, and resolves the winning
  face's attributes with a one-hot masked sublane reduction — no face-id
  buffer, no second pass, no gathers.
- Chunk-level screen-bbox culling via scalar prefetch + spatial face
  sorting (the binning that replaces a GL rasterizer's traversal).
- f32 robustness: tile-local coordinate shift; per-face 1/z clamping so
  degenerate slivers can't fabricate a closer depth.

Final shading (normal normalize/flip + headlight Lambert) is elementwise
XLA after the kernel. Replaces the reference's multiprocess OpenGL pool
(/root/reference/happypose/toolbox/renderer/panda3d_batch_renderer.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from happypose_tpu.meshes.database import RenderAssets
from happypose_tpu.ops.rasterizer import (
    RenderOutput,
    _FaceData,
    _face_screen_data,
)

CHUNK = 64  # faces per chunk
N_AFF = 10  # w0, w1, w2, iz, (r, g, b, nx, ny, nz) * iz
N_OUT_ROWS = 8  # iz + 6 attrs + 1 pad (sublane-aligned)
TILE_H = 16
TILE_W = 128
TILE_PX = TILE_H * TILE_W


def _face_affine_coeffs_fused(fd, face_attr_iz, resolution):
    """Affine coefficients for coverage, 1/z and attribute*(1/z) channels.

    Args:
      fd: _FaceData (u, v [F, 3], inv_z [F, 3], valid [F]).
      face_attr_iz: [F, 3, 6] per-vertex (attr * inv_z) values.
    Returns:
      A [F, 3, N_AFF] (coeff a/b/c in rows), izrange [F, 2], bbox [F, 4].
    """
    H, W = resolution
    u0, u1, u2 = fd.u[:, 0], fd.u[:, 1], fd.u[:, 2]
    v0, v1, v2 = fd.v[:, 0], fd.v[:, 1], fd.v[:, 2]
    e1u, e1v = u1 - u0, v1 - v0
    e2u, e2v = u2 - u0, v2 - v0
    area = e1u * e2v - e2u * e1v
    ok = fd.valid & (jnp.abs(area) > 1e-12)
    norm = jnp.where(ok, jnp.sign(area) / jnp.maximum(jnp.abs(area), 1e-12), 0.0)

    a1, b1 = e2v * norm, -e2u * norm
    c1 = (-u0 * e2v + v0 * e2u) * norm
    a2, b2 = -e1v * norm, e1u * norm
    c2 = (u0 * e1v - v0 * e1u) * norm
    a0, b0 = -(a1 + a2), -(b1 + b2)
    c0 = area * norm - c1 - c2
    c0 = jnp.where(ok, c0, -1.0)  # invalid faces never covered

    # normalized bary coeff stacks: [F, 3(vertex), 3(a,b,c)]
    bary = jnp.stack(
        [
            jnp.stack([a0, b0, c0], -1),
            jnp.stack([a1, b1, c1], -1),
            jnp.stack([a2, b2, c2], -1),
        ],
        axis=1,
    )

    # iz and attribute channels are linear in bary: coeff = sum_j bary_j*val_j
    vals = jnp.concatenate([fd.inv_z[..., None], face_attr_iz], axis=-1)
    chan = jnp.einsum("fvc,fvk->fck", bary, vals)  # [F, 3, 7]

    A = jnp.concatenate(
        [jnp.moveaxis(bary, 1, 2), chan], axis=-1
    )  # [F, 3, N_AFF]

    izmin = jnp.min(fd.inv_z, axis=-1)
    izmax = jnp.max(fd.inv_z, axis=-1)
    izrange = jnp.stack([izmin, izmax], axis=-1)

    big = jnp.float32(1e9)
    umin = jnp.clip(jnp.min(fd.u, -1), 0.0, W - 1.0)
    umax = jnp.clip(jnp.max(fd.u, -1), 0.0, W - 1.0)
    vmin = jnp.clip(jnp.min(fd.v, -1), 0.0, H - 1.0)
    vmax = jnp.clip(jnp.max(fd.v, -1), 0.0, H - 1.0)
    bbox = jnp.stack(
        [
            jnp.where(ok, umin, big),
            jnp.where(ok, vmin, big),
            jnp.where(ok, umax, -big),
            jnp.where(ok, vmax, -big),
        ],
        axis=-1,
    )
    return A, izrange, bbox


def _sort_key(bbox: jax.Array) -> jax.Array:
    """Spatial sort key: tile-granular row-major index of the bbox center."""
    cu = (bbox[:, 0] + bbox[:, 2]) * 0.5
    cv = (bbox[:, 1] + bbox[:, 3]) * 0.5
    ku = jnp.clip(cu / TILE_W, 0, 255).astype(jnp.int32)
    kv = jnp.clip(cv / TILE_H, 0, 255).astype(jnp.int32)
    return kv * 256 + ku


def _make_kernel(n_tw: int):
    # grid order (B, chunks, tiles): tiles iterate fastest so the chunk's
    # At/finfo blocks stay resident in VMEM across all tiles (block index
    # unchanged -> no HBM re-copy); only the culling scalar test runs for
    # non-overlapping tiles.
    def kernel(bbox_ref, At_ref, finfo_ref, buf_out):
        t = pl.program_id(2)
        c = pl.program_id(1)
        b = pl.program_id(0)

        @pl.when((t == 0) & (c == 0))
        def _():
            buf_out[...] = jnp.zeros_like(buf_out)

        ti = t // n_tw
        tj = t - ti * n_tw
        tu0 = (tj * TILE_W).astype(jnp.float32)
        tv0 = (ti * TILE_H).astype(jnp.float32)
        # bbox is stored flat [B, n_chunks*4]: SMEM pads the trailing dim
        # to 128, so a [..., 4] layout would waste 32x and overflow SMEM
        # for large face counts
        umin = bbox_ref[b, c * 4 + 0]
        vmin = bbox_ref[b, c * 4 + 1]
        umax = bbox_ref[b, c * 4 + 2]
        vmax = bbox_ref[b, c * 4 + 3]
        overlap = (
            (umax >= tu0)
            & (umin <= tu0 + (TILE_W - 1))
            & (vmax >= tv0)
            & (vmin <= tv0 + (TILE_H - 1))
        )

        @pl.when(overlap)
        def _():
            At = At_ref[0, 0]  # [N_AFF*CHUNK, 3]
            # shift constants to tile-local pixel coords (f32-friendly)
            c_adj = At[:, 2:3] + At[:, 0:1] * tu0 + At[:, 1:2] * tv0
            At_loc = jnp.concatenate([At[:, 0:2], c_adj], axis=1)

            # M^T [3, TILE_PX]: rows (pu_local, pv_local, 1), built directly
            # in target shape (no lane relayouts allowed in mosaic)
            lane = jax.lax.broadcasted_iota(jnp.int32, (3, TILE_PX), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (3, TILE_PX), 0)
            pu = (lane % TILE_W).astype(jnp.float32)
            pv = (lane // TILE_W).astype(jnp.float32)
            Mt = jnp.where(row == 0, pu, jnp.where(row == 1, pv, 1.0))

            R = jnp.dot(At_loc, Mt, preferred_element_type=jnp.float32)
            W0 = R[0 * CHUNK : 1 * CHUNK, :]
            W1 = R[1 * CHUNK : 2 * CHUNK, :]
            W2 = R[2 * CHUNK : 3 * CHUNK, :]
            IZ = R[3 * CHUNK : 4 * CHUNK, :]
            fi = finfo_ref[0, 0]  # [CHUNK, 8]
            IZ = jnp.clip(IZ, fi[:, 0:1], fi[:, 1:2])
            cov = (W0 >= 0) & (W1 >= 0) & (W2 >= 0)
            # per-face bbox mask: sliver faces can pass the edge test far
            # from the triangle through f32 coefficient noise
            gu = pu[0:1, :] + tu0  # [1, TILE_PX] global pixel coords
            gv = pv[0:1, :] + tv0
            inside = (
                (gu >= fi[:, 2:3] - 1.0)
                & (gu <= fi[:, 4:5] + 1.0)
                & (gv >= fi[:, 3:4] - 1.0)
                & (gv <= fi[:, 5:6] + 1.0)
            )
            cand = jnp.where(cov & inside, IZ, -1.0)  # [CHUNK, TILE_PX]

            best = jnp.max(cand, axis=0, keepdims=True)  # [1, TILE_PX]
            # first-winner one-hot (ties resolve to the lowest face index)
            fidx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_PX), 0)
            amin = jnp.min(
                jnp.where(cand == best, fidx, CHUNK), axis=0, keepdims=True
            )
            onehot = (fidx == amin).astype(jnp.float32)

            rows = [best]
            for k in range(6):
                Q = R[(4 + k) * CHUNK : (5 + k) * CHUNK, :]
                rows.append(jnp.sum(Q * onehot, axis=0, keepdims=True))
            rows.append(jnp.zeros((1, TILE_PX), jnp.float32))
            new_rows = jnp.concatenate(rows, axis=0)  # [N_OUT_ROWS, TILE_PX]

            prev = buf_out[0, pl.ds(t, 1)][0]  # [N_OUT_ROWS, TILE_PX]
            better = (best > prev[0:1, :]) & (best > 0)  # [1, TILE_PX]
            merged = jnp.where(better, new_rows, prev)
            buf_out[0, pl.ds(t, 1)] = merged[None]

    return kernel




def _make_kernel_tilemajor(n_tw: int, n_chunks: int, tile_h: int,
                           tile_w: int):
    """Tile-major kernel: grid (B, tiles), chunks looped INSIDE the kernel.

    The dense (B, chunks, tiles) sweep pays a grid-step cost for every
    culled (chunk, tile) pair — measured ~0.4 ms per chunk at B=16/240x320
    even when the chunk's bbox misses most tiles. Here the whole per-image
    face-chunk database stays VMEM-resident (index map constant across the
    tile axis), the chunk loop is a `fori_loop` whose culled iterations are
    a scalar bbox test + branch, and the z/attr state lives in VMEM scratch
    so each output tile is written exactly once."""
    tile_px = tile_h * tile_w

    def kernel(bbox_ref, At_ref, finfo_ref, out_ref, best_scr, acc_scr):
        b = pl.program_id(0)
        t = pl.program_id(1)
        ti = t // n_tw
        tj = t - ti * n_tw
        tu0 = (tj * tile_w).astype(jnp.float32)
        tv0 = (ti * tile_h).astype(jnp.float32)

        best_scr[...] = jnp.zeros_like(best_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

        lane = jax.lax.broadcasted_iota(jnp.int32, (3, tile_px), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (3, tile_px), 0)
        pu = (lane % tile_w).astype(jnp.float32)
        pv = (lane // tile_w).astype(jnp.float32)
        Mt = jnp.where(row == 0, pu, jnp.where(row == 1, pv, 1.0))
        gu = pu[0:1, :] + tu0
        gv = pv[0:1, :] + tv0

        def body(c, carry):
            umin = bbox_ref[b, c * 4 + 0]
            vmin = bbox_ref[b, c * 4 + 1]
            umax = bbox_ref[b, c * 4 + 2]
            vmax = bbox_ref[b, c * 4 + 3]
            overlap = (
                (umax >= tu0)
                & (umin <= tu0 + (tile_w - 1))
                & (vmax >= tv0)
                & (vmin <= tv0 + (tile_h - 1))
            )

            @pl.when(overlap)
            def _():
                At = At_ref[0, c]  # [N_AFF*CHUNK, 3]
                c_adj = At[:, 2:3] + At[:, 0:1] * tu0 + At[:, 1:2] * tv0
                At_loc = jnp.concatenate([At[:, 0:2], c_adj], axis=1)
                R = jnp.dot(At_loc, Mt, preferred_element_type=jnp.float32)
                W0 = R[0 * CHUNK : 1 * CHUNK, :]
                W1 = R[1 * CHUNK : 2 * CHUNK, :]
                W2 = R[2 * CHUNK : 3 * CHUNK, :]
                IZ = R[3 * CHUNK : 4 * CHUNK, :]
                fi = finfo_ref[0, c]  # [CHUNK, 8]
                IZ = jnp.clip(IZ, fi[:, 0:1], fi[:, 1:2])
                cov = (W0 >= 0) & (W1 >= 0) & (W2 >= 0)
                inside = (
                    (gu >= fi[:, 2:3] - 1.0)
                    & (gu <= fi[:, 4:5] + 1.0)
                    & (gv >= fi[:, 3:4] - 1.0)
                    & (gv <= fi[:, 5:6] + 1.0)
                )
                cand = jnp.where(cov & inside, IZ, -1.0)

                cbest = jnp.max(cand, axis=0, keepdims=True)
                fidx = jax.lax.broadcasted_iota(
                    jnp.int32, (CHUNK, tile_px), 0
                )
                amin = jnp.min(
                    jnp.where(cand == cbest, fidx, CHUNK), axis=0,
                    keepdims=True,
                )
                onehot = (fidx == amin).astype(jnp.float32)

                prev = best_scr[0:1, :]
                better = (cbest > prev) & (cbest > 0)
                best_scr[0:1, :] = jnp.where(better, cbest, prev)
                rows = []
                for k in range(6):
                    Q = R[(4 + k) * CHUNK : (5 + k) * CHUNK, :]
                    rows.append(jnp.sum(Q * onehot, axis=0, keepdims=True))
                new_attr = jnp.concatenate(rows, axis=0)  # [6, tile_px]
                acc_scr[...] = jnp.where(better, new_attr, acc_scr[...])

            return carry

        jax.lax.fori_loop(0, n_chunks, body, 0)
        out_ref[0, 0] = jnp.concatenate(
            [best_scr[...], acc_scr[...],
             jnp.zeros((N_OUT_ROWS - 7, tile_px), jnp.float32)],
            axis=0,
        )

    return kernel


def _raster_fused_xla(At, finfo, resolution):
    """jnp reference for the fused kernel: same packed inputs, same outputs."""
    H, W = resolution
    B, n_chunks = At.shape[:2]
    px_u = jnp.tile(jnp.arange(W, dtype=jnp.float32), H)
    px_v = jnp.repeat(jnp.arange(H, dtype=jnp.float32), W)
    Mt = jnp.stack([px_u, px_v, jnp.ones_like(px_u)], axis=0)  # [3, H*W]

    def per_image(At_i, finfo_i):
        def body(carry, inp):
            best, rows = carry
            a, z = inp  # [N_AFF*CHUNK, 3], [CHUNK, 8]
            # chunk-local coordinates (f32 precision, mirrors the kernel's
            # tile-local shift): constants re-anchored at the chunk bbox min
            u0 = jnp.min(z[:, 2])
            v0 = jnp.min(z[:, 3])
            c_adj = a[:, 2] + a[:, 0] * u0 + a[:, 1] * v0
            Mt_loc = jnp.stack(
                [px_u - u0, px_v - v0, jnp.ones_like(px_u)], axis=0
            )
            a_loc = jnp.stack([a[:, 0], a[:, 1], c_adj], axis=1)
            R = a_loc @ Mt_loc  # [N_AFF*CHUNK, H*W]
            W0 = R[0 * CHUNK : 1 * CHUNK]
            W1 = R[1 * CHUNK : 2 * CHUNK]
            W2 = R[2 * CHUNK : 3 * CHUNK]
            IZ = jnp.clip(R[3 * CHUNK : 4 * CHUNK], z[:, 0:1], z[:, 1:2])
            cov = (W0 >= 0) & (W1 >= 0) & (W2 >= 0)
            inside = (
                (px_u[None, :] >= z[:, 2:3] - 1.0)
                & (px_u[None, :] <= z[:, 4:5] + 1.0)
                & (px_v[None, :] >= z[:, 3:4] - 1.0)
                & (px_v[None, :] <= z[:, 5:6] + 1.0)
            )
            cand = jnp.where(cov & inside, IZ, -1.0)
            cbest = jnp.max(cand, axis=0, keepdims=True)
            fidx = jnp.arange(CHUNK)[:, None]
            amin = jnp.min(jnp.where(cand == cbest, fidx, CHUNK), axis=0,
                           keepdims=True)
            onehot = (fidx == amin).astype(jnp.float32)
            new_rows = [cbest]
            for k in range(6):
                Q = R[(4 + k) * CHUNK : (5 + k) * CHUNK]
                new_rows.append(jnp.sum(Q * onehot, axis=0, keepdims=True))
            new_rows.append(jnp.zeros_like(cbest))
            new_rows = jnp.concatenate(new_rows, axis=0)
            better = (cbest > best[0:1]) & (cbest > 0)
            merged = jnp.where(better, new_rows, best)
            return (merged, rows), None

        init = (jnp.zeros((N_OUT_ROWS, H * W)), None)
        (acc, _), _ = jax.lax.scan(body, init, (At_i, finfo_i))
        return acc

    acc = jax.vmap(per_image)(At, finfo)  # [B, N_OUT_ROWS, H*W]
    x = acc.reshape(B, N_OUT_ROWS, H, W)
    iz = x[:, 0]
    z = jnp.where(iz > 0, 1.0 / jnp.maximum(iz, 1e-12), 0.0)
    attr = x[:, 1:7] * z[:, None]
    return iz, attr


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@partial(jax.jit, static_argnames=("resolution", "interpret"))
def raster_fused_pallas(
    u: jax.Array,
    v: jax.Array,
    inv_z: jax.Array,
    valid: jax.Array,
    attrs: jax.Array,  # [B, F, 3, 6] per-vertex attributes (rgb + n_cam)
    resolution: Tuple[int, int],
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (iz [B, H, W], attr [B, 6, H, W]); attr is already divided by
    iz (perspective-correct rgb + camera normals, 0 on background)."""
    H, W = resolution
    B, F = u.shape[:2]
    Fp = _cdiv(F, CHUNK) * CHUNK
    pad = Fp - F
    u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    inv_z = jnp.pad(inv_z, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
    valid = jnp.pad(valid, ((0, 0), (0, pad)))
    attrs = jnp.pad(attrs, ((0, 0), (0, pad), (0, 0), (0, 0)))

    def per_image(u_i, v_i, iz_i, val_i, attr_i):
        fd = _FaceData(u=u_i, v=v_i, inv_z=iz_i, valid=val_i)
        attr_iz = attr_i * iz_i[..., None]
        A, izr, bbox = _face_affine_coeffs_fused(fd, attr_iz, resolution)
        perm = jnp.argsort(_sort_key(bbox))
        A = A[perm]
        izr = izr[perm]
        bbox = bbox[perm]
        n_chunks = Fp // CHUNK
        # [n_chunks, N_AFF*CHUNK, 3]: affine groups in separate row blocks
        At = A.reshape(n_chunks, CHUNK, 3, N_AFF).transpose(0, 3, 1, 2)
        At = At.reshape(n_chunks, N_AFF * CHUNK, 3)
        bb = bbox.reshape(n_chunks, CHUNK, 4)
        finfo = jnp.concatenate(
            [izr.reshape(n_chunks, CHUNK, 2), bb,
             jnp.zeros((n_chunks, CHUNK, 2))],
            axis=-1,
        )  # [c, CHUNK, 8]
        chunk_bbox = jnp.concatenate(
            [jnp.min(bb[..., :2], axis=1), jnp.max(bb[..., 2:], axis=1)],
            axis=-1,
        )
        return At, finfo, chunk_bbox

    At, finfo, chunk_bbox = jax.vmap(per_image)(u, v, inv_z, valid, attrs)

    n_chunks = Fp // CHUNK
    Hp = _cdiv(H, TILE_H) * TILE_H
    Wp = _cdiv(W, TILE_W) * TILE_W
    n_th = Hp // TILE_H
    n_tw = Wp // TILE_W
    n_tiles = n_th * n_tw
    grid = (B, n_chunks, n_tiles)

    if interpret:
        # Pure-XLA mirror of the kernel contract (pallas interpret mode
        # mis-accumulates revisited output blocks under jit; the compiled
        # kernel is validated on TPU directly). Test/CPU sizes only.
        return _raster_fused_xla(At, finfo, (H, W))

    out_shape = jax.ShapeDtypeStruct(
        (B, n_tiles, N_OUT_ROWS, TILE_PX), jnp.float32
    )

    def run_full():
        """Lossless chunk×tile sweep (in-kernel bbox culling)."""
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_chunks, n_tiles),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, N_AFF * CHUNK, 3),
                    lambda b, c, t, *refs: (b, c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, CHUNK, 8),
                    lambda b, c, t, *refs: (b, c, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, n_tiles, N_OUT_ROWS, TILE_PX),
                lambda b, c, t, *refs: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        return pl.pallas_call(
            _make_kernel(n_tw),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(chunk_bbox.reshape(B, n_chunks * 4), At, finfo)

    def run_tilemajor(tile_h: int, tile_w: int):
        """Grid (B, tiles); chunk loop inside the kernel over the
        VMEM-resident per-image face database (see _make_kernel_tilemajor).
        Eliminates the per-(chunk, tile) grid-step cost that made the dense
        sweep linear in chunk count even under full culling. Uses its own
        (smaller) tile so the resident face DB + tile temporaries fit the
        scoped-VMEM budget. Returns untiled [B, N_OUT_ROWS, H, W]."""
        tile_px = tile_h * tile_w
        hp = _cdiv(H, tile_h) * tile_h
        wp = _cdiv(W, tile_w) * tile_w
        th_ = hp // tile_h
        tw_ = wp // tile_w
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, th_ * tw_),
            in_specs=[
                pl.BlockSpec(
                    (1, n_chunks, N_AFF * CHUNK, 3),
                    lambda b, t, *refs: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, n_chunks, CHUNK, 8),
                    lambda b, t, *refs: (b, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, N_OUT_ROWS, tile_px),
                lambda b, t, *refs: (b, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((1, tile_px), jnp.float32),
                pltpu.VMEM((6, tile_px), jnp.float32),
            ],
        )
        buf = pl.pallas_call(
            _make_kernel_tilemajor(tw_, n_chunks, tile_h, tile_w),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (B, th_ * tw_, N_OUT_ROWS, tile_px), jnp.float32
            ),
            interpret=interpret,
        )(chunk_bbox.reshape(B, n_chunks * 4), At, finfo)
        x = buf.reshape(B, th_, tw_, N_OUT_ROWS, tile_h, tile_w)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(B, N_OUT_ROWS, hp, wp)
        return x[:, :, :H, :W]

    # NOTE: a binned variant (per-tile chunk lists via scalar-prefetch-
    # indexed BlockSpecs, grid (B, n_tiles, L)) was measured at 20k faces:
    # 3x fewer grid steps but no wall-clock win (135 vs 141 renders/s) —
    # the full sweep amortizes its face-block loads across the whole tile
    # axis, which binning necessarily gives up. The tile-major kernel keeps
    # that amortization AND removes the culled grid steps; it needs the
    # whole per-image face database resident, so very large meshes fall
    # back to the dense sweep.
    face_vmem_bytes = n_chunks * (N_AFF * CHUNK * 3 + CHUNK * 8) * 4
    if face_vmem_bytes <= 4 * 1024 * 1024:
        x = run_tilemajor(tile_h=8, tile_w=128)
    else:
        buf = run_full()
        # un-tile [B, n_tiles, R, TILE_PX] -> [B, R, Hp, Wp] -> crop
        x = buf.reshape(B, n_th, n_tw, N_OUT_ROWS, TILE_H, TILE_W)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(B, N_OUT_ROWS, Hp, Wp)
        x = x[:, :, :H, :W]
    iz = x[:, 0]
    z = jnp.where(iz > 0, 1.0 / jnp.maximum(iz, 1e-12), 0.0)
    attr = x[:, 1:7] * z[:, None]
    return iz, attr


@partial(
    jax.jit,
    static_argnames=(
        "resolution", "light_ambient", "light_diffuse", "interpret"
    ),
)
def render_batch_pallas(
    assets: RenderAssets,
    obj_ids: jax.Array,
    TCO: jax.Array,
    K: jax.Array,
    resolution: Tuple[int, int] = (240, 320),
    light_ambient: float = 0.6,
    light_diffuse: float = 0.6,
    interpret: bool = False,
) -> RenderOutput:
    """Drop-in replacement for `rasterizer.render_batch` (TPU kernel)."""
    inst = assets.select(obj_ids)

    fd_all, _ = jax.vmap(_face_screen_data)(
        inst.vertices, inst.faces, inst.faces_mask, TCO, K
    )

    # per-face per-vertex attributes: rgb + camera-frame normals
    def face_attrs(faces, colors, normals, T):
        n_cam = normals @ T[:3, :3].T
        av = jnp.concatenate([colors, n_cam], axis=-1)  # [V, 6]
        return av[faces]  # [F, 3, 6]

    attrs = jax.vmap(face_attrs)(
        inst.faces, inst.vertex_colors, inst.vertex_normals, TCO
    )

    iz, attr = raster_fused_pallas(
        fd_all.u, fd_all.v, fd_all.inv_z, fd_all.valid, attrs, resolution,
        interpret=interpret,
    )

    hit = iz > 0
    depth = jnp.where(hit, 1.0 / jnp.maximum(iz, 1e-12), 0.0)
    rgb = jnp.moveaxis(attr[:, 0:3], 1, -1)  # [B, H, W, 3]
    n = jnp.moveaxis(attr[:, 3:6], 1, -1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-8)
    n = jnp.where(n[..., 2:3] > 0, -n, n)
    lambert = jnp.maximum(-n[..., 2], 0.0)
    shade = jnp.clip(light_ambient + light_diffuse * lambert, 0.0, 1.0)
    rgb = jnp.clip(rgb * shade[..., None], 0.0, 1.0)
    hit_f = hit[..., None]
    return RenderOutput(
        rgb=jnp.where(hit_f, rgb, 0.0),
        depth=depth,
        mask=hit,
        normals=jnp.where(hit_f, n, 0.0),
    )
