"""Pallas TPU kernel for the rasterizer's z-buffer pass.

Same contract as `rasterizer._zbuffer_scan` (per-pixel closest-face search),
engineered for the MXU instead of scalar loops:

- Each face is reduced (host XLA side, `_face_affine_coeffs`) to four affine
  functions of the pixel coordinate: the three normalized edge functions
  (bary coords, >= 0 inside) and the affine 1/z. A chunk of 64 faces is a
  [4*CHUNK, 3] coefficient matrix.
- The kernel evaluates all faces of a chunk against all pixels of a tile with
  one [4*CHUNK, 3] @ [3, TILE_PX] matmul (MXU): faces live in sublanes,
  pixels in lanes, so the face reduction (z-compare/argmax) is a cheap
  cross-sublane reduce and the running z-buffer is a lane-major [1, TILE_PX]
  row — no lane-dimension relayouts anywhere (mosaic constraint).
- Faces are pre-sorted by screen-space tile (Morton-ish key); a per-chunk
  screen bbox lives in SMEM (scalar prefetch) so a tile skips whole chunks
  that cannot touch it (`@pl.when`). This is the binning that replaces a GL
  rasterizer's hierarchical traversal.
- 1/z is clamped per face to its vertex range so degenerate slivers can never
  fabricate a closer depth (same guard as the reference implementation).

Outputs feed the plain-XLA shading pass (`rasterizer._shade`) unchanged.
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
    _shade,
)

CHUNK = 64  # faces per chunk (sublane-friendly: 4 affine groups x 64 = 256)
TILE_H = 16
TILE_W = 128
TILE_PX = TILE_H * TILE_W


def _face_affine_coeffs(fd: _FaceData, resolution: Tuple[int, int]):
    """Per-face affine coefficients + bboxes (XLA, batched over faces).

    Returns:
      A: [F, 3, 4] — columns (w0', w1', w2', inv_z) as affine functions
         [a, b, c] of (pu, pv, 1); w' normalized so covered <=> all w' >= 0.
      izrange: [F, 2] — (izmin, izmax) clamp range.
      bbox: [F, 4] — (umin, vmin, umax, vmax), empty for invalid faces.
    """
    H, W = resolution
    u0, u1, u2 = fd.u[:, 0], fd.u[:, 1], fd.u[:, 2]
    v0, v1, v2 = fd.v[:, 0], fd.v[:, 1], fd.v[:, 2]
    e1u, e1v = u1 - u0, v1 - v0
    e2u, e2v = u2 - u0, v2 - v0
    area = e1u * e2v - e2u * e1v
    ok = fd.valid & (jnp.abs(area) > 1e-12)
    norm = jnp.where(ok, jnp.sign(area) / jnp.maximum(jnp.abs(area), 1e-12), 0.0)

    # w1(p) = (pu - u0) e2v - (pv - v0) e2u ; w2(p) = (pv - v0) e1u - (pu - u0) e1v
    a1, b1 = e2v, -e2u
    c1 = -u0 * e2v + v0 * e2u
    a2, b2 = -e1v, e1u
    c2 = u0 * e1v - v0 * e1u
    a0, b0 = -(a1 + a2), -(b1 + b2)
    c0 = area - c1 - c2

    def nrm(a, b, c):
        return a * norm, b * norm, c * norm

    a0, b0, c0 = nrm(a0, b0, c0)
    a1, b1, c1 = nrm(a1, b1, c1)
    a2, b2, c2 = nrm(a2, b2, c2)
    # invalid faces: w0' == -1 everywhere -> never covered
    c0 = jnp.where(ok, c0, -1.0)

    iz0, iz1, iz2 = fd.inv_z[:, 0], fd.inv_z[:, 1], fd.inv_z[:, 2]
    az = a0 * iz0 + a1 * iz1 + a2 * iz2
    bz = b0 * iz0 + b1 * iz1 + b2 * iz2
    cz = c0 * iz0 + c1 * iz1 + c2 * iz2

    A = jnp.stack(
        [
            jnp.stack([a0, a1, a2, az], -1),
            jnp.stack([b0, b1, b2, bz], -1),
            jnp.stack([c0, c1, c2, cz], -1),
        ],
        axis=1,
    )  # [F, 3, 4]

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


def _make_zbuffer_kernel(n_tw: int):
    """Kernel over grid (B, n_tiles, n_chunks); n_tw static (tiles per row)."""

    def kernel(bbox_ref, At_ref, izc_ref, iz_out, fid_out):
        t = pl.program_id(1)
        c = pl.program_id(2)
        b = pl.program_id(0)

        @pl.when((t == 0) & (c == 0))
        def _():
            iz_out[...] = jnp.zeros_like(iz_out)
            fid_out[...] = jnp.full_like(fid_out, -1)

        ti = t // n_tw
        tj = t - ti * n_tw
        tu0 = (tj * TILE_W).astype(jnp.float32)
        tv0 = (ti * TILE_H).astype(jnp.float32)
        umin = bbox_ref[b, c, 0]
        vmin = bbox_ref[b, c, 1]
        umax = bbox_ref[b, c, 2]
        vmax = bbox_ref[b, c, 3]
        overlap = (
            (umax >= tu0)
            & (umin <= tu0 + (TILE_W - 1))
            & (vmax >= tv0)
            & (vmin <= tv0 + (TILE_H - 1))
        )

        @pl.when(overlap)
        def _():
            At = At_ref[0, 0]  # [4*CHUNK, 3] faces-in-rows coefficients
            # shift constants to tile-local pixel coords (f32-friendly)
            c_adj = At[:, 2:3] + At[:, 0:1] * tu0 + At[:, 1:2] * tv0
            At_loc = jnp.concatenate([At[:, 0:2], c_adj], axis=1)  # [4C, 3]

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
            izc = izc_ref[0, 0]  # [CHUNK, 2]
            IZ = jnp.clip(IZ, izc[:, 0:1], izc[:, 1:2])
            cov = (W0 >= 0) & (W1 >= 0) & (W2 >= 0)
            cand = jnp.where(cov, IZ, -1.0)  # [CHUNK, TILE_PX]

            best = jnp.max(cand, axis=0, keepdims=True)  # [1, TILE_PX]
            fidx = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, TILE_PX), 0)
            amax = jnp.min(
                jnp.where(cand == best, fidx, CHUNK), axis=0, keepdims=True
            )

            prev_iz = iz_out[0, pl.ds(t, 1)]  # [1, TILE_PX]
            prev_fid = fid_out[0, pl.ds(t, 1)]
            better = (best > prev_iz) & (best > 0)
            iz_out[0, pl.ds(t, 1)] = jnp.where(better, best, prev_iz)
            fid_out[0, pl.ds(t, 1)] = jnp.where(better, c * CHUNK + amax, prev_fid)

    return kernel


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@partial(jax.jit, static_argnames=("resolution", "interpret"))
def zbuffer_pallas(
    u: jax.Array,
    v: jax.Array,
    inv_z: jax.Array,
    valid: jax.Array,
    resolution: Tuple[int, int],
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched closest-face search on TPU.

    Args:
      u, v, inv_z: [B, F, 3] per-face screen data (any F; padded to CHUNK).
      valid: [B, F] bool.
    Returns:
      (face_id [B, H, W] int32 into the *sorted* face order, inv_z_best
       [B, H, W], perm [B, F_padded] the sort permutation applied).
    """
    H, W = resolution
    B, F = u.shape[:2]
    Fp = _cdiv(F, CHUNK) * CHUNK
    pad = Fp - F
    u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    inv_z = jnp.pad(inv_z, ((0, 0), (0, pad), (0, 0)), constant_values=1.0)
    valid = jnp.pad(valid, ((0, 0), (0, pad)))

    def per_image(u_i, v_i, iz_i, val_i):
        fd = _FaceData(u=u_i, v=v_i, inv_z=iz_i, valid=val_i)
        A, izr, bbox = _face_affine_coeffs(fd, resolution)
        perm = jnp.argsort(_sort_key(bbox))
        A = A[perm]
        izr = izr[perm]
        bbox = bbox[perm]
        n_chunks = Fp // CHUNK
        # chunk-major [n_chunks, 4*CHUNK, 3]: rows grouped as
        # (w0 x CHUNK, w1 x CHUNK, w2 x CHUNK, iz x CHUNK), coeff in columns
        At = A.reshape(n_chunks, CHUNK, 3, 4).transpose(0, 3, 1, 2)  # [c,4,C,3]
        At = At.reshape(n_chunks, 4 * CHUNK, 3)
        izc = izr.reshape(n_chunks, CHUNK, 2)
        bb = bbox.reshape(n_chunks, CHUNK, 4)
        chunk_bbox = jnp.concatenate(
            [jnp.min(bb[..., :2], axis=1), jnp.max(bb[..., 2:], axis=1)], axis=-1
        )  # [c, 4]
        return At, izc, chunk_bbox, perm

    At, izc, chunk_bbox, perm = jax.vmap(per_image)(u, v, inv_z, valid)

    n_chunks = Fp // CHUNK
    Hp = _cdiv(H, TILE_H) * TILE_H
    Wp = _cdiv(W, TILE_W) * TILE_W
    n_th = Hp // TILE_H
    n_tw = Wp // TILE_W
    n_tiles = n_th * n_tw
    grid = (B, n_tiles, n_chunks)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, 4 * CHUNK, 3),
                lambda b, t, c, *refs: (b, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, CHUNK, 2),
                lambda b, t, c, *refs: (b, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, n_tiles, TILE_PX), lambda b, t, c, *refs: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_tiles, TILE_PX), lambda b, t, c, *refs: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
    )

    iz_flat, fid_flat = pl.pallas_call(
        _make_zbuffer_kernel(n_tw),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, TILE_PX), jnp.float32),
            jax.ShapeDtypeStruct((B, n_tiles, TILE_PX), jnp.int32),
        ],
        interpret=interpret,
    )(chunk_bbox, At, izc)

    # un-tile: [B, n_tiles, TILE_PX] -> [B, Hp, Wp] -> crop
    def untile(x):
        x = x.reshape(B, n_th, n_tw, TILE_H, TILE_W)
        x = x.transpose(0, 1, 3, 2, 4).reshape(B, Hp, Wp)
        return x[:, :H, :W]

    return untile(fid_flat), untile(iz_flat), perm


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
    """Drop-in replacement for `rasterizer.render_batch` using the TPU kernel
    for the z-buffer pass."""
    inst = assets.select(obj_ids)

    fd_all, verts_cam_all = jax.vmap(
        lambda vtx, f, fm, T, Kb: _face_screen_data(vtx, f, fm, T, Kb)
    )(inst.vertices, inst.faces, inst.faces_mask, TCO, K)

    face_id_sorted, _, perm = zbuffer_pallas(
        fd_all.u, fd_all.v, fd_all.inv_z, fd_all.valid, resolution,
        interpret=interpret,
    )

    def shade_one(fid_img, perm_i, fd_u, fd_v, fd_iz, fd_val, faces, vc, cols,
                  nrm, T):
        # shading consumes face data in sorted order to match kernel ids
        F = fd_u.shape[0]
        Fp = perm_i.shape[0]
        padv = Fp - F
        fd_s = _FaceData(
            u=jnp.pad(fd_u, ((0, padv), (0, 0)))[perm_i],
            v=jnp.pad(fd_v, ((0, padv), (0, 0)))[perm_i],
            inv_z=jnp.pad(fd_iz, ((0, padv), (0, 0)), constant_values=1.0)[perm_i],
            valid=jnp.pad(fd_val, (0, padv))[perm_i],
        )
        faces_s = jnp.pad(faces, ((0, padv), (0, 0)))[perm_i]
        return _shade(
            fid_img, fd_s, faces_s, vc, cols, nrm, T,
            light_ambient, light_diffuse,
        )

    return jax.vmap(shade_one)(
        face_id_sorted, perm, fd_all.u, fd_all.v, fd_all.inv_z, fd_all.valid,
        inst.faces, verts_cam_all, inst.vertex_colors, inst.vertex_normals, TCO,
    )
