"""Deterministic SO(3) covering grids (host numpy; loaded once).

The reference ships precomputed quaternion files
(/root/reference/happypose/pose_estimators/megapose/data/data_{72,512,576,
4608}.qua, loaded by toolbox/utils/transform_utils.py:24-57). Instead of
shipping binary data we *generate* covering grids with the Super-Fibonacci
spiral construction (Alexa, CVPR'22) — a closed-form, deterministic,
low-discrepancy sampling of SO(3) with covering properties comparable to the
HealPix-based grids the reference uses. Any grid size is available, not just
the four shipped files.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_PHI = np.sqrt(2.0)
_PSI = 1.533751168755204288118041  # solution of psi^4 = psi + 4


@lru_cache(maxsize=None)
def super_fibonacci_quats(n: int) -> np.ndarray:
    """n unit quaternions (xyzw) covering SO(3) evenly."""
    s = np.arange(n, dtype=np.float64) + 0.5
    t = s / n
    d = 2 * np.pi * s
    r = np.sqrt(t)
    R = np.sqrt(1.0 - t)
    alpha = d / _PHI
    beta = d / _PSI
    # (w, x, y, z) in the paper's ordering
    w = r * np.sin(alpha)
    x = r * np.cos(alpha)
    y = R * np.sin(beta)
    z = R * np.cos(beta)
    q_xyzw = np.stack([x, y, z, w], axis=-1)
    return q_xyzw.astype(np.float32)


def quats_to_rotmats(q: np.ndarray) -> np.ndarray:
    """xyzw quaternions [N, 4] -> rotation matrices [N, 3, 3] (numpy)."""
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    R = np.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    ).reshape(*q.shape[:-1], 3, 3)
    return R.astype(np.float32)


def load_SO3_grid(resolution: int = 576) -> np.ndarray:
    """Rotation-matrix grid [N, 3, 3]; resolutions mirror the reference's
    shipped sizes (72 / 512 / 576 / 4608) but any N works."""
    return quats_to_rotmats(super_fibonacci_quats(resolution))
