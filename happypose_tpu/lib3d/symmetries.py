"""Object symmetry enumeration (host-side numpy; feeds padded device tensors).

Parity target: /root/reference/happypose/toolbox/lib3d/symmetries.py:29-84
(BOP convention: product of discrete symmetries with sampled continuous-axis
rotations; identity always included).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class DiscreteSymmetry:
    """pose: (4, 4) homogeneous matrix (BOP models_info convention)."""

    pose: np.ndarray


@dataclass
class ContinuousSymmetry:
    """Continuous rotational symmetry about `axis` through `offset`."""

    offset: np.ndarray = field(default_factory=lambda: np.zeros(3))
    axis: np.ndarray = field(default_factory=lambda: np.array([0, 0, 1.0]))


def _euler_to_R(euler_xyz: np.ndarray) -> np.ndarray:
    a, b, c = euler_xyz
    ca, sa, cb, sb, cc, sc = np.cos(a), np.sin(a), np.cos(b), np.sin(b), np.cos(c), np.sin(c)
    return np.array(
        [
            [cb * cc, sa * sb * cc - ca * sc, ca * sb * cc + sa * sc],
            [cb * sc, sa * sb * sc + ca * cc, ca * sb * sc - sa * cc],
            [-sb, sa * cb, ca * cb],
        ]
    )


def make_symmetries_poses(
    symmetries_discrete: Optional[List[DiscreteSymmetry]] = None,
    symmetries_continuous: Optional[List[ContinuousSymmetry]] = None,
    n_symmetries_continuous: int = 8,
    units: str = "mm",
    scale: Optional[float] = None,
) -> np.ndarray:
    """Enumerate symmetry poses: (continuous x discrete) products, identity first.

    Returns (num_symmetries, 4, 4) float64.
    """
    symmetries_discrete = symmetries_discrete or []
    symmetries_continuous = symmetries_continuous or []
    if scale is None:
        scale = {"m": 1.0, "mm": 0.001}[units]

    all_discrete = [np.eye(4)]
    for sym_d in symmetries_discrete:
        M = np.array(sym_d.pose, dtype=np.float64).copy()
        M[:3, -1] *= scale
        all_discrete.append(M)

    all_continuous = []
    for sym_c in symmetries_continuous:
        axis = np.asarray(sym_c.axis, dtype=np.float64)
        assert np.allclose(sym_c.offset, 0), "offset continuous symmetries unsupported"
        assert axis.sum() == 1
        for n in range(n_symmetries_continuous):
            euler = axis * 2 * np.pi * n / n_symmetries_continuous
            M = np.eye(4)
            M[:3, :3] = _euler_to_R(euler)
            all_continuous.append(M)

    out = []
    for Md in all_discrete:
        if all_continuous:
            for Mc in all_continuous:
                out.append(Mc @ Md)
        else:
            out.append(Md)
    return np.stack(out, axis=0)
