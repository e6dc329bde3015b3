"""BOP challenge result export.

Parity target: /root/reference/happypose/pose_estimators/megapose/evaluation/
bop.py:68-160 (`convert_results_to_bop`): one csv row per estimate with
scene_id, im_id, obj_id, score, R (9 floats, row-major), t (mm), time.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np


def predictions_to_bop_csv(
    poses: np.ndarray,  # [N, 4, 4] (meters)
    obj_ids: np.ndarray,  # [N] BOP object ids (1-based dataset convention)
    scene_ids: np.ndarray,  # [N]
    view_ids: np.ndarray,  # [N]
    scores: np.ndarray,  # [N]
    times: Optional[np.ndarray] = None,  # [N] seconds, -1 if unknown
) -> List[str]:
    """Render csv lines (no header) in the bop_toolkit inout format."""
    n = len(poses)
    times = times if times is not None else np.full(n, -1.0)
    lines = []
    for i in range(n):
        R = np.asarray(poses[i][:3, :3], np.float64).reshape(-1)
        t_mm = np.asarray(poses[i][:3, 3], np.float64) * 1000.0
        lines.append(
            "{scene},{im},{obj},{score:.8f},{R},{t},{time:.6f}".format(
                scene=int(scene_ids[i]),
                im=int(view_ids[i]),
                obj=int(obj_ids[i]),
                score=float(scores[i]),
                R=" ".join(f"{x:.8f}" for x in R),
                t=" ".join(f"{x:.8f}" for x in t_mm),
                time=float(times[i]),
            )
        )
    return lines


def save_bop_csv(
    path: Union[str, Path],
    poses: np.ndarray,
    obj_ids: np.ndarray,
    scene_ids: np.ndarray,
    view_ids: np.ndarray,
    scores: np.ndarray,
    times: Optional[np.ndarray] = None,
) -> None:
    lines = predictions_to_bop_csv(
        poses, obj_ids, scene_ids, view_ids, scores, times
    )
    header = "scene_id,im_id,obj_id,score,R,t,time"
    Path(path).write_text("\n".join([header] + lines) + "\n")


def load_bop_csv(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    """Read a BOP csv back into arrays (poses in meters)."""
    rows = Path(path).read_text().strip().splitlines()
    if rows and rows[0].startswith("scene_id"):
        rows = rows[1:]
    n = len(rows)
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    scene = np.zeros(n, np.int64)
    im = np.zeros(n, np.int64)
    obj = np.zeros(n, np.int64)
    score = np.zeros(n, np.float64)
    time_ = np.zeros(n, np.float64)
    for i, row in enumerate(rows):
        parts = row.split(",")
        scene[i], im[i], obj[i] = int(parts[0]), int(parts[1]), int(parts[2])
        score[i] = float(parts[3])
        R = np.fromstring(parts[4], sep=" ").reshape(3, 3)
        t = np.fromstring(parts[5], sep=" ") / 1000.0
        poses[i, :3, :3] = R
        poses[i, :3, 3] = t
        time_[i] = float(parts[6])
    return {
        "poses": poses, "scene_ids": scene, "view_ids": im, "obj_ids": obj,
        "scores": score, "times": time_,
    }
