"""Per-frame prediction loop + evaluation orchestration.

Parity targets:
- `PredictionRunner.get_predictions` (frame shard -> ObservationTensor ->
  gt/external detections -> run_inference_pipeline -> tagged predictions):
  /root/reference/happypose/pose_estimators/megapose/evaluation/
  prediction_runner.py:52-291
- `run_eval`: megapose/evaluation/evaluation.py:79-277.

Detections are padded to a fixed per-frame budget so every frame reuses one
compiled pipeline; results gather into plain numpy dicts (the multi-host
variant all-gathers fixed-shape arrays instead of the reference's
file-round-trip `gather_distributed`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from happypose_tpu.datasets.bop import BOPSceneDataset, SceneObservation
from happypose_tpu.datasets.samplers import DistributedSceneSampler
from happypose_tpu.inference.pose_estimator import PoseEstimator
from happypose_tpu.utils.logging import get_logger

logger = get_logger(__name__)
from happypose_tpu.inference.types import DetectionBatch, ObservationBatch
from happypose_tpu.meshes.database import MeshDataBase


@dataclass
class PredictionRunner:
    """Runs the inference pipeline over a (sharded) scene dataset."""

    scene_ds: BOPSceneDataset
    estimator: PoseEstimator
    mesh_db: MeshDataBase
    detection_type: str = "gt"  # gt | detector | external
    min_visib_fract: float = 0.05
    max_detections: int = 8
    external_detections: Optional[Dict] = None  # keyed (scene_id, view_id)
    detector: Optional[object] = None  # inference.detector.Detector
    detection_th: float = 0.3
    one_instance_per_class: bool = False
    n_replicas: int = 1
    rank: int = 0
    max_frames: Optional[int] = None  # truncate the split (smoke runs)

    def _detections_from_detector(
        self, obs: SceneObservation
    ) -> Optional[DetectionBatch]:
        """Run the trained detector on the frame at its training resolution
        and map boxes back to the original image (the reference's
        `detection_type="detector"` path, prediction_runner.py:98-105)."""
        import functools

        import jax
        import jax.numpy as jnp

        from happypose_tpu.datasets.augmentations import crop_resize_to_aspect

        H, W = getattr(self.detector, "image_size", (240, 320))
        x = jnp.asarray(
            np.moveaxis(obs.rgb.astype(np.float32) / 255.0, -1, 0)[None]
        )
        K = jnp.asarray(obs.K[None].astype(np.float32))
        crop_fn = getattr(self, "_crop_jit", None)
        if crop_fn is None:
            crop_fn = self._crop_jit = jax.jit(
                functools.partial(crop_resize_to_aspect, target_hw=(H, W))
            )
        x_r, K2 = crop_fn(x, K)
        det, _ = self.detector.get_detections(
            ObservationBatch(rgb=x_r, K=K2),
            detection_th=self.detection_th,
            one_instance_per_class=self.one_instance_per_class,
            max_detections=self.max_detections,
        )
        if det.n_rows == 0:
            return None
        # invert the aspect crop: boxes were predicted in the resized frame
        s = float(np.asarray(K2)[0, 0, 0]) / float(obs.K[0, 0])
        offx = float(np.asarray(K2)[0, 0, 2]) - float(obs.K[0, 2]) * s
        offy = float(np.asarray(K2)[0, 1, 2]) - float(obs.K[1, 2]) * s
        boxes = np.asarray(det.boxes).copy()
        boxes[:, 0::2] = (boxes[:, 0::2] - offx) / s
        boxes[:, 1::2] = (boxes[:, 1::2] - offy) / s
        return DetectionBatch.from_numpy(
            boxes=boxes,
            obj_ids=np.asarray(det.obj_ids),
            scores=np.asarray(det.scores),
        )

    def _detections_for(self, obs: SceneObservation) -> Optional[DetectionBatch]:
        if self.detection_type == "gt":
            if obs.obj_labels is None:
                return None
            keep = [
                i
                for i in range(len(obs.obj_labels))
                if (obs.visib_fract is None or obs.visib_fract[i] > self.min_visib_fract)
                and obs.obj_labels[i] in self.mesh_db.label_to_id
            ]
            if not keep:
                return None
            boxes = obs.bboxes[keep]
            ids = self.mesh_db.ids_of([obs.obj_labels[i] for i in keep])
            return DetectionBatch.from_numpy(boxes=boxes, obj_ids=ids)
        if self.detection_type == "detector":
            return self._detections_from_detector(obs)
        if self.detection_type == "external":
            det = self.external_detections.get((obs.scene_id, obs.view_id))
            if det is None:
                return None
            return DetectionBatch.from_numpy(
                boxes=np.asarray(det["boxes"], np.float32),
                obj_ids=self.mesh_db.ids_of(det["labels"]),
                scores=np.asarray(det.get("scores"), np.float32)
                if "scores" in det
                else None,
            )
        raise ValueError(self.detection_type)

    def get_predictions(self) -> Dict[str, List[dict]]:
        """Returns {"final": [per-frame dicts], ...} with numpy results.

        The result is cached on the runner: the full pipeline over the split
        is the expensive part of an eval (round 4's two 35-50 min eval
        attempts ran it TWICE — once for metrics, once for the BOP csv)."""
        if getattr(self, "_cached_predictions", None) is not None:
            return self._cached_predictions
        sampler = DistributedSceneSampler(
            len(self.scene_ds), self.n_replicas, self.rank, shuffle=False
        )
        out: Dict[str, List[dict]] = {"final": []}
        for idx in sampler:
            if (
                self.max_frames is not None
                and len(out["final"]) >= self.max_frames
            ):
                break
            obs = self.scene_ds[idx]
            det = self._detections_for(obs)
            if det is None:
                continue
            det = DetectionBatch.pad(det, self.max_detections)
            obs_batch = ObservationBatch.from_numpy(
                obs.rgb, obs.K, depth=obs.depth
            )
            t0 = time.time()
            pipeline = (
                self.estimator.run_inference_pipeline_jit
                if self.estimator.device_mesh is None
                else self.estimator.run_inference_pipeline
            )
            results = pipeline(obs_batch, det)
            final = results["final"]
            elapsed = time.time() - t0
            valid = np.asarray(final.valid)
            out["final"].append(
                {
                    "scene_id": obs.scene_id,
                    "view_id": obs.view_id,
                    "poses": np.asarray(final.poses)[valid],
                    "obj_ids": np.asarray(final.obj_ids)[valid],
                    "scores": np.asarray(final.pose_logits)[valid],
                    "time": elapsed,
                }
            )
            n_done = len(out["final"])
            if n_done % 8 == 0 or n_done == 1:
                # the first frame's `elapsed` is dominated by compiles;
                # log it so long quiet setups are diagnosable
                logger.info(
                    f"frame {n_done}: scene {obs.scene_id} view "
                    f"{obs.view_id} in {elapsed:.1f}s"
                )
        self._cached_predictions = out
        return out


def run_eval(
    runner: PredictionRunner,
    meter,
    obj_dataset=None,
    bop19_evaluator=None,
) -> Dict[str, float]:
    """Predictions -> matched against dataset GT via the meter -> summary.

    If a `Bop19Evaluator` is passed, its official VSD/MSSD/MSPD recalls are
    merged into the summary (the reference gets these from the bop_toolkit
    subprocess, megapose/evaluation/bop.py:162-229)."""
    t0 = time.time()
    preds = runner.get_predictions()
    t_pred = time.time() - t0
    t0 = time.time()
    frame_index = {
        (s, v): i for i, (s, v) in enumerate(runner.scene_ds.frames)
    }
    for rec in preds["final"]:
        idx = frame_index.get((rec["scene_id"], rec["view_id"]))
        if idx is None:
            continue
        obs = runner.scene_ds[idx]
        if obs.obj_labels is None:
            continue
        gt_ids = runner.mesh_db.ids_of(obs.obj_labels)
        meter.add(
            TCO_pred=rec["poses"],
            pred_obj_ids=rec["obj_ids"],
            pred_scores=rec["scores"],
            pred_group=np.full(len(rec["poses"]), rec["view_id"]),
            TCO_gt=obs.TWO,
            gt_obj_ids=gt_ids,
            gt_group=np.full(len(gt_ids), rec["view_id"]),
        )
        if bop19_evaluator is not None:
            bop19_evaluator.add_image(
                TCO_pred=rec["poses"],
                pred_obj_ids=rec["obj_ids"],
                pred_scores=rec["scores"],
                TCO_gt=obs.TWO,
                gt_obj_ids=gt_ids,
                K=obs.K,
                gt_visib_fract=obs.visib_fract,
                depth_test=obs.depth,
                im_width=obs.rgb.shape[1],
            )
    t_metrics = time.time() - t0
    summary = meter.summary()
    if bop19_evaluator is not None:
        summary.update(bop19_evaluator.summary())
    summary["eval_seconds_predictions"] = t_pred
    summary["eval_seconds_metrics"] = t_metrics
    logger.info(
        f"eval timing: predictions {t_pred:.1f}s, "
        f"metrics (meter+bop19) {t_metrics:.1f}s"
    )
    return summary
