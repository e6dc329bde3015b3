"""Forward+loss builders for refiner and coarse-classifier training.

Parity targets: /root/reference/happypose/pose_estimators/megapose/training/
megapose_forward_loss.py (hypothesis generation :46-141, per-iteration
disentangled loss :168-241) and cosypose/training/pose_forward_loss.py.

Everything (noise sampling, multiview negative sampling, rendering, loss)
runs inside the jitted step — the reference's numpy hypothesis sampling is
replaced by jax.random so the whole step is device-resident.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.multiview_geom import make_TCO_multiview
from happypose_tpu.lib3d.transforms import add_pose_noise
from happypose_tpu.meshes.database import BatchedMeshes, RenderAssets
from happypose_tpu.models.pose_predictor import PosePredictor
from happypose_tpu.training.losses import (
    coarse_classification_loss,
    loss_refiner_CO_disentangled_reference_point,
)


class PoseTrainingBatch(NamedTuple):
    """One training batch (all fixed-shape device arrays)."""

    images: jax.Array  # [B, 3(+1), H, W]
    K: jax.Array  # [B, 3, 3]
    obj_ids: jax.Array  # [B] int32
    TCO_gt: jax.Array  # [B, 4, 4]


def make_refiner_loss_fn(
    model: PosePredictor,
    assets: RenderAssets,
    meshes: BatchedMeshes,
    n_iterations: int = 3,
    euler_deg_std=(15.0, 15.0, 15.0),
    trans_std=(0.01, 0.01, 0.05),
):
    """Refiner training: input = gt + SE(3) noise ("gt+noise" generator,
    train_pose.py:263), loss = disentangled reference-point loss summed over
    iterations."""

    def loss_fn(variables, batch: PoseTrainingBatch, rng):
        inst = meshes.select(batch.obj_ids)
        TCO_input = add_pose_noise(
            rng, batch.TCO_gt, euler_deg_std=euler_deg_std, trans_std=trans_std
        )
        out, new_state = model.apply(
            variables,
            batch.images,
            batch.K,
            batch.obj_ids,
            TCO_input,
            assets,
            inst,
            n_iterations=n_iterations,
            train=True,
            mutable=["batch_stats"],
        )
        TCO_possible_gt = jnp.einsum(
            "bij,bsjk->bsik", batch.TCO_gt, inst.symmetries
        )
        total = 0.0
        metrics: Dict[str, jax.Array] = {}
        for it in range(n_iterations):
            l, parts = loss_refiner_CO_disentangled_reference_point(
                TCO_possible_gt=TCO_possible_gt,
                TCO_input=out.TCO_input[it],
                refiner_outputs=out.pose_raw[it],
                K_crop=out.K_crop[it],
                points=inst.points,
                tCR=out.tCR[it],
                points_mask=inst.points_mask,
                sym_mask=inst.symmetries_mask,
            )
            total = total + jnp.mean(l)
            metrics[f"loss_TCO_iter{it + 1}"] = jnp.mean(l)
            metrics[f"loss_orn_iter{it + 1}"] = jnp.mean(parts["loss_orn"])
        total = total / n_iterations
        return total, (metrics, new_state["batch_stats"])

    return loss_fn


def make_coarse_loss_fn(
    model: PosePredictor,
    assets: RenderAssets,
    meshes: BatchedMeshes,
    n_hypotheses: int = 2,
    positive_inclusion_prob: float = 0.7,
    euler_deg_std=(15.0, 15.0, 15.0),
    trans_std=(0.01, 0.01, 0.05),
    logits_temperature: float = 1.0,
):
    """Coarse-classifier training ("coarse_classif_multiview_paper",
    megapose_forward_loss.py:104-141): negatives are renders of the noised
    gt pose seen from the 26-sphere x 4-inplane viewpoints; the positive
    (view 0) is included in the sampled hypothesis set with probability
    `positive_inclusion_prob` when not drawn naturally."""

    def loss_fn(variables, batch: PoseTrainingBatch, rng):
        B = batch.TCO_gt.shape[0]
        k_noise, k_perm, k_inc, k_slot = jax.random.split(rng, 4)
        TCO_noise = add_pose_noise(
            k_noise, batch.TCO_gt, euler_deg_std=euler_deg_std,
            trans_std=trans_std,
        )
        tCR = TCO_noise[:, :3, 3]
        TCV_O = make_TCO_multiview(
            TCO_noise, tCR, multiview_type="sphere_26views",
            remove_TCO_rendering=True, views_inplane_rotations=True,
        )  # [B, 104, 4, 4]
        n_views = TCV_O.shape[1]

        # sample n_hypotheses distinct views per sample
        perm = jax.vmap(
            lambda k: jax.random.permutation(k, n_views)[:n_hypotheses]
        )(jax.random.split(k_perm, B))  # [B, n_hyp]
        # forced positive inclusion
        include = jax.random.uniform(k_inc, (B,)) < positive_inclusion_prob
        slot = jax.random.randint(k_slot, (B,), 0, n_hypotheses)
        has_pos = jnp.any(perm == 0, axis=1)
        do_force = include & ~has_pos
        perm = jnp.where(
            do_force[:, None]
            & (jnp.arange(n_hypotheses)[None, :] == slot[:, None]),
            0,
            perm,
        )
        is_positive = (perm == 0).astype(jnp.float32)  # [B, n_hyp]

        hyp_TCO = jnp.take_along_axis(
            TCV_O, perm[:, :, None, None], axis=1
        ).reshape(B * n_hypotheses, 4, 4)
        rep = lambda x: jnp.repeat(x, n_hypotheses, axis=0)
        inst = meshes.select(rep(batch.obj_ids))
        out, new_state = model.apply(
            variables,
            rep(batch.images),
            rep(batch.K),
            rep(batch.obj_ids),
            hyp_TCO,
            assets,
            inst,
            n_iterations=1,
            train=True,
            mutable=["batch_stats"],
        )
        logits = out.renderings_logits[0, :, 0].reshape(B, n_hypotheses)
        logits = logits / logits_temperature
        loss = coarse_classification_loss(logits, is_positive)
        acc = jnp.mean(((logits > 0) == (is_positive > 0.5)).astype(jnp.float32))
        return loss, ({"coarse_acc": acc}, new_state["batch_stats"])

    return loss_fn
