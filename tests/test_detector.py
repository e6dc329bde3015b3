"""Detector tests: shapes, NMS semantics, a few training steps reduce loss,
and detection of a rendered object after brief overfitting."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from happypose_tpu.models.detector import (
    DetectorConfig,
    FCOSDetector,
    decode_boxes,
    detector_postprocess,
    nms_fixed,
)
from happypose_tpu.training.detector_loss import (
    DetectionTargets,
    detector_loss,
)

H, W = 128, 128


def test_nms_fixed():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 10, 10]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    labels = jnp.asarray([0, 0, 0, 1])  # last overlaps box 0 but other class
    keep, kv = nms_fixed(boxes, scores, labels, iou_threshold=0.5, max_out=4)
    kept = set(np.asarray(keep)[np.asarray(kv)].tolist())
    assert kept == {0, 2, 3}  # box 1 suppressed by box 0; box 3 survives


def test_decode_boxes():
    loc = jnp.asarray([[10.0, 20.0]])
    reg = jnp.asarray([[2.0, 3.0, 4.0, 5.0]])
    b = np.asarray(decode_boxes(loc, reg))
    np.testing.assert_allclose(b, [[8, 17, 14, 25]])


@pytest.fixture(scope="module")
def detector():
    cfg = DetectorConfig(n_classes=2, n_prototypes=8, fpn_channels=32,
                         head_depth=1)
    model = FCOSDetector(cfg)
    imgs = jnp.zeros((1, 3, H, W))
    # jitted init: eager tracing is the old 30 s fixture cost
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=False)
    )(jax.random.PRNGKey(0), imgs)
    return cfg, model, variables


def test_forward_shapes(detector):
    cfg, model, variables = detector
    # batch 1 (same shape as the fixture init - a second batch size would
    # compile a second trace; this is the only default-lane detector test)
    imgs = jnp.zeros((1, 3, H, W))
    out = model.apply(variables, imgs, train=False)
    # pyramid levels for 128: 16x16 + 8x8 + 4x4 + 2x2 + 1x1 = 341
    L = 16 * 16 + 8 * 8 + 4 * 4 + 2 * 2 + 1
    assert out.cls_logits.shape == (1, L, 2)
    assert out.box_reg.shape == (1, L, 4)
    assert (np.asarray(out.box_reg) > 0).all()  # exp-parametrized distances
    assert out.prototypes.shape[0] == 1 and out.prototypes.shape[-1] == 8
    assert out.locations.shape == (L, 2)
    post = detector_postprocess(out, score_threshold=0.0, max_detections=8)
    assert post["boxes"].shape == (1, 8, 4)
    assert post["masks"].shape[:2] == (1, 8)


@pytest.mark.slow
def test_training_reduces_loss(detector):
    cfg, model, variables = detector
    import optax

    # one synthetic scene: a bright square (class 0) on dark background
    img = np.zeros((1, 3, H, W), np.float32)
    img[:, :, 40:80, 30:90] = 1.0
    gt_boxes = np.asarray([[[30.0, 40.0, 90.0, 80.0]]], np.float32)
    gt_labels = np.asarray([[0]], np.int32)
    Hm = Wm = H // 4
    m = np.zeros((1, 1, Hm, Wm), bool)
    m[:, :, 10:20, 8:23] = True
    targets = DetectionTargets(
        boxes=jnp.asarray(gt_boxes), labels=jnp.asarray(gt_labels),
        masks=jnp.asarray(m), valid=jnp.ones((1, 1), bool),
    )
    imgs = jnp.asarray(img)

    tx = optax.adam(1e-3)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state):
        def lf(p):
            out, new_state = model.apply(
                {"params": p, "batch_stats": bstats}, imgs, train=True,
                mutable=["batch_stats"],
            )
            loss, parts = detector_loss(out, targets, cfg.n_classes)
            return loss, (parts, new_state["batch_stats"])

        (loss, (parts, new_bstats)), grads = jax.value_and_grad(
            lf, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, new_bstats, opt_state, loss

    losses = []
    for _ in range(10):
        params, bstats, opt_state, loss = step(params, bstats, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
