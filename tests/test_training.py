"""Training tests: loss math, a few real train steps reduce the loss, and
the data-parallel step runs on the virtual 8-device CPU mesh (the
distributed testing the reference lacks, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from happypose_tpu.lib3d.transforms import make_T, add_pose_noise
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.models import PosePredictor, PosePredictorConfig
from happypose_tpu.training import (
    TrainState,
    make_optimizer,
    make_train_step,
)
from happypose_tpu.training.forward_loss import (
    PoseTrainingBatch,
    make_refiner_loss_fn,
    make_coarse_loss_fn,
)
from happypose_tpu.training.losses import (
    loss_refiner_CO_disentangled_reference_point,
)
from happypose_tpu.training.synth_data import make_synth_batch
from happypose_tpu.training.trainer import split_batch_for_mesh


@pytest.fixture(scope="module")
def world():
    db = MeshDataBase(
        meshes={
            "sphere": make_uv_sphere(radius=0.05, n_lat=10, n_lon=12),
            "box": make_box_mesh((0.04, 0.03, 0.05)),
        }
    )
    assets = db.render_assets()
    bm = db.batched(n_points=128)
    K1 = jnp.asarray(
        [[150.0, 0, 80.0], [0, 150.0, 60.0], [0, 0, 1.0]], jnp.float32
    )
    return db, assets, bm, K1


def test_disentangled_loss_zero_at_gt():
    """If the network outputs exactly the gt update, loss must be ~0."""
    rs = np.random.RandomState(0)
    B = 4
    TCO_gt = make_T(
        jnp.broadcast_to(jnp.eye(3), (B, 3, 3)),
        jnp.asarray(rs.uniform(-0.05, 0.05, (B, 3)) + [0, 0, 0.5], jnp.float32),
    )
    TCO_possible = TCO_gt[:, None]
    TCO_input = add_pose_noise(jax.random.PRNGKey(0), TCO_gt)
    K = jnp.broadcast_to(
        jnp.asarray([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]]), (B, 3, 3)
    )
    points = jnp.asarray(rs.uniform(-0.05, 0.05, (B, 64, 3)), jnp.float32)
    tCR = TCO_input[:, :3, 3]

    # construct gt outputs
    dR_gt = TCO_gt[:, :3, :3] @ jnp.swapaxes(TCO_input[:, :3, :3], -1, -2)
    tCR_out_gt = TCO_gt[:, :3, 3] - jnp.squeeze(
        dR_gt @ (TCO_input[:, :3, 3] - tCR)[..., None], -1
    )
    vz_gt = tCR_out_gt[:, 2:3] / tCR[:, 2:3]
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)
    vxvy_gt = fxfy * (
        tCR_out_gt[:, 0:2] / tCR_out_gt[:, 2:3] - tCR[:, 0:2] / tCR[:, 2:3]
    )
    # ortho6d of dR_gt: first two columns
    ortho6d = jnp.concatenate([dR_gt[:, :, 0], dR_gt[:, :, 1]], -1)
    outputs = jnp.concatenate([ortho6d, vxvy_gt, vz_gt], -1)

    loss, parts = loss_refiner_CO_disentangled_reference_point(
        TCO_possible, TCO_input, outputs, K, points, tCR
    )
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)


@pytest.mark.slow
def test_refiner_training_reduces_loss(world):
    db, assets, bm, K1 = world
    cfg = PosePredictorConfig(
        backbone="wide_resnet18", render_size=(60, 80), renderer="reference"
    )
    model = PosePredictor(cfg)
    loss_fn = make_refiner_loss_fn(model, assets, bm, n_iterations=1)

    batch = make_synth_batch(
        jax.random.PRNGKey(0), assets, K1, n_objects=2, batch_size=4,
        resolution=(120, 160),
    )
    inst = bm.select(batch.obj_ids)
    variables = model.init(
        jax.random.PRNGKey(1), batch.images, batch.K, batch.obj_ids,
        batch.TCO_gt, assets, inst, n_iterations=1,
    )
    tx = make_optimizer(lr=1e-3, n_warmup_steps=1)
    state = TrainState.create(variables, tx)
    step = make_train_step(loss_fn, tx)

    losses = []
    for i in range(8):
        rng = jax.random.PRNGKey(100 + i)
        batch = make_synth_batch(
            jax.random.fold_in(rng, 1), assets, K1, n_objects=2, batch_size=4,
            resolution=(120, 160),
        )
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # loss goes down (the identity-init refiner has headroom on noised poses)
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


@pytest.mark.slow
def test_coarse_training_step(world):
    db, assets, bm, K1 = world
    cfg = PosePredictorConfig(
        backbone="wide_resnet18", render_size=(60, 80), renderer="reference",
        predict_pose_update=False, predict_rendered_views_logits=True,
    )
    model = PosePredictor(cfg)
    loss_fn = make_coarse_loss_fn(model, assets, bm, n_hypotheses=2)
    batch = make_synth_batch(
        jax.random.PRNGKey(0), assets, K1, n_objects=2, batch_size=2,
        resolution=(120, 160),
    )
    inst = bm.select(batch.obj_ids)
    variables = model.init(
        jax.random.PRNGKey(1), batch.images, batch.K, batch.obj_ids,
        batch.TCO_gt, assets, inst,
    )
    tx = make_optimizer(lr=1e-3, n_warmup_steps=1)
    state = TrainState.create(variables, tx)
    step = make_train_step(loss_fn, tx)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert "coarse_acc" in metrics


def test_grid_hypothesis_sampling_labels(world):
    """Grid-negative sampling: shared translation across hypotheses, labels
    = symmetry-aware angle < threshold, slot 0 near gt."""
    from happypose_tpu.lib3d.so3_grid import load_SO3_grid
    from happypose_tpu.training.forward_loss import sample_grid_hypotheses

    db, assets, bm, K1 = world
    batch = make_synth_batch(
        jax.random.PRNGKey(0), assets, K1, n_objects=2, batch_size=4,
        resolution=(120, 160),
    )
    inst = bm.select(batch.obj_ids)
    grid = jnp.asarray(load_SO3_grid(72))
    hyp, labels, ang = sample_grid_hypotheses(
        jax.random.PRNGKey(3), batch.TCO_gt, inst.symmetries,
        inst.symmetries_mask, grid, n_hypotheses=6,
    )
    hyp, labels, ang = np.asarray(hyp), np.asarray(labels), np.asarray(ang)
    assert hyp.shape == (4, 6, 4, 4)
    # every hypothesis shares slot 0's translation (no translation shortcut)
    np.testing.assert_allclose(
        hyp[:, :, :3, 3], np.broadcast_to(hyp[:, :1, :3, 3], (4, 6, 3)),
        atol=1e-6,
    )
    # labels consistent with the angles
    np.testing.assert_array_equal(labels, (ang < np.deg2rad(30.0)))
    # slot 0 is the noised gt: angle stddev 15deg/axis -> nearly always
    # below 90deg, usually below 45
    assert (ang[:, 0] < np.deg2rad(90.0)).all()
    # negative rotations are genuine grid members
    d = np.einsum("bnji,mji->bnm", hyp[:, 1:, :3, :3], np.asarray(grid))
    assert np.isclose(d.max(axis=-1), 3.0, atol=1e-3).all()


@pytest.mark.slow
def test_coarse_grid_loss_step(world):
    """One grad step of the grid-negative coarse loss (full model)."""
    from happypose_tpu.training.forward_loss import make_coarse_grid_loss_fn

    db, assets, bm, K1 = world
    cfg = PosePredictorConfig(
        backbone="wide_resnet18", render_size=(60, 80), renderer="reference",
        predict_pose_update=False, predict_rendered_views_logits=True,
    )
    model = PosePredictor(cfg)
    loss_fn = make_coarse_grid_loss_fn(
        model, assets, bm, n_hypotheses=4, so3_grid_size=72
    )
    batch = make_synth_batch(
        jax.random.PRNGKey(0), assets, K1, n_objects=2, batch_size=2,
        resolution=(120, 160),
    )
    inst = bm.select(batch.obj_ids)
    variables = model.init(
        jax.random.PRNGKey(1), batch.images, batch.K, batch.obj_ids,
        batch.TCO_gt, assets, inst,
    )
    (loss, (metrics, _)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(variables, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert "coarse_top1_within_thresh" in metrics
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


@pytest.mark.slow
def test_data_parallel_train_step_8_devices(world):
    """Full dp train step over the virtual 8-device CPU mesh: shard batch,
    pmean grads, sync-BN through axis_name."""
    db, assets, bm, K1 = world
    devices = np.array(jax.devices()[:8])
    assert len(devices) == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(devices, ("dp",))

    cfg = PosePredictorConfig(
        backbone="wide_resnet18", render_size=(60, 80), renderer="reference",
        bn_axis_name="dp",
    )
    model = PosePredictor(cfg)
    loss_fn = make_refiner_loss_fn(model, assets, bm, n_iterations=1)

    B = 16  # 2 per device
    batch = make_synth_batch(
        jax.random.PRNGKey(0), assets, K1, n_objects=2, batch_size=B,
        resolution=(120, 160),
    )
    inst = bm.select(batch.obj_ids)
    variables = model.init(
        jax.random.PRNGKey(1), batch.images, batch.K, batch.obj_ids,
        batch.TCO_gt, assets, inst, n_iterations=1,
    )
    tx = make_optimizer(lr=1e-3, n_warmup_steps=1)
    state = TrainState.create(variables, tx)
    # snapshot before the step: the step donates its input state
    params_before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    step = make_train_step(loss_fn, tx, mesh=mesh, axis="dp")
    sharded = split_batch_for_mesh(batch, mesh)
    state2, metrics = step(state, sharded, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree.map(
            lambda a, b: jnp.asarray(a) - b, params_before, state2.params
        ),
        0.0,
    )
    assert delta > 0


def test_nonfinite_batch_skipped():
    """A batch producing NaN loss must not move params (SURVEY §5.3
    mitigation the reference lacks)."""
    import optax

    def loss_fn(variables, batch, rng):
        x = batch["x"]
        loss = jnp.where(
            batch["poison"], jnp.nan, ((variables["params"]["w"] - x) ** 2).sum()
        )
        return loss, ({"dummy": jnp.float32(0.0)}, {})

    tx = optax.sgd(0.1)
    variables = {"params": {"w": jnp.ones(3)}, "batch_stats": {}}
    state = TrainState.create(variables, tx)
    step = make_train_step(loss_fn, tx)

    rng = jax.random.PRNGKey(0)
    good = {"x": jnp.zeros(3), "poison": jnp.asarray(False)}
    bad = {"x": jnp.zeros(3), "poison": jnp.asarray(True)}

    state1, m1 = step(state, bad, rng)
    assert float(m1["skipped_nonfinite"]) == 1.0
    np.testing.assert_allclose(
        np.asarray(state1.params["w"]), np.ones(3)
    )  # unchanged

    state2, m2 = step(state1, good, rng)
    assert float(m2["skipped_nonfinite"]) == 0.0
    assert not np.allclose(np.asarray(state2.params["w"]), np.ones(3))


def test_mesh_only_registry():
    from happypose_tpu.training.synth_data import make_synth_mesh_db
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_synth_mesh_db("mesh_only", None)
    ref = "/root/reference/tests/data/obj_000001.ply"
    import os
    if not os.path.exists(ref):
        _pytest.skip("reference fixture absent")
    db = make_synth_mesh_db("mesh_only", [ref], max_faces=3000)
    assert db.labels == ["mesh0"]
    m = db.meshes["mesh0"]
    assert len(m.faces) <= 3000
    assert m.texture is not None  # procedural texture over shipped UVs
    assert db.scales["mesh0"] == 1e-3  # mm -> m
