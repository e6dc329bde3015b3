"""Object-center disentangled loss (ortho6d + quaternion) and the
quaternion pose head."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from happypose_tpu.lib3d.rotations import rotmat_to_quat
from happypose_tpu.training.losses import loss_refiner_CO_disentangled


def _setup(B=4, P=32, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.randn(B, P, 3).astype(np.float32) * 0.05
    K = np.broadcast_to(
        np.asarray([[320.0, 0, 120], [0, 320.0, 90], [0, 0, 1]], np.float32),
        (B, 3, 3),
    )
    T_in = np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy()
    T_in[:, 2, 3] = 0.5
    T_gt = T_in.copy()
    T_gt[:, 0, 3] += rs.uniform(-0.02, 0.02, B)
    T_gt[:, 2, 3] += rs.uniform(-0.02, 0.02, B)
    return jnp.asarray(pts), jnp.asarray(K), jnp.asarray(T_in), jnp.asarray(T_gt)


def _gt_outputs_ortho6d(T_in, T_gt, K):
    """The network outputs that exactly reproduce the GT pose."""
    dR = T_gt[:, :3, :3] @ jnp.swapaxes(T_in[:, :3, :3], -1, -2)
    o6 = jnp.concatenate([dR[:, :, 0], dR[:, :, 1]], axis=-1)
    fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)
    z_in, z_gt = T_in[:, 2, 3:4], T_gt[:, 2, 3:4]
    vxvy = fxfy * (T_gt[:, :2, 3] / z_gt - T_in[:, :2, 3] / z_in)
    vz = z_gt / z_in
    return jnp.concatenate([o6, vxvy, vz], axis=-1)


class TestObjectCenterDisentangled:
    def test_zero_at_gt(self):
        pts, K, T_in, T_gt = _setup()
        out = _gt_outputs_ortho6d(T_in, T_gt, K)
        loss, parts = loss_refiner_CO_disentangled(
            T_gt[:, None], T_in, out, K, pts
        )
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)

    def test_nonzero_off_gt(self):
        pts, K, T_in, T_gt = _setup()
        bad = _gt_outputs_ortho6d(T_in, T_gt, K).at[:, 8].add(0.2)
        loss, parts = loss_refiner_CO_disentangled(
            T_gt[:, None], T_in, bad, K, pts
        )
        assert float(parts["loss_z"].mean()) > 1e-3
        # disentanglement: only the z term moves
        np.testing.assert_allclose(np.asarray(parts["loss_xy"]), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(parts["loss_orn"]), 0.0, atol=1e-5)

    def test_quaternion_variant_zero_at_gt(self):
        pts, K, T_in, T_gt = _setup(seed=1)
        dR = T_gt[:, :3, :3] @ jnp.swapaxes(T_in[:, :3, :3], -1, -2)
        q = rotmat_to_quat(dR)
        fxfy = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)
        z_in, z_gt = T_in[:, 2, 3:4], T_gt[:, 2, 3:4]
        vxvy = fxfy * (T_gt[:, :2, 3] / z_gt - T_in[:, :2, 3] / z_in)
        out7 = jnp.concatenate([q, vxvy, z_gt / z_in], axis=-1)
        loss, _ = loss_refiner_CO_disentangled(
            T_gt[:, None], T_in, out7, K, pts, rotation_param="quaternion"
        )
        np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-5)

    def test_gradients_finite(self):
        pts, K, T_in, T_gt = _setup(seed=2)
        out = _gt_outputs_ortho6d(T_in, T_gt, K) + 0.01

        def f(o):
            l, _ = loss_refiner_CO_disentangled(T_gt[:, None], T_in, o, K, pts)
            return l.sum()

        g = jax.grad(f)(out)
        assert np.isfinite(np.asarray(g)).all()


class TestQuaternionHead:
    @pytest.mark.slow  # full PosePredictor compile for a variant head
    def test_identity_init_and_forward(self):
        from happypose_tpu.meshes.database import MeshDataBase
        from happypose_tpu.meshes.io import make_box_mesh
        from happypose_tpu.models import PosePredictor, PosePredictorConfig

        db = MeshDataBase(meshes={"box": make_box_mesh((0.04, 0.03, 0.05))})
        cfg = PosePredictorConfig(
            backbone="wide_resnet18", render_size=(64, 64),
            renderer="reference", pose_head="quaternion",
        )
        model = PosePredictor(cfg)
        B = 2
        images = jnp.zeros((B, 3, 64, 64))
        K = jnp.broadcast_to(
            jnp.asarray([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]]),
            (B, 3, 3),
        )
        TCO = jnp.broadcast_to(jnp.eye(4), (B, 4, 4)).at[:, 2, 3].set(0.5)
        ids = jnp.zeros(B, jnp.int32)
        bm = db.batched(n_points=64)
        var = model.init(
            jax.random.PRNGKey(0), images, K, ids, TCO, db.render_assets(),
            bm.select(ids), n_iterations=1,
        )
        assert var["params"]["pose_fc"]["bias"].shape == (7,)
        out = model.apply(
            var, images, K, ids, TCO, db.render_assets(), bm.select(ids),
            n_iterations=1,
        )
        T_out = np.asarray(out.TCO_output[-1])
        assert np.isfinite(T_out).all()
        # near-identity-initialized head keeps the pose roughly in place
        assert np.abs(T_out[:, :3, 3] - np.asarray(TCO)[:, :3, 3]).max() < 0.05
