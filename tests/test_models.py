"""Model tests: backbone shapes, pose predictor iteration semantics."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.models import (
    PosePredictor,
    PosePredictorConfig,
    ResNet34,
    WideResNet18,
)
from happypose_tpu.lib3d.multiview_geom import make_TCO_multiview, look_at_R
from happypose_tpu.lib3d.rotations import log_SE3_norm


def test_backbone_shapes():
    x = jnp.zeros((2, 64, 64, 6))
    for mk in (WideResNet18, ResNet34):
        model = mk()
        params = model.init(jax.random.PRNGKey(0), x, train=False)
        feats = model.apply(params, x, train=False)
        assert feats.shape == (2, 512)
        assert feats.dtype == jnp.float32


def test_backbone_train_updates_bn():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    model = WideResNet18()
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, new_state = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


class TestMultiviewGeom:
    def test_look_at_identity(self):
        eye = jnp.zeros((2, 3))
        target = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
        up = jnp.asarray([[0.0, -1.0, 0.0]] * 2)
        R = look_at_R(eye, target, up)
        np.testing.assert_allclose(np.asarray(R), np.tile(np.eye(3), (2, 1, 1)), atol=1e-6)

    def test_TCO_only(self):
        TCO = jnp.eye(4)[None].at[:, 2, 3].set(0.7)
        out = make_TCO_multiview(TCO, TCO[:, :3, 3], multiview_type="TCO")
        assert out.shape == (1, 1, 4, 4)
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(TCO), atol=1e-6)

    def test_front_3views(self):
        TCO = jnp.eye(4)[None].at[:, 2, 3].set(0.7)
        tCR = TCO[:, :3, 3]
        out = make_TCO_multiview(TCO, tCR, multiview_type="front_3views")
        assert out.shape == (1, 4, 4, 4)  # TCO + 3 extra
        # view 1 is at the same position looking at ref -> == TCO here
        np.testing.assert_allclose(np.asarray(out[:, 1]), np.asarray(TCO), atol=1e-5)
        # all views place the reference point at the same distance (on the
        # sphere of radius |offset - tCR|); every camera looks AT the ref:
        # ref point in each view's frame must be on the +z axis
        for v in range(1, 4):
            T = np.asarray(out[0, v])
            # ref in view frame: TCV_O @ origin_O ... ref is origin of object
            ref_v = T[:3, 3]
            np.testing.assert_allclose(ref_v[0], 0.0, atol=1e-5)
            np.testing.assert_allclose(ref_v[1], 0.0, atol=1e-5)
            assert ref_v[2] > 0

    def test_sphere_26(self):
        TCO = jnp.eye(4)[None].at[:, 2, 3].set(0.7)
        out = make_TCO_multiview(
            TCO, TCO[:, :3, 3], multiview_type="sphere_26views",
            remove_TCO_rendering=True,
        )
        assert out.shape == (1, 26, 4, 4)

    def test_inplane_rotations(self):
        TCO = jnp.eye(4)[None].at[:, 2, 3].set(0.7)
        out = make_TCO_multiview(
            TCO, TCO[:, :3, 3], multiview_type="front_1view",
            remove_TCO_rendering=True, views_inplane_rotations=True,
        )
        assert out.shape == (1, 4, 4, 4)


class TestPosePredictor:
    def _setup(self):
        db = MeshDataBase(
            meshes={
                "sphere": make_uv_sphere(radius=0.05, n_lat=12, n_lon=16),
                "box": make_box_mesh((0.04, 0.04, 0.04)),
            }
        )
        assets = db.render_assets()
        bm = db.batched(n_points=200)
        B = 2
        K = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
        K[:, 0, 0] = K[:, 1, 1] = 300.0
        K[:, 0, 2] = 160.0
        K[:, 1, 2] = 120.0
        TCO = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        TCO[:, 2, 3] = 0.5
        images = np.random.RandomState(0).rand(B, 3, 240, 320).astype(np.float32)
        ids = jnp.asarray([0, 1], jnp.int32)
        return db, assets, bm, jnp.asarray(images), jnp.asarray(K), ids, jnp.asarray(TCO)

    def test_refiner_identity_at_init(self):
        """With the identity-bias head, an untrained refiner must output a
        pose close to its input (kernel init is tiny)."""
        db, assets, bm, images, K, ids, TCO = self._setup()
        cfg = PosePredictorConfig(
            backbone="wide_resnet18",
            render_size=(120, 160),
            renderer="reference",
        )
        model = PosePredictor(cfg)
        meshes = bm.select(ids)
        variables = model.init(
            jax.random.PRNGKey(0), images, K, ids, TCO, assets, meshes,
            n_iterations=1,
        )
        out = model.apply(
            variables, images, K, ids, TCO, assets, meshes, n_iterations=2
        )
        assert out.TCO_output.shape == (2, 2, 4, 4)
        d = log_SE3_norm(out.TCO_output[0], out.TCO_input[0])
        assert np.asarray(d).max() < 0.05
        # iteration chaining: input of iter 2 == output of iter 1
        np.testing.assert_allclose(
            np.asarray(out.TCO_input[1]), np.asarray(out.TCO_output[0]), atol=1e-5
        )

    def test_coarse_logits(self):
        db, assets, bm, images, K, ids, TCO = self._setup()
        cfg = PosePredictorConfig(
            backbone="wide_resnet18",
            render_size=(120, 160),
            renderer="reference",
            predict_pose_update=False,
            predict_rendered_views_logits=True,
            multiview_type="TCO",
        )
        model = PosePredictor(cfg)
        meshes = bm.select(ids)
        variables = model.init(
            jax.random.PRNGKey(0), images, K, ids, TCO, assets, meshes
        )
        out = model.apply(variables, images, K, ids, TCO, assets, meshes)
        assert out.renderings_logits.shape == (1, 2, 1)
        # no pose update performed
        np.testing.assert_allclose(
            np.asarray(out.TCO_output), np.asarray(out.TCO_input), atol=0
        )


@pytest.mark.slow
def test_efficientnet_backbone():
    from happypose_tpu.models import EfficientNetB0

    model = EfficientNetB0()
    x = jnp.zeros((2, 64, 64, 6))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(params, x, train=False)
    assert feats.shape == (2, model.n_features)
    assert model.n_features == 1280
