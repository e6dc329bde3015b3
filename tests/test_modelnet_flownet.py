"""FlowNetS backbone + DeepIM-ModelNet dataset loader tests."""

import numpy as np
import jax
import jax.numpy as jnp

from happypose_tpu.datasets.deepim_modelnet import (
    DeepImModelNetDataset,
    MODELNET_K,
    bbox_from_label_mask,
    parse_pose,
)
from happypose_tpu.models.backbones import FlowNetS


class TestFlowNetS:
    def test_shapes_and_dtype(self):
        m = FlowNetS()
        x = jnp.zeros((2, 64, 64, 6))
        vars_ = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(vars_, x)
        assert y.shape == (2, 1024)
        assert y.dtype == jnp.float32
        assert m.n_features == 1024

    def test_batchnorm_mode(self):
        m = FlowNetS(use_batchnorm=True)
        x = jnp.ones((2, 64, 64, 6))
        vars_ = m.init(jax.random.PRNGKey(0), x, train=True)
        assert "batch_stats" in vars_
        y, new_state = m.apply(
            vars_, x, train=True, mutable=["batch_stats"]
        )
        assert y.shape == (2, 1024)

    def test_works_in_pose_predictor(self):
        from happypose_tpu.models import PosePredictor, PosePredictorConfig
        from happypose_tpu.meshes.database import MeshDataBase
        from happypose_tpu.meshes.io import make_box_mesh

        db = MeshDataBase(meshes={"box": make_box_mesh((0.04, 0.03, 0.05))})
        cfg = PosePredictorConfig(
            backbone="flownet", render_size=(64, 64), renderer="reference"
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
        out = model.apply(
            var, images, K, ids, TCO, db.render_assets(), bm.select(ids),
            n_iterations=1,
        )
        assert out.TCO_output[-1].shape == (B, 4, 4)


class TestParsePose:
    def test_roundtrip(self):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0.1, -0.2, 0.9]
        txt = "some header\nlines\n" + "\n".join(
            " ".join(str(x) for x in T[r]) for r in range(3)
        )
        np.testing.assert_allclose(parse_pose(txt), T)

    def test_bbox_from_label(self):
        lab = np.zeros((40, 60), np.uint8)
        lab[10:20, 25:45] = 1
        bb = bbox_from_label_mask(lab)
        np.testing.assert_allclose(bb, [25, 10, 44, 19])

    def test_bbox_empty(self):
        np.testing.assert_allclose(
            bbox_from_label_mask(np.zeros((8, 8), np.uint8)), np.zeros(4)
        )


class TestDeepImModelNetDataset:
    def _make_fixture(self, tmp_path):
        from PIL import Image

        cat, split = "chair", "test"
        (tmp_path / "model_set").mkdir()
        (tmp_path / "model_set" / f"{cat}_{split}.txt").write_text(
            "chair_0001\nchair_0002\n"
        )
        real = tmp_path / "modelnet_render_v1" / "data" / "real" / cat / split
        rend = (
            tmp_path / "modelnet_render_v1" / "data" / "rendered" / cat / split
        )
        real.mkdir(parents=True)
        rend.mkdir(parents=True)
        rs = np.random.RandomState(0)
        for obj in ("chair_0001", "chair_0002"):
            for im in range(2):
                stem = f"{obj}_{im:04d}"
                Image.fromarray(
                    rs.randint(0, 255, (48, 64, 3), dtype=np.uint8)
                ).save(real / f"{stem}-color.png")
                Image.fromarray(
                    (rs.rand(48, 64) * 2000).astype(np.uint16)
                ).save(real / f"{stem}-depth.png")
                lab = np.zeros((48, 64), np.uint8)
                lab[10:30, 20:50] = 1
                Image.fromarray(lab).save(real / f"{stem}-label.png")
                T = np.eye(4)
                T[:3, 3] = [0.01 * im, 0, 0.8]
                pose_txt = "\n".join(
                    " ".join(str(x) for x in T[r]) for r in range(3)
                )
                (real / f"{stem}-pose.txt").write_text(pose_txt)
                T2 = T.copy()
                T2[0, 3] += 0.05
                init_txt = "\n".join(
                    " ".join(str(x) for x in T2[r]) for r in range(3)
                )
                (rend / f"{stem}_0-pose.txt").write_text(init_txt)
        return tmp_path

    def test_load(self, tmp_path):
        root = self._make_fixture(tmp_path)
        ds = DeepImModelNetDataset(
            root, "chair", n_objects=2, n_images_per_object=2,
            load_depth=True,
        )
        assert len(ds) == 4
        obs = ds[1]
        assert obs.rgb.shape == (48, 64, 3)
        assert obs.depth.shape == (48, 64)
        assert obs.depth.max() <= 2.0  # mm -> m conversion
        np.testing.assert_allclose(obs.K, MODELNET_K)
        assert obs.obj_labels == ["chair_0001"]
        np.testing.assert_allclose(obs.TWO[0, 0, 3], 0.01)
        np.testing.assert_allclose(obs.TWO_init[0, 0, 3], 0.06)
        np.testing.assert_allclose(obs.bboxes[0], [20, 10, 49, 29])
        assert (obs.scene_id, obs.view_id) == (0, 1)

    def test_frames_index(self, tmp_path):
        root = self._make_fixture(tmp_path)
        ds = DeepImModelNetDataset(
            root, "chair", n_objects=2, n_images_per_object=2
        )
        assert ds.frames == [(0, 0), (0, 1), (1, 0), (1, 1)]
