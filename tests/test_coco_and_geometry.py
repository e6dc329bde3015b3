"""COCO export (RLE round-trip) + procedural viz meshes."""

import numpy as np

from happypose_tpu.evaluation.coco_export import (
    binary_mask_to_rle,
    detections_to_coco,
    load_coco_json,
    rle_to_binary_mask,
    save_coco_json,
)
from happypose_tpu.meshes.io import (
    make_axes_mesh,
    make_capsule_mesh,
    make_cylinder_mesh,
)
from happypose_tpu.ops.rasterizer import render_batch


class TestRLE:
    def test_roundtrip_random(self):
        rs = np.random.RandomState(0)
        for _ in range(5):
            m = rs.rand(13, 17) > 0.5
            np.testing.assert_array_equal(
                rle_to_binary_mask(binary_mask_to_rle(m)), m
            )

    def test_empty_and_full(self):
        for m in (np.zeros((4, 6), bool), np.ones((4, 6), bool)):
            rle = binary_mask_to_rle(m)
            np.testing.assert_array_equal(rle_to_binary_mask(rle), m)
        assert binary_mask_to_rle(np.ones((4, 6), bool))["counts"][0] == 0

    def test_column_major_semantics(self):
        m = np.zeros((2, 3), bool)
        m[0, 0] = True  # first element in column-major order
        assert binary_mask_to_rle(m)["counts"][0] == 0

    def test_coco_records(self, tmp_path):
        recs = detections_to_coco(
            boxes_xyxy=np.asarray([[10.0, 20.0, 30.0, 60.0]]),
            scores=np.asarray([0.75]),
            category_ids=np.asarray([3]),
            scene_ids=np.asarray([2]),
            view_ids=np.asarray([7]),
            masks=np.ones((1, 8, 8), bool),
        )
        assert recs[0]["bbox"] == [10.0, 20.0, 20.0, 40.0]
        assert recs[0]["category_id"] == 3
        p = tmp_path / "dets.json"
        save_coco_json(p, recs)
        back = load_coco_json(p)
        assert back[0]["score"] == 0.75
        np.testing.assert_array_equal(
            rle_to_binary_mask(back[0]["segmentation"]), np.ones((8, 8), bool)
        )


class TestProceduralMeshes:
    def _renders(self, mesh):
        import jax.numpy as jnp

        from happypose_tpu.meshes.database import MeshDataBase

        db = MeshDataBase(meshes={"m": mesh})
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [0, 0, 0.4]
        out = render_batch(
            db.render_assets(), jnp.asarray([0], jnp.int32),
            jnp.asarray(T[None]),
            jnp.asarray([[[200.0, 0, 40], [0, 200.0, 30], [0, 0, 1]]]),
            resolution=(60, 80),
        )
        return np.asarray(out.mask[0])

    def test_cylinder_renders(self):
        m = make_cylinder_mesh(0.03, 0.1)
        assert len(m.vertices) and len(m.faces)
        assert self._renders(m).sum() > 100

    def test_capsule_renders(self):
        m = make_capsule_mesh(0.03, 0.08)
        assert self._renders(m).sum() > 100
        # capsule is longer than its cylinder by the two end caps
        z = m.vertices[:, 2]
        assert z.min() < -0.02 and z.max() > 0.1

    def test_axes_colors(self):
        m = make_axes_mesh(0.1)
        # three distinct colors present
        assert len(np.unique(m.vertex_colors.round(2), axis=0)) >= 3
        assert self._renders(m).sum() > 50
