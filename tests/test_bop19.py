"""BOP19 error functions (VSD/MSSD/MSPD) — oracle + protocol tests.

The reference gets these numbers from the external bop_toolkit subprocess
(megapose/evaluation/bop.py); here they are native, so we test against
hand-written numpy oracles and protocol edge cases."""

import numpy as np
import jax.numpy as jnp

from happypose_tpu.evaluation.bop19 import (
    Bop19Evaluator,
    CORRECTNESS_THS,
    MSPD_THS,
    VSD_TAUS,
    mssd_mspd_batch,
    vsd_batch,
)
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.ops.rasterizer import render_batch


def _rotz(deg):
    a = np.deg2rad(deg)
    T = np.eye(4, dtype=np.float32)
    T[0, 0] = T[1, 1] = np.cos(a)
    T[0, 1] = -np.sin(a)
    T[1, 0] = np.sin(a)
    return T


def _pose(t, R4=None):
    T = np.eye(4, dtype=np.float32) if R4 is None else R4.copy()
    T[:3, 3] = t
    return T


def _db():
    sym = np.stack([np.eye(4, dtype=np.float32), _rotz(180)])
    return MeshDataBase(
        meshes={
            "box": make_box_mesh((0.04, 0.03, 0.05)),
            "sphere": make_uv_sphere(radius=0.05, n_lat=12, n_lon=16),
        },
        symmetries={"box": sym},
    )


K = np.asarray(
    [[120.0, 0, 40.0], [0, 120.0, 30.0], [0, 0, 1.0]], np.float32
)
RES = (60, 80)


class TestMSSDMSPD:
    def _errors(self, TCO_pred, TCO_gt, label="box"):
        db = _db()
        bm = db.batched(n_points=256)
        ids = jnp.asarray([db.id_of(label)], jnp.int32)
        inst = bm.select(ids)
        out = mssd_mspd_batch(
            jnp.asarray(TCO_pred[None]),
            jnp.asarray(TCO_gt[None]),
            jnp.asarray(K[None]),
            inst.points,
            inst.points_mask,
            inst.symmetries,
            inst.symmetries_mask,
        )
        return float(out["mssd"][0]), float(out["mspd"][0])

    def test_identical_pose_zero(self):
        T = _pose([0.01, -0.02, 0.5])
        mssd, mspd = self._errors(T, T)
        assert mssd < 1e-6 and mspd < 1e-4

    def test_symmetry_aware(self):
        Tg = _pose([0, 0, 0.5])
        Tp = Tg @ _rotz(180)  # exactly the declared discrete symmetry
        mssd, mspd = self._errors(Tp, Tg)
        assert mssd < 1e-5 and mspd < 1e-3
        # a 90-degree rotation is NOT a symmetry of the box
        mssd90, _ = self._errors(Tg @ _rotz(90), Tg)
        assert mssd90 > 0.01

    def test_translation_oracle(self):
        # pure translation: mssd == |dt| exactly, for any point set
        Tg = _pose([0, 0, 0.5])
        Tp = _pose([0.03, 0, 0.5])
        mssd, _ = self._errors(Tp, Tg, label="sphere")
        np.testing.assert_allclose(mssd, 0.03, rtol=1e-5)

    def test_mspd_oracle_numpy(self):
        rs = np.random.RandomState(0)
        db = _db()
        bm = db.batched(n_points=64)
        ids = jnp.asarray([db.id_of("box")], jnp.int32)
        inst = bm.select(ids)
        pts = np.asarray(inst.points[0])[np.asarray(inst.points_mask[0])]
        Tg = _pose([0.01, 0.0, 0.6])
        dR = _rotz(7)
        Tp = _pose([0.02, -0.01, 0.55], Tg @ dR)

        def proj(T):
            c = pts @ T[:3, :3].T + T[:3, 3]
            uv = c @ K.T
            return uv[:, :2] / uv[:, 2:3]

        sym = np.stack([np.eye(4, dtype=np.float32), _rotz(180)])
        want = min(
            np.max(np.linalg.norm(proj(Tp) - proj(Tg @ S), axis=-1))
            for S in sym
        )
        _, mspd = self._errors(Tp, Tg)
        np.testing.assert_allclose(mspd, want, rtol=1e-4)


class TestVSD:
    def _setup(self):
        db = _db()
        assets = db.render_assets()
        bm = db.batched(n_points=128)
        oid = db.id_of("sphere")
        return db, assets, bm, oid

    def _gt_depth(self, assets, oid, T):
        r = render_batch(
            assets,
            jnp.asarray([oid], jnp.int32),
            jnp.asarray(T[None], jnp.float32),
            jnp.asarray(K[None]),
            resolution=RES,
        )
        return np.asarray(r.depth[0])

    def test_perfect_pose_zero_error(self):
        db, assets, bm, oid = self._setup()
        T = _pose([0, 0, 0.4])
        depth = self._gt_depth(assets, oid, T)
        assert (depth > 0).sum() > 50  # object actually visible
        e = vsd_batch(
            T[None], T[None], np.asarray([oid]), K[None], depth[None],
            assets, np.asarray(bm.diameters)[[oid]], resolution=RES,
        )
        assert e.shape == (1, len(VSD_TAUS))
        np.testing.assert_allclose(e, 0.0, atol=1e-6)

    def test_disjoint_pose_error_one(self):
        db, assets, bm, oid = self._setup()
        Tg = _pose([-0.1, 0, 0.4])
        Tp = _pose([0.12, 0, 0.4])  # renders in a disjoint image region
        depth = self._gt_depth(assets, oid, Tg)
        e = vsd_batch(
            Tp[None], Tg[None], np.asarray([oid]), K[None], depth[None],
            assets, np.asarray(bm.diameters)[[oid]], resolution=RES,
        )
        np.testing.assert_allclose(e, 1.0, atol=1e-6)

    def test_occluded_gt_union_empty(self):
        # an occluder covering the whole image in front of the object makes
        # both visibility masks empty -> error is defined as 1 (bop19)
        db, assets, bm, oid = self._setup()
        T = _pose([0, 0, 0.4])
        depth = np.full(RES, 0.1, np.float32)
        e = vsd_batch(
            T[None], T[None], np.asarray([oid]), K[None], depth[None],
            assets, np.asarray(bm.diameters)[[oid]], resolution=RES,
        )
        np.testing.assert_allclose(e, 1.0, atol=1e-6)

    def test_no_test_depth_counts_visible(self):
        # bop19 visib mode: pixels with invalid (0) test depth are visible
        db, assets, bm, oid = self._setup()
        T = _pose([0, 0, 0.4])
        depth = np.zeros(RES, np.float32)
        e = vsd_batch(
            T[None], T[None], np.asarray([oid]), K[None], depth[None],
            assets, np.asarray(bm.diameters)[[oid]], resolution=RES,
        )
        np.testing.assert_allclose(e, 0.0, atol=1e-6)

    def test_small_offset_monotone_in_tau(self):
        db, assets, bm, oid = self._setup()
        Tg = _pose([0, 0, 0.4])
        Tp = _pose([0, 0, 0.42])  # 2cm depth offset
        depth = self._gt_depth(assets, oid, Tg)
        e = vsd_batch(
            Tp[None], Tg[None], np.asarray([oid]), K[None], depth[None],
            assets, np.asarray(bm.diameters)[[oid]], resolution=RES,
        )[0]
        assert np.all(np.diff(e) <= 1e-9)  # larger tau -> smaller error
        assert e[0] > 0.5  # 2cm >> 5% of 10cm diameter
        assert e[-1] < 0.9


class TestEvaluatorProtocol:
    def _eval(self, **kw):
        db = _db()
        ev = Bop19Evaluator(
            meshes=db.batched(n_points=128),
            assets=db.render_assets(),
            vsd_resolution=RES,
        )
        return db, ev

    def test_perfect_predictions_ar_one(self):
        db, ev = self._eval()
        oid = db.id_of("sphere")
        T = _pose([0, 0, 0.4])
        r = render_batch(
            db.render_assets(), jnp.asarray([oid], jnp.int32),
            jnp.asarray(T[None], jnp.float32), jnp.asarray(K[None]),
            resolution=RES,
        )
        depth = np.asarray(r.depth[0])
        ev.add_image(
            TCO_pred=T[None], pred_obj_ids=np.asarray([oid]),
            pred_scores=np.asarray([0.9]),
            TCO_gt=T[None], gt_obj_ids=np.asarray([oid]),
            K=K, depth_test=depth, im_width=RES[1],
        )
        s = ev.summary()
        assert s["AR_MSSD"] == 1.0
        assert s["AR_MSPD"] == 1.0
        assert s["AR_VSD"] == 1.0
        assert s["bop19_AR"] == 1.0

    def test_wrong_pose_ar_zero(self):
        db, ev = self._eval()
        oid = db.id_of("box")
        Tg = _pose([0, 0, 0.4])
        Tp = _pose([0.3, 0.2, 1.5], _rotz(90))
        ev.add_image(
            TCO_pred=Tp[None], pred_obj_ids=np.asarray([oid]),
            pred_scores=np.asarray([0.9]),
            TCO_gt=Tg[None], gt_obj_ids=np.asarray([oid]),
            K=K, im_width=RES[1],
        )
        s = ev.summary()
        assert s["AR_MSSD"] == 0.0
        assert "AR_VSD" not in s  # RGB-only: no depth given
        assert s["bop19_AR"] == 0.0

    def test_low_visib_gt_excluded(self):
        db, ev = self._eval()
        oid = db.id_of("box")
        Tg = _pose([0, 0, 0.4])
        ev.add_image(
            TCO_pred=np.zeros((0, 4, 4)), pred_obj_ids=np.zeros(0, int),
            pred_scores=np.zeros(0),
            TCO_gt=Tg[None], gt_obj_ids=np.asarray([oid]),
            K=K, gt_visib_fract=np.asarray([0.05]), im_width=RES[1],
        )
        s = ev.summary()
        # the only GT is invalid -> denominator 0 -> recall 0/0 counted as 0
        assert s["AR_MSSD"] == 0.0

    def test_missed_instance_halves_recall(self):
        db, ev = self._eval()
        oid = db.id_of("box")
        T1 = _pose([-0.05, 0, 0.4])
        T2 = _pose([0.05, 0, 0.4])
        ev.add_image(
            TCO_pred=T1[None], pred_obj_ids=np.asarray([oid]),
            pred_scores=np.asarray([0.9]),
            TCO_gt=np.stack([T1, T2]),
            gt_obj_ids=np.asarray([oid, oid]),
            K=K, im_width=RES[1],
        )
        s = ev.summary()
        assert abs(s["AR_MSSD"] - 0.5) < 1e-9
        assert abs(s["AR_MSPD"] - 0.5) < 1e-9

    def test_score_order_matching_with_ntop_truncation(self):
        # BOP19 n_top = -1 (bop_toolkit eval_calc_errors): per object only
        # the top-|GT| scored estimates participate. One GT instance ->
        # only the higher-scored estimate survives; if that one is wrong,
        # the image scores 0 even though a correct lower-scored estimate
        # existed. (Cross-validated in tests/test_bop19_crossval.py.)
        db, ev = self._eval()
        oid = db.id_of("box")
        Tg = _pose([0, 0, 0.4])
        Tbad = _pose([0.5, 0.5, 2.0])
        ev.add_image(
            TCO_pred=np.stack([Tbad, Tg]),
            pred_obj_ids=np.asarray([oid, oid]),
            pred_scores=np.asarray([0.99, 0.5]),
            TCO_gt=Tg[None], gt_obj_ids=np.asarray([oid]),
            K=K, im_width=RES[1],
        )
        s = ev.summary()
        assert s["AR_MSSD"] == 0.0

        # good estimate scored higher -> survives truncation and matches
        db2, ev2 = self._eval()
        ev2.add_image(
            TCO_pred=np.stack([Tbad, Tg]),
            pred_obj_ids=np.asarray([oid, oid]),
            pred_scores=np.asarray([0.5, 0.99]),
            TCO_gt=Tg[None], gt_obj_ids=np.asarray([oid]),
            K=K, im_width=RES[1],
        )
        assert ev2.summary()["AR_MSSD"] == 1.0

    def test_settings_constants(self):
        assert len(VSD_TAUS) == 10
        assert len(CORRECTNESS_THS) == 10
        assert len(MSPD_THS) == 10
