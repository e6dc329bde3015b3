"""Cross-validation of the native BOP19 metrics against an independent
reference implementation.

bop_toolkit is not installable in this environment (the upstream repo
shells out to it as a subprocess, megapose/evaluation/bop.py:162-229), so
this file carries a SECOND, from-scratch numpy implementation of the
published BOP19 error functions and matching protocol (Hodaň et al.,
"BOP Challenge 2020", following bop_toolkit_lib/pose_error.py +
visibility.py + the eval_calc_scores matching semantics):

- per-pixel python/numpy loops, no shared code with
  `happypose_tpu/evaluation/bop19.py`'s vectorized device math;
- distance-image visibility with delta=15mm and the est∪(gt∩rendered)
  augmentation;
- step costs normalized by diameter over the visibility union;
- score-ordered greedy matching with per-object top-n truncation.

Agreement of the two implementations on randomized fixtures is the
offline equivalence claim for the headline AR numbers (VERDICT r1
missing #6 / next-round task #7).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from happypose_tpu.evaluation import bop19
from happypose_tpu.meshes.database import MeshDataBase
from happypose_tpu.meshes.io import make_box_mesh, make_uv_sphere
from happypose_tpu.ops.rasterizer import render_batch


# ----------------------------------------------------------------------
# Independent reference implementation (bop_toolkit semantics, pure loops)
# ----------------------------------------------------------------------

def ref_mssd(T_est, T_gt, syms, pts):
    best = np.inf
    for S in syms:
        gt = (T_gt @ S)[:3, :3] @ pts.T + (T_gt @ S)[:3, 3:4]
        est = T_est[:3, :3] @ pts.T + T_est[:3, 3:4]
        best = min(best, np.linalg.norm(est - gt, axis=0).max())
    return best


def ref_mspd(T_est, T_gt, syms, pts, K):
    def proj(T):
        c = T[:3, :3] @ pts.T + T[:3, 3:4]
        uv = K @ c
        return (uv[:2] / uv[2:3]).T

    p_est = proj(T_est)
    best = np.inf
    for S in syms:
        p_gt = proj(T_gt @ S)
        best = min(best, np.linalg.norm(p_est - p_gt, axis=1).max())
    return best


def _dist_im(depth, K):
    H, W = depth.shape
    out = np.zeros_like(depth)
    for i in range(H):
        for j in range(W):
            x = (j - K[0, 2]) / K[0, 0]
            y = (i - K[1, 2]) / K[1, 1]
            out[i, j] = depth[i, j] * np.sqrt(x * x + y * y + 1.0)
    return out


def ref_vsd(depth_est, depth_gt, depth_test, K, delta, taus, diameter):
    """bop_toolkit pose_error.vsd with normalized_by_diameter=True."""
    d_est = _dist_im(depth_est, K)
    d_gt = _dist_im(depth_gt, K)
    d_test = _dist_im(depth_test, K)

    def visib(d):
        m = (d > 0) & ((d - d_test <= delta) | (d_test == 0))
        return m

    visib_gt = visib(d_gt)
    visib_est = visib(d_est) | (visib_gt & (d_est > 0))
    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    union_n = union.sum()
    errs = []
    for tau in taus:
        if union_n == 0:
            errs.append(1.0)
            continue
        bad = 0
        for i, j in zip(*np.nonzero(union)):
            if inter[i, j]:
                if abs(d_gt[i, j] - d_est[i, j]) / diameter > tau:
                    bad += 1
            else:
                bad += 1
        errs.append(bad / union_n)
    return np.asarray(errs)


def ref_match_recall(errors, scores, gt_valid, ths):
    """Score-ordered greedy matching (eval_calc_matches semantics)."""
    gt_used = np.zeros(errors.shape[1], bool)
    matched = 0
    for ei in np.argsort(-scores):
        cands = [
            g for g in range(errors.shape[1])
            if not gt_used[g] and errors[ei, g] < ths[ei, g]
        ]
        if not cands:
            continue
        g = min(cands, key=lambda g: errors[ei, g])
        gt_used[g] = True
        if gt_valid[g]:
            matched += 1
    return matched, int(gt_valid.sum())


# ----------------------------------------------------------------------
# Fixtures
# ----------------------------------------------------------------------

def _fixture():
    z_syms = []
    for k in range(4):
        a = np.pi / 2 * k
        S = np.eye(4, dtype=np.float32)
        S[:2, :2] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
        z_syms.append(S)
    db = MeshDataBase(
        meshes={
            "box": make_box_mesh((0.03, 0.03, 0.05)),
            "sphere": make_uv_sphere(0.04, 10, 14),
        },
        symmetries={"box": np.stack(z_syms)},
    )
    return db


def _random_poses(rs, n, z=(0.4, 0.7)):
    from scipy.spatial.transform import Rotation

    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, :3, :3] = Rotation.random(n, random_state=rs).as_matrix()
    T[:, 0, 3] = rs.uniform(-0.05, 0.05, n)
    T[:, 1, 3] = rs.uniform(-0.05, 0.05, n)
    T[:, 2, 3] = rs.uniform(*z, n)
    return T


def test_mssd_mspd_match_reference_impl():
    db = _fixture()
    bm = db.batched(n_points=128)
    rs = np.random.RandomState(0)
    n = 12
    T_gt = _random_poses(rs, n)
    T_est = T_gt.copy()
    T_est[:, :3, 3] += rs.normal(0, 0.01, (n, 3))
    from scipy.spatial.transform import Rotation

    dR = Rotation.from_rotvec(rs.normal(0, 0.1, (n, 3))).as_matrix()
    T_est[:, :3, :3] = dR @ T_est[:, :3, :3]
    obj_ids = rs.randint(0, 2, n)
    K = np.asarray([[320.0, 0, 120], [0, 320.0, 90], [0, 0, 1]], np.float32)

    inst = bm.select(jnp.asarray(obj_ids, jnp.int32))
    out = bop19.mssd_mspd_batch(
        jnp.asarray(T_est), jnp.asarray(T_gt),
        jnp.broadcast_to(jnp.asarray(K), (n, 3, 3)),
        inst.points, inst.points_mask, inst.symmetries,
        inst.symmetries_mask,
    )
    pts_all = np.asarray(bm.points)
    pm_all = np.asarray(bm.points_mask)
    syms_all = np.asarray(bm.symmetries)
    sm_all = np.asarray(bm.symmetries_mask)
    for i in range(n):
        o = obj_ids[i]
        pts = pts_all[o][pm_all[o]]
        syms = syms_all[o][sm_all[o]]
        np.testing.assert_allclose(
            float(out["mssd"][i]), ref_mssd(T_est[i], T_gt[i], syms, pts),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(out["mspd"][i]), ref_mspd(T_est[i], T_gt[i], syms, pts, K),
            rtol=1e-4, atol=1e-4,
        )


def test_vsd_matches_reference_impl():
    db = _fixture()
    assets = db.render_assets()
    bm = db.batched(n_points=64)
    H, W = 48, 64
    K = np.asarray([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)
    rs = np.random.RandomState(1)
    n = 4
    T_gt = _random_poses(rs, n, z=(0.4, 0.5))
    T_est = T_gt.copy()
    T_est[:, :3, 3] += rs.normal(0, 0.008, (n, 3))
    obj_ids = np.asarray([0, 1, 0, 1])

    # observed depth: the GT render plus an occluder strip + sensor holes
    r_gt = render_batch(
        assets, jnp.asarray(obj_ids, jnp.int32), jnp.asarray(T_gt),
        jnp.broadcast_to(jnp.asarray(K), (n, 3, 3)), resolution=(H, W),
    )
    depth_test = np.asarray(r_gt.depth).copy()
    depth_test[:, :, : W // 4] = 0.35  # occluder in front
    depth_test[:, :: 6, :] = 0.0  # invalid rows

    diam = np.asarray(bm.diameters)[obj_ids]
    taus = np.asarray(bop19.VSD_TAUS[:4])
    e = bop19.vsd_batch(
        T_est, T_gt, obj_ids, np.broadcast_to(K, (n, 3, 3)), depth_test,
        assets, diam, taus_rel=tuple(taus),
    )
    r_est = render_batch(
        assets, jnp.asarray(obj_ids, jnp.int32), jnp.asarray(T_est),
        jnp.broadcast_to(jnp.asarray(K), (n, 3, 3)), resolution=(H, W),
    )
    for i in range(n):
        expect = ref_vsd(
            np.asarray(r_est.depth[i]), np.asarray(r_gt.depth[i]),
            depth_test[i], K, bop19.VSD_DELTA, taus, diam[i],
        )
        np.testing.assert_allclose(e[i], expect, atol=1e-5)


def test_matching_and_ntop_match_reference_impl():
    """Greedy matching incl. the per-object top-n truncation (BOP19
    n_top=-1): an extra low-quality estimate of an object with one GT
    instance must NOT add recall."""
    rs = np.random.RandomState(2)
    n_est, n_gt = 5, 3
    errors = rs.rand(n_est, n_gt).astype(np.float32)
    scores = rs.rand(n_est).astype(np.float32)
    gt_valid = np.asarray([True, True, False])
    ths = np.full((n_est, n_gt), 0.6, np.float32)
    ours = bop19._match_recall(errors, scores, gt_valid, ths)
    theirs = ref_match_recall(errors, scores, gt_valid, ths)
    assert ours == theirs

    # end-to-end evaluator n_top check: duplicate estimates of the same
    # object, second one perfect — truncation must keep only the best-
    # scored one, so AR reflects the (bad) kept estimate
    db = _fixture()
    bm = db.batched(n_points=64)
    ev = bop19.Bop19Evaluator(meshes=bm)
    T_gt = _random_poses(np.random.RandomState(3), 1)
    T_bad = T_gt.copy()
    T_bad[:, :3, 3] += 1.0  # hopeless
    K = np.asarray([[320.0, 0, 120], [0, 320.0, 90], [0, 0, 1]], np.float32)
    ev.add_image(
        TCO_pred=np.concatenate([T_bad, T_gt]),
        pred_obj_ids=np.asarray([1, 1]),
        pred_scores=np.asarray([0.9, 0.1]),  # bad one scores higher
        TCO_gt=T_gt,
        gt_obj_ids=np.asarray([1]),
        K=K,
    )
    s = ev.summary()
    assert s["AR_MSSD"] == 0.0 and s["AR_MSPD"] == 0.0

    ev2 = bop19.Bop19Evaluator(meshes=bm)
    ev2.add_image(
        TCO_pred=np.concatenate([T_bad, T_gt]),
        pred_obj_ids=np.asarray([1, 1]),
        pred_scores=np.asarray([0.1, 0.9]),  # good one scores higher
        TCO_gt=T_gt,
        gt_obj_ids=np.asarray([1]),
        K=K,
    )
    s2 = ev2.summary()
    assert s2["AR_MSSD"] == 1.0 and s2["AR_MSPD"] == 1.0


def test_ntop_budget_counts_only_visible_gt():
    """n_top budget counts GT instances with visib >= 0.1 only
    (code-review finding r3, matching bop_toolkit's targets inst_count)."""
    db = _fixture()
    bm = db.batched(n_points=64)
    K = np.asarray([[320.0, 0, 120], [0, 320.0, 90], [0, 0, 1]], np.float32)
    T_gt = _random_poses(np.random.RandomState(5), 2)
    T_bad = T_gt[0:1].copy()
    T_bad[:, :3, 3] += 1.0
    ev = bop19.Bop19Evaluator(meshes=bm)
    # 2 GTs of object 1: one valid, one 5%-visible. Budget must be 1, so
    # only the higher-scored (bad) estimate participates -> AR 0.
    ev.add_image(
        TCO_pred=np.concatenate([T_bad, T_gt[0:1]]),
        pred_obj_ids=np.asarray([1, 1]),
        pred_scores=np.asarray([0.9, 0.5]),
        TCO_gt=T_gt,
        gt_obj_ids=np.asarray([1, 1]),
        gt_visib_fract=np.asarray([1.0, 0.05]),
        K=K,
    )
    assert ev.summary()["AR_MSSD"] == 0.0
