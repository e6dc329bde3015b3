"""Hand-transcribed BOP19 golden cases (VERDICT r2 task #7).

`tests/test_bop19_crossval.py` cross-validates our VSD/MSSD/MSPD against an
independent per-pixel numpy implementation — but both implementations share
one author. The cases here are derived BY HAND, pixel by pixel, from the
published bop_toolkit semantics (bop_toolkit_lib/pose_error.py `vsd`,
`mssd`, `mspd`; bop_toolkit_lib/visibility.py `_estimate_visib_mask`,
visib_mode='bop19'), so the expected numbers do not depend on either
implementation:

  _estimate_visib_mask (bop19): visib = (d_model > 0) AND
      (d_model <= d_test + delta  OR  d_test == 0)
  estimate_visib_mask_est adds: visib_est |= (visib_gt AND d_est > 0)
  vsd: union = visib_gt | visib_est; inter = visib_gt & visib_est;
      e(tau) = (#{p in inter : |d_gt - d_est| > tau} + #union - #inter)
               / #union,   e = 1 if #union == 0
  mssd = min_sym max_pt || T_est x - T_gt S x ||
  mspd = min_sym max_pt || proj(T_est x) - proj(T_gt S x) ||
"""

import numpy as np
import jax.numpy as jnp

from happypose_tpu.evaluation.bop19 import _vsd_from_depths, mssd_mspd_batch

# near-orthographic K: dist_image = depth * sqrt(x^2+y^2+1) with
# x, y ~ 1e-7 -> the along-ray correction is < 1e-13, so the hand
# arithmetic below can be done directly on z-depths
K_ORTHO = np.asarray(
    [[1e7, 0.0, 2.0], [0.0, 1e7, 2.0], [0.0, 0.0, 1.0]], np.float32
)


def test_vsd_golden_hand_derived():
    """4x4 depth images, delta = 0.015, taus = (0.05, 0.10).

    Pixels (all others are 0/0/0 and leave the union):
      A (0,0): d_gt=0.5  d_est=0.5  d_test=0.5
          visib_gt: 0.5 <= 0.515 -> yes; visib_est yes; inter. |diff|=0.
      B (0,1): d_gt=0.5  d_est=0.56 d_test=0.5
          visib_gt yes. visib_est: 0.56 <= 0.515 NO, d_test != 0 ->
          base no, BUT visib_gt & d_est>0 -> yes. inter. |diff|=0.06.
      C (1,0): d_gt=0.5  d_est=0    d_test=0.5
          visib_gt yes, visib_est no (d_est=0) -> union-only (complement).
      D (1,1): d_gt=0    d_est=0.5  d_test=0.5
          visib_est yes (0.5<=0.515), visib_gt no -> complement.
      E (2,2): d_gt=0.7  d_est=0    d_test=0.5
          0.7 <= 0.515 no and d_test!=0 -> visib_gt NO (occluded);
          d_est=0 -> not in union at all.
      F (3,3): d_gt=0.5  d_est=0.5  d_test=0
          d_test==0 -> both visible; inter; |diff|=0.

    union = {A,B,C,D,F} (5), inter = {A,B,F} (3), complement = 2.
      tau=0.05: |0.06| > 0.05 at B -> bad = 1 + 2 = 3 -> e = 3/5 = 0.6
      tau=0.10: bad = 0 + 2 = 2 -> e = 2/5 = 0.4
    """
    d_gt = np.zeros((4, 4), np.float32)
    d_est = np.zeros((4, 4), np.float32)
    d_test = np.zeros((4, 4), np.float32)
    d_gt[0, 0], d_est[0, 0], d_test[0, 0] = 0.5, 0.5, 0.5  # A
    d_gt[0, 1], d_est[0, 1], d_test[0, 1] = 0.5, 0.56, 0.5  # B
    d_gt[1, 0], d_est[1, 0], d_test[1, 0] = 0.5, 0.0, 0.5  # C
    d_gt[1, 1], d_est[1, 1], d_test[1, 1] = 0.0, 0.5, 0.5  # D
    d_gt[2, 2], d_est[2, 2], d_test[2, 2] = 0.7, 0.0, 0.5  # E
    d_gt[3, 3], d_est[3, 3], d_test[3, 3] = 0.5, 0.5, 0.0  # F

    e = np.asarray(_vsd_from_depths(
        jnp.asarray(d_est[None]), jnp.asarray(d_gt[None]),
        jnp.asarray(d_test[None]), jnp.asarray(K_ORTHO[None]),
        jnp.asarray([[0.05, 0.10]], np.float32),
    ))[0]
    np.testing.assert_allclose(e, [0.6, 0.4], atol=1e-6)


def test_vsd_golden_empty_union_is_one():
    """Neither pose renders any visible pixel -> e = 1 for every tau
    (pose_error.py: 'e = 1.0' when visib_union is empty)."""
    zero = jnp.zeros((1, 4, 4), jnp.float32)
    # gt behind the measured surface everywhere: d_gt=0.7 vs d_test=0.5
    d_gt = jnp.full((1, 4, 4), 0.7, jnp.float32)
    d_test = jnp.full((1, 4, 4), 0.5, jnp.float32)
    e = np.asarray(_vsd_from_depths(
        zero, d_gt, d_test, jnp.asarray(K_ORTHO[None]),
        jnp.asarray([[0.05, 0.5]], np.float32),
    ))[0]
    np.testing.assert_allclose(e, [1.0, 1.0], atol=1e-6)


def test_mssd_mspd_golden_hand_derived():
    """3 points, 2 symmetries (identity + Rz(180deg)), pure translation
    error t_err = (0.03, 0, 0), K = [[500,0,320],[0,500,240]], z = 1.

    S = I:  every point moves exactly 0.03 m -> max = 0.03
    S = Rz(pi): gt points flip sign in x/y:
        x1=(0.1,0,0):  est (0.13,0,1) vs gt (-0.1,0,1)  -> 0.23
        x2=(0,0.2,0):  est (0.03,0.2,1) vs gt (0,-0.2,1) -> sqrt(0.03^2+0.4^2)
        x3=(0,0,0):    0.03
        max = sqrt(0.03^2 + 0.4^2) = 0.4011234
    mssd = min(0.03, 0.40112) = 0.03

    projections (f=500, z=1): pixel shift = 500 * metric shift
    S = I: all three points shift 15 px -> max 15
    S = Rz(pi): 115, sqrt(15^2+200^2)=200.5617, 15 -> max 200.5617
    mspd = min(15, 200.5617) = 15
    """
    pts = np.zeros((1, 4, 3), np.float32)
    pts[0, 0] = (0.1, 0.0, 0.0)
    pts[0, 1] = (0.0, 0.2, 0.0)
    pts[0, 2] = (0.0, 0.0, 0.0)
    pts[0, 3] = (9.9, 9.9, 9.9)  # padding — must be ignored via the mask
    mask = np.asarray([[True, True, True, False]])
    T_gt = np.eye(4, dtype=np.float32)
    T_gt[2, 3] = 1.0
    T_est = T_gt.copy()
    T_est[0, 3] += 0.03
    Rz = np.diag([-1.0, -1.0, 1.0, 1.0]).astype(np.float32)
    syms = np.stack([np.eye(4, dtype=np.float32), Rz])[None]
    sym_mask = np.asarray([[True, True]])
    K = np.asarray(
        [[500.0, 0, 320.0], [0, 500.0, 240.0], [0, 0, 1.0]], np.float32
    )
    out = mssd_mspd_batch(
        jnp.asarray(T_est[None]), jnp.asarray(T_gt[None]),
        jnp.asarray(K[None]), jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray(syms), jnp.asarray(sym_mask),
    )
    np.testing.assert_allclose(np.asarray(out["mssd"]), [0.03], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["mspd"]), [15.0], atol=1e-4)
    # and with the symmetry masked off, the flipped variant must win
    out2 = mssd_mspd_batch(
        jnp.asarray(T_est[None]), jnp.asarray(T_gt[None]),
        jnp.asarray(K[None]), jnp.asarray(pts), jnp.asarray(mask),
        jnp.asarray(syms[:, 1:2]), jnp.asarray([[True]]),
    )
    np.testing.assert_allclose(
        np.asarray(out2["mssd"]), [np.hypot(0.03, 0.4)], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out2["mspd"]), [np.hypot(15.0, 200.0)], atol=1e-3
    )
