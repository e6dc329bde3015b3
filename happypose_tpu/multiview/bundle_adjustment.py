"""Object-level bundle adjustment (Levenberg-Marquardt over 9D poses).

Parity target: /root/reference/happypose/pose_estimators/cosypose/cosypose/
multiview/bundle_adjustment.py (`MultiviewRefinement`: greedy TWC/TWO
initialization :140-198, symmetry-aligned reprojection residuals
`align_TCO_cand` :208-221, LM with autograd Jacobians :223-350 — flagged by
the reference itself as "could be much faster").

TPU design: the whole residual vector and its Jacobian are computed in one
jitted `jax.jacfwd` pass (forward-mode over the small [n_obj + n_view, 9]
parameter vector — exact, no per-residual autograd replay), normal equations
are solved on device. The first camera is gauge-fixed. Robustness follows
the reference: per-residual clipping at `residuals_threshold`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from happypose_tpu.lib3d.camera import project_points
from happypose_tpu.lib3d.transforms import pose9d_to_T, T_to_pose9d
from happypose_tpu.meshes.database import BatchedMeshes


class SamplerError(RuntimeError):
    pass


def initialize_TWO_TWC(
    n_views: int,
    n_objects: int,
    cand_view_idx: np.ndarray,  # [C] view index per candidate
    cand_obj_idx: np.ndarray,  # [C] object index per candidate
    cand_TCO: np.ndarray,  # [C, 4, 4]
    view_pairs: list,  # [(v1_idx, v2_idx)]
    TC1C2: np.ndarray,  # [n_pairs, 4, 4]
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy spanning initialization (reference :140-198): camera 0 of a
    random order is the world; others chain through known relative poses;
    objects initialize from the first view that sees them."""
    rng = np.random.RandomState(seed)
    TWC = np.full((n_views, 4, 4), np.nan)
    TWO = np.full((n_objects, 4, 4), np.nan)
    rel = {}
    for (v1, v2), T in zip(view_pairs, TC1C2):
        rel[(v1, v2)] = T
        rel[(v2, v1)] = np.linalg.inv(T)

    order = rng.permutation(n_views)
    TWC[order[0]] = np.eye(4)
    initialized = {order[0]}
    for _ in range(n_views):
        for v1 in order:
            if v1 in initialized:
                continue
            for v2 in order:
                if v2 in initialized and (v2, v1) in rel:
                    TWC[v1] = TWC[v2] @ rel[(v2, v1)]
                    initialized.add(v1)
                    break
    if len(initialized) < n_views:
        raise SamplerError("view graph is not connected")

    for o in range(n_objects):
        cands = np.where(cand_obj_idx == o)[0]
        if len(cands) == 0:
            TWO[o] = np.eye(4)
            continue
        c = cands[0]
        TWO[o] = TWC[cand_view_idx[c]] @ cand_TCO[c]
    return TWO, TWC


@dataclass(eq=False)
class MultiviewRefinement:
    """LM bundle adjustment of all object & camera poses of one scene.

    Args:
      cand_TCO: [C, 4, 4] single-view estimates.
      cand_view_idx / cand_obj_idx: [C] dense indices.
      K: [n_views, 3, 3].
      meshes: padded mesh db; points used for residuals are subsampled to
        `n_points`.
    """

    cand_TCO: np.ndarray
    cand_view_idx: np.ndarray
    cand_obj_idx: np.ndarray
    cand_obj_ids: np.ndarray  # [C] mesh-db ids (for symmetries/points)
    K: np.ndarray
    meshes: BatchedMeshes
    n_points: int = 8
    # "dense": one jacfwd over all params + dense normal-equation solve.
    # "schur": per-candidate Jacobian blocks + Schur-complement elimination
    # of the object blocks (BASELINE.json north star) — the reduced camera
    # system is (n_views*9)^2 regardless of object/candidate count, and all
    # block sums are segment ops (shardable over the candidate axis).
    solver: str = "dense"

    def __post_init__(self):
        self.n_views = int(self.K.shape[0])
        self.n_objects = int(np.max(self.cand_obj_idx)) + 1
        inst = self.meshes.select(jnp.asarray(self.cand_obj_ids, jnp.int32))
        # deterministic point subsample for residuals
        P = inst.points.shape[1]
        sel = np.linspace(0, P - 1, self.n_points).astype(np.int64)
        self.cand_points = jnp.asarray(inst.points[:, sel])  # [C, p, 3]
        self.cand_sym = inst.symmetries
        self.cand_sym_mask = inst.symmetries_mask
        self.K_j = jnp.asarray(self.K, jnp.float32)
        self.TCO_j = jnp.asarray(self.cand_TCO, jnp.float32)
        self.v_idx = jnp.asarray(self.cand_view_idx, jnp.int32)
        self.o_idx = jnp.asarray(self.cand_obj_idx, jnp.int32)

    # -------------------- residuals --------------------

    def _align_targets(self, TWO_9d, TCW_9d):
        """Symmetry-align each candidate to the current model (stop-grad):
        pick S* minimizing reprojected distance, target = TCO_cand @ S*."""
        TWO = pose9d_to_T(TWO_9d)
        TCW = pose9d_to_T(TCW_9d)
        TCO_model = jnp.einsum(
            "cij,cjk->cik", TCW[self.v_idx], TWO[self.o_idx]
        )
        Kc = self.K_j[self.v_idx]
        # reprojected symmetric distance (reference symmetric_distances.py:103)
        T_sym = jnp.einsum("cij,csjk->csik", self.TCO_j, self.cand_sym)
        pts = self.cand_points
        # uv of every symmetry variant: [C, S, p, 2]
        uv_s = jax.vmap(
            lambda Ts_c, p_c, K_c: jax.vmap(
                lambda T1: project_points(p_c[None], K_c[None], T1[None])[0]
            )(Ts_c)
        )(T_sym, pts, Kc)
        uv_model = project_points(pts, Kc, TCO_model)  # [C, p, 2]
        d = jnp.linalg.norm(uv_s - uv_model[:, None], axis=-1).mean(-1)
        d = jnp.where(self.cand_sym_mask, d, jnp.inf)
        best = jnp.argmin(d, axis=-1)
        T_target = jnp.take_along_axis(
            T_sym, best[:, None, None, None], axis=1
        )[:, 0]
        return jax.lax.stop_gradient(T_target)

    def _residuals(self, params, T_target):
        """Flat residual vector [C * p * 2] of reprojection errors."""
        TWO_9d = params[: self.n_objects * 9].reshape(self.n_objects, 9)
        TCW_9d = params[self.n_objects * 9 :].reshape(self.n_views, 9)
        TWO = pose9d_to_T(TWO_9d)
        TCW = pose9d_to_T(TCW_9d)
        TCO_model = jnp.einsum(
            "cij,cjk->cik", TCW[self.v_idx], TWO[self.o_idx]
        )
        Kc = self.K_j[self.v_idx]
        uv_model = project_points(self.cand_points, Kc, TCO_model)
        uv_target = project_points(self.cand_points, Kc, T_target)
        return (uv_target - uv_model).reshape(-1)

    # -------------------- LM --------------------

    @partial(jax.jit, static_argnames=("self",))
    def _lm_step(self, params, T_target, lambd, residuals_threshold):
        errors = self._residuals(params, T_target)
        J = jax.jacfwd(self._residuals)(params, T_target)  # [R, D]
        clipped = jnp.clip(errors, -residuals_threshold, residuals_threshold)
        loss = jnp.mean(jnp.minimum(errors**2, residuals_threshold**2))
        JtJ = J.T @ J
        # Jacobi scaling: solve S(J^TJ+λI)S y = S J^T e, h = S y — exact
        # in real arithmetic but keeps the f32 solve well-conditioned
        # (pixel-per-unit column norms differ by orders of magnitude)
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(JtJ), 1e-12))
        A = JtJ * s[:, None] * s[None, :] + lambd * jnp.diag(s**2)
        b = (J.T @ clipped) * s
        h = jnp.linalg.solve(A, b) * s
        # gauge fix: first camera does not move
        mask = jnp.ones_like(params)
        start = self.n_objects * 9
        mask = mask.at[start : start + 9].set(0.0)
        return params + h * mask, loss

    # -------------------- Schur-complement LM --------------------

    def _cand_residual(self, two9, tcw9, pts, K, T_target):
        """Residuals of ONE candidate as a function of its own two pose
        blocks only — the sparsity unit of the BA problem."""
        TWO = pose9d_to_T(two9[None])[0]
        TCW = pose9d_to_T(tcw9[None])[0]
        TCO = TCW @ TWO
        uv_model = project_points(pts[None], K[None], TCO[None])[0]
        uv_target = project_points(pts[None], K[None], T_target[None])[0]
        return (uv_target - uv_model).reshape(-1)  # [p*2]

    @partial(jax.jit, static_argnames=("self",))
    def _lm_step_schur(self, params, T_target, lambd, residuals_threshold):
        """Same update as `_lm_step` but via block elimination.

        J^T J = [[U, W], [W^T, V]] with U block-diagonal over objects and V
        over cameras; the object blocks are eliminated:
        (V - W^T U^-1 W) h_c = b_c - W^T U^-1 b_o, then back-substitution.
        The reference's dense `pinverse` on CPU (bundle_adjustment.py:272-279)
        scales with (9*(n_obj+n_views))^2; this scales with candidates only
        linearly and solves a (9*n_views)^2 system."""
        n_obj, n_views = self.n_objects, self.n_views
        two_all = params[: n_obj * 9].reshape(n_obj, 9)
        tcw_all = params[n_obj * 9 :].reshape(n_views, 9)
        two_c = two_all[self.o_idx]  # [C, 9]
        tcw_c = tcw_all[self.v_idx]
        Kc = self.K_j[self.v_idx]

        f = self._cand_residual
        r = jax.vmap(f)(two_c, tcw_c, self.cand_points, Kc, T_target)
        A = jax.vmap(jax.jacfwd(f, argnums=0))(
            two_c, tcw_c, self.cand_points, Kc, T_target
        )  # [C, m, 9]
        Bj = jax.vmap(jax.jacfwd(f, argnums=1))(
            two_c, tcw_c, self.cand_points, Kc, T_target
        )  # [C, m, 9]
        e = jnp.clip(r, -residuals_threshold, residuals_threshold)
        loss = jnp.mean(jnp.minimum(r**2, residuals_threshold**2))

        AtA = jnp.einsum("cmi,cmj->cij", A, A)
        BtB = jnp.einsum("cmi,cmj->cij", Bj, Bj)
        AtB = jnp.einsum("cmi,cmj->cij", A, Bj)
        Ate = jnp.einsum("cmi,cm->ci", A, e)
        Bte = jnp.einsum("cmi,cm->ci", Bj, e)

        U = jnp.zeros((n_obj, 9, 9)).at[self.o_idx].add(AtA)
        V = jnp.zeros((n_views, 9, 9)).at[self.v_idx].add(BtB)
        W = jnp.zeros((n_obj, n_views, 9, 9)).at[
            self.o_idx, self.v_idx
        ].add(AtB)
        b_o = jnp.zeros((n_obj, 9)).at[self.o_idx].add(Ate)
        b_v = jnp.zeros((n_views, 9)).at[self.v_idx].add(Bte)

        # Jacobi preconditioning: the 9d ortho6d blocks are singular along
        # the parameterization's scale directions, so eliminating U in f32
        # without scaling is unstable. Solving S(J^TJ+λI)S y = S b with
        # S = diag(J^TJ)^{-1/2} is exact-arithmetic-equivalent and stable.
        eps = 1e-12
        s_o = 1.0 / jnp.sqrt(
            jnp.maximum(jnp.diagonal(U, axis1=-2, axis2=-1), eps)
        )  # [n_obj, 9]
        s_v = 1.0 / jnp.sqrt(
            jnp.maximum(jnp.diagonal(V, axis1=-2, axis2=-1), eps)
        )
        U = U * s_o[:, :, None] * s_o[:, None, :]
        V = V * s_v[:, :, None] * s_v[:, None, :]
        W = W * s_o[:, None, :, None] * s_v[None, :, None, :]
        diag9 = jnp.eye(9)
        U = U + lambd * diag9 * (s_o**2)[:, None, :]
        V = V + lambd * diag9 * (s_v**2)[:, None, :]
        b_o = b_o * s_o
        b_v = b_v * s_v

        # truncated pseudo-inverse of the object blocks (the reference also
        # pinverse's its normal matrix, bundle_adjustment.py:272-279): the
        # ortho6d parameterization has non-axis-aligned null directions
        # that diagonal scaling cannot lift, and plainly inverting them
        # poisons the Schur complement. Eigenvalues below 1e-5 of the block
        # max are treated as null (their b components are ~0 too).
        w, Q = jnp.linalg.eigh(U)
        w_floor = jnp.maximum(w[..., -1:], 1e-12) * 1e-5
        w_inv = jnp.where(w > w_floor, 1.0 / jnp.maximum(w, 1e-12), 0.0)
        Uinv = jnp.einsum("oij,oj,okj->oik", Q, w_inv, Q)
        # reduced camera system
        S = -jnp.einsum("ovki,okl,owlj->vwij", W, Uinv, W)
        S = S.at[jnp.arange(n_views), jnp.arange(n_views)].add(V)
        S = S.transpose(0, 2, 1, 3).reshape(n_views * 9, n_views * 9)
        rhs = b_v - jnp.einsum("ovki,okl,ol->vi", W, Uinv, b_o)
        h_c = jnp.linalg.solve(S, rhs.reshape(-1)).reshape(n_views, 9)
        h_o = jnp.einsum(
            "okl,ol->ok", Uinv,
            b_o - jnp.einsum("ovij,vj->oi", W, h_c),
        )
        h_o = h_o * s_o  # undo the scaling
        h_c = h_c * s_v

        h = jnp.concatenate([h_o.reshape(-1), h_c.reshape(-1)])
        mask = jnp.ones_like(params)
        start = n_obj * 9
        mask = mask.at[start : start + 9].set(0.0)  # gauge fix camera 0
        return params + h * mask, loss

    @partial(jax.jit, static_argnames=("self",))
    def _loss(self, params, T_target, residuals_threshold):
        e = self._residuals(params, T_target)
        return jnp.mean(jnp.minimum(e**2, residuals_threshold**2))

    def solve(
        self,
        view_pairs: list,
        TC1C2: np.ndarray,
        n_iterations: int = 50,
        residuals_threshold: float = 25.0,
        lambd0: float = 1e-3,
        n_init: int = 1,
    ) -> Dict:
        """Run LM from `n_init` random greedy initializations, keep the best.

        Returns dict(TWO [n_obj, 4, 4], TWC [n_views, 4, 4], loss)."""
        best = None
        for s in range(n_init):
            TWO0, TWC0 = initialize_TWO_TWC(
                self.n_views, self.n_objects, self.cand_view_idx,
                self.cand_obj_idx, self.cand_TCO, view_pairs, TC1C2, seed=s,
            )
            TCW0 = jnp.asarray(np.linalg.inv(TWC0), jnp.float32)
            params = jnp.concatenate(
                [
                    T_to_pose9d(jnp.asarray(TWO0, jnp.float32)).reshape(-1),
                    T_to_pose9d(TCW0).reshape(-1),
                ]
            )
            T_target = self._align_targets(
                params[: self.n_objects * 9].reshape(self.n_objects, 9),
                params[self.n_objects * 9 :].reshape(self.n_views, 9),
            )
            lambd = lambd0
            loss = float(self._loss(params, T_target, residuals_threshold))
            step = (
                self._lm_step_schur if self.solver == "schur"
                else self._lm_step
            )
            for _ in range(n_iterations):
                new_params, _ = step(
                    params, T_target, lambd, residuals_threshold
                )
                new_loss = float(
                    self._loss(new_params, T_target, residuals_threshold)
                )
                if new_loss < loss:
                    params = new_params
                    loss = new_loss
                    lambd = max(lambd / 10.0, 1e-8)
                    # re-align symmetry targets as the model moves
                    T_target = self._align_targets(
                        params[: self.n_objects * 9].reshape(self.n_objects, 9),
                        params[self.n_objects * 9 :].reshape(self.n_views, 9),
                    )
                else:
                    lambd = min(lambd * 10.0, 1e6)
            if best is None or loss < best["loss"]:
                TWO = pose9d_to_T(
                    params[: self.n_objects * 9].reshape(self.n_objects, 9)
                )
                TCW = pose9d_to_T(
                    params[self.n_objects * 9 :].reshape(self.n_views, 9)
                )
                best = {
                    "TWO": np.asarray(TWO),
                    "TWC": np.asarray(
                        jnp.linalg.inv(TCW)
                    ),
                    "loss": loss,
                }
        return best
