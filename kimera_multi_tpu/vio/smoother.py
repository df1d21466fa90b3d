"""Fixed-lag visual-inertial smoother: windowed batched Gauss-Newton.

Role of Kimera-VIO's backend (`VioBackend::spinOnce` ->
addImuFactor / addBetweenFactor / addLandmarksToGraph / Optimize with GTSAM
iSAM2 + smart stereo factors, images/kimera-multi.drawio:1630-1754;
25-state horizon, params/D455/BackendParams.yaml:70).

TPU-native design (SURVEY.md section 7.4 "iSAM2 equivalence without
iSAM2"): instead of incremental Bayes-tree relinearization, the whole
sliding window re-solves each keyframe with matrix-free Gauss-Newton —
all factor residuals are batched array ops, J/J^T via jvp/vjp, CG inner
solves. Landmarks are handled structurelessly ("smart factor" semantics):
each landmark is re-triangulated from the current window poses per
iteration (variable projection), so the state stays (pose, vel, bias) per
keyframe and no Schur complement is materialized.

Marginalization is approximated by anchoring the oldest window state with
a prior at its running estimate — the documented deviation from iSAM2's
exact marginals; acceptance is by trajectory accuracy (SURVEY.md 7.4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..kernels.linalg import cholesky_unrolled
from . import imu as imu_mod


class VioState(NamedTuple):
    """Sliding window of W keyframe states."""

    R: jnp.ndarray  # (W, 3, 3)
    t: jnp.ndarray  # (W, 3)
    v: jnp.ndarray  # (W, 3)
    bg: jnp.ndarray  # (W, 3) gyro bias
    ba: jnp.ndarray  # (W, 3) accel bias


class VioWindow(NamedTuple):
    """All measurements binding the window (fixed shapes, masked)."""

    # IMU preintegration between consecutive states k -> k+1
    pre: imu_mod.Preintegrated  # batched over (W-1,)
    imu_valid: jnp.ndarray  # (W-1,)
    # landmark observations: L landmarks x W frames, unit bearings
    bearings: jnp.ndarray  # (L, W, 3)
    obs_valid: jnp.ndarray  # (L, W)
    # external odometry between consecutive states (optional)
    odo_R: jnp.ndarray  # (W-1, 3, 3)
    odo_t: jnp.ndarray  # (W-1, 3)
    odo_valid: jnp.ndarray  # (W-1,)
    # zero-velocity / no-motion flags (LOW_DISPARITY handling,
    # drawio:1657-1674)
    zero_vel: jnp.ndarray  # (W,) bool
    # anchor (marginalization prior) values for state 0
    anchor: VioState  # leaves with leading dim 1
    # stereo range of each observation (None = mono window): constrains
    # scale like the reference's smart STEREO factors (drawio:1651)
    depths: jnp.ndarray | None = None  # (L, W) range along the bearing
    depth_valid: jnp.ndarray | None = None  # (L, W)
    # per-observation range sigma (stereo depth noise grows ~ Z^2/(fx b);
    # a scalar sigma over-trusts far points) — falls back to
    # cfg.depth_sigma when None
    depth_sigmas: jnp.ndarray | None = None  # (L, W)


class VioConfig(NamedTuple):
    imu_weight: float = 1.0  # multiplies the whitened IMU residual
    proj_sigma: float = 1e-2  # bearing residual sigma (rad-ish)
    odo_rot_sigma: float = 1e-2
    odo_trans_sigma: float = 5e-2
    bias_rw_sigma: float = 1e-3
    zero_vel_sigma: float = 1e-2
    anchor_pose_sigma: float = 1e-3
    # roll/pitch are OBSERVABLE (gravity), not gauge freedoms: anchoring
    # them tight would lock in any attitude-bootstrap error (alignment
    # under initial acceleration is biased); only position + yaw are
    # gauge and get the tight sigma
    anchor_rp_sigma: float = 0.1
    anchor_vel_sigma: float = 1.0  # loose: velocity is not a gauge freedom
    anchor_bias_sigma: float = 1e-2
    depth_sigma: float = 0.15  # stereo range residual sigma (m)
    step_trials: int = 6  # damped-step ladder per GN iteration
    gn_iters: int = 5
    cg_iters: int = 30
    damping: float = 1e-6


def triangulate(bearings: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                valid: jnp.ndarray,
                depths: jnp.ndarray | None = None,
                depth_w: jnp.ndarray | None = None):
    """Linear midpoint triangulation of one landmark from world-frame rays,
    optionally fused with stereo range pseudo-observations.

    bearings: (W, 3) camera-frame unit bearings; R, t: (W, 3, 3/3) camera
    poses (world <- cam); valid: (W,). Solves
    sum_k (I - d_k d_k^T) (X - t_k) + sum_k w_k (X - (t_k + dep_k d_k)) = 0
    with d_k = R_k b_k. The depth terms bound the along-ray direction,
    which pure multi-view triangulation leaves unconstrained for
    low-parallax landmarks (points near the epipole under forward motion
    otherwise explode to spurious far ranges).

    Returns (X (3,), ok) — ok False with < 2 valid rays or ill-conditioned
    normal matrix.
    """
    d = jnp.einsum("kij,kj->ki", R, bearings)  # world rays
    w = valid.astype(bearings.dtype)
    P = (jnp.eye(3)[None] - d[:, :, None] * d[:, None, :]) * w[:, None, None]
    A = jnp.sum(P, axis=0)
    b = jnp.einsum("kij,kj->i", P, t)
    if depths is not None:
        dw = (depth_w * w) if depth_w is not None else w
        A = A + jnp.sum(dw) * jnp.eye(3)
        b = b + jnp.einsum("k,ki->i", dw, t + depths[:, None] * d)
    # 3x3 solve via analytic inverse (adjugate)
    detA = jnp.linalg.det(A)
    ok = (jnp.sum(valid) >= 2) & (jnp.abs(detA) > 1e-8)
    A_safe = jnp.where(ok, A, jnp.eye(3))
    X = jnp.linalg.solve(A_safe, jnp.where(ok, b, jnp.zeros(3)))
    return X, ok


def residuals(state: VioState, win: VioWindow, cfg: VioConfig) -> jnp.ndarray:
    """Stacked whitened residual vector of the whole window."""
    W = state.R.shape[0]
    parts = []

    # ---- IMU factors -------------------------------------------------
    def imu_res(k):
        pre_k = jax.tree_util.tree_map(lambda x: x[k], win.pre)
        r = imu_mod.imu_residual(
            pre_k, state.R[k], state.t[k], state.v[k], state.bg[k],
            state.ba[k], state.R[k + 1], state.t[k + 1], state.v[k + 1])
        # whiten with the preintegration covariance (unrolled 9x9 chol)
        L = cholesky_unrolled(pre_k.cov + 1e-10 * jnp.eye(9))
        r_w = _forward_solve(L, r)
        return jnp.where(win.imu_valid[k], r_w * cfg.imu_weight, 0.0)

    parts.append(jax.vmap(imu_res)(jnp.arange(W - 1)).reshape(-1))

    # ---- bias random walk -------------------------------------------
    dbg = (state.bg[1:] - state.bg[:-1]) / cfg.bias_rw_sigma
    dba = (state.ba[1:] - state.ba[:-1]) / cfg.bias_rw_sigma
    mask = win.imu_valid[:, None]
    parts.append((dbg * mask).reshape(-1))
    parts.append((dba * mask).reshape(-1))

    # ---- structureless landmark factors ------------------------------
    have_depth = win.depths is not None

    def lm_res(bear, ovalid, dep, dvalid, dsig):
        # depth pseudo-observation weight: ratio of the bearing factor's
        # positional noise (dep * proj_sigma) to the range noise
        dw = jnp.where(dvalid, (dep * cfg.proj_sigma / dsig) ** 2, 0.0)
        X, ok = triangulate(bear, state.R, state.t, ovalid,
                            depths=dep, depth_w=dw)
        # residual: angular deviation between observed ray and predicted
        pred = jnp.einsum("kji,kj->ki", state.R,
                          X[None] - state.t)  # cam-frame vector
        # eps inside sqrt: masked-out slots have pred = 0 and a bare norm
        # would send NaN through the VJP despite the jnp.where mask below
        norm = jnp.sqrt(jnp.sum(pred * pred, axis=-1, keepdims=True) + 1e-18)
        pred_n = pred / norm
        r = jnp.cross(pred_n, bear) / cfg.proj_sigma  # (W, 3)
        m = (ovalid & ok)[:, None]
        r_bear = jnp.where(m, r, 0.0)
        # stereo range residual (smart STEREO factor role): predicted
        # range along the ray vs the measured stereo depth
        r_dep = (norm[:, 0] - dep) / dsig
        r_dep = jnp.where(dvalid & ovalid & ok, r_dep, 0.0)
        return r_bear, r_dep

    dep = win.depths if have_depth else jnp.zeros_like(win.obs_valid,
                                                       jnp.float32)
    dva = win.depth_valid if have_depth else jnp.zeros_like(win.obs_valid)
    dsig = (win.depth_sigmas if win.depth_sigmas is not None
            else jnp.full_like(dep, cfg.depth_sigma))
    r_bear, r_dep = jax.vmap(lm_res)(win.bearings, win.obs_valid, dep, dva,
                                     dsig)
    parts.append(r_bear.reshape(-1))
    if have_depth:
        parts.append(r_dep.reshape(-1))

    # ---- external odometry between factors ---------------------------
    Rrel = jnp.swapaxes(state.R[:-1], -1, -2) @ state.R[1:]
    trel = jnp.einsum("kji,kj->ki", state.R[:-1], state.t[1:] - state.t[:-1])
    r_rot = lie.so3_log(jnp.swapaxes(win.odo_R, -1, -2) @ Rrel) / cfg.odo_rot_sigma
    r_tr = (trel - win.odo_t) / cfg.odo_trans_sigma
    m = win.odo_valid[:, None]
    parts.append((r_rot * m).reshape(-1))
    parts.append((r_tr * m).reshape(-1))

    # ---- zero-velocity priors ---------------------------------------
    parts.append(
        (state.v * win.zero_vel[:, None] / cfg.zero_vel_sigma).reshape(-1))

    # ---- anchor (marginalization surrogate) on state 0 ---------------
    # world-frame (left) rotation error, split: yaw (world z = gravity
    # axis) is gauge -> tight; roll/pitch observable -> loose
    a = win.anchor
    e_w = lie.so3_log(state.R[0] @ a.R[0].T)
    parts.append(e_w[2:] / cfg.anchor_pose_sigma)
    parts.append(e_w[:2] / cfg.anchor_rp_sigma)
    parts.append((state.t[0] - a.t[0]) / cfg.anchor_pose_sigma)
    parts.append((state.v[0] - a.v[0]) / cfg.anchor_vel_sigma)
    parts.append((state.bg[0] - a.bg[0]) / cfg.anchor_bias_sigma)
    parts.append((state.ba[0] - a.ba[0]) / cfg.anchor_bias_sigma)
    return jnp.concatenate(parts)


def retract(state: VioState, delta: jnp.ndarray) -> VioState:
    """delta: (W, 15) = [dw, dt, dv, dbg, dba]."""
    return VioState(
        R=lie.so3_exp(delta[:, 0:3]) @ state.R,
        t=state.t + delta[:, 3:6],
        v=state.v + delta[:, 6:9],
        bg=state.bg + delta[:, 9:12],
        ba=state.ba + delta[:, 12:15],
    )


def solve_window(state0: VioState, win: VioWindow,
                 cfg: VioConfig = VioConfig()) -> VioState:
    """Matrix-free Gauss-Newton over the window (jit-able)."""
    W = state0.R.shape[0]

    def full_res(delta, st):
        return residuals(retract(st, delta), win, cfg)

    def gn_step(_, st):
        d0 = jnp.zeros((W, 15))
        r0, jvp_lin = jax.linearize(lambda d: full_res(d, st), d0)
        _, vjp_fn = jax.vjp(lambda d: full_res(d, st), d0)

        def matvec(v):
            return vjp_fn(jvp_lin(v))[0] + cfg.damping * v

        g = vjp_fn(r0)[0]

        def cg_body(_, s):
            x, r, p, rs = s
            Ap = matvec(p)
            alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-20)
            x = x + alpha * p
            r = r - alpha * Ap
            rs2 = jnp.sum(r * r)
            p = r + (rs2 / jnp.maximum(rs, 1e-20)) * p
            return x, r, p, rs2

        delta, *_ = jax.lax.fori_loop(
            0, cfg.cg_iters, cg_body,
            (jnp.zeros_like(g), -g, -g, jnp.sum(g * g)))
        # damped accept: GN full steps can diverge when the linearization
        # is poor (bad bootstrap, inconsistent factors) — evaluate a
        # fixed backtracking ladder on the TRUE cost and keep the best
        # improving point (monotone by construction, NaN-proof: non-finite
        # trial costs lose the argmin)
        delta = jnp.nan_to_num(delta)
        steps = 1.0 * (0.5 ** jnp.arange(cfg.step_trials))

        def trial_cost(s):
            r = full_res(s * delta, st)
            c = jnp.sum(r * r)
            return jnp.where(jnp.isfinite(c), c, jnp.inf)

        costs = jax.vmap(trial_cost)(steps)
        c0 = jnp.sum(r0 * r0)
        best = jnp.argmin(costs)
        improved = costs[best] < c0
        st_new = retract(st, steps[best] * delta)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(improved, a, b), st_new, st)

    return jax.lax.fori_loop(0, cfg.gn_iters, gn_step, state0)


def _forward_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Unrolled forward substitution (L lower-triangular, small static n)."""
    n = L.shape[-1]
    x = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)
