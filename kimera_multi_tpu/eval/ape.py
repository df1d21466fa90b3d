"""Absolute pose error evaluation — the evo-equivalent acceptance metric.

Replicates the reference's live evaluation pipeline
(`examples/evo_real_time.py:259-281`): associate estimate to ground truth by
timestamp (max_diff 0.01 s), SE(3)-align (Umeyama, no scale), then APE
translation RMSE and full-pose RMSE. These numbers are the acceptance
statistic of the whole framework (SURVEY.md section 6).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import lie


class ApeResult(NamedTuple):
    rmse_trans: float
    mean_trans: float
    max_trans: float
    rmse_full: float  # full-SE(3) APE (evo "full" metric: ||T_err - I||_F)
    n_matched: int


def align_left(R_ref0, t_ref0, R_est0, t_est0, R_est, t_est):
    """Left-multiplicative gauge alignment: find T_a = T_ref0 * T_est0^{-1}
    and return T_a * T_est_i. Exact when estimate and reference differ by a
    global rigid transform (e.g. anchored-at-identity solutions)."""
    Ri, ti = lie.se3_inverse(R_est0, t_est0)
    Ra, ta = lie.se3_compose(R_ref0, t_ref0, Ri, ti)
    n = R_est.shape[0]
    return lie.se3_compose(
        jnp.broadcast_to(Ra, (n, 3, 3)), jnp.broadcast_to(ta, (n, 3)),
        R_est, t_est,
    )


def umeyama_alignment(t_est: jnp.ndarray, t_ref: jnp.ndarray,
                      with_scale: bool = False):
    """SE(3) (optionally Sim(3)) alignment of point sets, evo-style
    (evo_real_time.py:264-266 `traj_est.align(traj_ref)`).

    Returns (R, t, s) minimizing || t_ref - (s R t_est + t) ||."""
    mu_e = jnp.mean(t_est, axis=0)
    mu_r = jnp.mean(t_ref, axis=0)
    e = t_est - mu_e
    r = t_ref - mu_r
    H = e.T @ r / t_est.shape[0]  # maps est -> ref
    from ..kernels.linalg import so3_procrustes

    R, _ = so3_procrustes(H)
    if with_scale:
        var_e = jnp.mean(jnp.sum(e * e, axis=-1))
        # tr(D S) with our cross-product SVD: approximate via projection
        s = jnp.sum(r * jnp.einsum("ij,kj->ki", R, e)) / jnp.maximum(
            var_e * t_est.shape[0], 1e-12
        )
    else:
        s = jnp.asarray(1.0, t_est.dtype)
    t = mu_r - s * jnp.einsum("ij,j->i", R, mu_e)
    return R, t, s


def associate(ts_est: np.ndarray, ts_ref: np.ndarray, max_diff: float = 0.01):
    """Nearest-timestamp association (evo `sync.associate_trajectories`,
    max_diff 0.01 s). Returns index arrays (into est, into ref)."""
    ts_est = np.asarray(ts_est, np.float64)
    ts_ref = np.asarray(ts_ref, np.float64)
    pos = np.searchsorted(ts_ref, ts_est)
    pos = np.clip(pos, 1, len(ts_ref) - 1)
    left, right = ts_ref[pos - 1], ts_ref[pos]
    choose_right = (ts_est - left) > (right - ts_est)
    idx_ref = np.where(choose_right, pos, pos - 1)
    diff = np.abs(ts_ref[idx_ref] - ts_est)
    keep = diff <= max_diff
    return np.nonzero(keep)[0], idx_ref[keep]


def ape(
    t_est: jnp.ndarray,
    R_est: jnp.ndarray,
    t_ref: jnp.ndarray,
    R_ref: jnp.ndarray,
    align: bool = True,
) -> ApeResult:
    """APE between already-associated trajectories.

    Caveat (evo-protocol semantics): the SE(3) alignment fits POSITIONS
    only (`traj_est.align`), so on a (near-)straight trajectory the roll
    about the track axis is unconstrained and lands wherever noise takes
    it — `rmse_full` then reports an arbitrary constant rotation offset
    even when the estimated attitudes are consistent with ground truth
    up to a global rotation. On such segments read `rmse_trans` (always
    well-posed) and judge attitudes by relative rotations."""
    if align:
        Ra, ta, _ = umeyama_alignment(t_est, t_ref)
        n = t_est.shape[0]
        R_est = jnp.broadcast_to(Ra, (n, 3, 3)) @ R_est
        t_est = jnp.einsum("ij,kj->ki", Ra, t_est) + ta
    dt = t_est - t_ref
    d2 = jnp.sum(dt * dt, axis=-1)
    rmse_t = jnp.sqrt(jnp.mean(d2))
    # full metric: || T_ref^{-1} T_est - I ||_F per pose
    Rrel = jnp.swapaxes(R_ref, -1, -2) @ R_est
    trel = jnp.einsum("kji,kj->ki", R_ref, dt)
    eye = jnp.eye(3, dtype=Rrel.dtype)
    full2 = jnp.sum((Rrel - eye) ** 2, axis=(-1, -2)) + jnp.sum(trel * trel, -1)
    return ApeResult(
        rmse_trans=float(rmse_t),
        mean_trans=float(jnp.mean(jnp.sqrt(d2))),
        max_trans=float(jnp.max(jnp.sqrt(d2))),
        rmse_full=float(jnp.sqrt(jnp.mean(full2))),
        n_matched=int(t_est.shape[0]),
    )


def ape_from_tum(est_path: str, ref_path: str, max_diff: float = 0.01,
                 align: bool = True) -> ApeResult:
    """File-level entry matching the reference's evaluation flow: read two
    TUM files, associate, align, APE (evo_real_time.py:151-152,259-281)."""
    from ..io.logs import read_tum

    ts_e, t_e, q_e = read_tum(est_path)
    ts_r, t_r, q_r = read_tum(ref_path)
    ie, ir = associate(ts_e, ts_r, max_diff)
    R_e = lie.quat_to_rot(jnp.asarray(q_e[ie]))
    R_r = lie.quat_to_rot(jnp.asarray(q_r[ir]))
    return ape(jnp.asarray(t_e[ie]), R_e, jnp.asarray(t_r[ir]), R_r, align)
