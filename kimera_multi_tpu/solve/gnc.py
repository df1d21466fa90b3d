"""Graduated non-convexity with a truncated-least-squares (TLS) robust cost.

Role of the GNC layer the reference applies both in Kimera-RPGO
(`gnc_alpha: 0.9`, params/D455/LcdParams.yaml:36) and in dpgo's
measurement-weight update rounds (GNC_TLS, images/kimera-multi.drawio:2175).

Standard GNC-TLS (Yang et al.) weight update, fully vectorized over edges:

    w(r^2) = 1                                  if r^2 <= (mu/(mu+1)) barc^2
           = 0                                  if r^2 >= ((mu+1)/mu) barc^2
           = barc sqrt(mu(mu+1)) / |r| - mu     otherwise

with the continuation schedule mu_0 = barc^2 / (2 r_max^2 - barc^2),
mu <- mu_factor * mu each outer iteration. Odometry edges are never
down-weighted (matching dpgo: only loop closures get GNC weights,
drawio:2175-2215).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.containers import EDGE_ODOMETRY, GncState

_EPS = 1e-12


def barc2_from_quantile(alpha: float = 0.9, dof: int = 6) -> float:
    """Inlier threshold from a chi-square quantile (alpha = `gnc_alpha`).

    Small fixed table for the dofs used (6 = SE(3) residual, 3, 1); avoids a
    scipy dependency at runtime.
    """
    table = {
        (0.9, 6): 10.6446,
        (0.95, 6): 12.5916,
        (0.99, 6): 16.8119,
        (0.9, 3): 6.2514,
        (0.95, 3): 7.8147,
        (0.9, 1): 2.7055,
    }
    key = (round(float(alpha), 4), int(dof))
    if key not in table:
        raise ValueError(f"no chi2 entry for alpha={alpha}, dof={dof}")
    return table[key]


def gnc_init(sq_errors: jnp.ndarray, etype: jnp.ndarray, valid: jnp.ndarray,
             barc2: float) -> GncState:
    """Initialize mu for the continuation schedule.

    GTSAM-style: mu_0 = barc^2 / (2 r_max^2 - barc^2) from the worst
    loop-closure residual at the initial solution — the fully-convex start.
    The continuation then needs enough outer iterations to anneal mu across
    the residual dynamic range: callers should budget
    ~ log(2 r2_max / barc2) / log(mu_factor) rounds (robust_pgo defaults
    are sized for gross outliers at r^2/barc^2 ~ 1e4).
    """
    lc = valid & (etype != EDGE_ODOMETRY)
    r2max = jnp.max(jnp.where(lc, sq_errors, 0.0))
    mu0 = barc2 / jnp.maximum(2.0 * r2max - barc2, _EPS)
    mu0 = jnp.clip(mu0, 1e-6, 1e6)
    return GncState(
        mu=mu0,
        weights=jnp.ones_like(sq_errors),
        barc2=jnp.asarray(barc2, sq_errors.dtype),
        outer_iter=jnp.asarray(0, jnp.int32),
    )


def gnc_update_weights(
    state: GncState,
    sq_errors: jnp.ndarray,
    etype: jnp.ndarray,
    valid: jnp.ndarray,
    mu_factor: float = 1.4,
) -> GncState:
    """One GNC outer iteration: recompute TLS weights, anneal mu."""
    mu, barc2 = state.mu, state.barc2
    lo = mu / (mu + 1.0) * barc2
    hi = (mu + 1.0) / mu * barc2
    r = jnp.sqrt(jnp.maximum(sq_errors, _EPS))
    w_mid = jnp.sqrt(barc2 * mu * (mu + 1.0)) / r - mu
    w = jnp.where(sq_errors <= lo, 1.0, jnp.where(sq_errors >= hi, 0.0,
                                                  jnp.clip(w_mid, 0.0, 1.0)))
    # odometry edges (and invalid slots) keep weight 1 / 0
    is_odo = etype == EDGE_ODOMETRY
    w = jnp.where(is_odo, 1.0, w)
    w = jnp.where(valid, w, 0.0)
    return GncState(
        mu=mu * mu_factor,
        weights=w,
        barc2=barc2,
        outer_iter=state.outer_iter + 1,
    )
