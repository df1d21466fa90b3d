"""Robust PGO driver: Gauss-Newton solves interleaved with GNC-TLS weight
updates — the single-block equivalent of the reference's
Kimera-RPGO GNC pipeline and the weight-update round structure of dpgo
(`shouldUpdateMeasurementWeights` -> UPDATE_WEIGHT, drawio:2466-2469,
2175-2215)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.containers import EDGE_SHARED_LC, PoseGraphEdges
from . import chordal, gnc, pcm, pgo


@functools.partial(
    jax.jit,
    static_argnames=(
        "poses_per_robot",
        "gnc_outer_iters",
        "gn_iters",
        "cg_iters",
    ),
)
def robust_pgo(
    params0: pgo.PgoParams,
    edges: PoseGraphEdges,
    poses_per_robot: int,
    gnc_outer_iters: int = 40,
    gn_iters: int = 8,
    cg_iters: int = 40,
    gnc_alpha: float = 0.9,
    mu_factor: float = 1.4,
    damping: float = 1e-4,
):
    """Returns (params, gnc_state). Fixed outer iteration count (the
    reference iterates `until UpdateCount >= NumWeightUpdates`).

    Pipeline: PCM consensus decides each robot pair's relative frame (GNC
    alone cannot when a pair's loop closures are majority-outlier), then
    weighted chordal + Gauss-Newton refine under GNC-TLS continuation.
    params0 must hold per-robot-anchored trajectories (odometry init).
    """
    barc2 = gnc.barc2_from_quantile(gnc_alpha, dof=6)
    ones = jnp.ones(edges.capacity, params0.t.dtype)
    n_total = params0.R.shape[0]
    n_robots = n_total // poses_per_robot

    params_w, consensus, _frame_ok = pcm.robot_frame_init(
        edges, params0, n_robots, poses_per_robot
    )
    shared = edges.valid & (edges.etype == EDGE_SHARED_LC)
    w0 = jnp.where(shared & ~consensus, 0.0, ones)

    # Refine from the PCM placement (do NOT re-solve from scratch: the
    # placement is the hard-won part). Non-consensus shared edges start at
    # weight 0 but can be re-admitted by GNC once their residuals say so.
    params1 = pgo.gauss_newton(
        params_w, edges, w0, poses_per_robot,
        gn_iters=gn_iters, cg_iters=cg_iters, damping=damping,
    )
    sq = pgo.edge_squared_errors(params1, edges, poses_per_robot)
    state = gnc.gnc_init(sq, edges.etype, edges.valid, barc2)

    def outer(carry, _):
        params, state = carry
        sq = pgo.edge_squared_errors(params, edges, poses_per_robot)
        state = gnc.gnc_update_weights(state, sq, edges.etype, edges.valid,
                                       mu_factor=mu_factor)
        params = pgo.gauss_newton(
            params, edges, state.weights, poses_per_robot,
            gn_iters=gn_iters, cg_iters=cg_iters, damping=damping,
        )
        return (params, state), None

    (params, state), _ = jax.lax.scan(
        outer, (params1, state), None, length=gnc_outer_iters
    )
    return params, state
