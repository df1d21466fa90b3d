"""Robust PGO on synthetic multi-robot graphs (sim tier, SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import lie
from kimera_multi_tpu.core.containers import EDGE_ODOMETRY
from kimera_multi_tpu.eval.ape import align_left, ape
from kimera_multi_tpu.io.synthetic import multi_robot_graph
from kimera_multi_tpu.solve import pgo, robust


def _align_and_ate(params, R_gt, t_gt):
    """Gauge-align estimate to GT via pose 0, return max translation error."""
    Ra, ta = align_left(R_gt[0], t_gt[0], params.R[0], params.t[0],
                        params.R, params.t)
    return float(jnp.max(jnp.linalg.norm(ta - t_gt, axis=-1)))


def test_init_from_odometry_matches_chain():
    g = multi_robot_graph(seed=1, n_robots=2, n_poses=16, outlier_ratio=0.0,
                          rot_noise=0.0, trans_noise=0.0)
    params = pgo.init_from_odometry(g.edges, g.n_robots, g.poses_per_robot)
    # noiseless odometry -> init equals GT up to per-robot gauge (robot
    # chains each start at identity). Check per-robot relative poses.
    n = g.poses_per_robot
    for r in range(g.n_robots):
        sl = slice(r * n, (r + 1) * n)
        Rrel_est = jnp.swapaxes(params.R[sl][:1], -1, -2) @ params.R[sl]
        Rrel_gt = jnp.swapaxes(g.R_gt[sl][:1], -1, -2) @ g.R_gt[sl]
        assert np.allclose(np.asarray(Rrel_est), np.asarray(Rrel_gt), atol=1e-4)


def test_gauss_newton_clean_graph():
    g = multi_robot_graph(seed=2, n_robots=1, n_poses=32, outlier_ratio=0.0,
                          rot_noise=0.002, trans_noise=0.005)
    params0 = pgo.init_from_odometry(g.edges, 1, g.poses_per_robot)
    w = jnp.ones(g.edges.capacity)
    params = pgo.gauss_newton(params0, g.edges, w, g.poses_per_robot,
                              gn_iters=10, cg_iters=40)
    # cost decreases vs init and ATE is small
    c0 = float(pgo.pgo_cost(params0, g.edges, w, g.poses_per_robot))
    c1 = float(pgo.pgo_cost(params, g.edges, w, g.poses_per_robot))
    assert c1 < c0
    assert _align_and_ate(params, g.R_gt, g.t_gt) < 0.25


def test_robust_pgo_rejects_outliers():
    g = multi_robot_graph(seed=3, n_robots=2, n_poses=48, outlier_ratio=0.35,
                          n_intra_lc=6, n_inter_lc=10)
    params0 = pgo.init_from_odometry(g.edges, g.n_robots, g.poses_per_robot)
    params, state = robust.robust_pgo(
        params0, g.edges, g.poses_per_robot, gn_iters=6, cg_iters=40,
    )
    w = np.asarray(state.weights)
    out = np.asarray(g.is_outlier)
    valid = np.asarray(g.edges.valid)
    lc = valid & (np.asarray(g.edges.etype) != EDGE_ODOMETRY)
    # outlier LCs killed, inlier LCs kept
    assert w[lc & out].max(initial=0.0) < 0.1
    assert w[lc & ~out].min(initial=1.0) > 0.9
    # trajectory close to GT despite 35% outliers
    ate = _align_and_ate(params, g.R_gt, g.t_gt)
    assert ate < 0.8
