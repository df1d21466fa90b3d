"""chordal init + PCM consensus units."""

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core.containers import EDGE_SHARED_LC
from kimera_multi_tpu.eval.ape import align_left
from kimera_multi_tpu.io.synthetic import multi_robot_graph
from kimera_multi_tpu.solve import chordal, pcm, pgo


def test_chordal_recovers_clean_graph():
    g = multi_robot_graph(seed=7, n_robots=2, n_poses=24, outlier_ratio=0.0,
                          rot_noise=0.001, trans_noise=0.002)
    n = g.R_gt.shape[0]
    params = chordal.chordal_init(
        g.edges, jnp.ones(g.edges.capacity), n, g.poses_per_robot, cg_iters=150
    )
    Ra, ta = align_left(g.R_gt[0], g.t_gt[0], params.R[0], params.t[0],
                        params.R, params.t)
    ate = float(jnp.max(jnp.linalg.norm(ta - g.t_gt, axis=-1)))
    assert ate < 0.2


def test_pcm_consensus_separates_outliers():
    g = multi_robot_graph(seed=11, n_robots=3, n_poses=32, outlier_ratio=0.4,
                          n_intra_lc=4, n_inter_lc=8)
    params0 = pgo.init_from_odometry(g.edges, g.n_robots, g.poses_per_robot)
    pw, cons, ok = pcm.robot_frame_init(
        g.edges, params0, g.n_robots, g.poses_per_robot
    )
    cons = np.asarray(cons)
    out = np.asarray(g.is_outlier)
    shared = np.asarray(g.edges.valid & (g.edges.etype == EDGE_SHARED_LC))
    # no outlier enters any consensus set
    assert cons[shared & out].sum() == 0
    # consensus found for most pairs (inliers exist between each pair)
    assert cons[shared & ~out].sum() >= 0.5 * (shared & ~out).sum()
    assert bool(np.asarray(ok)[0])
    # placement quality: robots that got frames are near GT
    Ra, ta = align_left(g.R_gt[0], g.t_gt[0], pw.R[0], pw.t[0], pw.R, pw.t)
    okmask = np.repeat(np.asarray(ok), g.poses_per_robot)
    err = np.linalg.norm(np.asarray(ta) - np.asarray(g.t_gt), axis=-1)
    assert err[okmask].max() < 1.5
