"""Lifted RBCD: convergence, sharded-vs-reference equality, fault masks,
checkpoint/resume — the distributed tier on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import rng as rngmod, stiefel
from kimera_multi_tpu.dist import checkpoint, fault, mesh as mesh_mod, rounds
from kimera_multi_tpu.eval.ape import align_left
from kimera_multi_tpu.io.synthetic import multi_robot_graph
from kimera_multi_tpu.solve import pgo, rbcd


def _setup(seed=5, n_robots=2, n_poses=24, outlier_ratio=0.0, rank=5):
    g = multi_robot_graph(seed=seed, n_robots=n_robots, n_poses=n_poses,
                          outlier_ratio=outlier_ratio, n_intra_lc=4,
                          n_inter_lc=6)
    params0 = pgo.init_from_odometry(g.edges, g.n_robots, g.poses_per_robot)
    key = rngmod.derive(rngmod.base_key(0), rngmod.Stream.LIFTING)
    ylift = stiefel.random_lifting_matrix(key, rank, 3)
    Y0 = rbcd.lift_params(params0, ylift, g.n_robots, g.poses_per_robot)
    return g, params0, Y0


def test_rbcd_reference_converges():
    g, params0, Y0 = _setup()
    cfg = rbcd.RbcdConfig(inner_iters=5)
    active = jnp.ones(g.n_robots, bool)
    Y, costs = rbcd.solve_rounds(Y0, active, g.edges, g.poses_per_robot, cfg,
                                 n_rounds=20)
    costs = np.asarray(costs)
    # against the cost at Y0 (costs[0] is already AFTER one round — with
    # block-Jacobi PCG the first round alone nearly converges, so a
    # ratio against costs[0] no longer measures progress)
    c_init = float(rbcd.lifted_cost(
        Y0.reshape(-1, Y0.shape[2], Y0.shape[3]), g.edges,
        jnp.ones(g.edges.capacity), g.poses_per_robot))
    assert costs[-1] < c_init * 0.2
    # monotone non-increasing (within tolerance — parallel RBCD can tick up
    # transiently, but the backtracking ladder guards per-block descent)
    assert costs[-1] <= costs.min() * 1.05
    # rounded solution close to GT
    Y_flat = Y.reshape(-1, Y.shape[2], Y.shape[3])
    R, t = stiefel.round_solution(Y_flat, 3)
    Ra, ta = align_left(g.R_gt[0], g.t_gt[0], R[0], t[0], R, t)
    ate = float(jnp.max(jnp.linalg.norm(ta - g.t_gt, axis=-1)))
    assert ate < 0.7


def test_sharded_round_matches_reference():
    g, params0, Y0 = _setup(seed=6)
    cfg = rbcd.RbcdConfig(inner_iters=3)
    active = jnp.ones(g.n_robots, bool)
    w = jnp.ones(g.edges.capacity)

    # reference (vmap) semantics, 2 rounds
    Y_ref = Y0
    for _ in range(2):
        Y_ref = rbcd.rbcd_round_reference(Y_ref, active, g.edges, w, cfg)

    # sharded semantics on a 2-robot mesh
    m = mesh_mod.robot_mesh(g.n_robots)
    round_fn = rounds.make_round_fn(m, g.edges, g.poses_per_robot, cfg,
                                    weight_update_every=1000)
    state = rounds.init_state(m, Y0, active, g.edges, g.poses_per_robot)
    state, _ = round_fn(state)
    state, _ = round_fn(state)
    np.testing.assert_allclose(np.asarray(state.Y), np.asarray(Y_ref),
                               rtol=1e-5, atol=1e-5)


def test_spd4_inv_matches_lu():
    """Closed-form Schur-split 4x4 inverse == LAPACK-style inverse."""
    npr = np.random.default_rng(3)
    A = npr.normal(0, 1, (64, 4, 4)).astype(np.float32)
    H = A @ np.swapaxes(A, 1, 2) + 0.05 * np.eye(4, dtype=np.float32)
    from kimera_multi_tpu.solve.rbcd import _spd4_inv

    got = np.asarray(_spd4_inv(jnp.asarray(H)))
    want = np.linalg.inv(H.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_bucketed_round_matches_masked():
    """O(E_robot) bucketed block updates == O(E_total) masked updates."""
    g, params0, Y0 = _setup(seed=7, n_robots=3, n_poses=16)
    cfg = rbcd.RbcdConfig(inner_iters=2)
    active = jnp.ones(g.n_robots, bool)
    w = jnp.ones(g.edges.capacity)
    buckets = rbcd.bucket_edges(g.edges, g.n_robots)

    Y_masked = rbcd.rbcd_round_reference(Y0, active, g.edges, w, cfg)
    Y_bucketed = rbcd.rbcd_round_reference(Y0, active, g.edges, w, cfg,
                                           buckets=buckets)
    np.testing.assert_allclose(np.asarray(Y_bucketed), np.asarray(Y_masked),
                               rtol=1e-5, atol=1e-6)


def test_sharded_gnc_outlier_rejection():
    g, params0, Y0 = _setup(seed=8, n_robots=2, n_poses=32, outlier_ratio=0.3)
    cfg = rbcd.RbcdConfig(inner_iters=5)
    active = jnp.ones(g.n_robots, bool)
    m = mesh_mod.robot_mesh(g.n_robots)
    round_fn = rounds.make_round_fn(m, g.edges, g.poses_per_robot, cfg,
                                    weight_update_every=2)
    state = rounds.init_state(m, Y0, active, g.edges, g.poses_per_robot)
    # enough rounds for the GNC continuation to anneal past the burn-in
    for _ in range(60):
        state, cost = round_fn(state)
    w = np.asarray(state.gnc_state.weights)
    out = np.asarray(g.is_outlier)
    lcmask = np.asarray(g.edges.valid) & (np.asarray(g.edges.etype) != 1)
    assert w[lcmask & out].max(initial=0.0) < 0.05
    assert w[lcmask & ~out].min(initial=1.0) > 0.5


def test_fault_mask_freezes_block():
    g, params0, Y0 = _setup(seed=9)
    cfg = rbcd.RbcdConfig(inner_iters=3)
    active = fault.deactivate(jnp.ones(g.n_robots, bool), 1)
    w = jnp.ones(g.edges.capacity)
    Y1 = rbcd.rbcd_round_reference(Y0, active, g.edges, w, cfg)
    # robot 1 frozen (up to polar reprojection noise); robot 0 moved
    assert np.allclose(np.asarray(Y1[1]), np.asarray(Y0[1]), atol=1e-5)
    assert not np.allclose(np.asarray(Y1[0]), np.asarray(Y0[0]))


def test_checkpoint_roundtrip(tmp_path):
    g, params0, Y0 = _setup(seed=10)
    cfg = rbcd.RbcdConfig(inner_iters=2)
    active = jnp.ones(g.n_robots, bool)
    m = mesh_mod.robot_mesh(g.n_robots)
    round_fn = rounds.make_round_fn(m, g.edges, g.poses_per_robot, cfg)
    state = rounds.init_state(m, Y0, active, g.edges, g.poses_per_robot)
    state, _ = round_fn(state)
    p = str(tmp_path / "ckpt.npz")
    checkpoint.save(p, state)
    loaded = checkpoint.load(p, mesh=m)
    # resume from checkpoint == continue original, exactly
    s1, _ = round_fn(state)
    s2, _ = round_fn(loaded)
    np.testing.assert_array_equal(np.asarray(s1.Y), np.asarray(s2.Y))
    np.testing.assert_array_equal(np.asarray(s1.gnc_state.weights),
                                  np.asarray(s2.gnc_state.weights))


def test_sharded_hypothesis_ransac_matches_single_device():
    """SURVEY 2.3 row 7: hypothesis-sharded RANSAC == single-chip result."""
    from kimera_multi_tpu.dist import sharded_verify
    from kimera_multi_tpu.kernels import ransac
    from kimera_multi_tpu.core import lie, rng as rngmod

    rng = np.random.default_rng(13)
    K = 128
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.4], jnp.float32)))
    t_gt = np.array([1.0, 0.5, -0.2], np.float32)
    p = rng.uniform(-4, 4, (K, 3)).astype(np.float32)
    q = np.einsum("ij,kj->ki", R_gt, p) + t_gt
    q += rng.normal(0, 0.01, (K, 3)).astype(np.float32)
    out_idx = rng.choice(K, 30, replace=False)
    q[out_idx] += rng.uniform(2, 8, (30, 3)).astype(np.float32)
    valid = np.ones(K, bool)
    key = rngmod.derive(rngmod.base_key(5), rngmod.Stream.RANSAC_STEREO)

    # single-device with the same hypothesis count
    single = jax.jit(lambda k, a, b, v: ransac.ransac_arun(
        k, a, b, v, n_hyp=512))(key, jnp.asarray(p.T), jnp.asarray(q.T),
                                jnp.asarray(valid))

    # sharded over a 1-robot x 4-shard mesh
    m = mesh_mod.robot_mesh(1, intra=4)
    fn = sharded_verify.make_sharded_arun(m, n_hyp=512)
    sharded = fn(key, jnp.asarray(p.T), jnp.asarray(q.T),
                 jnp.asarray(valid))

    assert int(single["n_inliers"]) == int(sharded["n_inliers"])
    np.testing.assert_array_equal(np.asarray(single["inliers"]),
                                  np.asarray(sharded["inliers"]))
    np.testing.assert_allclose(np.asarray(single["R"]),
                               np.asarray(sharded["R"]), atol=1e-6)


def test_chain_sequence_parallel_solve():
    """SURVEY 2.3 row 8: chain-sharded halo-exchange CG == dense lstsq."""
    from kimera_multi_tpu.dist import chain as chain_mod

    rng = np.random.default_rng(17)
    N = 64
    t_gt = np.cumsum(rng.normal(0, 0.5, (N, 3)), axis=0).astype(np.float32)
    t_gt -= t_gt[0]
    d_chain = np.zeros((N, 3), np.float32)
    d_chain[:-1] = t_gt[1:] - t_gt[:-1]
    d_chain[:-1] += rng.normal(0, 0.01, (N - 1, 3)).astype(np.float32)
    # loop closures between distant poses
    C = 8
    lc_src = np.full(C, -1, np.int32)
    lc_dst = np.zeros(C, np.int32)
    lc_d = np.zeros((C, 3), np.float32)
    lc_w = np.zeros(C, np.float32)
    for e in range(5):
        i, j = rng.integers(0, N, 2)
        if i == j:
            continue
        lc_src[e], lc_dst[e] = min(i, j), max(i, j)
        lc_d[e] = t_gt[lc_dst[e]] - t_gt[lc_src[e]]
        lc_w[e] = 4.0

    m = mesh_mod.robot_mesh(1, intra=4)
    solver = chain_mod.make_chain_translation_solver(m, N, C, cg_iters=200)
    t_sharded = np.asarray(solver(jnp.asarray(d_chain), jnp.asarray(lc_src),
                                  jnp.asarray(lc_dst), jnp.asarray(lc_d),
                                  jnp.asarray(lc_w)))
    t_ref = chain_mod.chain_translation_reference(
        N, d_chain, lc_src, lc_dst, lc_d, lc_w)
    assert np.abs(t_sharded - t_ref).max() < 1e-3
    # and both near ground truth
    assert np.abs(t_sharded - t_gt).max() < 0.1


def test_chain_weighted_fleet_concat():
    """The production --chain-refine shape: TWO robots' chains
    concatenated into one, zero-weight chain link at the robot boundary,
    inter-robot coupling only through the LC table. Sharded solve ==
    dense weighted lstsq, and each robot's chain is internally rigid."""
    from kimera_multi_tpu.dist import chain as chain_mod

    rng = np.random.default_rng(23)
    Nr = 16
    N = 2 * Nr
    t_gt = np.cumsum(rng.normal(0, 0.5, (N, 3)), axis=0).astype(np.float32)
    t_gt -= t_gt[0]
    d_chain = np.zeros((N, 3), np.float32)
    d_chain[:-1] = t_gt[1:] - t_gt[:-1]
    wc = np.full(N, 2.5, np.float32)
    wc[Nr - 1] = 0.0  # no odometry across the robot boundary
    d_chain[Nr - 1] = 999.0  # must be ignored (zero weight)
    C = 8
    lc_src = np.full(C, -1, np.int32)
    lc_dst = np.zeros(C, np.int32)
    lc_d = np.zeros((C, 3), np.float32)
    lc_w = np.zeros(C, np.float32)
    for e in range(4):  # inter-robot loop closures tie the two chains
        i = int(rng.integers(0, Nr))
        j = int(rng.integers(Nr, N))
        lc_src[e], lc_dst[e] = i, j
        lc_d[e] = t_gt[j] - t_gt[i]
        lc_w[e] = 4.0

    m = mesh_mod.robot_mesh(1, intra=4)
    solver = chain_mod.make_chain_translation_solver(m, N, C, cg_iters=300)
    t_sharded = np.asarray(solver(
        jnp.asarray(d_chain), jnp.asarray(lc_src), jnp.asarray(lc_dst),
        jnp.asarray(lc_d), jnp.asarray(lc_w), w_chain=jnp.asarray(wc)))
    t_ref = chain_mod.chain_translation_reference(
        N, d_chain, lc_src, lc_dst, lc_d, lc_w, w_chain=wc)
    assert np.abs(t_sharded - t_ref).max() < 1e-3
    assert np.abs(t_sharded - t_gt).max() < 0.05  # exact up to anchor gauge


def test_measured_comm_bytes_from_hlo():
    """Per-round received bytes measured from the compiled HLO collectives
    (reference counter mTotalBytesReceived, drawio:2355): must scale with
    mesh size and agree with the analytic collective-schedule model on its
    dominant term (the Y/delta block gathers)."""
    measured = {}
    analytic = {}
    for n_robots in (2, 4):
        g, params0, Y0 = _setup(seed=12, n_robots=n_robots, n_poses=16)
        cfg = rbcd.RbcdConfig(inner_iters=2, cg_iters=5)
        m = mesh_mod.robot_mesh(n_robots, intra=1)
        round_fn = rounds.make_round_fn(m, g.edges, g.poses_per_robot, cfg,
                                        weight_update_every=1000)
        state = rounds.init_state(m, Y0, jnp.ones(n_robots, bool), g.edges,
                                  g.poses_per_robot)
        measured[n_robots] = rounds.measured_round_comm_bytes(
            round_fn, state, cfg.inner_iters)
        analytic[n_robots] = rounds.round_comm_bytes(Y0.shape,
                                                     cfg.inner_iters)
    # scales with mesh size
    assert measured[4] > measured[2] > 0
    # the analytic model counts the same dominant gathers the compiler
    # emits; XLA may add/fuse small collectives (cost gather, flags), so
    # agreement is within a factor of 2 on both fixtures
    for n in (2, 4):
        ratio = measured[n] / analytic[n]
        assert 0.5 < ratio < 2.0, (n, measured[n], analytic[n])
