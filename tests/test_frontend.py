"""Frontend: vocabulary, BoW database, LCD detector, submap coarsening."""

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import lie
from kimera_multi_tpu.frontend import bow_db, lcd, submap, vocab
from kimera_multi_tpu.io.synthetic import multi_robot_graph
from kimera_multi_tpu.kernels import bow as bow_kernel


def _corpus(n=400, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, 32),
                                                dtype=np.uint8)


def test_vocab_build_and_transform():
    corpus = _corpus()
    v = vocab.build_vocabulary(corpus, k=4, depth=3, seed=1)
    assert v.n_words == 64
    # transform training descriptors: all get valid word ids
    words = vocab.transform(v, jnp.asarray(corpus[:64]),
                            jnp.ones(64, bool))
    w = np.asarray(words)
    assert (w >= 0).all() and (w < 64).all()
    # same descriptor -> same word, deterministic
    words2 = vocab.transform(v, jnp.asarray(corpus[:64]), jnp.ones(64, bool))
    assert np.array_equal(w, np.asarray(words2))
    # nearby descriptors usually map to the same word
    nearby = corpus[:64].copy()
    nearby[:, 0] ^= 1
    words3 = np.asarray(vocab.transform(v, jnp.asarray(nearby),
                                        jnp.ones(64, bool)))
    assert (words3 == w).mean() > 0.6


def test_bow_from_words_tf_idf():
    v_weights = jnp.ones(64, jnp.float32)
    words = jnp.asarray([3, 3, 3, 7, 7, 12, -1, -1], jnp.int32)
    ids, w, overflow = vocab.bow_from_words(words, v_weights, capacity=8)
    ids, w = np.asarray(ids), np.asarray(w)
    assert int(overflow) == 0
    got = {int(i): float(x) for i, x in zip(ids, w) if i >= 0}
    assert set(got) == {3, 7, 12}
    assert abs(got[3] - 3 / 6) < 1e-6
    assert abs(got[7] - 2 / 6) < 1e-6
    assert abs(got[12] - 1 / 6) < 1e-6
    # overflow accounting
    many = jnp.asarray(np.arange(16), jnp.int32)
    _, _, ovf = vocab.bow_from_words(many, v_weights, capacity=8)
    assert int(ovf) == 8


def test_bow_db_and_lcd_detection():
    rng = np.random.default_rng(3)
    W = 16
    db = bow_db.empty(64, W)

    def mk_bow(word_seed):
        r2 = np.random.default_rng(word_seed)
        ids = np.sort(r2.choice(200, 10, replace=False)).astype(np.int32)
        w = np.ones(10, np.float32) / 10
        ids_p = np.full(W, -1, np.int32)
        w_p = np.zeros(W, np.float32)
        ids_p[:10], w_p[:10] = ids, w
        return jnp.asarray(ids_p), jnp.asarray(w_p)

    # fill frames 0..39 with random places; frames 20-22 share a place
    for f in range(40):
        seed = 100 + f
        if f in (21, 22):
            seed = 120  # same place as frame 20
        ids, w = mk_bow(seed)
        db = bow_db.add(db, jnp.asarray(f), ids, w)

    # query = the shared place; nss_factor from a self-similar frame
    q_ids, q_w = mk_bow(120)
    qs_ids, qs_w = bow_kernel.sort_bow(q_ids, q_w)
    params = lcd.LcdParams(recent_frames_window=5, max_db_results=10)
    res = lcd.detect(db, qs_ids, qs_w, jnp.asarray(1.0), params,
                     self_query_frame=jnp.asarray(39))
    assert bool(res.detected)
    assert int(res.match_id) in (20, 21, 22)
    # island aggregates the three consecutive frames
    assert float(res.island_score) > 2.5

    # recent-frames window: querying as frame 23 must exclude 20-22
    res2 = lcd.detect(db, qs_ids, qs_w, jnp.asarray(1.0), params,
                      self_query_frame=jnp.asarray(23))
    assert int(res2.match_id) not in (19, 20, 21, 22)


def test_submap_coarsening_roundtrip():
    g = multi_robot_graph(seed=4, n_robots=2, n_poses=40, outlier_ratio=0.0,
                          rot_noise=0.0, trans_noise=0.0)
    n = g.poses_per_robot
    assigns = []
    for r in range(2):
        sl = slice(r * n, (r + 1) * n)
        a = submap.assign_submaps(g.R_gt[sl], g.t_gt[sl],
                                  jnp.ones(n, bool), max_submap_size=8)
        assigns.append(a)
        # submap ids nondecreasing, sizes <= 8
        sm = np.asarray(a.submap_of_kf)
        assert (np.diff(sm) >= 0).all()
        assert np.bincount(sm).max() <= 8
    coarse = submap.coarsen_edges(g.edges, assigns, n)
    # intra-submap odometry edges dropped, others kept
    valid0 = int(np.asarray(g.edges.valid).sum())
    valid1 = int(np.asarray(coarse.valid).sum())
    assert 0 < valid1 < valid0
    # exactness: coarse measurement equals relative anchor pose (noiseless)
    v = np.asarray(coarse.valid)
    si = np.asarray(coarse.src_pose)[v]
    sj = np.asarray(coarse.dst_pose)[v]
    sr = np.asarray(coarse.src_robot)[v]
    dr = np.asarray(coarse.dst_robot)[v]
    anchors = [np.asarray(a.anchor_kf) for a in assigns]
    for e in range(min(10, v.sum())):
        ai = anchors[sr[e]][si[e]] + sr[e] * n
        aj = anchors[dr[e]][sj[e]] + dr[e] * n
        Rg, tg = lie.se3_between(g.R_gt[ai], g.t_gt[ai], g.R_gt[aj],
                                 g.t_gt[aj])
        assert np.allclose(np.asarray(coarse.R[np.nonzero(v)[0][e]]),
                           np.asarray(Rg), atol=1e-4)
        assert np.allclose(np.asarray(coarse.t[np.nonzero(v)[0][e]]),
                           np.asarray(tg), atol=1e-3)
    # expansion: optimized anchors at GT reproduce keyframe poses
    S = int(np.asarray(assigns[0].n_submaps))
    R_sm = g.R_gt[np.asarray(assigns[0].anchor_kf)[:n]]
    t_sm = g.t_gt[np.asarray(assigns[0].anchor_kf)[:n]]
    R_exp, t_exp = submap.expand_solution(R_sm, t_sm, assigns[0],
                                          jnp.asarray(0))
    assert np.allclose(np.asarray(R_exp), np.asarray(g.R_gt[:n]), atol=1e-4)
    assert np.allclose(np.asarray(t_exp), np.asarray(g.t_gt[:n]), atol=1e-3)


def test_tf_correction():
    from kimera_multi_tpu.frontend import tf_correction
    npr = np.random.default_rng(12)
    w = npr.normal(0, 0.5, (4, 3)).astype(np.float32)
    R_odom = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_odom = npr.normal(0, 2, (4, 3)).astype(np.float32)
    # world = fixed transform of odom
    Rg = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.1, 0.8], jnp.float32)))
    tg = np.array([5.0, 1.0, -2.0], np.float32)
    R_world = np.einsum("ij,kjl->kil", Rg, R_odom)
    t_world = np.einsum("ij,kj->ki", Rg, t_odom) + tg
    corr = tf_correction.world_to_odom_correction(
        jnp.asarray(R_odom[2]), jnp.asarray(t_odom[2]),
        jnp.asarray(R_world[2]), jnp.asarray(t_world[2]))
    Rc, tc = tf_correction.apply_correction(
        corr, jnp.asarray(R_odom), jnp.asarray(t_odom))
    assert np.allclose(np.asarray(Rc), R_world, atol=1e-5)
    assert np.allclose(np.asarray(tc), t_world, atol=1e-4)
