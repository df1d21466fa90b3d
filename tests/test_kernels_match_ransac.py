"""Hamming matching, BoW scoring, and batched RANSAC vs oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import lie, rng as rngmod
from kimera_multi_tpu.kernels import bow, hamming, ransac


def _rand_desc(rng, n):
    return rng.integers(0, 256, size=(n, 32), dtype=np.uint8)


def test_hamming_matrix_oracle():
    rng = np.random.default_rng(0)
    a, b = _rand_desc(rng, 64), _rand_desc(rng, 48)
    D = np.asarray(hamming.hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
    # numpy oracle
    abits = np.unpackbits(a, axis=1, bitorder="little")
    bbits = np.unpackbits(b, axis=1, bitorder="little")
    ref = (abits[:, None, :] != bbits[None, :, :]).sum(-1)
    assert np.array_equal(D, ref)


def test_knn2_lowe_oracle():
    rng = np.random.default_rng(1)
    t = _rand_desc(rng, 100)
    # queries: copies of targets with few flipped bits -> should match
    q = t[:20].copy()
    q[:, 0] ^= 1  # flip one bit
    valid_q = np.ones(20, bool)
    valid_t = np.ones(100, bool)
    valid_t[5] = False
    m, d = hamming.knn2_lowe_match(
        jnp.asarray(q), jnp.asarray(valid_q), jnp.asarray(t), jnp.asarray(valid_t)
    )
    m, d = np.asarray(m), np.asarray(d)
    for i in range(20):
        if i == 5:
            assert m[i] != 5  # masked target never matched
        elif m[i] >= 0:
            assert m[i] == i
            assert d[i] == 1
    # most should pass lowe (random 256-bit second neighbors are far)
    assert (m >= 0).sum() >= 18


def test_bow_l1_score_oracle():
    rng = np.random.default_rng(2)
    W = 32
    def mk(n_words):
        ids = rng.choice(1000, size=n_words, replace=False).astype(np.int32)
        w = rng.uniform(0.1, 1.0, n_words).astype(np.float32)
        ids_p = np.full(W, -1, np.int32)
        w_p = np.zeros(W, np.float32)
        ids_p[:n_words] = ids
        w_p[:n_words] = w / w.sum()
        return ids_p, w_p
    q_ids, q_w = mk(20)
    N = 16
    db_ids = np.stack([mk(rng.integers(5, 30))[0] for _ in range(N)])
    db_w = np.zeros((N, W), np.float32)
    for i in range(N):
        n = (db_ids[i] >= 0).sum()
        w = rng.uniform(0.1, 1.0, n).astype(np.float32)
        db_w[i, :n] = w / w.sum()
    # make entry 3 identical to query -> score 1
    db_ids[3], db_w[3] = q_ids, q_w
    qs_ids, qs_w = bow.sort_bow(jnp.asarray(q_ids), jnp.asarray(q_w))
    scores = np.asarray(
        bow.l1_scores(qs_ids, qs_w, jnp.asarray(db_ids), jnp.asarray(db_w),
                      jnp.ones(N, bool))
    )
    # numpy oracle
    for i in range(N):
        s = 0.0
        qmap = {int(a): float(b) for a, b in zip(q_ids, q_w) if a >= 0}
        for a, b in zip(db_ids[i], db_w[i]):
            if int(a) >= 0 and int(a) in qmap:
                s += min(qmap[int(a)], float(b))
        assert abs(scores[i] - s) < 1e-5, i
    assert abs(scores[3] - 1.0) < 1e-5


def test_ransac_arun_outliers():
    rng = np.random.default_rng(3)
    K = 128
    w_gt = np.array([0.3, -0.2, 0.5], np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w_gt)))
    t_gt = np.array([1.0, -2.0, 0.5], np.float32)
    p = rng.uniform(-5, 5, size=(K, 3)).astype(np.float32)
    q = np.einsum("ij,kj->ki", R_gt, p) + t_gt
    q += rng.normal(size=(K, 3)).astype(np.float32) * 0.01
    n_out = 40
    out_idx = rng.choice(K, n_out, replace=False)
    q[out_idx] += rng.uniform(2, 10, size=(n_out, 3)).astype(np.float32)
    valid = np.ones(K, bool)
    valid[-8:] = False  # padding
    key = rngmod.derive(rngmod.base_key(0), 1, 2, rngmod.Stream.RANSAC_STEREO)
    out = jax.jit(ransac.ransac_arun)(
        key, jnp.asarray(p.T), jnp.asarray(q.T), jnp.asarray(valid)
    )
    assert bool(out["ok"])
    # all true inliers (valid, non-outlier) recovered
    true_inl = valid.copy()
    true_inl[out_idx] = False
    got = np.asarray(out["inliers"])
    assert (got & ~true_inl).sum() == 0 or (got & ~true_inl).sum() <= 2
    assert got[true_inl].mean() > 0.95
    assert np.allclose(np.asarray(out["R"]), R_gt, atol=0.02)
    assert np.allclose(np.asarray(out["t"]), t_gt, atol=0.05)
    # determinism
    out2 = jax.jit(ransac.ransac_arun)(
        key, jnp.asarray(p.T), jnp.asarray(q.T), jnp.asarray(valid)
    )
    assert np.array_equal(got, np.asarray(out2["inliers"]))


def test_ransac_essential_outliers():
    rng = np.random.default_rng(4)
    K = 96
    w_gt = np.array([0.1, 0.05, -0.2], np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w_gt)))
    t = np.array([0.5, 0.1, 0.2], np.float32)
    P = rng.uniform(-2, 2, size=(K, 3)).astype(np.float32)
    P[:, 2] += 5.0
    f1 = P / np.linalg.norm(P, axis=1, keepdims=True)
    P2 = np.einsum("ij,kj->ki", R, P) + t
    f2 = P2 / np.linalg.norm(P2, axis=1, keepdims=True)
    n_out = 30
    out_idx = rng.choice(K, n_out, replace=False)
    g = rng.normal(size=(n_out, 3)).astype(np.float32)
    f2[out_idx] = g / np.linalg.norm(g, axis=1, keepdims=True)
    valid = np.ones(K, bool)
    key = rngmod.derive(rngmod.base_key(0), 0, 7, rngmod.Stream.RANSAC_MONO)
    out = jax.jit(ransac.ransac_essential)(
        key, jnp.asarray(f1.T), jnp.asarray(f2.T), jnp.asarray(valid)
    )
    assert bool(out["ok"])
    true_inl = np.ones(K, bool)
    true_inl[out_idx] = False
    got = np.asarray(out["inliers"])
    assert got[true_inl].mean() > 0.9
    assert got[~true_inl].mean() < 0.1


def test_ransac_translation_known_rotation():
    rng = np.random.default_rng(5)
    K = 64
    R = np.asarray(lie.so3_exp(jnp.asarray(np.array([0.0, 0.3, 0.1], np.float32))))
    t_gt = np.array([0.5, 1.0, -0.7], np.float32)
    p = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
    q = np.einsum("ij,kj->ki", R, p) + t_gt
    q[:20] += 5.0  # outliers
    key = rngmod.base_key(11)
    out = ransac.ransac_translation_known_rotation(
        key, jnp.asarray(p.T), jnp.asarray(q.T), jnp.asarray(R),
        jnp.ones(K, bool)
    )
    assert bool(out["ok"])
    assert np.allclose(np.asarray(out["t"]), t_gt, atol=1e-3)
    assert int(out["n_inliers"]) == K - 20


def test_hamming_top2_pallas_matches_xla():
    rng = np.random.default_rng(6)
    q = _rand_desc(rng, 128)
    t = _rand_desc(rng, 512)
    bits_q = hamming.unpack_bits(jnp.asarray(q)).astype(jnp.bfloat16)
    bits_t = hamming.unpack_bits(jnp.asarray(t)).astype(jnp.bfloat16)
    d1, d2, i1 = hamming.hamming_top2_pallas(bits_q, bits_t, tile_q=64, tile_t=256)
    D = np.asarray(hamming.hamming_matrix(jnp.asarray(q), jnp.asarray(t)))
    ref_i1 = D.argmin(1)
    ref_d1 = D.min(1)
    Ds = np.sort(D, axis=1)
    assert np.array_equal(np.asarray(d1).astype(int), ref_d1)
    assert np.array_equal(np.asarray(d2).astype(int), Ds[:, 1])
    # index can differ on ties; check distance at claimed index
    assert np.array_equal(D[np.arange(128), np.asarray(i1)], ref_d1)


def test_epnp_exact():
    rng = np.random.default_rng(7)
    from kimera_multi_tpu.kernels import minimal
    w_gt = np.array([0.2, -0.4, 0.1], np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w_gt)))
    t_gt = np.array([0.3, -0.5, 0.8], np.float32)
    X = rng.uniform(-2, 2, (12, 3)).astype(np.float32)
    pc = np.einsum("ij,kj->ki", R_gt, X) + t_gt
    pc[:, 2] += 6.0  # keep in front
    t_gt2 = t_gt + np.array([0, 0, 6.0], np.float32)
    f = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    R, t, ok = minimal.epnp(jnp.asarray(X)[None], jnp.asarray(f)[None])
    assert bool(np.asarray(ok)[0])
    assert np.allclose(np.asarray(R)[0], R_gt, atol=5e-3)
    assert np.allclose(np.asarray(t)[0], t_gt2, atol=2e-2)


def test_ransac_pnp_outliers():
    rng = np.random.default_rng(8)
    K = 96
    R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.3, -0.2], jnp.float32)))
    t_gt = np.array([0.5, 0.2, 5.0], np.float32)
    X = rng.uniform(-3, 3, (K, 3)).astype(np.float32)
    pc = np.einsum("ij,kj->ki", R_gt, X) + t_gt
    f = pc / np.linalg.norm(pc, axis=1, keepdims=True)
    out_idx = rng.choice(K, 25, replace=False)
    g = rng.normal(size=(25, 3)).astype(np.float32)
    g[:, 2] = np.abs(g[:, 2]) + 1
    f[out_idx] = g / np.linalg.norm(g, axis=1, keepdims=True)
    key = rngmod.base_key(21)
    out = jax.jit(ransac.ransac_pnp)(key, jnp.asarray(X), jnp.asarray(f),
                                     jnp.ones(K, bool))
    assert bool(out["ok"])
    got = np.asarray(out["inliers"])
    true_inl = np.ones(K, bool); true_inl[out_idx] = False
    assert got[true_inl].mean() > 0.9
    assert got[~true_inl].mean() < 0.15
    assert np.allclose(np.asarray(out["R"]), R_gt, atol=0.02)
    assert np.allclose(np.asarray(out["t"]), t_gt, atol=0.1)


def test_essential_5pt_minimal():
    """5-point solver finds the true essential matrix among its candidate
    roots on clean minimal samples."""
    from kimera_multi_tpu.kernels import minimal
    rng = np.random.default_rng(9)
    hits = 0
    B = 24
    f1s, f2s, Es = [], [], []
    for _ in range(B):
        w = rng.normal(0, 0.3, 3).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        t = rng.normal(0, 1, 3).astype(np.float32)
        t /= np.linalg.norm(t)
        P = rng.uniform(-2, 2, (5, 3)).astype(np.float32)
        P[:, 2] += 5
        f1 = P / np.linalg.norm(P, axis=1, keepdims=True)
        P2 = np.einsum("ij,kj->ki", R, P) + t
        f2 = P2 / np.linalg.norm(P2, axis=1, keepdims=True)
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]], np.float32)
        E_gt = tx @ R
        f1s.append(f1); f2s.append(f2); Es.append(E_gt / np.linalg.norm(E_gt))
    E_all, ok = minimal.essential_5pt(jnp.asarray(np.stack(f1s)),
                                      jnp.asarray(np.stack(f2s)))
    E_all = np.asarray(E_all)  # (B, S, 3, 3)
    for b in range(B):
        best = 0.0
        for s in range(E_all.shape[1]):
            Ec = E_all[b, s] / max(np.linalg.norm(E_all[b, s]), 1e-12)
            best = max(best, abs(float(np.sum(Ec * Es[b]))))
        if best > 0.999:
            hits += 1
    # multi-start polishing finds the true root in the vast majority of
    # samples; RANSAC needs only a decent per-sample hit rate
    assert hits >= 0.8 * B, hits


def test_ransac_essential_5pt_outliers():
    rng = np.random.default_rng(10)
    K = 96
    R = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.05, -0.2], jnp.float32)))
    t = np.array([0.5, 0.1, 0.2], np.float32)
    P = rng.uniform(-2, 2, size=(K, 3)).astype(np.float32)
    P[:, 2] += 5.0
    f1 = P / np.linalg.norm(P, axis=1, keepdims=True)
    P2 = np.einsum("ij,kj->ki", R, P) + t
    f2 = P2 / np.linalg.norm(P2, axis=1, keepdims=True)
    out_idx = rng.choice(K, 30, replace=False)
    g = rng.normal(size=(30, 3)).astype(np.float32)
    f2[out_idx] = g / np.linalg.norm(g, axis=1, keepdims=True)
    key = rngmod.derive(rngmod.base_key(3), rngmod.Stream.RANSAC_MONO)
    fn = jax.jit(lambda k, a, b, v: ransac.ransac_essential_5pt(
        k, a, b, v, n_hyp=64))
    out = fn(key, jnp.asarray(f1.T), jnp.asarray(f2.T), jnp.ones(K, bool))
    assert bool(out["ok"])
    got = np.asarray(out["inliers"])
    true_inl = np.ones(K, bool); true_inl[out_idx] = False
    assert got[true_inl].mean() > 0.9
    assert got[~true_inl].mean() < 0.1


def test_pair_matcher_kernel_interpret_equals_xla():
    """The Pallas pair matcher (raw-descriptor in-kernel bit unpack) must
    reproduce the XLA path's matches and distances EXACTLY: the bit-major
    unpack order is a fixed permutation of the byte-major reference
    order, and Hamming distances are permutation-invariant."""
    import numpy as np
    import jax.numpy as jnp
    from kimera_multi_tpu.kernels import hamming

    npr = np.random.default_rng(42)
    C, K = 3, 96
    dq = npr.integers(0, 256, (C, K, 32), dtype=np.uint8)
    dt = dq.copy()
    # half true matches with flipped bits, half clutter, some invalid
    flip = npr.integers(0, 32, (C, K))
    for c in range(C):
        dt[c, np.arange(K), flip[c]] ^= 3
        idx = npr.choice(K, K // 2, replace=False)
        dt[c, idx] = npr.integers(0, 256, (len(idx), 32), dtype=np.uint8)
    vq = npr.uniform(size=(C, K)) > 0.1
    vt = npr.uniform(size=(C, K)) > 0.1

    m_x, d_x = hamming.knn2_lowe_match_pairs(
        jnp.asarray(dq), jnp.asarray(vq), jnp.asarray(dt), jnp.asarray(vt))
    m_k, d_k = hamming.knn2_lowe_match_pairs(
        jnp.asarray(dq), jnp.asarray(vq), jnp.asarray(dt), jnp.asarray(vt),
        interpret=True)
    np.testing.assert_array_equal(np.asarray(m_k), np.asarray(m_x))
    np.testing.assert_array_equal(np.asarray(d_k), np.asarray(d_x))
    assert (np.asarray(m_x) >= 0).sum() > 0


def test_sample_gather_perm_kernel_matches_composition():
    """The fused permutation gather must equal data[order[picks]] exactly
    (interpret mode runs the kernel's one-hot path)."""
    import numpy as np
    import jax.numpy as jnp
    from kimera_multi_tpu.kernels import gather

    npr = np.random.default_rng(5)
    K, H, k = 96, 300, 5
    data = jnp.asarray(npr.normal(size=(3, K)).astype(np.float32))
    order = jnp.asarray(npr.permutation(K).astype(np.int32))
    inv = jnp.asarray(np.argsort(np.asarray(order)).astype(np.int32))
    picks = jnp.asarray(npr.integers(0, K, (H, k)).astype(np.int32))
    a = gather.sample_gather_perm_t(data, picks, order, inv,
                                    interpret=True)
    b = gather.sample_gather_perm_t(data, picks, order, inv)  # XLA path
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_permute_cols_kernel_matches_gather():
    import numpy as np
    import jax.numpy as jnp
    from kimera_multi_tpu.kernels import gather

    npr = np.random.default_rng(9)
    D, K = 3, 160
    data = jnp.asarray(npr.normal(size=(D, K)).astype(np.float32))
    idx = jnp.asarray(npr.integers(0, K, K).astype(np.int32))
    a = gather.permute_cols(data, idx, interpret=True)
    b = data[:, idx]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
