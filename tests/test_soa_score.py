"""SoA minimal solvers and fused scoring kernels vs the AoS references."""

import jax
import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import lie, rng as rngmod
from kimera_multi_tpu.kernels import linalg, minimal, ransac, score, soa


def _rand_spd3(rng, B):
    M = rng.normal(size=(B, 3, 3)).astype(np.float32)
    return np.einsum("bij,bkj->bik", M, M) + 0.1 * np.eye(3, dtype=np.float32)


def test_soa_eigh3x3_matches_aos():
    rng = np.random.default_rng(0)
    A = _rand_spd3(rng, 256)
    evals_ref, V_ref = linalg.eigh3x3(jnp.asarray(A))
    evals_soa, V_soa = soa.eigh3x3(soa.unstack_mat3(jnp.asarray(A)))
    np.testing.assert_allclose(np.stack([np.asarray(e) for e in evals_soa],
                                        axis=-1),
                               np.asarray(evals_ref), rtol=1e-4, atol=1e-4)
    # columns agree (same algorithm -> same signs)
    V_soa_m = np.stack([np.stack([np.asarray(c) for c in col], axis=-1)
                        for col in V_soa], axis=-1)
    np.testing.assert_allclose(V_soa_m, np.asarray(V_ref), atol=1e-3)


def test_soa_arun3_matches_aos():
    rng = np.random.default_rng(1)
    B = 512
    ps = rng.uniform(-3, 3, (B, 3, 3)).astype(np.float32)
    w = rng.normal(0, 0.5, (B, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_gt = rng.uniform(-2, 2, (B, 3)).astype(np.float32)
    qs = np.einsum("bij,bkj->bki", R_gt, ps) + t_gt[:, None, :]

    R_ref, t_ref, ok_ref = minimal.arun_3d3d(jnp.asarray(ps), jnp.asarray(qs))
    ps_l = [[jnp.asarray(ps[:, k, i]) for i in range(3)] for k in range(3)]
    qs_l = [[jnp.asarray(qs[:, k, i]) for i in range(3)] for k in range(3)]
    R_l, t_l, ok_soa = soa.arun3(ps_l, qs_l)
    R_soa = np.asarray(soa.stack_mat3(R_l))
    t_soa = np.asarray(soa.stack_vec(t_l))

    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_soa))
    # near-collinear minimal samples are ill-conditioned: both paths emit
    # (differing) garbage there and RANSAC scoring discards them. Compare
    # only well-conditioned samples (sigma2/sigma1 of the covariance H).
    pc = ps - ps.mean(axis=1, keepdims=True)
    qc = qs - qs.mean(axis=1, keepdims=True)
    H = np.einsum("bki,bkj->bij", pc, qc) / 3.0
    s = np.linalg.svd(H, compute_uv=False)
    m = np.asarray(ok_ref) & (s[:, 1] > 5e-2 * s[:, 0])
    assert m.sum() > 300
    # same analytic algorithm, different accumulation order; the rank-2
    # Procrustes eigenproblem amplifies fp differences on marginally
    # conditioned samples (the consensus refit downstream restores full
    # accuracy; RANSAC scoring discards bad hypotheses either way)
    np.testing.assert_allclose(R_soa[m], np.asarray(R_ref)[m], atol=2e-2)
    np.testing.assert_allclose(t_soa[m], np.asarray(t_ref)[m], atol=5e-2)
    # and both recover ground truth
    np.testing.assert_allclose(R_soa[m], R_gt[m], atol=2e-2)


def test_soa_essential8_matches_aos():
    rng = np.random.default_rng(2)
    B = 256
    P = rng.uniform(-2, 2, (B, 8, 3)).astype(np.float32)
    P[..., 2] += 6.0
    w = rng.normal(0, 0.3, (B, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
    t /= np.maximum(np.linalg.norm(t, axis=-1, keepdims=True), 1e-6)
    P2 = np.einsum("bij,bkj->bki", R, P) + t[:, None, :]
    f1 = P / np.linalg.norm(P, axis=-1, keepdims=True)
    f2 = P2 / np.linalg.norm(P2, axis=-1, keepdims=True)

    E_ref, ok_ref = minimal.essential_8pt(jnp.asarray(f1), jnp.asarray(f2))
    f1_l = [[jnp.asarray(f1[:, k, i]) for i in range(3)] for k in range(8)]
    f2_l = [[jnp.asarray(f2[:, k, i]) for i in range(3)] for k in range(8)]
    E_l, ok_soa = soa.essential8(f1_l, f2_l)
    E_soa = np.asarray(soa.stack_mat3(E_l))

    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_soa))
    m = np.asarray(ok_ref)
    # essential matrices are scale/sign free; same algorithm -> same scale,
    # compare up to per-sample sign. The f32 inverse-iteration nullspace is
    # accuracy-limited on poorly conditioned 8-point configurations (either
    # implementation may land closer), so assert bulk agreement, not tails.
    Er = np.asarray(E_ref)[m]
    Es = E_soa[m]
    sign = np.sign(np.sum(Er * Es, axis=(1, 2)))[:, None, None]
    diff = np.abs(Es * sign - Er).max(axis=(1, 2))
    assert np.median(diff) < 5e-3
    assert np.mean(diff < 2e-2) > 0.7
    # and both align with the ground-truth essential matrix [t]x R for
    # nearly all samples (|<E_gt_unit, E>| = sqrt(2) when exact)
    Egt = np.cross(np.eye(3)[None], t[m][:, None, :], axis=-1) @ R[m]
    Egt /= np.linalg.norm(Egt, axis=(1, 2), keepdims=True)
    a_ref = np.abs(np.einsum("bij,bij->b", Egt, Er)) / np.sqrt(2)
    a_soa = np.abs(np.einsum("bij,bij->b", Egt, Es)) / np.sqrt(2)
    assert np.mean(a_ref > 0.98) > 0.85
    assert np.mean(a_soa > 0.98) > 0.85


def test_score_kernels_match_reference_interpret():
    """Pallas kernels (interpret mode on CPU) vs the XLA reference path."""
    rng = np.random.default_rng(3)
    H, K = 192, 176  # deliberately not multiples of the 128-hypothesis tile
    w = rng.normal(0, 0.5, (H, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = rng.uniform(-1, 1, (H, 3)).astype(np.float32)
    p = rng.uniform(-4, 4, (K, 3)).astype(np.float32)
    q = np.einsum("ij,kj->ki", R[0], p) + t[0] \
        + rng.normal(0, 0.2, (K, 3)).astype(np.float32)
    valid = rng.uniform(size=K) < 0.8

    ref = score.rigid_counts_ref(jnp.asarray(R), jnp.asarray(t),
                                 jnp.asarray(p.T), jnp.asarray(q.T),
                                 jnp.asarray(valid), 0.3)
    got = score.rigid_counts(jnp.asarray(R), jnp.asarray(t),
                             jnp.asarray(p.T), jnp.asarray(q.T),
                             jnp.asarray(valid), 0.3,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    E = rng.normal(size=(H, 3, 3)).astype(np.float32)
    E /= np.linalg.norm(E, axis=(1, 2), keepdims=True)
    f1 = rng.normal(size=(K, 3)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    f2 = rng.normal(size=(K, 3)).astype(np.float32)
    f2 /= np.linalg.norm(f2, axis=-1, keepdims=True)
    thr = 1e-3
    ref_e = score.essential_counts_ref(jnp.asarray(E), jnp.asarray(f1.T),
                                       jnp.asarray(f2.T),
                                       jnp.asarray(valid), thr)
    got_e = score.essential_counts(jnp.asarray(E), jnp.asarray(f1.T),
                                   jnp.asarray(f2.T), jnp.asarray(valid),
                                   thr, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_e), np.asarray(got_e))


def test_ransac_results_unchanged_by_rewire():
    """End-to-end ransac_arun still recovers a clean transform and stays
    deterministic after the SoA + fused-scoring rewire."""
    rng = np.random.default_rng(7)
    K = 160
    w_gt = np.array([0.2, -0.3, 0.1], np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w_gt)))
    t_gt = np.array([0.5, 1.0, -0.8], np.float32)
    p = rng.uniform(-5, 5, (K, 3)).astype(np.float32)
    q = np.einsum("ij,kj->ki", R_gt, p) + t_gt
    q += rng.normal(0, 0.01, (K, 3)).astype(np.float32)
    out_idx = rng.choice(K, 50, replace=False)
    q[out_idx] += rng.uniform(2, 8, (50, 3)).astype(np.float32)
    valid = np.ones(K, bool)
    key = rngmod.derive(rngmod.base_key(3), rngmod.Stream.RANSAC_STEREO)
    fn = jax.jit(lambda k, a, b, v: ransac.ransac_arun(k, a, b, v))
    out = fn(key, jnp.asarray(p.T), jnp.asarray(q.T), jnp.asarray(valid))
    assert bool(out["ok"])
    np.testing.assert_allclose(np.asarray(out["R"]), R_gt, atol=0.02)
    out2 = fn(key, jnp.asarray(p.T), jnp.asarray(q.T), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(out["inliers"]),
                                  np.asarray(out2["inliers"]))
