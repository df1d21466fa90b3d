"""Fused 5-pt model-generation kernel (kernels/fivept.py).

The Pallas kernel and the XLA reference path share one algebra
(nullspace Householder QR -> multi-start GN -> essential projection).
Exact bitwise equality between executions is NOT a meaningful contract
here: the polish is a root finder whose start/basin boundaries amplify
float-level differences into different (equally valid) roots — measured
divergence grows with gn_iters from ~1e-6 basis noise. What IS the
contract, and what these tests pin:

  1. layout: the two paths agree on the overwhelming majority of
     entries (a transposed/shifted layout bug would disagree everywhere);
  2. solver correctness: on clean minimal samples, (nearly) every
     hypothesis has at least one start that lands on an essential matrix
     fitting its 5 sample constraints to ~machine precision;
  3. manifold: every output is an exactly-projected essential matrix
     (singular values (s, s, 0));
  4. end-to-end: the production RANSAC recall fixture
     (tests/test_mono_5pt_parity.py) runs THIS path on CPU.
"""

import numpy as np

import jax.numpy as jnp

from kimera_multi_tpu.kernels import fivept


def _samples(H, seed=0):
    npr = np.random.default_rng(seed)
    P = npr.uniform(-3, 3, (H, 5, 3)).astype(np.float32)
    P[..., 2] = npr.uniform(3, 9, (H, 5))
    f1 = P / np.linalg.norm(P, axis=-1, keepdims=True)
    w = npr.normal(0, 0.3, 3)
    th = np.linalg.norm(w)
    k = w / max(th, 1e-12)
    Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = (np.eye(3) + np.sin(th) * Kx
         + (1 - np.cos(th)) * Kx @ Kx).astype(np.float32)
    t = np.asarray([0.5, -0.2, 0.1], np.float32)
    P2 = (P - t) @ R
    f2 = P2 / np.linalg.norm(P2, axis=-1, keepdims=True)
    return jnp.asarray(f1), jnp.asarray(f2.astype(np.float32))


def _to_soa(f):
    # (H, 5, 3) -> (15, H): row 3 j + d = coord d of sample j
    return jnp.moveaxis(f, 0, -1).reshape(15, f.shape[0])


def _epipolar_resid(E_flat, f1, f2, S):
    """max over the 5 sample points of |f2^T E f1| per model -> (H, S)."""
    H = f1.shape[0]
    E = np.asarray(E_flat).reshape(H, S, 3, 3)
    r = np.einsum("hkj,hsji,hki->hsk", np.asarray(f2), E, np.asarray(f1))
    return np.abs(r).max(-1)


def test_kernel_interpret_vs_ref_majority_and_roots():
    H, S, iters = 192, 8, 12
    f1, f2 = _samples(H)
    # layout contract at gn_iters=0 (nullspace + q0 combination +
    # projection — smooth ops, no chaotic root iteration): near-total
    # agreement; a transposed/shifted layout bug would disagree everywhere
    a0 = fivept.fivept_models(_to_soa(f1), _to_soa(f2), n_starts=S,
                              gn_iters=0, interpret=True)
    b0 = fivept._fivept_models_ref(_to_soa(f1), _to_soa(f2), S, 0)
    d0 = np.abs(np.asarray(a0) - np.asarray(b0))
    assert (d0 < 1e-3).mean() > 0.98, (d0 < 1e-3).mean()

    a = fivept.fivept_models(_to_soa(f1), _to_soa(f2), n_starts=S,
                             gn_iters=iters, interpret=True)
    b = fivept._fivept_models_ref(_to_soa(f1), _to_soa(f2), S, iters)

    # solver contract, for BOTH paths: nearly every hypothesis has a
    # start whose converged model fits its clean minimal sample
    for E_rows in (a, b):
        E_flat = fivept.models_to_flat(E_rows, S)
        resid = _epipolar_resid(E_flat, f1, f2, S)  # (H, S)
        best = resid.min(axis=1)
        assert (best < 5e-4).mean() > 0.95, (best < 5e-4).mean()


def test_outputs_are_essential_matrices():
    H, S, iters = 64, 8, 8
    f1, f2 = _samples(H, seed=7)
    E_rows = fivept.fivept_models(_to_soa(f1), _to_soa(f2), n_starts=S,
                                  gn_iters=iters, interpret=True)
    E = np.asarray(fivept.models_to_flat(E_rows, S)).reshape(-1, 3, 3)
    s = np.linalg.svd(E, compute_uv=False)
    np.testing.assert_allclose(s[:, 0], s[:, 1], atol=1e-4)
    np.testing.assert_allclose(s[:, 2], 0.0, atol=1e-4)


def test_models_to_flat_layout():
    S, H = 2, 3
    rows = jnp.arange(9 * S * H, dtype=jnp.float32).reshape(9 * S, H)
    flat = fivept.models_to_flat(rows, S)
    assert flat.shape == (H * S, 3, 3)
    # row e*S+s, col h  ->  flat[h*S+s, e//3, e%3]
    for h in range(H):
        for s in range(S):
            for e in range(9):
                assert float(flat[h * S + s, e // 3, e % 3]) == float(
                    rows[e * S + s, h])


def test_presel_counts_kernel_matches_ref():
    """Inlier counting is exact arithmetic (no root chaos): the kernel
    must agree with the reference scoring bit-for-bit."""
    import jax

    H, S, P = 192, 8, 64
    npr = np.random.default_rng(11)
    E_rows = jnp.asarray(npr.normal(size=(9 * S, H)).astype(np.float32))
    f1 = jnp.asarray(npr.normal(size=(3, P)).astype(np.float32))
    f2 = jnp.asarray(npr.normal(size=(3, P)).astype(np.float32))
    valid = jnp.asarray(npr.uniform(size=P) > 0.2)
    thr = 3e-2
    a = fivept.presel_counts(E_rows, f1, f2, valid, thr, S, interpret=True)
    from kimera_multi_tpu.kernels import score

    flat = fivept.models_to_flat(E_rows, S)
    b = score.essential_counts_ref(flat, f1, f2, valid, thr).reshape(H, S)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(a).sum()) > 0  # the threshold actually fires


def test_select_models_layout():
    """select_models keeps each hypothesis's best start and returns the
    matching models + flat indices."""
    H, S = 16, 4
    npr = np.random.default_rng(3)
    E_rows = jnp.asarray(npr.normal(size=(9 * S, H)).astype(np.float32))
    counts = jnp.asarray(npr.integers(0, 50, (H, S)).astype(np.int32))
    E_sel, flat_idx = fivept.select_models(E_rows, counts, 5, S)
    cn = np.asarray(counts)
    flat = np.asarray(fivept.models_to_flat(E_rows, S))
    best_per_h = cn.max(axis=1)
    expect_h = np.argsort(-best_per_h, kind="stable")[:5]
    for j in range(5):
        h = int(np.asarray(flat_idx)[j]) // S
        s = int(np.asarray(flat_idx)[j]) % S
        assert h == expect_h[j]
        assert cn[h, s] == cn[h].max()
        np.testing.assert_array_equal(np.asarray(E_sel)[j], flat[h * S + s])
