"""kernels.linalg / minimal vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import lie
from kimera_multi_tpu.kernels import linalg, minimal


def test_eigh3x3_random():
    rng = np.random.default_rng(0)
    M = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = (M + M.transpose(0, 2, 1)) / 2
    evals, V = jax.jit(linalg.eigh3x3)(jnp.asarray(A))
    evals, V = np.asarray(evals), np.asarray(V)
    ref = np.linalg.eigvalsh(A)[:, ::-1]  # descending
    assert np.allclose(evals, ref, atol=1e-4)
    # A v = lambda v
    for k in range(3):
        Av = np.einsum("bij,bj->bi", A, V[:, :, k])
        lv = evals[:, k : k + 1] * V[:, :, k]
        assert np.allclose(Av, lv, atol=2e-3)
    # orthonormal columns
    VtV = np.einsum("bji,bjk->bik", V, V)
    assert np.allclose(VtV, np.eye(3), atol=1e-4)


def test_eigh3x3_degenerate():
    # repeated eigenvalues: isotropic and axis-aligned
    A = np.stack([np.eye(3), np.diag([2.0, 2.0, 1.0]), np.diag([5.0, 1.0, 1.0])])
    evals, V = linalg.eigh3x3(jnp.asarray(A, jnp.float32))
    evals, V = np.asarray(evals), np.asarray(V)
    ref = np.linalg.eigvalsh(A)[:, ::-1]
    # analytic f32 trig method: ~1e-4 relative error on repeated roots
    assert np.allclose(evals, ref, atol=2e-3)
    VtV = np.einsum("bji,bjk->bik", V, V)
    assert np.allclose(VtV, np.eye(3), atol=1e-4)


def test_so3_procrustes_oracle():
    rng = np.random.default_rng(1)
    # known rotation, coplanar points (rank-2 H, the minimal-sample case)
    w = rng.normal(size=(16, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    p = rng.normal(size=(16, 3, 3)).astype(np.float32)
    p -= p.mean(axis=1, keepdims=True)
    q = np.einsum("bij,bkj->bki", R_gt, p)
    H = np.einsum("bki,bkj->bij", p, q)
    R, ok = linalg.so3_procrustes(jnp.asarray(H))
    assert np.all(np.asarray(ok))
    assert np.allclose(np.asarray(R), R_gt, atol=1e-3)


def test_arun_3d3d_exact():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 3)).astype(np.float32)
    R_gt = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t_gt = rng.normal(size=(8, 3)).astype(np.float32)
    p = rng.normal(size=(8, 5, 3)).astype(np.float32)
    q = np.einsum("bij,bkj->bki", R_gt, p) + t_gt[:, None, :]
    R, t, ok = minimal.arun_3d3d(jnp.asarray(p), jnp.asarray(q))
    assert np.all(np.asarray(ok))
    assert np.allclose(np.asarray(R), R_gt, atol=1e-3)
    assert np.allclose(np.asarray(t), t_gt, atol=1e-3)


def test_arun_collinear_flagged():
    p = np.zeros((1, 3, 3), np.float32)
    p[0, :, 0] = [0.0, 1.0, 2.0]  # collinear along x
    q = p.copy()
    _, _, ok = minimal.arun_3d3d(jnp.asarray(p), jnp.asarray(q))
    assert not bool(np.asarray(ok)[0])


def test_essential_8pt_epipolar():
    rng = np.random.default_rng(3)
    w = rng.normal(size=3).astype(np.float32) * 0.3
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = np.array([1.0, 0.2, -0.1], np.float32)
    # synthetic bearings: points in front of both cameras
    P = rng.uniform(-1, 1, size=(24, 3)).astype(np.float32)
    P[:, 2] += 4.0
    f1 = P / np.linalg.norm(P, axis=1, keepdims=True)
    P2 = np.einsum("ij,kj->ki", R, P) + t
    f2 = P2 / np.linalg.norm(P2, axis=1, keepdims=True)
    E, ok = minimal.essential_8pt(jnp.asarray(f1)[None], jnp.asarray(f2)[None])
    assert bool(np.asarray(ok)[0])
    err = minimal.sampson_error(E, jnp.asarray(f1)[None], jnp.asarray(f2)[None])
    # f32 noise floor of the 9x9 eigh + manifold projection is ~3e-8 —
    # comfortably below the operational inlier threshold of 1e-6.
    assert float(np.asarray(err).max()) < 2e-7
    # oracle: E ~ [t]x R up to scale
    tx = np.array(
        [[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]], np.float32
    )
    E_gt = tx @ R
    E_gt /= np.linalg.norm(E_gt)
    E_est = np.array(E)[0]
    E_est /= np.linalg.norm(E_est)
    align = abs(float(np.sum(E_gt * E_est)))
    assert align > 0.999


def test_cholesky_solve():
    rng = np.random.default_rng(4)
    M = rng.normal(size=(6, 9, 9)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", M, M) + 9 * np.eye(9, dtype=np.float32)
    b = rng.normal(size=(6, 9)).astype(np.float32)
    x = linalg.cholesky_solve(jnp.asarray(A), jnp.asarray(b))
    assert np.allclose(np.einsum("bij,bj->bi", A, np.asarray(x)), b, atol=1e-2)
