"""Analytic batched small-matrix linear algebra.

RANSAC hypothesis solving needs thousands of tiny (3x3) eigen/SVD problems
per candidate. XLA's generic `linalg.svd`/`eigh` lower to iterative custom
calls that serialize poorly on TPU; these closed-form versions are pure VPU
elementwise math, fully vmappable, branchless — the speed-of-light path for
the batched minimal solvers (role of Eigen's small-matrix solvers inside
opengv, SURVEY.md section 2.1 `opengv` row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular as _solve_triangular

_EPS = 1e-12


def eigh3x3(A: jnp.ndarray):
    """Analytic eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns (eigvals (..., 3) DESCENDING, eigvecs (..., 3, 3) columns).
    Eberly's trigonometric method for values; eigenvectors via the
    largest cross-product of rows of (A - lambda I), with degeneracy
    fallbacks selected branchlessly.
    """
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22) / 6.0 + (
        a01 * a01 + a02 * a02 + a12 * a12
    ) / 3.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    # det(B)/ (2 p^3)
    detB = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(detB / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues in descending order
    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3
    evals = jnp.stack([e1, e2, e3], axis=-1)

    v1 = _eigvec(A, e1)
    v3_raw = _eigvec(A, e3)
    # Orthogonalize v3 against v1 (exact for distinct eigenvalues; rescues
    # near-degenerate cases), v2 = v3 x v1.
    v3 = v3_raw - jnp.sum(v3_raw * v1, axis=-1, keepdims=True) * v1
    n3 = jnp.linalg.norm(v3, axis=-1, keepdims=True)
    # Degenerate (e1 ~ e3 ~ isotropic): any orthonormal frame works.
    v3_fb = _any_orthogonal(v1)
    v3 = jnp.where(n3 > 1e-6, v3 / jnp.maximum(n3, _EPS), v3_fb)
    v2 = jnp.cross(v3, v1)
    V = jnp.stack([v1, v2, v3], axis=-1)  # columns
    return evals, V


def _eigvec(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of symmetric 3x3 for eigenvalue lam: the largest cross
    product of two rows of (A - lam I) is orthogonal to both -> eigvec.

    Selection is branchless `where` arithmetic — argmax + take_along_axis
    gathers dominate the whole RANSAC pipeline on TPU otherwise."""
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    use01 = (n01 >= n02) & (n01 >= n12)
    use02 = (~use01) & (n02 >= n12)
    v = jnp.where(use01, c01, jnp.where(use02, c02, c12))
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    # Rank-deficient M (repeated eigenvalue): fall back to any unit vector
    # orthogonal to the largest row of M.
    l0 = jnp.sum(r0 * r0, axis=-1, keepdims=True)
    l1 = jnp.sum(r1 * r1, axis=-1, keepdims=True)
    l2 = jnp.sum(r2 * r2, axis=-1, keepdims=True)
    r01 = (l0 >= l1) & (l0 >= l2)
    r02 = (~r01) & (l1 >= l2)
    big_row = jnp.where(r01, r0, jnp.where(r02, r1, r2))
    fb = _any_orthogonal(_safe_unit(big_row))
    return jnp.where(n > 1e-9, v / jnp.maximum(n, _EPS), fb)


def _safe_unit(v: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    e0 = jnp.zeros_like(v).at[..., 0].set(1.0)
    return jnp.where(n > 1e-9, v / jnp.maximum(n, _EPS), e0)


def _any_orthogonal(u: jnp.ndarray) -> jnp.ndarray:
    """A unit vector orthogonal to unit vector u, branchless (no gathers)."""
    ax = jnp.abs(u[..., 0:1])
    ay = jnp.abs(u[..., 1:2])
    az = jnp.abs(u[..., 2:3])
    use_x = (ax <= ay) & (ax <= az)
    use_y = (~use_x) & (ay <= az)
    ex = jnp.zeros_like(u).at[..., 0].set(1.0)
    ey = jnp.zeros_like(u).at[..., 1].set(1.0)
    ez = jnp.zeros_like(u).at[..., 2].set(1.0)
    e = jnp.where(use_x, ex, jnp.where(use_y, ey, ez))
    v = jnp.cross(u, e)
    return _safe_unit(v)


def so3_procrustes(H: jnp.ndarray):
    """R* = argmax_{R in SO(3)} tr(R H) for (..., 3, 3) H — the rotation
    step of Arun's 3d-3d alignment, closed form.

    Uses H = U S V^T via eigh(H^T H); completes rank-2 H (always the case
    for 3-point minimal sets: centered points are coplanar) with cross
    products, which also enforces det(R) = +1 without branching.

    Returns (R, ok) where ok is False when rank(H) < 2 (degenerate sample:
    collinear points — the hypothesis must be masked out).
    """
    A = jnp.swapaxes(H, -1, -2) @ H
    evals, V = eigh3x3(A)
    s = jnp.sqrt(jnp.maximum(evals, 0.0))  # singular values, descending
    v1, v2 = V[..., :, 0], V[..., :, 1]
    u1 = _safe_unit(jnp.einsum("...ij,...j->...i", H, v1))
    u2_raw = jnp.einsum("...ij,...j->...i", H, v2)
    # re-orthogonalize u2 against u1 for numerical safety
    u2 = _safe_unit(u2_raw - jnp.sum(u2_raw * u1, axis=-1, keepdims=True) * u1)
    u3 = jnp.cross(u1, u2)
    v3 = jnp.cross(v1, v2)
    U = jnp.stack([u1, u2, u3], axis=-1)
    Vp = jnp.stack([v1, v2, v3], axis=-1)
    # tr(R H) maximized by R = U V^T in the H = U S V^T convention:
    # tr(R H)=tr(R U S V^T) -> R = V U^T? Convention check in tests; we
    # return R such that R maximizes tr(R H):
    R = Vp @ jnp.swapaxes(U, -1, -2)
    ok = s[..., 1] > 1e-7 * jnp.maximum(s[..., 0], 1.0)
    return R, ok


def nullspace_qr(rows: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Orthonormal basis of the right nullspace of a batched short-fat
    design matrix rows (..., k, n), k < n, via k unrolled Householder
    reflections — exact for full-row-rank inputs (the generic case for
    minimal samples), unlike shifted inverse iteration which only
    approaches the subspace. Returns (..., n, n - k).

    Cost is k reflections + (n - k) back-applications of small batched
    elementwise/reduce ops; replaced the 9x9 Cholesky inverse-iteration
    path in the 5-pt solver, which was the largest single slice of the
    mono verification stage on TPU (14 of 39 ms at the bench shape)."""
    k, n = rows.shape[-2], rows.shape[-1]
    A = jnp.swapaxes(rows, -1, -2)  # (..., n, k)
    vs = []
    for j in range(k):
        x = A[..., :, j]
        mask = (jnp.arange(n) >= j).astype(x.dtype)
        xj = x * mask
        alpha = jnp.sqrt(jnp.maximum(jnp.sum(xj * xj, -1), eps))
        sign = jnp.where(x[..., j] >= 0, 1.0, -1.0)
        v = xj + (sign * alpha)[..., None] * jax.nn.one_hot(
            j, n, dtype=x.dtype)
        v = v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1), eps))[..., None]
        vs.append(v)
        coef = 2.0 * jnp.einsum("...i,...ij->...j", v, A)
        A = A - v[..., :, None] * coef[..., None, :]
    cols = []
    for j in range(k, n):
        q = jnp.broadcast_to(jax.nn.one_hot(j, n, dtype=rows.dtype),
                             rows.shape[:-2] + (n,))
        for v in reversed(vs):
            q = q - 2.0 * v * jnp.sum(v * q, -1, keepdims=True)
        cols.append(q)
    return jnp.stack(cols, axis=-1)


def cholesky_unrolled(A: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky for small static n via fully-unrolled scalar
    recurrences — compiles to branchless elementwise VPU code (no XLA
    Cholesky custom call). A: (..., n, n) SPD."""
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        dj = jnp.sqrt(jnp.maximum(s, _EPS))
        L[j][j] = dj
        inv_dj = 1.0 / dj
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_dj
    zero = jnp.zeros_like(A[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def _tri_solve_unrolled(L: jnp.ndarray, b: jnp.ndarray, lower: bool):
    """Solve L x = b (lower) or L^T x = b (upper via lower input), unrolled
    for small static n. b: (..., n)."""
    n = L.shape[-1]
    x = [None] * n
    order = range(n) if lower else range(n - 1, -1, -1)
    for i in order:
        s = b[..., i]
        if lower:
            for k in range(i):
                s = s - L[..., i, k] * x[k]
            x[i] = s / L[..., i, i]
        else:
            for k in range(i + 1, n):
                s = s - L[..., k, i] * x[k]
            x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def smallest_eigvec_psd(N: jnp.ndarray, iters: int = 4,
                        shift_scale: float = 1e-7) -> jnp.ndarray:
    """Smallest-eigenvalue eigenvector of a batched PSD matrix (..., n, n)
    via shifted inverse iteration with an unrolled Cholesky.

    XLA's generic eigh lowers to a serialized QR-iteration custom call that
    dominates RANSAC runtime on TPU for tiny (9x9) systems. Inverse
    iteration amplifies the bottom eigenvector by (lam2+shift)/(lam1+shift)
    per step — thousands of x for RANSAC normal matrices whose smallest
    eigenvalue is ~0 — so a handful of unrolled solves replace the custom
    call with pure VPU code.
    """
    n = N.shape[-1]
    tr = jnp.trace(N, axis1=-2, axis2=-1)
    shift = (shift_scale * tr / n + 1e-12)[..., None, None]
    A = N + shift * jnp.eye(n, dtype=N.dtype)
    L = cholesky_unrolled(A)
    # deterministic init biased toward the smallest diagonal entry
    d = jnp.diagonal(N, axis1=-2, axis2=-1)
    k = jnp.argmin(d, axis=-1)
    v = jax.nn.one_hot(k, n, dtype=N.dtype) + 0.1
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    for _ in range(iters):
        y = _tri_solve_unrolled(L, v, lower=True)
        v = _tri_solve_unrolled(L, y, lower=False)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)
    return v


def smallest_eigvecs_psd(N: jnp.ndarray, m: int, iters: int = 4,
                         shift_scale: float = 1e-7) -> jnp.ndarray:
    """Orthonormal basis of the m-dimensional bottom eigenspace of a
    batched PSD matrix (..., n, n): block inverse iteration with unrolled
    Cholesky solves and modified Gram-Schmidt re-orthonormalization.
    Returns (..., n, m)."""
    n = N.shape[-1]
    tr = jnp.trace(N, axis1=-2, axis2=-1)
    shift = (shift_scale * tr / n + 1e-12)[..., None, None]
    A = N + shift * jnp.eye(n, dtype=N.dtype)
    L = cholesky_unrolled(A)
    # deterministic init: unit vectors at the m smallest diagonal entries
    d = jnp.diagonal(N, axis1=-2, axis2=-1)
    order = jnp.argsort(d, axis=-1)[..., :m]  # (..., m)
    V = jax.nn.one_hot(order, n, dtype=N.dtype)  # (..., m, n)
    V = jnp.swapaxes(V, -1, -2) + 0.05  # (..., n, m)

    def mgs(V):
        cols = []
        for j in range(m):
            v = V[..., :, j]
            for c in cols:
                v = v - jnp.sum(v * c, axis=-1, keepdims=True) * c
            v = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)
            cols.append(v)
        return jnp.stack(cols, axis=-1)

    V = mgs(V)
    for _ in range(iters):
        # solve A X = V column-wise with the unrolled triangular solves
        cols = []
        for j in range(m):
            y = _tri_solve_unrolled(L, V[..., :, j], lower=True)
            cols.append(_tri_solve_unrolled(L, y, lower=False))
        V = mgs(jnp.stack(cols, axis=-1))
    return V


def polar_orthonormalize(M: jnp.ndarray) -> jnp.ndarray:
    """Closest orthonormal-column matrix to (..., r, 3): analytic polar
    factor M (M^T M)^{-1/2} via the closed-form 3x3 eigendecomposition —
    the fast path for Stiefel retraction (requires full column rank, which
    holds for retraction inputs Y + small steps)."""
    A = jnp.swapaxes(M, -1, -2) @ M
    evals, V = eigh3x3(A)
    inv_sqrt = jnp.einsum(
        "...ik,...k,...jk->...ij", V, 1.0 / jnp.sqrt(jnp.maximum(evals, 1e-12)), V
    )
    return M @ inv_sqrt



def cholesky_solve(A: jnp.ndarray, b: jnp.ndarray, damping: float = 0.0) -> jnp.ndarray:
    """Batched SPD solve: x = A^{-1} b. A (..., n, n); b (..., n) or
    (..., n, k)."""
    n = A.shape[-1]
    if damping:
        A = A + damping * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    squeeze = b.ndim == A.ndim - 1
    if squeeze:
        b = b[..., None]
    y = _solve_triangular(L, b, lower=True)
    x = _solve_triangular(jnp.swapaxes(L, -1, -2), y, lower=False)
    return x[..., 0] if squeeze else x
