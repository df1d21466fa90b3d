"""Batched minimal solvers for geometric verification.

TPU-native equivalents of the opengv solvers the reference selects
(`params/D455/LcdParams.yaml:55-74`, `FrontendParams.yaml:75-88`):
  * 3d3d Arun alignment (`pose_recovery_type: 0`) — closed-form Procrustes
  * 3d3d 1-point with known rotation (`ransac_use_1point_3d3d: 1`)
  * 2d2d essential matrix — both the true five-point minimal solver
    (`essential_5pt`: nullspace + multi-start Gauss-Newton on the
    essential variety, matching the reference's Stewenius/Nister
    sample-size semantics) and the 8-point least-squares solver
    (`essential_8pt`, used for consensus refits and as a cheaper
    hypothesis generator), with angular Sampson scoring.

All solvers are closed-form, branchless, and vmap over a hypothesis axis.
Inputs use fixed-capacity correspondence arrays with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .linalg import eigh3x3, smallest_eigvec_psd, so3_procrustes

_EPS = 1e-12


# ---------------------------------------------------------------------------
# 3d3d: Arun / Procrustes (reference: geometricVerificationNister ->
# recoverPose 3d3d Arun RANSAC, images/kimera-multi.drawio:2595-2599)
# ---------------------------------------------------------------------------


def arun_3d3d(p: jnp.ndarray, q: jnp.ndarray, w: jnp.ndarray | None = None):
    """Weighted rigid alignment: find (R, t) minimizing sum w ||q - (R p + t)||^2.

    p, q: (..., k, 3); w: (..., k) nonneg weights (None = uniform).
    Returns (R (..., 3, 3), t (..., 3), ok (...,) bool) — ok False for
    degenerate (collinear) samples.
    """
    if w is None:
        w = jnp.ones(p.shape[:-1], p.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(wsum, _EPS)
    pbar = jnp.sum(p * wn[..., None], axis=-2)
    qbar = jnp.sum(q * wn[..., None], axis=-2)
    pc = p - pbar[..., None, :]
    qc = q - qbar[..., None, :]
    # H = sum w p' q'^T ; R maximizes tr(R H)
    H = jnp.einsum("...k,...ki,...kj->...ij", wn, pc, qc)
    R, ok = so3_procrustes(H)
    t = qbar - jnp.einsum("...ij,...j->...i", R, pbar)
    return R, t, ok


def translation_given_rotation(p: jnp.ndarray, q: jnp.ndarray, R: jnp.ndarray):
    """1-point (or k-point average) translation with known rotation
    (reference: ransac_use_1point_3d3d with IMU-given rotation,
    drawio:1787-1846). p, q: (..., k, 3); R: (..., 3, 3)."""
    return jnp.mean(q - jnp.einsum("...ij,...kj->...ki", R, p), axis=-2)


# ---------------------------------------------------------------------------
# 2d2d: essential matrix from bearing vectors
# ---------------------------------------------------------------------------


def essential_8pt(f1: jnp.ndarray, f2: jnp.ndarray, w: jnp.ndarray | None = None):
    """Essential matrix from >= 8 bearing-vector correspondences.

    f1, f2: (..., k, 3) unit bearing vectors in the two camera frames, with
    the epipolar constraint f2^T E f1 = 0. Solves the least-squares
    nullspace of the (k, 9) design matrix via analytic eigh of the 9x9
    normal matrix (power-free: we take the smallest eigenvector through
    inverse shifting — implemented as full Jacobi-free closed form is not
    available for 9x9, so we use XLA's eigh which batches acceptably for
    the hypothesis counts involved), then projects to the essential
    manifold (singular values (s, s, 0)).

    Returns (E (..., 3, 3), ok (...,)).
    """
    if w is None:
        w = jnp.ones(f1.shape[:-1], f1.dtype)
    # design rows: kron(f1, f2) ordered so that A @ vec(E) = f2^T E f1
    # (f2^T E f1) = sum_ij f2_i E_ij f1_j -> row = outer(f2, f1).ravel()
    rows = (f2[..., :, :, None] * f1[..., :, None, :]).reshape(
        *f1.shape[:-2], f1.shape[-2], 9
    )
    Wr = rows * w[..., None]
    N = jnp.einsum("...ki,...kj->...ij", Wr, rows)  # (..., 9, 9) PSD
    # smallest eigenvector via complement power iteration — XLA's 9x9 eigh
    # custom call dominates RANSAC runtime on TPU otherwise
    e = smallest_eigvec_psd(N)
    E = e.reshape(*e.shape[:-1], 3, 3)
    # project to essential manifold: E <- U diag(1, 1, 0) V^T (scale-free)
    A = jnp.swapaxes(E, -1, -2) @ E
    s2, V = eigh3x3(A)  # descending
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    v1, v2 = V[..., :, 0], V[..., :, 1]
    u1 = _unit(jnp.einsum("...ij,...j->...i", E, v1))
    u2r = jnp.einsum("...ij,...j->...i", E, v2)
    u2 = _unit(u2r - jnp.sum(u2r * u1, axis=-1, keepdims=True) * u1)
    Eproj = u1[..., :, None] * v1[..., None, :] + u2[..., :, None] * v2[..., None, :]
    ok = s[..., 1] > 1e-6 * jnp.maximum(s[..., 0], _EPS)
    return Eproj, ok


def _unit(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), _EPS)


# ---------------------------------------------------------------------------
# 2d2d: five-point minimal solver (reference `ransac_2d2d_algorithm: 0
# Stewenius` for LCD / `1 Nister` for the frontend,
# params/D455/LcdParams.yaml:73, FrontendParams.yaml:78)
# ---------------------------------------------------------------------------

# deterministic multi-start directions on S^3 (coefficients of the
# nullspace combination); chosen to spread over the sphere
_FIVEPT_STARTS = jnp.asarray(
    [
        [1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1],
        [1, 1, 1, 1], [1, -1, 1, -1], [1, 1, -1, -1], [1, -1, -1, 1],
        [2, 1, 0, -1], [-1, 2, 1, 0], [0, -1, 2, 1], [1, 0, -1, 2],
        [1, 2, -2, 1], [-2, 1, 1, 2], [1, -2, 1, 2], [2, 2, 1, -1],
    ],
    jnp.float32,
)
_FIVEPT_STARTS = _FIVEPT_STARTS / jnp.linalg.norm(
    _FIVEPT_STARTS, axis=1, keepdims=True)


def _essential_constraints(E: jnp.ndarray) -> jnp.ndarray:
    """The 10 polynomial constraints of an essential matrix: det(E) = 0
    and 2 E E^T E - tr(E E^T) E = 0. E (..., 3, 3) -> (..., 10)."""
    EEt = E @ jnp.swapaxes(E, -1, -2)
    tr = EEt[..., 0, 0] + EEt[..., 1, 1] + EEt[..., 2, 2]
    C = 2.0 * EEt @ E - tr[..., None, None] * E
    d = jnp.linalg.det(E)
    return jnp.concatenate(
        [d[..., None], C.reshape(*C.shape[:-2], 9)], axis=-1)


def essential_5pt(f1: jnp.ndarray, f2: jnp.ndarray, n_starts: int = 16,
                  gn_iters: int = 20):
    """Five-point essential matrix solver, TPU-native.

    Role of opengv's Nister/Stewenius 5-pt (the reference's configured
    minimal solver). Same algebra: the 4-dimensional nullspace of the
    5-correspondence epipolar design is intersected with the essential
    variety (det + trace constraints). Deviation (documented,
    COMPONENTS.md): instead of Nister's degree-10 polynomial elimination
    (serial root finding), the cubic system is solved by multi-start
    Gauss-Newton on S^3 — `n_starts` deterministic starts polished in
    parallel, each landing on one of the <= 10 real roots; all candidates
    are returned and RANSAC scoring picks the best, exactly as Nister's
    multiple roots are all scored by opengv.

    The polish runs in lane-major SoA form with an analytic Jacobian
    (soa.essential5_polish_soa): the earlier AoS + per-direction-jvp
    version spent ~99% of verification time in tiny-op launch overhead
    (measured 1.38 s per 16k models on TPU vs ~12 ms to score all of
    them). GN on the constraint system converges quadratically;
    `gn_iters`=20 with 16 starts finds MORE true roots than the old
    40-iteration 8-start version (23/24 vs 21/24 on the minimal-sample
    fixture) at a fraction of the cost — extra starts are nearly free in
    SoA (one more lane batch), extra iterations are not.

    f1, f2: (..., 5, 3) unit bearings. Returns (E (..., n_starts, 3, 3),
    ok (...,)).
    """
    from . import soa
    from .linalg import nullspace_qr

    # nullspace basis: exact orthonormal complement of the 5 design rows
    # via unrolled Householder QR (replaced 4 smallest eigvecs of the 9x9
    # normal matrix by inverse iteration — same subspace for full-rank
    # samples, exact instead of iterative, and the 9x9 Cholesky was the
    # largest single slice of the mono stage on TPU)
    rows = (f2[..., :, :, None] * f1[..., :, None, :]).reshape(
        *f1.shape[:-2], f1.shape[-2], 9)
    basis = nullspace_qr(rows)  # (..., 9, 4)
    ok = jnp.ones(rows.shape[:-2], bool)

    # SoA: basis entries (..., 1) broadcast against the start axis in q
    B9 = [[basis[..., i, s][..., None] for i in range(9)]
          for s in range(4)]
    starts = _FIVEPT_STARTS[:n_starts]  # (S, 4)
    batch = f1.shape[:-2]
    q0 = [jnp.broadcast_to(starts[:, s], batch + (n_starts,))
          for s in range(4)]

    q = soa.essential5_polish_soa(B9, q0, n_iters=gn_iters)
    E9 = [q[0] * B9[0][i] + q[1] * B9[1][i] + q[2] * B9[2][i]
          + q[3] * B9[3][i] for i in range(9)]
    Eproj, _okp = soa.project_essential_soa(E9)
    # (..., S) entries -> (..., S, 3, 3)
    E_all = jnp.stack(
        [jnp.stack([Eproj[i][j] for j in range(3)], axis=-1)
         for i in range(3)], axis=-2)
    return E_all, ok


def _project_essential(E: jnp.ndarray):
    """Project (..., 3, 3) onto the essential manifold (two equal singular
    values, one zero) using the analytic primitives."""
    A = jnp.swapaxes(E, -1, -2) @ E
    s2, V = eigh3x3(A)
    s = jnp.sqrt(jnp.maximum(s2, 0.0))
    v1, v2 = V[..., :, 0], V[..., :, 1]
    u1 = _unit(jnp.einsum("...ij,...j->...i", E, v1))
    u2r = jnp.einsum("...ij,...j->...i", E, v2)
    u2 = _unit(u2r - jnp.sum(u2r * u1, axis=-1, keepdims=True) * u1)
    Ep = u1[..., :, None] * v1[..., None, :] + u2[..., :, None] * v2[..., None, :]
    ok = s[..., 1] > 1e-6 * jnp.maximum(s[..., 0], _EPS)
    return Ep, ok


# ---------------------------------------------------------------------------
# 2d3d: EPnP (reference `ransac_2d3d_algorithm: 3  # EPNP`,
# params/D455/LcdParams.yaml:74, FrontendParams.yaml pnp_algorithm)
# ---------------------------------------------------------------------------


def epnp(
    X: jnp.ndarray,  # (..., k, 3) world points
    f: jnp.ndarray,  # (..., k, 3) unit bearings in camera frame
    w: jnp.ndarray | None = None,
):
    """EPnP pose estimation (camera pose from 2d-3d correspondences).

    Lepetit-style: 4 control points (centroid + scaled principal axes of
    the world points), barycentric coordinates, the (2k, 12) design
    system's smallest singular vector (beta-1 case), scale/sign fix from
    cheirality + rigidity, then Procrustes onto the world control points.
    All steps reuse the analytic/unrolled primitives (no XLA eig custom
    calls). Returns (R, t, ok) with x_cam = R x_world + t.
    """
    from .linalg import smallest_eigvec_psd

    if w is None:
        w = jnp.ones(X.shape[:-1], X.dtype)
    wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), _EPS)
    # control points: centroid + principal axes
    c0 = jnp.sum(X * wn[..., None], axis=-2)
    Xc = X - c0[..., None, :]
    cov = jnp.einsum("...k,...ki,...kj->...ij", wn, Xc, Xc)
    evals, V = eigh3x3(cov)
    s = jnp.sqrt(jnp.maximum(evals, 1e-10))
    ctrl = jnp.concatenate(
        [c0[..., None, :],
         c0[..., None, :] + jnp.swapaxes(V, -1, -2) * s[..., :, None]],
        axis=-2)  # (..., 4, 3): c0, c0+s1*v1, c0+s2*v2, c0+s3*v3
    # barycentric coords: X = alphas @ ctrl with sum(alphas) = 1
    # alpha_{1..3} solve V diag(s) a = (X - c0) -> a = diag(1/s) V^T (X-c0)
    a123 = jnp.einsum("...ij,...kj->...ki", jnp.swapaxes(V, -1, -2), Xc) \
        / s[..., None, :]
    a0 = 1.0 - jnp.sum(a123, axis=-1, keepdims=True)
    alphas = jnp.concatenate([a0, a123], axis=-1)  # (..., k, 4)

    # design: for each correspondence, the camera point sum_j a_j C^c_j is
    # parallel to bearing f => two independent cross-product rows; use all
    # 3 rows of [f]x (rank 2) for simplicity.
    Fx = jnp.stack([
        jnp.zeros_like(f[..., 0]), -f[..., 2], f[..., 1],
        f[..., 2], jnp.zeros_like(f[..., 0]), -f[..., 0],
        -f[..., 1], f[..., 0], jnp.zeros_like(f[..., 0]),
    ], axis=-1).reshape(*f.shape[:-1], 3, 3)
    # rows[..., k, row, ctrl, coord] = Fx[..., k, row, coord] * alpha_ctrl
    rows = Fx[..., :, :, None, :] * alphas[..., :, None, :, None]
    M = rows.reshape(*f.shape[:-2], f.shape[-2] * 3, 12)
    Mw = M * jnp.repeat(jnp.sqrt(jnp.maximum(w, 0.0)), 3, axis=-1)[..., None]
    N = jnp.einsum("...ki,...kj->...ij", Mw, Mw)
    v = smallest_eigvec_psd(N)  # (..., 12) = stacked camera control points
    Cc = v.reshape(*v.shape[:-1], 4, 3)
    # scale: match inter-control-point distances to world ones
    dw = ctrl[..., 1:, :] - ctrl[..., :1, :]
    dc = Cc[..., 1:, :] - Cc[..., :1, :]
    num = jnp.sum(jnp.linalg.norm(dw, axis=-1), axis=-1)
    den = jnp.sum(jnp.linalg.norm(dc, axis=-1), axis=-1)
    beta = num / jnp.maximum(den, _EPS)
    Cc = Cc * beta[..., None, None]
    # cheirality: camera points must be in front (positive mean depth
    # along bearings)
    pts_c = jnp.einsum("...kj,...ji->...ki", alphas, Cc)
    depth_sign = jnp.sign(jnp.sum(jnp.sum(pts_c * f, axis=-1), axis=-1))
    Cc = Cc * jnp.where(depth_sign == 0, 1.0, depth_sign)[..., None, None]
    # Procrustes: find (R, t): Cc ~ R ctrl + t
    cw_bar = jnp.mean(ctrl, axis=-2)
    cc_bar = jnp.mean(Cc, axis=-2)
    H = jnp.einsum("...ki,...kj->...ij", ctrl - cw_bar[..., None, :],
                   Cc - cc_bar[..., None, :])
    R, okp = so3_procrustes(H)
    t = cc_bar - jnp.einsum("...ij,...j->...i", R, cw_bar)
    ok = okp & (jnp.abs(den) > 1e-9)
    return R, t, ok


def bearing_reprojection_error(R, t, X, f):
    """Squared angular reprojection error (1 - cos^2-style cross product)
    of world points X against observed bearings f under x_c = R X + t."""
    pc = jnp.einsum("...ij,...kj->...ki", R, X) + t[..., None, :]
    pc = _unit(pc)
    c = jnp.cross(pc, f)
    return jnp.sum(c * c, axis=-1)


def arun_3d3d_soa(p3: jnp.ndarray, q3: jnp.ndarray, w: jnp.ndarray):
    """Weighted rigid alignment on coordinate-major point sets.

    p3, q3: (3, K) SoA; w: (K,) nonneg weights. Same algebra as
    `arun_3d3d` (the AoS form) without ever materializing a (K, 3)
    array — a trailing dim of 3 pads to a 128-lane tile on TPU (42x
    physical HBM), which made AoS refits a measured staging cost of the
    verification batch. Returns (R (3, 3), t (3,), ok)."""
    wsum = jnp.maximum(jnp.sum(w), _EPS)
    wn = w / wsum  # (K,)
    pbar = jnp.sum(p3 * wn[None, :], axis=1)  # (3,)
    qbar = jnp.sum(q3 * wn[None, :], axis=1)
    pc = p3 - pbar[:, None]
    qc = q3 - qbar[:, None]
    H = jnp.einsum("k,ik,jk->ij", wn, pc, qc)
    from .linalg import so3_procrustes

    R, ok = so3_procrustes(H)
    t = qbar - R @ pbar
    return R, t, ok


def essential_8pt_soa(f1: jnp.ndarray, f2: jnp.ndarray,
                      w: jnp.ndarray | None = None):
    """Weighted 8-point least-squares essential refit on SoA bearings.

    f1, f2: (3, K); w: (K,). Same algebra as `essential_8pt`: the
    (K, 9) design rows are row_k = outer(f2_k, f1_k).ravel(), formed
    here as a (9, K) SoA stack; N = rows W rows^T is a 9x9 normal
    matrix. Returns (E (3, 3), ok)."""
    K = f1.shape[1]
    if w is None:
        w = jnp.ones((K,), f1.dtype)
    rows = (f2[:, None, :] * f1[None, :, :]).reshape(9, K)
    N = jnp.einsum("ik,jk,k->ij", rows, rows, w)
    e = smallest_eigvec_psd(N)
    E = e.reshape(3, 3)
    Eproj, ok = _project_essential(E)
    return Eproj, ok


def sampson_error_soa(E: jnp.ndarray, f1: jnp.ndarray,
                      f2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson error on SoA bearings: E (..., 3, 3);
    f1, f2: (3, K). Returns (..., K). Identical math to
    `sampson_error` on transposed inputs."""
    Ef1 = jnp.einsum("...ij,jk->...ik", E, f1)   # (..., 3, K)
    Etf2 = jnp.einsum("...ji,jk->...ik", E, f2)
    num = jnp.sum(f2 * Ef1, axis=-2)
    den = (Ef1[..., 0, :] ** 2 + Ef1[..., 1, :] ** 2
           + Etf2[..., 0, :] ** 2 + Etf2[..., 1, :] ** 2)
    return (num * num) / jnp.maximum(den, _EPS)


def sampson_error(E: jnp.ndarray, f1: jnp.ndarray, f2: jnp.ndarray) -> jnp.ndarray:
    """First-order epipolar (Sampson) error for bearing vectors.

    E: (..., 3, 3); f1, f2: (..., k, 3). Returns (..., k) squared error.
    Matches opengv's reprojection-style scoring regime; the reference
    threshold `ransac_threshold_2d2d: 1e-06` applies to this quantity.
    """
    Ef1 = jnp.einsum("...ij,...kj->...ki", E, f1)
    Etf2 = jnp.einsum("...ji,...kj->...ki", E, f2)
    num = jnp.sum(f2 * Ef1, axis=-1)
    den = (
        Ef1[..., 0] ** 2
        + Ef1[..., 1] ** 2
        + Etf2[..., 0] ** 2
        + Etf2[..., 1] ** 2
    )
    return (num * num) / jnp.maximum(den, _EPS)
