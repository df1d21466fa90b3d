"""Batched minimal solvers for geometric verification.

TPU-native equivalents of the opengv solvers the reference selects
(`params/D455/LcdParams.yaml:55-74`, `FrontendParams.yaml:75-88`):
  * 3d3d Arun alignment (`pose_recovery_type: 0`) — closed-form Procrustes
  * 3d3d 1-point with known rotation (`ransac_use_1point_3d3d: 1`)
  * 2d2d essential matrix — the reference uses 5-pt Stewenius/Nister;
    v1 ships the SVD-free normalized 8-point solver (fully batched,
    TPU-friendly) with angular Sampson scoring. Exact 5-pt parity is a
    planned follow-up (degree-10 polynomial via Sturm bisection) —
    SURVEY.md section 7.4 "bit-equal inlier sets".

All solvers are closed-form, branchless, and vmap over a hypothesis axis.
Inputs use fixed-capacity correspondence arrays with validity masks.
"""

from __future__ import annotations

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
