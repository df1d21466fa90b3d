"""Stiefel-manifold operations for rank-lifted pose-graph optimization.

The reference's dpgo optimizes "lifted" poses on St(d, r)^n — each rotation
block is an r x d matrix with orthonormal columns (Riemannian staircase /
SE-Sync style); see SURVEY.md section 2.1 `dpgo` row and the reference's
`PGOAgent::setLiftingMatrix -> YLift` (images/kimera-multi.drawio:2313-2322).

We store a lifted pose block as Y = (..., r, d+1): columns 0..d-1 are the
lifted rotation (Stiefel point), column d is the lifted translation
(unconstrained in R^r). All ops broadcast over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def sym(M: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def stiefel_project(M: jnp.ndarray) -> jnp.ndarray:
    """Project (..., r, d) onto St(d, r) via polar decomposition (closest
    orthonormal-column matrix in Frobenius norm).

    d == 3 (the SLAM case) uses the analytic 3x3 polar factor — batched
    VPU math, no XLA SVD custom call in the RBCD retraction hot path.
    Other d fall back to SVD."""
    if M.shape[-1] == 3:
        from ..kernels.linalg import polar_orthonormalize

        return polar_orthonormalize(M)
    U, _, Vt = jnp.linalg.svd(M, full_matrices=False)
    return U @ Vt


def stiefel_tangent_project(Y: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Project an ambient gradient V onto the tangent space of St(d, r) at Y.

    T_Y St = { V : Y^T V + V^T Y = 0 };  proj(V) = V - Y sym(Y^T V).
    """
    YtV = jnp.swapaxes(Y, -1, -2) @ V
    return V - Y @ sym(YtV)


def stiefel_retract(Y: jnp.ndarray, V: jnp.ndarray) -> jnp.ndarray:
    """Retraction: metric projection of Y + V back onto the manifold."""
    return stiefel_project(Y + V)


def lifted_tangent_project(Y: jnp.ndarray, V: jnp.ndarray, d: int) -> jnp.ndarray:
    """Tangent projection for a lifted pose block (..., r, d+1): Stiefel
    projection on the rotation part, identity on the translation column."""
    YR, VR = Y[..., :d], V[..., :d]
    VR_t = stiefel_tangent_project(YR, VR)
    return jnp.concatenate([VR_t, V[..., d:]], axis=-1)


def lifted_retract(Y: jnp.ndarray, V: jnp.ndarray, d: int) -> jnp.ndarray:
    """Retract a lifted pose block: polar-retract rotations, add translations."""
    YR = stiefel_retract(Y[..., :d], V[..., :d])
    yt = Y[..., d:] + V[..., d:]
    return jnp.concatenate([YR, yt], axis=-1)


def random_lifting_matrix(key, r: int, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """Sample a lifting matrix YLift in St(d, r) (reference: leader broadcasts
    one shared lifting matrix, drawio:2313-2322). Deterministic given `key`."""
    import jax

    G = jax.random.normal(key, (r, d), dtype=dtype)
    Q, R = jnp.linalg.qr(G)
    # Fix signs for determinism across backends.
    s = jnp.sign(jnp.diagonal(R, axis1=-2, axis2=-1))
    s = jnp.where(s == 0, 1.0, s)
    return Q * s[..., None, :]


def lift_poses(R: jnp.ndarray, t: jnp.ndarray, ylift: jnp.ndarray) -> jnp.ndarray:
    """Lift SE(3) poses (R: (...,d,d), t: (...,d)) to (..., r, d+1) using the
    shared lifting matrix ylift (r, d): Y = YLift @ [R | t]."""
    Rt = jnp.concatenate([R, t[..., None]], axis=-1)  # (..., d, d+1)
    return jnp.einsum("rd,...de->...re", ylift, Rt)


def round_solution(Y: jnp.ndarray, d: int):
    """Round lifted poses back to SE(d): project the span to rank d.

    Standard SE-Sync rounding: stack rotations, take the top-d left singular
    subspace, then project each block onto SO(d). Here we do the cheap
    per-block variant (sufficient after convergence at r=d or r=d+small):
    R_i = Project_SO(d)(A^T Y_Ri) where A is the dominant subspace of all
    blocks. Returns (R (..., d, d), t (..., d)).
    """
    *batch, r, dp1 = Y.shape
    YR = Y[..., :d]  # (..., r, d)
    flat = YR.reshape((-1, d)) if batch else YR
    # Dominant rank-d subspace across all blocks: SVD of the (r, n*d) matrix.
    stacked = jnp.swapaxes(YR.reshape((-1, r, d)), 0, 1).reshape((r, -1))
    U, _, _ = jnp.linalg.svd(stacked, full_matrices=False)
    A = U[:, :d]  # (r, d)
    # Fix the reflection gauge of A: if the blocks land with det < 0 on
    # average, A spans the right subspace but mirrored — per-block SO(d)
    # projection of an orthogonal det=-1 matrix is ill-posed, so flip A's
    # last column once globally instead.
    R_amb0 = jnp.einsum("rd,...re->...de", A, YR)
    mean_det = jnp.mean(jnp.linalg.det(R_amb0.reshape((-1, d, d))))
    flip = jnp.where(mean_det < 0.0, -1.0, 1.0)
    A = A.at[:, -1].multiply(flip)
    R_amb = jnp.einsum("rd,...re->...de", A, YR)  # (..., d, d)
    from .lie import so3_project

    R = so3_project(R_amb) if d == 3 else _so_project_general(R_amb)
    t = jnp.einsum("rd,...r->...d", A, Y[..., d])
    return R, t


def _so_project_general(M: jnp.ndarray) -> jnp.ndarray:
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    d = M.shape[-1]
    diag = jnp.ones(M.shape[:-2] + (d,), M.dtype)
    diag = diag.at[..., -1].set(det)
    return (U * diag[..., None, :]) @ Vt
