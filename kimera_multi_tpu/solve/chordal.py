"""Chordal initialization: linear rotation averaging + translation recovery.

The global initializer that places all robot blocks in a common frame before
local refinement (role of dpgo's chordal/spectral initialization of the
lifted problem [recon]; SURVEY.md section 7.1 `chordal_init.py`).

Both subproblems are linear least squares over the pose graph:

  rotations:    min sum_e w_e kappa_e || X_j - X_i R_ij ||_F^2,  X in R^{3x3}
  translations: min sum_e w_e tau_e || (t_j - t_i) - R_i t_ij ||^2

solved matrix-free with CG (the normal operator is applied edge-wise via
gather + segment-sum — never materialized), then rotations are projected to
SO(3). Fixed iteration counts, jit-able, sharding-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.containers import PoseGraphEdges
from .pgo import PgoParams, _cg


@functools.partial(jax.jit, static_argnames=("n_poses_total", "cg_iters"))
def chordal_init(
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    n_poses_total: int,
    poses_per_robot: int | None = None,
    cg_iters: int = 100,
    anchor_weight: float = 1e3,
) -> PgoParams:
    """Returns PgoParams with pose 0 anchored at identity."""
    ppr = poses_per_robot if poses_per_robot is not None else n_poses_total
    src, dst = edges.global_ids(ppr)
    w = jnp.where(edges.valid, edge_weights, 0.0)
    s_rot = jnp.sqrt(jnp.maximum(w * edges.kappa, 0.0))[:, None, None]
    s_tr = jnp.sqrt(jnp.maximum(w * edges.tau, 0.0))[:, None]
    sa = jnp.sqrt(jnp.asarray(anchor_weight, edges.t.dtype))
    eye = jnp.eye(3, dtype=edges.R.dtype)

    # ---- rotations: linear residual in X (N, 3, 3) --------------------
    def rot_residual(X):
        r_e = (X[dst] - X[src] @ edges.R) * s_rot
        r_a = (X[0] - eye) * sa
        return jnp.concatenate([r_e.reshape(-1), r_a.reshape(-1)])

    X0 = jnp.broadcast_to(eye, (n_poses_total, 3, 3))
    r0, jvp_lin = jax.linearize(rot_residual, X0)
    _, vjp_fn = jax.vjp(rot_residual, X0)

    def matvec(v):
        return vjp_fn(jvp_lin(v))[0] + 1e-6 * v

    dX = _cg(matvec, -vjp_fn(r0)[0], cg_iters)
    R = lie.so3_project(X0 + dX)

    # ---- translations: linear residual in t (N, 3) --------------------
    Rsrc = R[src]

    def tr_residual(t):
        r_e = ((t[dst] - t[src]) - jnp.einsum("eij,ej->ei", Rsrc, edges.t)) * s_tr
        r_a = t[0] * sa
        return jnp.concatenate([r_e.reshape(-1), r_a])

    t0 = jnp.zeros((n_poses_total, 3), edges.t.dtype)
    r0t, jvp_t = jax.linearize(tr_residual, t0)
    _, vjp_t = jax.vjp(tr_residual, t0)

    def matvec_t(v):
        return vjp_t(jvp_t(v))[0] + 1e-6 * v

    t = t0 + _cg(matvec_t, -vjp_t(r0t)[0], cg_iters)
    return PgoParams(R=R, t=t)
