"""Single-block SE(3) pose-graph optimization: matrix-free Gauss-Newton.

Role of Kimera-RPGO / GTSAM batch PGO in the reference (SURVEY.md section
2.1 `kimera_rpgo`: `initializePGO/addOdometryFactorAndOptimize`,
images/kimera-multi.drawio:1872-1875), redesigned for TPU:

  * residuals over all edges evaluated as one batched gather + Lie ops —
    no factor-graph data structures, no sequential elimination;
  * the Gauss-Newton normal system is never materialized: CG runs
    matrix-free with J / J^T applied through `jax.jvp` / `jax.vjp` of the
    residual function (XLA fuses the whole matvec);
  * fixed iteration counts everywhere (`lax.fori_loop` / `lax.scan`) —
    static shapes, deterministic, jit-able end to end;
  * robustness = GNC-TLS edge weights (solve/gnc.py) multiplying the
    loop-closure residuals, exactly the reference's robust layer.

Gauge freedom is fixed with a prior on pose 0; padding poses are held by
Levenberg damping (they have no factors and simply stay at their initial
values).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.containers import EDGE_ODOMETRY, PoseGraphEdges


class PgoParams(NamedTuple):
    R: jnp.ndarray  # (N, 3, 3)
    t: jnp.ndarray  # (N, 3)


def edge_residuals(
    params: PgoParams,
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    poses_per_robot: int,
) -> jnp.ndarray:
    """Stacked whitened residuals, (E, 6): [rot | trans] per edge.

    rot residual  = sqrt(w kappa) Log(R_ij^T R_i^T R_j)
    trans residual = sqrt(w tau) (R_i^T (t_j - t_i) - t_ij)
    Invalid edges contribute exact zeros.
    """
    src, dst = edges.global_ids(poses_per_robot)
    Ri, Rj = params.R[src], params.R[dst]
    ti, tj = params.t[src], params.t[dst]
    Rrel = jnp.swapaxes(Ri, -1, -2) @ Rj
    r_rot = lie.so3_log(jnp.swapaxes(edges.R, -1, -2) @ Rrel)
    r_tr = jnp.einsum("eji,ej->ei", Ri, tj - ti) - edges.t
    w = jnp.where(edges.valid, edge_weights, 0.0)
    s_rot = jnp.sqrt(jnp.maximum(w * edges.kappa, 0.0))[:, None]
    s_tr = jnp.sqrt(jnp.maximum(w * edges.tau, 0.0))[:, None]
    return jnp.concatenate([r_rot * s_rot, r_tr * s_tr], axis=-1)


def anchor_residual(params: PgoParams, anchor_weight: float) -> jnp.ndarray:
    """Gauge prior on pose 0 at identity, (6,)."""
    s = jnp.sqrt(jnp.asarray(anchor_weight, params.t.dtype))
    return jnp.concatenate([lie.so3_log(params.R[0]) * s, params.t[0] * s])


def retract(params: PgoParams, delta: jnp.ndarray) -> PgoParams:
    """Left-multiplicative retraction: R <- Exp(dw) R, t <- t + dv.
    delta: (N, 6) = [dw | dv]."""
    dR = lie.so3_exp(delta[:, :3])
    return PgoParams(R=dR @ params.R, t=params.t + delta[:, 3:])


def _cg(matvec, b, iters: int):
    """Plain fixed-iteration conjugate gradients (b, x are (N, 6))."""

    def body(_, state):
        x, r, p, rs = state
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap)
        alpha = rs / jnp.maximum(pAp, 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        p = r + beta * p
        return x, r, p, rs_new

    x0 = jnp.zeros_like(b)
    state = (x0, b, b, jnp.sum(b * b))
    x, *_ = jax.lax.fori_loop(0, iters, body, state)
    return x


@functools.partial(
    jax.jit,
    static_argnames=("poses_per_robot", "gn_iters", "cg_iters"),
)
def gauss_newton(
    params0: PgoParams,
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    poses_per_robot: int,
    gn_iters: int = 20,
    cg_iters: int = 50,
    damping: float = 1e-4,
    anchor_weight: float = 1e4,
) -> PgoParams:
    """Damped Gauss-Newton with matrix-free CG inner solves."""

    N = params0.R.shape[0]

    def full_residual(delta, params):
        p = retract(params, delta)
        r_e = edge_residuals(p, edges, edge_weights, poses_per_robot)
        r_a = anchor_residual(p, anchor_weight)
        return jnp.concatenate([r_e.reshape(-1), r_a])

    def gn_step(_, params):
        delta0 = jnp.zeros((N, 6), params.t.dtype)
        r0, jvp_lin = jax.linearize(lambda d: full_residual(d, params), delta0)
        _, vjp_fn = jax.vjp(lambda d: full_residual(d, params), delta0)

        def matvec(v):
            return vjp_fn(jvp_lin(v))[0] + damping * v

        g = vjp_fn(r0)[0]  # J^T r
        delta = _cg(matvec, -g, cg_iters)
        return retract(params, delta)

    return jax.lax.fori_loop(0, gn_iters, gn_step, params0)


def pgo_cost(
    params: PgoParams,
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    poses_per_robot: int,
) -> jnp.ndarray:
    r = edge_residuals(params, edges, edge_weights, poses_per_robot)
    return 0.5 * jnp.sum(r * r)


def edge_squared_errors(
    params: PgoParams,
    edges: PoseGraphEdges,
    poses_per_robot: int,
) -> jnp.ndarray:
    """Unit-weight whitened squared residual per edge (the GNC r^2)."""
    r = edge_residuals(params, edges, jnp.ones(edges.capacity, params.t.dtype),
                       poses_per_robot)
    return jnp.sum(r * r, axis=-1)


def init_from_odometry(
    edges: PoseGraphEdges,
    n_robots: int,
    poses_per_robot: int,
) -> PgoParams:
    """Compose each robot's odometry chain from identity — the standard SLAM
    initialization (reference: VIO odometry provides initial guesses,
    drawio:1636-1642).

    Assumes odometry edges connect (robot, k) -> (robot, k+1). Edges are
    scattered into per-robot step slots then scanned; missing steps are
    identity.
    """
    # slot (robot, k) <- odometry edge with src_pose == k
    is_odo = edges.etype == EDGE_ODOMETRY
    slot = edges.src_robot * poses_per_robot + edges.src_pose
    slot = jnp.where(is_odo, slot, n_robots * poses_per_robot)  # overflow bin
    R_steps = jnp.zeros((n_robots * poses_per_robot + 1, 3, 3), edges.R.dtype)
    R_steps = R_steps.at[slot].add(jnp.where(is_odo[:, None, None], edges.R, 0.0))
    # default identity where no edge landed
    filled = jnp.zeros((n_robots * poses_per_robot + 1,), bool).at[slot].max(is_odo)
    eye = jnp.eye(3, dtype=edges.R.dtype)
    R_steps = jnp.where(filled[:, None, None], R_steps, eye)
    t_steps = jnp.zeros((n_robots * poses_per_robot + 1, 3), edges.t.dtype)
    t_steps = t_steps.at[slot].add(jnp.where(is_odo[:, None], edges.t, 0.0))
    R_steps = R_steps[:-1].reshape(n_robots, poses_per_robot, 3, 3)
    t_steps = t_steps[:-1].reshape(n_robots, poses_per_robot, 3)

    def compose(carry, step):
        R_prev, t_prev = carry
        R_step, t_step = step
        R_new, t_new = lie.se3_compose(R_prev, t_prev, R_step, t_step)
        return (R_new, t_new), (R_prev, t_prev)

    def per_robot(R_s, t_s):
        eye0 = jnp.eye(3, dtype=R_s.dtype)
        (_, _), (Rs, ts) = jax.lax.scan(
            compose, (eye0, jnp.zeros(3, R_s.dtype)), (R_s, t_s)
        )
        return Rs, ts

    R_all, t_all = jax.vmap(per_robot)(R_steps, t_steps)
    return PgoParams(
        R=R_all.reshape(-1, 3, 3),
        t=t_all.reshape(-1, 3),
    )
