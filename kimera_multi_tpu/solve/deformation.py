"""Deformation-graph mesh correction — the Kimera-PGMO equivalent.

Role of `kimera_pgmo`'s embedded-deformation local mesh optimization
("correct the local mesh using mesh deformation techniques", reference
README.md:89,141; DeformationGraph over GTSAM [recon], SURVEY.md section
2.1 `kimera_pgmo` row).

Embedded deformation (Sumner-style): graph nodes carry local rigid
transforms (R_g, t_g); the energy couples
  * regularization: neighboring nodes must agree where they map each
    other's positions,
  * constraints: nodes attached to pose-graph keyframes must follow the
    optimized trajectory (the "deform mesh with optimized trajectory"
    step, drawio:234-240).
Rotations stay on SO(3) via exp retraction; the sparse Gauss-Newton system
is solved matrix-free (jvp/vjp + CG — same machinery as solve/pgo.py).
Vertex re-skinning is a batched gather + blend (SURVEY.md: "gather+blend
matmul").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie


class DeformationGraph(NamedTuple):
    node_pos: jnp.ndarray  # (G, 3) rest positions
    edge_src: jnp.ndarray  # (E,) int32
    edge_dst: jnp.ndarray  # (E,) int32
    edge_valid: jnp.ndarray  # (E,)


class DeformationState(NamedTuple):
    R: jnp.ndarray  # (G, 3, 3)
    t: jnp.ndarray  # (G, 3)


class DeformationConfig(NamedTuple):
    w_reg: float = 1.0
    w_con: float = 10.0
    gn_iters: int = 8
    cg_iters: int = 40
    damping: float = 1e-5
    skin_k: int = 4


def build_graph_knn(node_pos: jnp.ndarray, k: int = 4) -> DeformationGraph:
    """Connect each node to its k nearest neighbors (undirected edges kept
    as directed pairs — the regularizer is asymmetric per Sumner)."""
    G = node_pos.shape[0]
    d2 = jnp.sum((node_pos[:, None] - node_pos[None]) ** 2, axis=-1)
    d2 = d2 + jnp.eye(G) * 1e12
    _, idx = jax.lax.top_k(-d2, k)
    src = jnp.repeat(jnp.arange(G), k)
    dst = idx.reshape(-1)
    return DeformationGraph(
        node_pos=node_pos,
        edge_src=src.astype(jnp.int32),
        edge_dst=dst.astype(jnp.int32),
        edge_valid=jnp.ones(G * k, bool),
    )


def identity_state(G: int) -> DeformationState:
    return DeformationState(
        R=jnp.broadcast_to(jnp.eye(3), (G, 3, 3)),
        t=jnp.zeros((G, 3)),
    )


def residuals(
    state: DeformationState,
    graph: DeformationGraph,
    con_node: jnp.ndarray,  # (C,) node indices with constraints
    con_target: jnp.ndarray,  # (C, 3) target positions
    con_valid: jnp.ndarray,  # (C,)
    cfg: DeformationConfig,
) -> jnp.ndarray:
    g = graph.node_pos
    # regularization: node s maps neighbor d's rest position; must agree
    # with d's own deformed position
    ps = g[graph.edge_src]
    pd = g[graph.edge_dst]
    Rs = state.R[graph.edge_src]
    mapped = jnp.einsum("eij,ej->ei", Rs, pd - ps) + ps + state.t[graph.edge_src]
    own = pd + state.t[graph.edge_dst]
    r_reg = (mapped - own) * cfg.w_reg
    r_reg = jnp.where(graph.edge_valid[:, None], r_reg, 0.0)
    # constraints: deformed node position hits the target
    moved = g[con_node] + state.t[con_node]
    r_con = (moved - con_target) * cfg.w_con
    r_con = jnp.where(con_valid[:, None], r_con, 0.0)
    return jnp.concatenate([r_reg.reshape(-1), r_con.reshape(-1)])


def retract(state: DeformationState, delta: jnp.ndarray) -> DeformationState:
    """delta (G, 6) = [dw | dt]."""
    return DeformationState(
        R=lie.so3_exp(delta[:, :3]) @ state.R,
        t=state.t + delta[:, 3:],
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def solve(
    state0: DeformationState,
    graph: DeformationGraph,
    con_node: jnp.ndarray,
    con_target: jnp.ndarray,
    con_valid: jnp.ndarray,
    cfg: DeformationConfig = DeformationConfig(),
) -> DeformationState:
    G = state0.R.shape[0]

    def full_res(delta, st):
        return residuals(retract(st, delta), graph, con_node, con_target,
                         con_valid, cfg)

    def gn(_, st):
        d0 = jnp.zeros((G, 6))
        r0, jvp_lin = jax.linearize(lambda d: full_res(d, st), d0)
        _, vjp_fn = jax.vjp(lambda d: full_res(d, st), d0)

        def mv(v):
            return vjp_fn(jvp_lin(v))[0] + cfg.damping * v

        gvec = vjp_fn(r0)[0]

        def cg(_, s):
            x, r, p, rs = s
            Ap = mv(p)
            al = rs / jnp.maximum(jnp.sum(p * Ap), 1e-20)
            x = x + al * p
            r = r - al * Ap
            rs2 = jnp.sum(r * r)
            return x, r, p * (rs2 / jnp.maximum(rs, 1e-20)) + r, rs2

        delta, *_ = jax.lax.fori_loop(
            0, cfg.cg_iters, cg,
            (jnp.zeros_like(gvec), -gvec, -gvec, jnp.sum(gvec * gvec)))
        return retract(st, delta)

    return jax.lax.fori_loop(0, cfg.gn_iters, gn, state0)


def skinning(vertices: jnp.ndarray, node_pos: jnp.ndarray, k: int = 4):
    """k-NN skinning weights: (V, k) node indices + normalized weights
    w ~ (1 - d/d_max)^2 (Sumner's falloff)."""
    d2 = jnp.sum((vertices[:, None] - node_pos[None]) ** 2, axis=-1)
    neg, idx = jax.lax.top_k(-d2, k + 1)
    d = jnp.sqrt(jnp.maximum(-neg, 0.0))
    dmax = d[:, -1:]
    w = jnp.maximum(1.0 - d[:, :k] / jnp.maximum(dmax, 1e-9), 0.0) ** 2
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    return idx[:, :k].astype(jnp.int32), w


def deform_vertices(
    vertices: jnp.ndarray,  # (V, 3)
    graph: DeformationGraph,
    state: DeformationState,
    skin_idx: jnp.ndarray,  # (V, k)
    skin_w: jnp.ndarray,  # (V, k)
) -> jnp.ndarray:
    """Re-skin mesh vertices through the deformation graph (gather+blend)."""
    g = graph.node_pos[skin_idx]  # (V, k, 3)
    Rg = state.R[skin_idx]  # (V, k, 3, 3)
    tg = state.t[skin_idx]  # (V, k, 3)
    moved = jnp.einsum("vkij,vkj->vki", Rg, vertices[:, None, :] - g) + g + tg
    return jnp.sum(moved * skin_w[..., None], axis=1)
