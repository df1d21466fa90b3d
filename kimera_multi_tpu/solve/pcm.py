"""Pairwise consistency maximization (PCM) + inter-robot frame initialization.

Role of Kimera-RPGO's PCM outlier filter (SURVEY.md section 2.1
`kimera_rpgo`: "PCM + GNC over GTSAM"; thresholds `pcm_rot_threshold/
pcm_trans_threshold`, params/D455/LcdParams.yaml:34-35) — and the missing
piece GNC alone cannot provide: when a robot pair's loop closures are
majority-outlier, residual annealing cannot decide the pair's relative
frame. PCM decides it combinatorially: each shared loop closure proposes a
relative robot-frame transform; mutually-consistent proposals form a
consensus set (approximate max clique via boolean matmul power iterations);
the consensus mean initializes the pair's frame.

Everything is fixed-shape and batched: the consistency matrix is (E, E)
boolean, clique growth is a few masked matvecs — MXU/VPU work, no host
combinatorics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core import lie
from ..core.containers import EDGE_SHARED_LC, PoseGraphEdges
from .pgo import PgoParams

_EPS = 1e-12


def relative_frame_candidates(
    edges: PoseGraphEdges, params: PgoParams, poses_per_robot: int
):
    """For every edge, the robot-frame transform it implies:
    T_ab^e = T_a(i) * T_e * T_b(j)^{-1}, where T_a(i) is robot a's pose i
    in robot a's own frame (params holds per-robot-anchored trajectories).
    Meaningful only for shared (inter-robot) edges."""
    src, dst = edges.global_ids(poses_per_robot)
    Ri, ti = params.R[src], params.t[src]
    Rj, tj = params.R[dst], params.t[dst]
    # T_a(i) * T_e
    R1, t1 = lie.se3_compose(Ri, ti, edges.R, edges.t)
    # ... * T_b(j)^{-1}
    Rjinv, tjinv = lie.se3_inverse(Rj, tj)
    return lie.se3_compose(R1, t1, Rjinv, tjinv)


def consistency_matrix(
    R_ab: jnp.ndarray,
    t_ab: jnp.ndarray,
    mask: jnp.ndarray,
    rot_thresh: float = 0.3,
    trans_thresh: float = 1.5,
) -> jnp.ndarray:
    """(E, E) boolean: proposals e, f agree on the relative frame."""
    dR = lie.rotation_geodesic_distance(R_ab[:, None], R_ab[None, :])
    dt = jnp.linalg.norm(t_ab[:, None] - t_ab[None, :], axis=-1)
    C = (dR < rot_thresh) & (dt < trans_thresh)
    return C & mask[:, None] & mask[None, :]


def max_consensus(C: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Approximate max clique: seed at the highest-degree vertex, take its
    neighborhood, then prune members inconsistent with the majority
    (boolean matvec refinement). Returns (E,) membership mask."""
    Cf = C.astype(jnp.float32)
    deg = jnp.sum(Cf, axis=1)
    seed = jnp.argmax(deg)
    m = C[seed]

    def body(_, m):
        mf = m.astype(jnp.float32)
        support = Cf @ mf  # consistency count with current members
        need = 0.75 * jnp.maximum(jnp.sum(mf), 1.0)
        return m & (support >= need)

    m = jax.lax.fori_loop(0, iters, body, m)
    # the clique is only meaningful if it has >= 2 members or the seed exists
    return m & (deg > 0)


@functools.partial(
    jax.jit, static_argnames=("n_robots", "poses_per_robot")
)
def robot_frame_init(
    edges: PoseGraphEdges,
    params_local: PgoParams,
    n_robots: int,
    poses_per_robot: int,
    rot_thresh: float = 0.3,
    trans_thresh: float = 1.5,
):
    """Place every robot's locally-anchored trajectory into a common world
    frame using PCM consensus over shared loop closures.

    params_local: trajectories with each robot anchored at identity
    (e.g. from odometry composition or per-robot PGO).

    Returns (params_world, consensus_mask (E,), frame_ok (n_robots,)).
    Robots unreachable through any consensus set keep identity frames
    (frame_ok False) — callers may deactivate them (reference
    SET_ACTIVE_ROBOTS semantics, drawio:2402-2405).
    """
    R_ab, t_ab = relative_frame_candidates(edges, params_local, poses_per_robot)
    shared = edges.valid & (edges.etype == EDGE_SHARED_LC)

    E = edges.capacity
    consensus_all = jnp.zeros((E,), bool)

    # world frames, built over a static robot loop (n_robots is small/static)
    Rw = jnp.broadcast_to(jnp.eye(3, dtype=edges.R.dtype), (n_robots, 3, 3))
    tw = jnp.zeros((n_robots, 3), edges.t.dtype)
    ok = jnp.zeros((n_robots,), bool).at[0].set(True)

    for b in range(1, n_robots):
        best_count = jnp.zeros((), jnp.int32)
        best_R = jnp.eye(3, dtype=edges.R.dtype)
        best_t = jnp.zeros((3,), edges.t.dtype)
        best_mask = jnp.zeros((E,), bool)
        for a in range(0, b):
            # edges between a and b, either direction; canonicalize to a->b
            fwd = shared & (edges.src_robot == a) & (edges.dst_robot == b)
            bwd = shared & (edges.src_robot == b) & (edges.dst_robot == a)
            pair = fwd | bwd
            Rinv, tinv = lie.se3_inverse(R_ab, t_ab)
            Rp = jnp.where(bwd[:, None, None], Rinv, R_ab)
            tp = jnp.where(bwd[:, None], tinv, t_ab)
            C = consistency_matrix(Rp, tp, pair, rot_thresh, trans_thresh)
            m = max_consensus(C)
            count = jnp.sum(m).astype(jnp.int32)
            # consensus mean: chordal rotation mean + translation mean
            w = m.astype(edges.R.dtype)
            Rm = lie.so3_project(
                jnp.einsum("e,eij->ij", w, Rp) / jnp.maximum(jnp.sum(w), 1.0)
            )
            tm = jnp.einsum("e,ei->i", w, tp) / jnp.maximum(jnp.sum(w), 1.0)
            # candidate world frame for b via a
            Rwb, twb = lie.se3_compose(Rw[a], tw[a], Rm, tm)
            take = (count > best_count) & ok[a] & (count >= 2)
            best_R = jnp.where(take, Rwb, best_R)
            best_t = jnp.where(take, twb, best_t)
            best_mask = jnp.where(take, m, best_mask)
            best_count = jnp.where(take, count, best_count)
        got = best_count >= 2
        Rw = Rw.at[b].set(jnp.where(got, best_R, jnp.eye(3, dtype=edges.R.dtype)))
        tw = tw.at[b].set(jnp.where(got, best_t, 0.0))
        ok = ok.at[b].set(got)
        consensus_all = consensus_all | best_mask

    # transform each robot's local trajectory into the world frame
    robot_of_pose = jnp.repeat(jnp.arange(n_robots), poses_per_robot)
    Rg = Rw[robot_of_pose]
    tg = tw[robot_of_pose]
    R_world, t_world = lie.se3_compose(Rg, tg, params_local.R, params_local.t)
    return PgoParams(R=R_world, t=t_world), consensus_all, ok
