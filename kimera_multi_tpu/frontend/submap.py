"""Submap coarsening: keyframes -> submaps -> sparse pose graph.

Role of kimera_distributed's submap atlas (`processLocalPoseGraph` "create
submap (keyframe + following frames)" + `getSubmapPoseGraph` publishing the
sparse graph of new LCs + inter-submap edges, images/kimera-multi.drawio:
548-574,623; "coarsened pose graph", README.md:132). The back-end
optimizes submap anchor poses only; member keyframes ride along rigidly
(SURVEY.md section 5 "Long-context": coarsening is the reference's answer
to trajectory growth).

TPU formulation: submap assignment is a cumulative gate over keyframe
arrays; edge coarsening is a gather + relabel, all fixed shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import lie
from ..core.containers import EDGE_ODOMETRY, PoseGraphEdges


class SubmapAssignment(NamedTuple):
    submap_of_kf: jnp.ndarray  # (N,) int32 submap index per keyframe
    anchor_kf: jnp.ndarray  # (S,) int32 anchor keyframe per submap
    n_submaps: jnp.ndarray  # () int32
    # relative pose of each keyframe in its submap's anchor frame
    R_in_submap: jnp.ndarray  # (N, 3, 3)
    t_in_submap: jnp.ndarray  # (N, 3)


def assign_submaps(
    R_kf: jnp.ndarray,  # (N, 3, 3) keyframe poses (odometry frame)
    t_kf: jnp.ndarray,  # (N, 3)
    kf_valid: jnp.ndarray,  # (N,)
    max_submap_size: int = 10,
    max_submap_distance: float = 5.0,
) -> SubmapAssignment:
    """Greedy sequential grouping: a new submap starts when the current one
    reaches max_submap_size keyframes or the distance to its anchor exceeds
    max_submap_distance (reference: distance/size-gated submap creation
    [recon]; capacity S = N)."""
    N = t_kf.shape[0]

    import jax

    def step(carry, inp):
        sm_idx, anchor_idx, count, anchor_t = carry
        i, t, valid = inp
        dist = jnp.linalg.norm(t - anchor_t)
        new = valid & ((count >= max_submap_size) |
                       (dist > max_submap_distance))
        sm_idx = jnp.where(new, sm_idx + 1, sm_idx)
        anchor_idx = jnp.where(new, i, anchor_idx)
        anchor_t = jnp.where(new, t, anchor_t)
        count = jnp.where(new, 1, count + valid.astype(jnp.int32))
        return (sm_idx, anchor_idx, count, anchor_t), (sm_idx, anchor_idx)

    init = (jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32), t_kf[0])
    _, (sm_of_kf, anchor_of_kf) = jax.lax.scan(
        step, init,
        (jnp.arange(N, dtype=jnp.int32), t_kf, kf_valid),
    )
    n_submaps = sm_of_kf[-1] + 1
    anchor_kf = jnp.zeros(N, jnp.int32).at[sm_of_kf].max(anchor_of_kf)
    # relative pose within submap: T_anchor^{-1} * T_kf
    Ra, ta = R_kf[anchor_of_kf], t_kf[anchor_of_kf]
    R_rel, t_rel = lie.se3_between(Ra, ta, R_kf, t_kf)
    return SubmapAssignment(
        submap_of_kf=sm_of_kf,
        anchor_kf=anchor_kf,
        n_submaps=n_submaps,
        R_in_submap=R_rel,
        t_in_submap=t_rel,
    )


def coarsen_edges(
    edges: PoseGraphEdges,
    assignment_per_robot,  # list/tuple of SubmapAssignment, one per robot
    poses_per_robot: int,
) -> PoseGraphEdges:
    """Relabel keyframe-level edges to submap-level:

    T_{sa sb} = T_{sa a}^{-1-anchored} composition:
      edge (a_kf i -> b_kf j) becomes
      (submap(i) -> submap(j)) with measurement
      T_{anchor_i, i} * T_ij * T_{j, anchor_j}^{-1} — exact relabelling.
    Odometry edges that become intra-submap (same submap both ends) are
    dropped (their constraint is inside the rigid submap).
    """
    sm = jnp.stack([a.submap_of_kf for a in assignment_per_robot])  # (R, N)
    Rrel = jnp.stack([a.R_in_submap for a in assignment_per_robot])
    trel = jnp.stack([a.t_in_submap for a in assignment_per_robot])

    si = sm[edges.src_robot, edges.src_pose]
    sj = sm[edges.dst_robot, edges.dst_pose]
    Ri_a, ti_a = (Rrel[edges.src_robot, edges.src_pose],
                  trel[edges.src_robot, edges.src_pose])
    Rj_a, tj_a = (Rrel[edges.dst_robot, edges.dst_pose],
                  trel[edges.dst_robot, edges.dst_pose])
    # new measurement: T_ai * T_ij * T_aj^{-1}
    R1, t1 = lie.se3_compose(Ri_a, ti_a, edges.R, edges.t)
    Rji, tji = lie.se3_inverse(Rj_a, tj_a)
    Rn, tn = lie.se3_compose(R1, t1, Rji, tji)

    same = (edges.src_robot == edges.dst_robot) & (si == sj)
    keep = edges.valid & ~same
    return PoseGraphEdges(
        src_robot=edges.src_robot,
        src_pose=si,
        dst_robot=edges.dst_robot,
        dst_pose=sj,
        R=Rn,
        t=tn,
        kappa=edges.kappa,
        tau=edges.tau,
        etype=jnp.where(keep, edges.etype, 0),
    )


def expand_solution(
    R_sm: jnp.ndarray,  # (S_total, 3, 3) optimized submap anchor poses
    t_sm: jnp.ndarray,
    assignment: SubmapAssignment,
    robot_submap_offset: jnp.ndarray,  # () int32: this robot's base index
):
    """Re-expand keyframe poses from optimized submap anchors:
    T_kf = T_submap * T_{anchor, kf} (the 'deform local trajectory by the
    optimized coarse graph' step, drawio:234-240)."""
    idx = robot_submap_offset + assignment.submap_of_kf
    Ra, ta = R_sm[idx], t_sm[idx]
    return lie.se3_compose(Ra, ta, assignment.R_in_submap,
                           assignment.t_in_submap)
