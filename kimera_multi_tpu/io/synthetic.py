"""Synthetic multi-robot pose-graph / scene generation.

The simulation tier of the test strategy (SURVEY.md section 4: "single-
process multi-robot simulation on synthetic + recorded pose graphs" — the
analogue of the reference's single-master tmux integration runs). Also the
workload generator for bench.py.

Everything is deterministic given a seed (threefry structural keys).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie, rng
from ..core.containers import (
    EDGE_ODOMETRY,
    EDGE_PRIVATE_LC,
    EDGE_SHARED_LC,
    PoseGraphEdges,
)


class SyntheticGraph(NamedTuple):
    edges: PoseGraphEdges
    R_gt: jnp.ndarray  # (n_robots * n_poses, 3, 3)
    t_gt: jnp.ndarray  # (n_robots * n_poses, 3)
    is_outlier: jnp.ndarray  # (E,) bool — ground-truth outlier labels
    n_robots: int
    poses_per_robot: int


def multi_robot_graph(
    seed: int = 0,
    n_robots: int = 2,
    n_poses: int = 64,
    edge_capacity: int | None = None,
    rot_noise: float = 0.005,
    trans_noise: float = 0.01,
    n_intra_lc: int = 8,
    n_inter_lc: int = 12,
    outlier_ratio: float = 0.3,
    kappa: float = 1e4,
    tau: float = 1e2,
) -> SyntheticGraph:
    """Robots travel interleaved circles (so trajectories overlap and loop
    closures are geometrically meaningful). Loop closures are sampled
    between nearby ground-truth poses; a fraction are replaced by gross
    outliers (random transforms) to exercise GNC."""
    npr = np.random.default_rng(seed)
    N = n_robots * n_poses

    # ground-truth trajectories: concentric circles with phase offsets
    R_gt = np.zeros((n_robots, n_poses, 3, 3), np.float32)
    t_gt = np.zeros((n_robots, n_poses, 3), np.float32)
    for r in range(n_robots):
        radius = 5.0 + 0.3 * r
        phase = 2 * np.pi * r / max(n_robots, 1) * 0.25
        ang = np.linspace(0, 1.5 * np.pi, n_poses) + phase
        t_gt[r, :, 0] = radius * np.cos(ang)
        t_gt[r, :, 1] = radius * np.sin(ang)
        t_gt[r, :, 2] = 0.1 * r
        yaw = ang + np.pi / 2
        w = np.stack([0 * yaw, 0 * yaw, yaw], -1)
        R_gt[r] = np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))
    R_gt = R_gt.reshape(N, 3, 3)
    t_gt = t_gt.reshape(N, 3)

    def rel(i, j):
        Ri, ti = R_gt[i], t_gt[i]
        Rj, tj = R_gt[j], t_gt[j]
        Rb = Ri.T @ Rj
        tb = Ri.T @ (tj - ti)
        return Rb, tb

    def noisy(Rb, tb):
        dw = npr.normal(0, rot_noise, 3).astype(np.float32)
        Rn = np.asarray(lie.so3_exp(jnp.asarray(dw))) @ Rb
        tn = tb + npr.normal(0, trans_noise, 3).astype(np.float32)
        return Rn, tn

    rows = []  # (sr, sp, dr, dp, R, t, etype, outlier)
    for r in range(n_robots):
        for k in range(n_poses - 1):
            i, j = r * n_poses + k, r * n_poses + k + 1
            Rb, tb = noisy(*rel(i, j))
            rows.append((r, k, r, k + 1, Rb, tb, EDGE_ODOMETRY, False))

    def add_lc(r1, r2, count, etype):
        made = 0
        trials = 0
        while made < count and trials < count * 50:
            trials += 1
            k1 = int(npr.integers(0, n_poses))
            k2 = int(npr.integers(0, n_poses))
            if r1 == r2 and abs(k1 - k2) < max(5, n_poses // 8):
                continue
            i, j = r1 * n_poses + k1, r2 * n_poses + k2
            if np.linalg.norm(t_gt[i] - t_gt[j]) > 3.0:
                continue
            is_out = npr.uniform() < outlier_ratio
            if is_out:
                Rb = np.asarray(
                    lie.so3_exp(jnp.asarray(npr.normal(0, 1.5, 3), jnp.float32))
                )
                tb = npr.uniform(-8, 8, 3).astype(np.float32)
            else:
                Rb, tb = noisy(*rel(i, j))
            rows.append((r1, k1, r2, k2, Rb, tb, etype, is_out))
            made += 1

    for r in range(n_robots):
        add_lc(r, r, n_intra_lc, EDGE_PRIVATE_LC)
    for r1 in range(n_robots):
        for r2 in range(r1 + 1, n_robots):
            add_lc(r1, r2, n_inter_lc, EDGE_SHARED_LC)

    E = len(rows)
    cap = edge_capacity or int(2 ** np.ceil(np.log2(max(E, 8))))
    if cap < E:
        raise ValueError(f"edge_capacity {cap} < generated edges {E}")

    def col(i, dtype=np.int32):
        out = np.zeros(cap, dtype)
        out[:E] = [row[i] for row in rows]
        return out

    Rm = np.broadcast_to(np.eye(3, dtype=np.float32), (cap, 3, 3)).copy()
    tm = np.zeros((cap, 3), np.float32)
    for e, row in enumerate(rows):
        Rm[e], tm[e] = row[4], row[5]
    kap = np.zeros(cap, np.float32)
    ta = np.zeros(cap, np.float32)
    kap[:E] = kappa
    ta[:E] = tau

    edges = PoseGraphEdges(
        src_robot=jnp.asarray(col(0)),
        src_pose=jnp.asarray(col(1)),
        dst_robot=jnp.asarray(col(2)),
        dst_pose=jnp.asarray(col(3)),
        R=jnp.asarray(Rm),
        t=jnp.asarray(tm),
        kappa=jnp.asarray(kap),
        tau=jnp.asarray(ta),
        etype=jnp.asarray(col(6)),
    )
    out = np.zeros(cap, bool)
    out[:E] = [row[7] for row in rows]
    return SyntheticGraph(
        edges=edges,
        R_gt=jnp.asarray(R_gt),
        t_gt=jnp.asarray(t_gt),
        is_outlier=jnp.asarray(out),
        n_robots=n_robots,
        poses_per_robot=n_poses,
    )
