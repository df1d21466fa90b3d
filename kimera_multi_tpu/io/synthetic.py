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

from ..core import rng
from ..core.containers import (
    EDGE_ODOMETRY,
    EDGE_PRIVATE_LC,
    EDGE_SHARED_LC,
    PoseGraphEdges,
)


def _so3_exp_np(w: np.ndarray) -> np.ndarray:
    """Batched Rodrigues formula on the HOST (numpy). The generator must
    never dispatch per-edge device ops: one jnp call per edge turns graph
    construction into thousands of (possibly relayed) device round-trips —
    this was the round-2 bench timeout."""
    w = np.asarray(w, np.float32)
    theta = np.linalg.norm(w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    safe = np.maximum(theta, 1e-12)
    k = w / safe[..., 0]
    K = np.zeros(w.shape[:-1] + (3, 3), np.float32)
    K[..., 0, 1], K[..., 0, 2] = -k[..., 2], k[..., 1]
    K[..., 1, 0], K[..., 1, 2] = k[..., 2], -k[..., 0]
    K[..., 2, 0], K[..., 2, 1] = -k[..., 1], k[..., 0]
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), K.shape)
    R = eye + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)
    return np.where(theta < 1e-8, eye, R).astype(np.float32)


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
    # (all host numpy — zero device dispatches in the generator)
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
        R_gt[r] = _so3_exp_np(w)
    R_gt = R_gt.reshape(N, 3, 3)
    t_gt = t_gt.reshape(N, 3)

    def rel_batch(i, j):
        """Batched GT relative poses for index arrays i, j."""
        Ri, ti = R_gt[i], t_gt[i]
        Rj, tj = R_gt[j], t_gt[j]
        Rb = np.einsum("eji,ejk->eik", Ri, Rj)
        tb = np.einsum("eji,ej->ei", Ri, tj - ti)
        return Rb, tb

    def noisy_batch(Rb, tb):
        n = Rb.shape[0]
        dw = npr.normal(0, rot_noise, (n, 3)).astype(np.float32)
        Rn = _so3_exp_np(dw) @ Rb
        tn = tb + npr.normal(0, trans_noise, (n, 3)).astype(np.float32)
        return Rn.astype(np.float32), tn.astype(np.float32)

    # odometry edges, one batch
    rr = np.repeat(np.arange(n_robots), n_poses - 1)
    kk = np.tile(np.arange(n_poses - 1), n_robots)
    io_ = rr * n_poses + kk
    R_odo, t_odo = noisy_batch(*rel_batch(io_, io_ + 1))

    # loop-closure candidate selection (host ints only), then one batched
    # transform generation pass
    lc_rows = []  # (r1, k1, r2, k2, etype, is_out)
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
            is_out = bool(npr.uniform() < outlier_ratio)
            lc_rows.append((r1, k1, r2, k2, etype, is_out))
            made += 1

    for r in range(n_robots):
        add_lc(r, r, n_intra_lc, EDGE_PRIVATE_LC)
    for r1 in range(n_robots):
        for r2 in range(r1 + 1, n_robots):
            add_lc(r1, r2, n_inter_lc, EDGE_SHARED_LC)

    n_lc = len(lc_rows)
    if n_lc:
        lr1 = np.asarray([x[0] for x in lc_rows], np.int32)
        lk1 = np.asarray([x[1] for x in lc_rows], np.int32)
        lr2 = np.asarray([x[2] for x in lc_rows], np.int32)
        lk2 = np.asarray([x[3] for x in lc_rows], np.int32)
        let = np.asarray([x[4] for x in lc_rows], np.int32)
        lout = np.asarray([x[5] for x in lc_rows], bool)
        R_lc, t_lc = noisy_batch(*rel_batch(lr1 * n_poses + lk1,
                                            lr2 * n_poses + lk2))
        # outliers: gross random transforms
        n_out = int(lout.sum())
        if n_out:
            R_lc[lout] = _so3_exp_np(
                npr.normal(0, 1.5, (n_out, 3)).astype(np.float32))
            t_lc[lout] = npr.uniform(-8, 8, (n_out, 3)).astype(np.float32)
    else:
        lr1 = lk1 = lr2 = lk2 = let = np.zeros(0, np.int32)
        lout = np.zeros(0, bool)
        R_lc = np.zeros((0, 3, 3), np.float32)
        t_lc = np.zeros((0, 3), np.float32)

    E_odo = len(io_)
    E = E_odo + n_lc
    cap = edge_capacity or int(2 ** np.ceil(np.log2(max(E, 8))))
    if cap < E:
        raise ValueError(f"edge_capacity {cap} < generated edges {E}")

    def col(odo_vals, lc_vals, dtype=np.int32):
        out = np.zeros(cap, dtype)
        out[:E_odo] = odo_vals
        out[E_odo:E] = lc_vals
        return out

    Rm = np.broadcast_to(np.eye(3, dtype=np.float32), (cap, 3, 3)).copy()
    tm = np.zeros((cap, 3), np.float32)
    Rm[:E_odo], tm[:E_odo] = R_odo, t_odo
    Rm[E_odo:E], tm[E_odo:E] = R_lc, t_lc
    kap = np.zeros(cap, np.float32)
    ta = np.zeros(cap, np.float32)
    kap[:E] = kappa
    ta[:E] = tau

    edges = PoseGraphEdges(
        src_robot=jnp.asarray(col(rr, lr1)),
        src_pose=jnp.asarray(col(kk, lk1)),
        dst_robot=jnp.asarray(col(rr, lr2)),
        dst_pose=jnp.asarray(col(kk + 1, lk2)),
        R=jnp.asarray(Rm),
        t=jnp.asarray(tm),
        kappa=jnp.asarray(kap),
        tau=jnp.asarray(ta),
        etype=jnp.asarray(col(np.full(E_odo, EDGE_ODOMETRY, np.int32), let)),
    )
    out = np.zeros(cap, bool)
    out[E_odo:E] = lout
    return SyntheticGraph(
        edges=edges,
        R_gt=jnp.asarray(R_gt),
        t_gt=jnp.asarray(t_gt),
        is_outlier=jnp.asarray(out),
        n_robots=n_robots,
        poses_per_robot=n_poses,
    )
