"""Rank-lifted Riemannian block-coordinate descent — the dpgo core.

TPU-native redesign of dpgo's `PGOAgent::iterate()` (SURVEY.md section 2.1
`dpgo` row; images/kimera-multi.drawio:2460-2520): pose blocks are lifted to
St(d, r) x R^r (Riemannian staircase rank r > d smooths away the local
minima of SE(d) optimization), and each robot updates its own block with
neighbors fixed.

Differences from the reference, by design (SURVEY.md section 7.4):
  * parallel (Jacobi-style) RBCD: all robot blocks update simultaneously
    against last-round neighbor poses, instead of dpgo's leader-designated
    round-robin (`drawio:2364,2478-2481`). The synchronous schedule is the
    TPU-native replacement for the ROS command state machine; dpgo's own
    `runOnceSynchronous` (drawio:2071) licenses the semantics.
  * block updates are preconditioned Riemannian gradient descent with a
    backtracking step ladder (fixed trials, masked argmin) instead of
    ROPTLIB's Riemannian trust region — fixed-shape, branchless.
  * GNC-TLS weights (solve/gnc.py) update on shared edges exactly like the
    reference's UPDATE_WEIGHT rounds (drawio:2175-2215).

The same functions run single-device (vmap over the robot axis) and
sharded (dist/rounds.py wraps them in shard_map; robots = mesh axis).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import stiefel
from ..core.containers import PoseGraphEdges
from .pgo import PgoParams

_EPS = 1e-12


class EdgeBuckets(NamedTuple):
    """Per-robot edge buckets: the edges touching each robot, gathered into
    dense padded (R, Em) arrays so a block update is O(E_robot), not
    O(E_total)-masked. This is the TPU analogue of dpgo's per-agent cached
    data matrices (`PoseGraph::addMeasurement` routing + `clearDataMatrices`,
    images/kimera-multi.drawio:2268,2790-2826): each agent only ever sees
    its own odometry/private/shared edges."""

    idx: jnp.ndarray  # (R, Em) int32 index into the flat edge arrays
    valid: jnp.ndarray  # (R, Em) bool
    src_robot: jnp.ndarray  # (R, Em) int32
    src_pose: jnp.ndarray  # (R, Em) int32
    dst_robot: jnp.ndarray  # (R, Em) int32
    dst_pose: jnp.ndarray  # (R, Em) int32
    R: jnp.ndarray  # (R, Em, 3, 3)
    t: jnp.ndarray  # (R, Em, 3)
    kappa: jnp.ndarray  # (R, Em)
    tau: jnp.ndarray  # (R, Em)


def bucket_edges(edges: PoseGraphEdges, n_robots: int,
                 pad_multiple: int = 8) -> EdgeBuckets:
    """Host-side bucketing (one-time, at REQUEST_POSE_GRAPH). Every valid
    edge lands in the bucket of each robot it touches (shared LCs appear in
    two buckets, exactly like dpgo keeps shared_lcs_ on both agents)."""
    sr = np.asarray(edges.src_robot)
    dr = np.asarray(edges.dst_robot)
    valid = np.asarray(edges.valid)
    per_robot = [np.nonzero(valid & ((sr == r) | (dr == r)))[0]
                 for r in range(n_robots)]
    em = max((len(ix) for ix in per_robot), default=1)
    em = max(pad_multiple, int(np.ceil(em / pad_multiple)) * pad_multiple)
    idx = np.zeros((n_robots, em), np.int32)
    bval = np.zeros((n_robots, em), bool)
    for r, ix in enumerate(per_robot):
        idx[r, : len(ix)] = ix
        bval[r, : len(ix)] = True
    gi = jnp.asarray(idx)
    take = lambda a: jnp.asarray(np.asarray(a))[gi]
    return EdgeBuckets(
        idx=gi,
        valid=jnp.asarray(bval),
        src_robot=take(edges.src_robot),
        src_pose=take(edges.src_pose),
        dst_robot=take(edges.dst_robot),
        dst_pose=take(edges.dst_pose),
        R=take(edges.R),
        t=take(edges.t),
        kappa=take(edges.kappa),
        tau=take(edges.tau),
    )


def bucket_slice(buckets: EdgeBuckets, r) -> EdgeBuckets:
    """One robot's bucket (Em, ...) — works with traced r (dynamic index)."""
    return jax.tree_util.tree_map(lambda a: a[r], buckets)


class RbcdConfig(NamedTuple):
    rank: int = 5  # staircase rank r (> d = 3)
    inner_iters: int = 3  # (direction -> global step) cycles per round
    cg_iters: int = 8  # PCG iterations for the block Newton solve
    step_init: float = 1.0  # cap on the exact-chord step (s* <= 4x this)
    precond: bool = True  # block-Jacobi (per-pose 4x4) PCG


def lift_params(
    params: PgoParams, ylift: jnp.ndarray, n_robots: int, poses_per_robot: int
) -> jnp.ndarray:
    """SE(3) params -> lifted blocks Y (R, N, r, d+1) via the shared
    lifting matrix (reference: leader broadcasts YLift, drawio:2313-2322)."""
    Y = stiefel.lift_poses(params.R, params.t, ylift)
    r, dp1 = ylift.shape[0], 4
    return Y.reshape(n_robots, poses_per_robot, r, dp1)


def lifted_cost(
    Y_flat: jnp.ndarray,  # (N_total, r, d+1)
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    poses_per_robot: int,
) -> jnp.ndarray:
    """f(Y) = sum_e w_e [kappa ||YR_j - YR_i R_ij||^2
                         + tau ||yt_j - yt_i - YR_i t_ij||^2]."""
    src, dst = edges.global_ids(poses_per_robot)
    Yi, Yj = Y_flat[src], Y_flat[dst]
    YRi, yti = Yi[..., :3], Yi[..., 3]
    YRj, ytj = Yj[..., :3], Yj[..., 3]
    w = jnp.where(edges.valid, edge_weights, 0.0)
    r_rot = YRj - jnp.einsum("erd,edf->erf", YRi, edges.R)
    r_tr = ytj - yti - jnp.einsum("erd,ed->er", YRi, edges.t)
    c_rot = jnp.sum(r_rot * r_rot, axis=(-1, -2)) * edges.kappa
    c_tr = jnp.sum(r_tr * r_tr, axis=-1) * edges.tau
    return jnp.sum(w * (c_rot + c_tr))


def lifted_edge_sq_errors(
    Y_flat: jnp.ndarray, edges: PoseGraphEdges, poses_per_robot: int
) -> jnp.ndarray:
    """Per-edge whitened squared error in the lifted space (GNC r^2).

    Comparable to barc2 thresholds since at rank d the lifted residual
    equals the chordal SE(3) residual."""
    src, dst = edges.global_ids(poses_per_robot)
    Yi, Yj = Y_flat[src], Y_flat[dst]
    YRi, yti = Yi[..., :3], Yi[..., 3]
    YRj, ytj = Yj[..., :3], Yj[..., 3]
    r_rot = YRj - jnp.einsum("erd,edf->erf", YRi, edges.R)
    r_tr = ytj - yti - jnp.einsum("erd,ed->er", YRi, edges.t)
    return (
        jnp.sum(r_rot * r_rot, axis=(-1, -2)) * edges.kappa
        + jnp.sum(r_tr * r_tr, axis=-1) * edges.tau
    )


def _block_cost(
    Y_own: jnp.ndarray,  # (N, r, d+1) this robot's block
    Y_all: jnp.ndarray,  # (R, N, r, d+1) all blocks (last round)
    robot: jnp.ndarray,  # scalar int
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Cost restricted to edges touching `robot`, with this robot's block
    taken from Y_own and all others from Y_all (detached)."""
    n_robots, N = Y_all.shape[0], Y_all.shape[1]
    Y_fixed = jax.lax.stop_gradient(Y_all)

    # ONE concatenated endpoint gather (src rows then dst rows): its
    # transpose is a single scatter-add, where two separate picks cost
    # two scatter fusions per Hessian-vector product — the dominant ops
    # of the CG loop in the round-5 device profile (33 ms of a 99 ms
    # 6x2048 round)
    rob2 = jnp.concatenate([edges.src_robot, edges.dst_robot])
    idx2 = jnp.concatenate([edges.src_pose, edges.dst_pose])
    Yg = jnp.where((rob2 == robot)[:, None, None], Y_own[idx2],
                   Y_fixed[rob2, idx2])
    Em = edges.src_robot.shape[0]
    Yi, Yj = Yg[:Em], Yg[Em:]
    touches = (edges.src_robot == robot) | (edges.dst_robot == robot)
    w = jnp.where(edges.valid & touches, edge_weights, 0.0)
    YRi, yti = Yi[..., :3], Yi[..., 3]
    YRj, ytj = Yj[..., :3], Yj[..., 3]
    r_rot = YRj - jnp.einsum("erd,edf->erf", YRi, edges.R)
    r_tr = ytj - yti - jnp.einsum("erd,ed->er", YRi, edges.t)
    c = jnp.sum(r_rot * r_rot, axis=(-1, -2)) * edges.kappa + jnp.sum(
        r_tr * r_tr, axis=-1
    ) * edges.tau
    return jnp.sum(w * c)


def _block_cost_bucketed(
    Y_own: jnp.ndarray,  # (N, r, d+1)
    Y_all: jnp.ndarray,  # (R, N, r, d+1)
    robot: jnp.ndarray,  # scalar int
    b: EdgeBuckets,  # one robot's slice: fields (Em, ...)
    w: jnp.ndarray,  # (Em,) gathered edge weights
) -> jnp.ndarray:
    """Same cost as `_block_cost` restricted to this robot's bucket —
    O(E_robot) instead of O(E_total)-masked."""
    Y_fixed = jax.lax.stop_gradient(Y_all)

    # single concatenated endpoint gather — one scatter-add per HVP in
    # the CG loop instead of two (see _block_cost)
    rob2 = jnp.concatenate([b.src_robot, b.dst_robot])
    idx2 = jnp.concatenate([b.src_pose, b.dst_pose])
    Yg = jnp.where((rob2 == robot)[:, None, None], Y_own[idx2],
                   Y_fixed[rob2, idx2])
    Em = b.src_robot.shape[0]
    Yi, Yj = Yg[:Em], Yg[Em:]
    ww = jnp.where(b.valid, w, 0.0)
    YRi, yti = Yi[..., :3], Yi[..., 3]
    YRj, ytj = Yj[..., :3], Yj[..., 3]
    r_rot = YRj - jnp.einsum("erd,edf->erf", YRi, b.R)
    r_tr = ytj - yti - jnp.einsum("erd,ed->er", YRi, b.t)
    c = jnp.sum(r_rot * r_rot, axis=(-1, -2)) * b.kappa + jnp.sum(
        r_tr * r_tr, axis=-1
    ) * b.tau
    return jnp.sum(ww * c)


def _block_jacobi_inv(src_pose, dst_pose, own_src, own_dst, t_e, kappa,
                      tau, w, n_poses: int) -> jnp.ndarray:
    """Inverted per-pose 4x4 diagonal blocks of the block Hessian.

    The lifted block cost is exactly quadratic in Y_own and acts
    IDENTICALLY AND INDEPENDENTLY on each of the r rows of a pose's
    (r, d+1) block (every residual is linear with the same coefficients
    per row), so the true block Hessian is a pose-coupled matrix tensored
    with I_r. Its per-pose 4x4 diagonal blocks are analytic: an edge
    (i -> j) with residuals r_rot = uR_j - uR_i R_ij and
    r_tr = ut_j - ut_i - uR_i t_ij contributes (per unit row u)

      at the SOURCE pose i:  2 w [kappa * R R^T (= kappa I, R orthogonal)
                                  on uR, plus tau * outer([t;1], [t;1])]
      at the DEST   pose j:  2 w [kappa I on uR, tau on ut]

    Damped with the CG operator's 1e-6 Tikhonov term so the
    preconditioner is exact for edge-free (padded) poses. Returns
    (n_poses, 4, 4) inverses for block-Jacobi PCG.

    Role of dpgo/ROPTLIB's preconditioned inner solve (the reference
    solves its block subproblem with a Riemannian trust region over
    cached data matrices, images/kimera-multi.drawio:2268,2513); here the
    preconditioner is what keeps the CG iteration count — the sequential,
    latency-bound part of an RBCD round on TPU — small."""
    e4 = jnp.eye(4)
    rot_mask = jnp.diag(jnp.asarray([1.0, 1.0, 1.0, 0.0]))
    u = jnp.concatenate([t_e, jnp.ones_like(t_e[..., :1])], axis=-1)
    H_src = (2.0 * w)[..., None, None] * (
        kappa[..., None, None] * rot_mask
        + tau[..., None, None] * (u[..., :, None] * u[..., None, :]))
    H_dst = (2.0 * w)[..., None, None] * (
        kappa[..., None, None] * rot_mask
        + tau[..., None, None] * (e4 - rot_mask))
    H = jnp.zeros((n_poses, 4, 4))
    H = H.at[src_pose].add(
        jnp.where(own_src[..., None, None], H_src, 0.0))
    H = H.at[dst_pose].add(
        jnp.where(own_dst[..., None, None], H_dst, 0.0))
    H = H + 1e-6 * e4
    return _spd4_inv(H)


def _spd4_inv(H: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched SPD 4x4 blocks via the (3, 1) Schur
    split: ~60 elementwise FLOPs per block on the VPU. `jnp.linalg.inv`
    lowers to a pivoted-LU custom call that profiled at 12.6 ms per cycle
    on the 6x2048 graph (26% of the whole RBCD round)."""
    A = H[..., :3, :3]
    b = H[..., :3, 3]
    c = H[..., 3, 3]
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02  # > 0 (SPD + damping)
    inv_det = 1.0 / det
    Ainv = jnp.stack([
        jnp.stack([c00, c01, c02], axis=-1),
        jnp.stack([c01, c11, c12], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2) * inv_det[..., None, None]
    u = jnp.einsum("...ij,...j->...i", Ainv, b)
    s = c - jnp.sum(b * u, axis=-1)  # Schur complement > 0
    inv_s = 1.0 / s
    tl = Ainv + inv_s[..., None, None] * (u[..., :, None] * u[..., None, :])
    tr = -inv_s[..., None] * u
    top = jnp.concatenate([tl, tr[..., :, None]], axis=-1)  # (..., 3, 4)
    bot = jnp.concatenate([tr, inv_s[..., None]],
                          axis=-1)[..., None, :]  # (..., 1, 4)
    return jnp.concatenate([top, bot], axis=-2)


def _newton_cg(cost_fn, Y_own: jnp.ndarray, cfg: RbcdConfig,
               Minv: jnp.ndarray | None = None) -> jnp.ndarray:
    """Matrix-free block Newton direction via (preconditioned) CG.

    The Hessian-vector product comes from `jax.linearize` of the
    gradient: the primal gradient trace runs ONCE (it re-gathers the
    fixed neighbor poses, which do not change during CG), and each CG
    step applies only the linear tangent map. `Minv` (from
    `_block_jacobi_inv`) enables block-Jacobi PCG."""
    g, hvp_lin = jax.linearize(jax.grad(cost_fn), Y_own)

    def hvp(v):
        return hvp_lin(v) + 1e-6 * v

    if Minv is None:
        apply_M = lambda r: r
    else:
        apply_M = lambda r: jnp.einsum("nab,nkb->nka", Minv, r)

    def cg_body(_, st):
        x, r, p, rs = st
        Ap = hvp(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-20)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rs2 = jnp.sum(r * z)
        p = z + (rs2 / jnp.maximum(rs, 1e-20)) * p
        return x, r, p, rs2

    b = -g
    z0 = apply_M(b)
    delta, *_ = jax.lax.fori_loop(
        0, cfg.cg_iters, cg_body,
        (jnp.zeros_like(b), b, z0, jnp.sum(b * z0))
    )
    return delta


def bucket_precond(bucket: EdgeBuckets, robot: jnp.ndarray,
                   edge_weights: jnp.ndarray,
                   n_poses: int) -> jnp.ndarray:
    """(N, 4, 4) block-Jacobi inverses for one robot's bucket slice.

    Depends only on the edges and their weights — NOT on Y — so callers
    compute it ONCE per round (or per weight update) and reuse it across
    inner cycles: rebuilding + LU-inverting it inside every cycle was
    26% of a 6x2048 round in the round-5 device profile."""
    w = edge_weights[bucket.idx]
    ww = jnp.where(bucket.valid, w, 0.0)
    return _block_jacobi_inv(
        bucket.src_pose, bucket.dst_pose,
        (bucket.src_robot == robot) & bucket.valid,
        (bucket.dst_robot == robot) & bucket.valid,
        bucket.t, bucket.kappa, bucket.tau, ww, n_poses)


def block_direction_bucketed(
    Y_own: jnp.ndarray,
    Y_all: jnp.ndarray,
    robot: jnp.ndarray,
    bucket: EdgeBuckets,  # one robot's slice (Em, ...)
    edge_weights: jnp.ndarray,  # (E_total,) flat weights
    cfg: RbcdConfig,
    Minv: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Newton direction over this robot's edge bucket only. Pass `Minv`
    (from `bucket_precond`, hoisted out of the cycle loop) to avoid
    rebuilding the preconditioner per call."""
    w = edge_weights[bucket.idx]
    cost_fn = lambda Y: _block_cost_bucketed(Y, Y_all, robot, bucket, w)
    if Minv is None and cfg.precond:
        Minv = bucket_precond(bucket, robot, edge_weights, Y_own.shape[0])
    return _newton_cg(cost_fn, Y_own, cfg, Minv)


def block_direction(
    Y_own: jnp.ndarray,
    Y_all: jnp.ndarray,
    robot: jnp.ndarray,
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    cfg: RbcdConfig,
    Minv: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Newton direction for one robot's block (role of dpgo's ROPTLIB inner
    solve per UPDATE command, drawio:2010,2513).

    The lifted cost is exactly quadratic in a single block (the manifold
    constraint is the only nonlinearity), so the unconstrained block Newton
    system is solved matrix-free with CG (Hessian-vector products via
    forward-over-reverse autodiff) — no ROPTLIB, no cached data matrices
    (cf. `clearDataMatrices`, drawio:2268 — there is nothing to
    invalidate).

    O(E_total) masked evaluation — prefer `block_direction_bucketed` (same
    semantics, O(E_robot)) anywhere a bucketing is available."""
    cost_fn = lambda Y: _block_cost(Y, Y_all, robot, edges, edge_weights)
    if Minv is None and cfg.precond:
        Minv = masked_precond(edges, robot, edge_weights, Y_own.shape[0])
    return _newton_cg(cost_fn, Y_own, cfg, Minv)


def masked_precond(edges: PoseGraphEdges, robot: jnp.ndarray,
                   edge_weights: jnp.ndarray, n_poses: int) -> jnp.ndarray:
    """O(E_total)-masked counterpart of `bucket_precond`."""
    ww = jnp.where(edges.valid, edge_weights, 0.0)
    return _block_jacobi_inv(
        edges.src_pose, edges.dst_pose,
        (edges.src_robot == robot) & edges.valid,
        (edges.dst_robot == robot) & edges.valid,
        edges.t, edges.kappa, edges.tau, ww, n_poses)


def _global_step(
    Y: jnp.ndarray,  # (R, N, r, d+1)
    deltas: jnp.ndarray,  # (R, N, r, d+1) proposed block directions
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    poses_per_robot: int,
    cfg: RbcdConfig,
) -> jnp.ndarray:
    """Accept the best point on the combined-direction chord. This is what
    makes parallel (Jacobi) block updates convergent: simultaneous full
    block steps overshoot on shared edges (both endpoints move), but the
    combined direction is still a descent direction, so a damped global
    step always exists. The search is replicated bit-identically on every
    shard — no coordination needed.

    The lifted cost is EXACTLY quadratic along the chord Y + s*deltas (all
    residuals are linear in Y), so the chord minimizer is closed-form from
    two jvp's: c(s) = c0 + b s + h s^2 / 2 with b = <grad, deltas> and
    h = d^2c/ds^2 constant. The retraction bends the chord back onto the
    manifold, so the exact chordal step is safeguarded by evaluating the
    retracted cost at {s*, s*/2, s*/4} and keeping the best improvement.
    This replaces the round-2 fixed 8-step backtracking ladder (9 full
    retraction+cost evaluations per cycle — the campus-scale scaling wall,
    VERDICT round-2 item 5) with 2 jvp's + 3 retracted evaluations, and
    picks the exactly-optimal damping instead of the nearest power of 1/2."""
    d = 3

    def total_cost(Yc):
        return lifted_cost(
            Yc.reshape(-1, Yc.shape[2], Yc.shape[3]), edges, edge_weights,
            poses_per_robot,
        )

    c0, b = jax.jvp(total_cost, (Y,), (deltas,))
    _, h = jax.jvp(lambda Yc: jax.jvp(total_cost, (Yc,), (deltas,))[1],
                   (Y,), (deltas,))
    # descent direction => b < 0; h = 2||J deltas||^2_w >= 0
    s_star = jnp.where(h > _EPS, -b / jnp.maximum(h, _EPS), 0.0)
    s_star = jnp.clip(s_star, 0.0, 4.0 * cfg.step_init)
    # deep fallbacks: on a high-curvature graph the retraction can bend
    # the chord enough that even s*/4 fails; a sufficiently small step
    # along a descent direction always improves, so probing down to s*/64
    # prevents a deterministic no-step stall
    steps = s_star * jnp.asarray([1.0, 0.5, 0.25, 1.0 / 16, 1.0 / 64])

    def try_step(s):
        Yc = stiefel.lifted_retract(Y, s * deltas, d)
        return total_cost(Yc)

    costs = jax.vmap(try_step)(steps)
    best = jnp.argmin(costs)
    improved = costs[best] < c0
    Y_new = stiefel.lifted_retract(Y, steps[best] * deltas, d)
    take = improved.astype(Y.dtype)
    return take * Y_new + (1.0 - take) * Y


def rbcd_round_reference(
    Y: jnp.ndarray,  # (R, N, r, d+1)
    active: jnp.ndarray,  # (R,) bool
    edges: PoseGraphEdges,
    edge_weights: jnp.ndarray,
    cfg: RbcdConfig,
    poses_per_robot: int | None = None,
    buckets: EdgeBuckets | None = None,
) -> jnp.ndarray:
    """Single-device reference semantics: `inner_iters` cycles of
    (parallel block Newton directions) -> (global damped step). The
    sharded path (dist/rounds.py) must match this exactly.

    With `buckets` (from `bucket_edges`) each block direction costs
    O(E_robot); without, the O(E_total)-masked path is used."""
    ppr = poses_per_robot if poses_per_robot is not None else Y.shape[1]
    robots = jnp.arange(Y.shape[0])
    n_poses = Y.shape[1]

    # preconditioner blocks depend only on (edges, weights) — build them
    # ONCE per round, not once per inner cycle (round-5 profile: the
    # in-cycle rebuild was 26% of a 6x2048 round)
    if cfg.precond:
        if buckets is not None:
            Minv_all = jax.vmap(
                lambda r, b: bucket_precond(b, r, edge_weights, n_poses)
            )(robots, buckets)
        else:
            Minv_all = jax.vmap(
                lambda r: masked_precond(edges, r, edge_weights, n_poses)
            )(robots)
    else:
        Minv_all = None

    def cycle(_, Yc):
        if buckets is not None:
            def one(robot, bslice, Minv):
                return block_direction_bucketed(
                    Yc[robot], Yc, robot, bslice, edge_weights, cfg,
                    Minv=Minv)

            deltas = jax.vmap(one)(robots, buckets, Minv_all)
        else:
            def one(robot, Minv):
                return block_direction(Yc[robot], Yc, robot, edges,
                                       edge_weights, cfg, Minv=Minv)

            deltas = jax.vmap(one)(robots, Minv_all)
        deltas = jnp.where(active[:, None, None, None], deltas, 0.0)
        return _global_step(Yc, deltas, edges, edge_weights, ppr, cfg)

    return jax.lax.fori_loop(0, cfg.inner_iters, cycle, Y)


def solve_rounds(
    Y0: jnp.ndarray,
    active: jnp.ndarray,
    edges: PoseGraphEdges,
    poses_per_robot: int,
    cfg: RbcdConfig,
    n_rounds: int = 30,
    gnc_weights: jnp.ndarray | None = None,
    buckets: EdgeBuckets | None = None,
):
    """Fixed-round RBCD driver (single-device). Returns final Y."""
    w = gnc_weights if gnc_weights is not None else jnp.ones(edges.capacity)

    def body(Y, _):
        Y = rbcd_round_reference(Y, active, edges, w, cfg, poses_per_robot,
                                 buckets)
        return Y, lifted_cost(
            Y.reshape(-1, *Y.shape[2:]), edges, w, poses_per_robot
        )

    Y, costs = jax.lax.scan(body, Y0, None, length=n_rounds)
    return Y, costs
