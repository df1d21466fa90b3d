"""Sequence parallelism: pose-chain sharding with halo exchange.

SURVEY.md section 2.3 row 8 / section 5 "Long-context": when one robot's
trajectory outgrows a chip, its pose chain is split into contiguous blocks
across the chips of its sub-mesh. Chain (odometry) coupling is local —
each CG iteration exchanges only the boundary poses with ring neighbors
(`ppermute` halo); loop-closure coupling is sparse — endpoint values are
combined with one small psum over a fixed-capacity endpoint table. Per-
iteration communication is O(1) + O(E_lc), not O(N).

Implemented for the chain-structured linear systems the back-end actually
solves (translation recovery / chordal-style normal equations: graph
Laplacian over chain + loop-closure edges). The sharded solver is asserted
equal to the single-device solve in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import SHARD_AXIS


def make_chain_translation_solver(
    mesh,
    n_poses: int,
    lc_capacity: int,
    cg_iters: int = 100,
    anchor_weight: float = 1e3,
):
    """Builds a sharded solver for

        min_t  sum_chain wc_i ||t_{i+1} - t_i - d_i||^2
             + sum_lc w_e ||t_{dst_e} - t_{src_e} - d_e||^2
             + anchor ||t_0||^2

    d_chain: (n_poses-1, 3) chain deltas (padded to n_poses rows);
    lc_src/lc_dst: (lc_capacity,) int32 (-1 padding); lc_d: (lc_capacity, 3);
    lc_w: (lc_capacity,). Returns t (n_poses, 3), chain-sharded.

    Per-chain-edge weights wc (row i = weight of edge i -> i+1, last row
    ignored) let one solve cover a CONCATENATED fleet chain: robot
    boundaries get wc = 0 (no odometry between robots), inter-robot
    coupling rides the LC table — this is how the production back-end
    refines all translations in one sequence-parallel pass
    (cli/run.py --chain-refine).
    """
    S = mesh.shape[SHARD_AXIS]
    assert n_poses % S == 0
    n_local = n_poses // S

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(SHARD_AXIS), P(SHARD_AXIS), P(SHARD_AXIS),
                  P(), P(), P(), P()),
        out_specs=P(SHARD_AXIS),
        check_vma=False,
    )
    def _solve(d_chain_local, wc_local, x0_local, lc_src, lc_dst, lc_d,
               lc_w):
        s = jax.lax.axis_index(SHARD_AXIS)
        base = s * n_local
        gidx = base + jnp.arange(n_local)  # global pose ids of this shard

        lc_valid = lc_src >= 0
        w = jnp.where(lc_valid, lc_w, 0.0)

        def halo(v_local):
            """Value of the pose just left of this block (from neighbor)
            and just right (from the other neighbor)."""
            left = jax.lax.ppermute(
                v_local[-1], SHARD_AXIS,
                [(i, (i + 1) % S) for i in range(S)])
            right = jax.lax.ppermute(
                v_local[0], SHARD_AXIS,
                [(i, (i - 1) % S) for i in range(S)])
            return left, right  # (3,), (3,)

        def lc_values(v_local):
            """All LC endpoint values, assembled with one psum: each shard
            contributes the endpoints it owns."""
            def pick(ids):
                local = ids - base
                own = (ids >= base) & (ids < base + n_local) & lc_valid
                vals = v_local[jnp.clip(local, 0, n_local - 1)]
                return jnp.where(own[:, None], vals, 0.0)

            src_v = jax.lax.psum(pick(lc_src), SHARD_AXIS)
            dst_v = jax.lax.psum(pick(lc_dst), SHARD_AXIS)
            return src_v, dst_v

        def scatter_own(ids, vals):
            """Scatter-add (lc_capacity, 3) values onto owned local poses."""
            local = jnp.clip(ids - base, 0, n_local - 1)
            own = (ids >= base) & (ids < base + n_local) & lc_valid
            out = jnp.zeros((n_local, 3))
            return out.at[local].add(jnp.where(own[:, None], vals, 0.0))

        # weight of the chain edge LEFT of pose i (edge i-1 -> i) needs
        # the neighbor's last weight, exchanged once outside the CG loop
        wc_left = jax.lax.ppermute(
            wc_local[-1], SHARD_AXIS, [(i, (i + 1) % S) for i in range(S)])
        wcm1 = jnp.concatenate([wc_left[None], wc_local[:-1]], axis=0)
        has_left = gidx > 0
        has_right = gidx < n_poses - 1
        wl = jnp.where(has_left, wcm1, 0.0)  # weight of edge into pose i
        wr = jnp.where(has_right, wc_local, 0.0)  # weight of edge out

        def matvec(v_local):
            """Normal-equation matvec: weighted chain Laplacian + LC terms
            + anchor."""
            left, right = halo(v_local)
            vm1 = jnp.concatenate([left[None], v_local[:-1]], axis=0)
            vp1 = jnp.concatenate([v_local[1:], right[None]], axis=0)
            # chain residual r_i = wc_i (v_{i+1} - v_i) contributes:
            # (A^T A v)_i = wc_{i-1}(v_i - v_{i-1}) + wc_i(v_i - v_{i+1})
            out = (wl + wr)[:, None] * v_local \
                - wl[:, None] * vm1 - wr[:, None] * vp1
            # LC terms: r_e = v_dst - v_src; (A^T A v) adds w_e (v_dst-v_src)
            # to dst and the negative to src
            src_v, dst_v = lc_values(v_local)
            diff = (dst_v - src_v) * w[:, None]
            out = out + scatter_own(lc_dst, diff) - scatter_own(lc_src, diff)
            # anchor on pose 0
            out = out + jnp.where((gidx == 0)[:, None],
                                  anchor_weight * v_local, 0.0)
            return out

        # right-hand side b = A^T d: weighted chain r_i gives
        # b_j = wc_{j-1} d_{j-1} - wc_j d_j (boundary terms masked)
        dm1 = jnp.concatenate(
            [halo(d_chain_local)[0][None], d_chain_local[:-1]], axis=0)
        b = wl[:, None] * dm1 - wr[:, None] * d_chain_local
        # LC rhs
        lcd = lc_d * w[:, None]
        b = b + scatter_own(lc_dst, lcd) - scatter_own(lc_src, lcd)

        # CG
        def cg(_, st):
            x, r, p_, rs = st
            Ap = matvec(p_)
            pAp = jax.lax.psum(jnp.sum(p_ * Ap), SHARD_AXIS)
            alpha = rs / jnp.maximum(pAp, 1e-20)
            x = x + alpha * p_
            r = r - alpha * Ap
            rs2 = jax.lax.psum(jnp.sum(r * r), SHARD_AXIS)
            beta = rs2 / jnp.maximum(rs, 1e-20)
            return x, r, r + beta * p_, rs2

        # warm start: CG never moves components whose residual is zero, so
        # a block disconnected from the anchor (all its LCs zero-weighted)
        # keeps its initial placement instead of collapsing to min-norm
        r0 = b - matvec(x0_local)
        rs0 = jax.lax.psum(jnp.sum(r0 * r0), SHARD_AXIS)
        x, *_ = jax.lax.fori_loop(0, cg_iters, cg, (x0_local, r0, r0, rs0))
        return x

    @jax.jit
    def solve(d_chain, lc_src, lc_dst, lc_d, lc_w, w_chain=None, x0=None):
        """d_chain: (n_poses, 3) with row i = measured t_{i+1} - t_i
        (last row ignored/zero). w_chain: (n_poses,) chain-edge weights
        (None = all ones). x0: (n_poses, 3) warm start (None = zeros)."""
        if w_chain is None:
            w_chain = jnp.ones((n_poses,), d_chain.dtype)
        if x0 is None:
            x0 = jnp.zeros((n_poses, 3), d_chain.dtype)
        sh = NamedSharding(mesh, P(SHARD_AXIS))
        return _solve(jax.device_put(d_chain, sh),
                      jax.device_put(w_chain, sh),
                      jax.device_put(x0, sh),
                      lc_src, lc_dst, lc_d, lc_w)

    return solve


def chain_translation_reference(n_poses, d_chain, lc_src, lc_dst, lc_d,
                                lc_w, anchor_weight=1e3, w_chain=None):
    """Single-device dense reference solution (for tests)."""
    import numpy as np

    if w_chain is None:
        w_chain = np.ones(n_poses)
    A_rows = []
    b_rows = []
    for i in range(n_poses - 1):
        sw = np.sqrt(w_chain[i])
        row = np.zeros(n_poses)
        row[i + 1], row[i] = sw, -sw
        A_rows.append(row)
        b_rows.append(np.asarray(d_chain[i]) * sw)
    for e in range(len(lc_src)):
        if lc_src[e] < 0:
            continue
        row = np.zeros(n_poses)
        row[lc_dst[e]], row[lc_src[e]] = 1, -1
        A_rows.append(row * np.sqrt(lc_w[e]))
        b_rows.append(np.asarray(lc_d[e]) * np.sqrt(lc_w[e]))
    row = np.zeros(n_poses)
    row[0] = np.sqrt(anchor_weight)
    A_rows.append(row)
    b_rows.append(np.zeros(3))
    A = np.stack(A_rows)
    b = np.stack(b_rows)
    return np.linalg.lstsq(A, b, rcond=None)[0]
