"""Intra-robot tensor parallelism: RANSAC hypothesis sharding.

SURVEY.md section 2.3 row 7 — the workload's "TP": shard the per-candidate
RANSAC hypothesis batch across the chips of a robot's sub-mesh
(mesh SHARD_AXIS). Each shard solves and scores its slice of the
hypothesis table; the winning model is selected with one small all_gather;
the consensus refit is replicated. The hypothesis table itself is
generated identically on every shard and sliced, so results are BITWISE
EQUAL to the single-chip path (asserted in tests) — sharding changes
wall-clock, never answers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..kernels import minimal, ransac, score
from .mesh import SHARD_AXIS


def make_sharded_arun(mesh, n_hyp: int = 512, threshold: float = 0.3,
                      min_inliers: int = 5):
    """Builds a jitted sharded 3d3d RANSAC with reference semantics.

    n_hyp must be divisible by the shard-axis size.
    """
    n_shards = mesh.shape[SHARD_AXIS]
    assert n_hyp % n_shards == 0, (n_hyp, n_shards)
    h_local = n_hyp // n_shards

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def _run(key, p, q, valid):
        # identical full hypothesis table on every shard, then slice.
        # Solve + score use the SAME helpers as the single-chip
        # ransac_arun — per-hypothesis arithmetic is batch-independent,
        # so the sharded counts are bitwise equal to the full-table ones.
        picks_full, order, inv_order = ransac._masked_sample_parts(
            key, valid, n_hyp, 3)
        s = jax.lax.axis_index(SHARD_AXIS)
        picks = jax.lax.dynamic_slice_in_dim(picks_full, s * h_local, h_local)
        R_h, t_h, ok_h = ransac.solve_arun_hyps(p, q, picks, order,
                                                inv_order)
        counts = score.rigid_counts(R_h, t_h, p, q, valid, threshold) * ok_h
        best_local = jnp.argmax(counts)
        # gather per-shard winners; the global argmax ties broken by shard
        # order to match the single-device argmax over the full table
        cand = jnp.concatenate([
            counts[best_local][None].astype(jnp.float32),
            (s * h_local + best_local)[None].astype(jnp.float32),
            R_h[best_local].reshape(9),
            t_h[best_local],
        ])  # (14,)
        allc = jax.lax.all_gather(cand, SHARD_AXIS, axis=0)  # (S, 14)
        # single-device argmax picks the FIRST max in table order: emulate
        # by preferring lower global hypothesis index on count ties
        cnts = allc[:, 0]
        gidx = allc[:, 1]
        keyed = cnts - gidx * 1e-9
        w = jnp.argmax(keyed)
        R_b = allc[w, 2:11].reshape(3, 3)
        t_b = allc[w, 11:14]
        # replicated consensus refit (identical on all shards).
        # p, q are SoA (3, K) — the pipeline-wide point layout.
        def _inl(R_b, t_b):
            r = q - (R_b @ p + t_b[:, None])
            return (jnp.sum(r * r, axis=0) < threshold * threshold) & valid

        best_inl = _inl(R_b, t_b)
        R_r, t_r, ok_r = minimal.arun_3d3d_soa(p, q,
                                               best_inl.astype(p.dtype))
        use = ok_r & (jnp.sum(best_inl) >= 3)
        R_b = jnp.where(use, R_r, R_b)
        t_b = jnp.where(use, t_r, t_b)
        best_inl = _inl(R_b, t_b)
        n_inl = jnp.sum(best_inl).astype(jnp.int32)
        return R_b, t_b, best_inl, n_inl

    @jax.jit
    def run(key, p, q, valid):
        """p, q: (3, K) SoA points; valid: (K,)."""
        R, t, inl, n = _run(key, p, q, valid)
        return {"R": R, "t": t, "inliers": inl, "n_inliers": n,
                "ok": n >= min_inliers}

    return run
