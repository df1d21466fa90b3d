"""Deterministic counter-based RNG policy.

The reference fork's headline contribution is determinism: fixed seeds per
node (`1014-example.yaml:50-69`), `ransac_randomize: 0`
(`params/D455/LcdParams.yaml:66`), and a thread-local RNG in OpenGV
(`README.md:35`). On TPU we get determinism by construction: every random
draw is keyed by a structural address (robot, keyframe, round, purpose) via
threefry fold-ins, so results are independent of execution order, batching,
and device count (SURVEY.md section 5 "Race detection").
"""

from __future__ import annotations

from enum import IntEnum

import jax
import jax.numpy as jnp


class Stream(IntEnum):
    """Purpose tags so different subsystems never collide on a key."""

    RANSAC_MONO = 0
    RANSAC_STEREO = 1
    LIFTING = 2
    INIT = 3
    VOCAB = 4
    SIM = 5
    VIO = 6


def base_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def derive(key: jax.Array, *ids) -> jax.Array:
    """Fold a sequence of integer ids (robot, kf, round, Stream, ...) into a
    key. Accepts python ints or traced int32 scalars."""
    for i in ids:
        key = jax.random.fold_in(key, jnp.asarray(i, jnp.uint32))
    return key


def minimal_sample_indices(
    key: jax.Array, n_points: int, n_hypotheses: int, k: int
) -> jnp.ndarray:
    """Deterministic RANSAC sampling: (n_hypotheses, k) distinct indices in
    [0, n_points).

    Replicates the role of the reference's seeded, non-randomized RANSAC
    sampling order (`ransac_randomize: 0`, LcdParams.yaml:66) with a
    counter-based scheme: hypothesis h draws its minimal set from
    fold_in(key, h), so the full table is order-independent and identical on
    every backend.

    Distinctness within a hypothesis uses the top-k of uniform keys
    (a fixed-shape, sort-based "sample without replacement").
    """
    keys = jax.random.split(key, n_hypotheses)
    u = jax.vmap(lambda kk: jax.random.uniform(kk, (n_points,)))(keys)
    # top-k indices of iid uniforms = uniform k-subset, in random order
    _, idx = jax.lax.top_k(u, k)
    return idx.astype(jnp.int32)
