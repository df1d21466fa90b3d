"""Bag-of-Words scoring kernels.

Role of DBoW2's L1 scoring + inverted index (reference `dbow2_catkin`,
SURVEY.md section 2.1; params `use_nss: 1, alpha: 0.4, min_nss_factor: 0.05`,
LcdParams.yaml:3-8).

DBoW2's L1 similarity between L1-normalized sparse vectors reduces to

    s(v, w) = 1 - 0.5 * |v - w|_1 = sum_i min(v_i, w_i)

(over the shared support). The TPU formulation avoids any vocabulary-sized
dense arrays: the query's (word_id, weight) list is sorted once, and every
database entry's word ids are matched against it with a vectorized binary
search (log2(W) compare steps on the VPU) — no inverted index, no host
hashing, fully batched over the database axis, O(N * W * log W).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def normalize_l1(weights: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    w = jnp.where(valid, weights, 0.0)
    return w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), _EPS)


def sort_bow(word_ids: jnp.ndarray, weights: jnp.ndarray):
    """Sort a padded BoW vector by word id (padding id = -1 sorts first and
    is turned into a sentinel larger than any id so searchsorted skips it)."""
    big = jnp.int32(2**30)
    ids = jnp.where(word_ids >= 0, word_ids, big)
    order = jnp.argsort(ids)
    return ids[order], weights[order]


def l1_scores(
    q_ids_sorted: jnp.ndarray,
    q_weights: jnp.ndarray,
    db_ids: jnp.ndarray,
    db_weights: jnp.ndarray,
    db_frame_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Score one query BoW against a database of N BoW vectors.

    q_ids_sorted: (W,) ascending word ids (sentinel-padded, from sort_bow);
    q_weights: (W,) L1-normalized weights aligned with q_ids_sorted;
    db_ids: (N, W) word ids (-1 padding); db_weights: (N, W) L1-normalized;
    db_frame_valid: (N,) mask. Returns (N,) scores in [0, 1].
    """
    W = q_ids_sorted.shape[0]
    flat = db_ids.reshape(-1)
    pos = jnp.searchsorted(q_ids_sorted, flat)
    pos = jnp.clip(pos, 0, W - 1)
    hit = (q_ids_sorted[pos] == flat) & (flat >= 0)
    qw = jnp.where(hit, q_weights[pos], 0.0).reshape(db_ids.shape)
    contrib = jnp.minimum(qw, jnp.where(db_ids >= 0, db_weights, 0.0))
    scores = jnp.sum(contrib, axis=-1)
    return jnp.where(db_frame_valid, scores, 0.0)


def nss_normalized_scores(
    scores: jnp.ndarray,
    nss_factor: jnp.ndarray,
    min_nss_factor: float = 0.05,
) -> jnp.ndarray:
    """Normalized similarity score (DBoW2 `use_nss`): divide raw scores by
    the query's similarity to its own recent frame (`nss_factor` =
    s(bow_t, bow_{t-1})), guarded by `min_nss_factor` (LcdParams.yaml:8) —
    below the guard the frame is considered unreliable and scores zero out
    (matching the reference's rejection path)."""
    good = nss_factor >= min_nss_factor
    return jnp.where(good, scores / jnp.maximum(nss_factor, _EPS), 0.0)
