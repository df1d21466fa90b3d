"""Loop-closure detection: BoW scoring -> islands -> temporal constraint ->
candidate selection.

Role of Kimera-VIO's `LoopClosureDetector::detectLoop` (nss-score ->
computeIslands -> checkTemporalConstraint, images/kimera-multi.drawio:1565)
and kimera_multi_lcd's inter-robot variants (drawio:2577-2580). Parameters
from params/D455/LcdParams.yaml: use_nss 1, alpha 0.4, min_nss_factor 0.05,
max_db_results 50, recent_frames_window 100, max_intraisland_gap 3,
max_nrFrames_between_islands 3, min_temporal_matches 1.

TPU formulation: islands over the frame axis are computed with cumsum
segment labelling and scatter-reductions — no sorting, no host loops; the
whole detector is one jittable function per (query, database) pair,
vmappable over candidate batches.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .bow_db import BowDatabase, query as db_query

_EPS = 1e-12


class LcdParams(NamedTuple):
    alpha: float = 0.4  # score threshold factor (x nss factor)
    min_nss_factor: float = 0.05
    max_db_results: int = 50
    recent_frames_window: int = 100
    max_intraisland_gap: int = 3
    max_nrFrames_between_islands: int = 3
    min_temporal_matches: int = 1
    use_nss: bool = True


class DetectionResult(NamedTuple):
    match_id: jnp.ndarray  # () int32, -1 if no detection
    island_score: jnp.ndarray  # () float32
    best_score: jnp.ndarray  # () float32 (nss-normalized best single score)
    detected: jnp.ndarray  # () bool


def normalize_scores(scores: jnp.ndarray, nss_factor: jnp.ndarray,
                     params: LcdParams) -> jnp.ndarray:
    """nss normalization (use_nss: 1): s' = s / nss_factor, gated by
    min_nss_factor (drawio:1565; LcdParams.yaml:3-8)."""
    if params.use_nss:
        ok_nss = nss_factor >= params.min_nss_factor
        return jnp.where(ok_nss, scores / jnp.maximum(nss_factor, _EPS), 0.0)
    return scores


def top_islands(norm_scores: jnp.ndarray, params: LcdParams, n_cand: int = 1):
    """Island computation over nss-normalized scores (computeIslands,
    drawio:1565): alpha gate + max_db_results cap, consecutive accepted
    frames (gaps <= max_intraisland_gap) merge into islands scored by sum;
    each island is represented by its first max-score member.

    Returns (match_ids (n_cand,) int32 — representative frame per island,
    -1 beyond the last island; island_scores (n_cand,) f32 descending;
    valid (n_cand,) bool). n_cand=1 reproduces the reference's single best
    island; n_cand>1 is the candidate-list mode (the reference's detector
    similarly surfaces up to max_db_results candidates, drawio:1565)."""
    N = norm_scores.shape[0]
    accept = norm_scores >= params.alpha
    k = min(params.max_db_results, N)
    top_vals, _ = _topk(norm_scores, k)
    kth = top_vals[-1]
    accept = accept & (norm_scores >= jnp.maximum(kth, _EPS))

    frame_has = accept
    idx = jnp.arange(N)
    window_any = jnp.zeros(N, bool)
    for g in range(1, params.max_intraisland_gap + 1):
        window_any = window_any | jnp.roll(frame_has, g) & (idx >= g)
    island_start = frame_has & ~window_any
    island_id = jnp.cumsum(island_start) - 1  # valid where frame_has
    island_id = jnp.where(frame_has, island_id, N - 1)

    island_scores = jnp.zeros(N, jnp.float32).at[island_id].add(
        jnp.where(frame_has, norm_scores, 0.0))
    member_best = jnp.zeros(N, jnp.float32).at[island_id].max(
        jnp.where(frame_has, norm_scores, 0.0))
    is_rep = frame_has & (norm_scores >= member_best[island_id] - 1e-9)
    rep_idx = jnp.full(N, N, jnp.int32).at[
        jnp.where(is_rep, island_id, N - 1)
    ].min(jnp.where(is_rep, idx, N).astype(jnp.int32))

    c = min(n_cand, N)
    best_scores, best_islands = _topk(island_scores, c)
    matches = rep_idx[best_islands]
    valid = (best_scores > 0.0) & (matches < N)
    out_m = jnp.where(valid, matches, -1).astype(jnp.int32)
    if c < n_cand:
        pad = n_cand - c
        out_m = jnp.concatenate([out_m, jnp.full(pad, -1, jnp.int32)])
        best_scores = jnp.concatenate([best_scores, jnp.zeros(pad)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, bool)])
    return out_m, best_scores.astype(jnp.float32), valid


def detect(
    db: BowDatabase,
    q_ids_sorted: jnp.ndarray,
    q_weights: jnp.ndarray,
    nss_factor: jnp.ndarray,
    params: LcdParams,
    self_query_frame: jnp.ndarray | None = None,
    prev_island_frame: jnp.ndarray | None = None,
) -> DetectionResult:
    """One detection pass of a query BoW against one database.

    self_query_frame: if set (intra-robot query), frames within
    recent_frames_window of it are excluded (drawio island logic).
    prev_island_frame: representative of the previous query's best island,
    for the temporal-consistency check (-1 = no history -> pass when
    min_temporal_matches <= 1).
    """
    N = db.capacity
    exclude_after = None
    if self_query_frame is not None:
        exclude_after = self_query_frame - params.recent_frames_window + 1
    scores = db_query(db, q_ids_sorted, q_weights, exclude_after)
    norm_scores = normalize_scores(scores, nss_factor, params)

    matches, island_scores, valid = top_islands(norm_scores, params, n_cand=1)
    match, best_island_score = matches[0], island_scores[0]
    any_island = valid[0]

    # --- temporal constraint (checkTemporalConstraint, drawio:1565):
    # previous best island's representative must be within
    # max_nrFrames_between_islands of the current one (when history given
    # and min_temporal_matches > 1)
    if prev_island_frame is not None and params.min_temporal_matches > 1:
        temporal_ok = (prev_island_frame >= 0) & (
            jnp.abs(match - prev_island_frame)
            <= params.max_nrFrames_between_islands
        )
    else:
        temporal_ok = jnp.asarray(True)

    detected = any_island & temporal_ok
    return DetectionResult(
        match_id=jnp.where(detected, match, -1).astype(jnp.int32),
        island_score=best_island_score,
        best_score=jnp.max(norm_scores),
        detected=detected,
    )


def _topk(x, k):
    import jax

    return jax.lax.top_k(x, k)
