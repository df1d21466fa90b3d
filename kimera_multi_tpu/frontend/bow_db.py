"""Per-robot BoW database with fixed capacity.

Role of DBoW2's database + kimera_multi_lcd's per-robot BoW stores
(`detectLoop()/detectLoopWithRobot()` "all vs self" variants,
images/kimera-multi.drawio:2577-2580). Robot-block-sharded in the
distributed front-end (SURVEY.md section 2.1 `kimera_distributed` row:
"robot-block-sharded BoW database").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..kernels import bow as bow_kernel


class BowDatabase(NamedTuple):
    word_ids: jnp.ndarray  # (N, W) int32, -1 padded
    weights: jnp.ndarray  # (N, W) float32, L1-normalized
    frame_valid: jnp.ndarray  # (N,) bool
    count: jnp.ndarray  # () int32 — frames inserted (may exceed N: overflow)

    @property
    def capacity(self) -> int:
        return self.word_ids.shape[0]


def empty(n_frames: int, words_per_frame: int) -> BowDatabase:
    return BowDatabase(
        word_ids=jnp.full((n_frames, words_per_frame), -1, jnp.int32),
        weights=jnp.zeros((n_frames, words_per_frame), jnp.float32),
        frame_valid=jnp.zeros((n_frames,), bool),
        count=jnp.asarray(0, jnp.int32),
    )


def add(db: BowDatabase, frame_id: jnp.ndarray, word_ids: jnp.ndarray,
        weights: jnp.ndarray) -> BowDatabase:
    """Insert a frame's BoW vector at `frame_id` (functional update)."""
    return BowDatabase(
        word_ids=db.word_ids.at[frame_id].set(word_ids),
        weights=db.weights.at[frame_id].set(weights),
        frame_valid=db.frame_valid.at[frame_id].set(True),
        count=jnp.maximum(db.count, frame_id.astype(jnp.int32) + 1),
    )


def query(db: BowDatabase, q_ids: jnp.ndarray, q_weights: jnp.ndarray,
          exclude_after: jnp.ndarray | None = None) -> jnp.ndarray:
    """L1 scores of a query against every frame; `exclude_after` masks
    frames with id >= the bound (the reference's recent_frames_window for
    self-queries, LcdParams.yaml:6). Query must be sorted (sort_bow)."""
    valid = db.frame_valid
    if exclude_after is not None:
        valid = valid & (jnp.arange(db.capacity) < exclude_after)
    return bow_kernel.l1_scores(q_ids, q_weights, db.word_ids, db.weights,
                                valid)
