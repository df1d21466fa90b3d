"""Campus-scale capacity point for the DETECT stage (VERDICT r3 item 5).

The reference envelope is ~6 robots x ~6,000 keyframes per campus run
(run guard 6010, /root/reference/examples/evo_real_time.py:184-188;
max_db_results sweep over the whole DB, params/D455/LcdParams.yaml:5).
The batched detector's budget (frontend/batched.py make_detector
docstring): compute O(R^2 T^2 W log W) is inherent to full-database
search; LIVE memory must stay O(R^2 * db_block * W) independent of T.

This test proves one campus-scale point ON CPU: 6 robots x 2,000
keyframes detect-only, asserting (a) it completes inside a wall-clock
bound, (b) peak RSS stays bounded (the naive unblocked step would
materialize ~GB-scale intermediates at this T), and (c) blocked and
unblocked scoring are bit-identical at a smaller shape.
"""

import resource
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kimera_multi_tpu.frontend.batched import make_detector
from kimera_multi_tpu.frontend.dlc import FrontendConfig
from kimera_multi_tpu.kernels import bow as bow_kernel


def _synth_bows(R, T, W, n_words=5000, seed=0):
    """Synthetic packed BoW streams with enough self-similarity that nss
    and island logic exercise their real paths."""
    npr = np.random.default_rng(seed)
    ids = npr.integers(0, n_words, (R, T, W)).astype(np.int32)
    # make consecutive frames share ~half their words (nss realistic)
    ids[:, 1:, : W // 2] = ids[:, :-1, : W // 2]
    weights = npr.uniform(0.1, 1.0, (R, T, W)).astype(np.float32)
    weights /= weights.sum(-1, keepdims=True)
    qids = np.empty_like(ids)
    qw = np.empty_like(weights)
    order = np.argsort(ids, axis=-1)
    qids = np.take_along_axis(ids, order, axis=-1)
    qw = np.take_along_axis(weights, order, axis=-1)
    kf_valid = np.ones((R, T), bool)
    return (jnp.asarray(ids), jnp.asarray(weights), jnp.asarray(qids),
            jnp.asarray(qw), jnp.asarray(kf_valid))


def test_blocked_scoring_identical():
    """db_block is a pure reorganization: detections/scores identical."""
    R, T, W = 3, 96, 32
    cfg = FrontendConfig(bow_capacity=W)
    args = _synth_bows(R, T, W, n_words=400, seed=3)
    out_full, _ = make_detector(R, T, cfg, db_block=T)(*args)
    out_blk, _ = make_detector(R, T, cfg, db_block=32)(*args)
    np.testing.assert_array_equal(np.asarray(out_full.detected),
                                  np.asarray(out_blk.detected))
    np.testing.assert_array_equal(np.asarray(out_full.match),
                                  np.asarray(out_blk.match))
    np.testing.assert_allclose(np.asarray(out_full.score),
                               np.asarray(out_blk.score), rtol=1e-6)


@pytest.mark.slow
def test_detect_campus_scale_cpu():
    """6 robots x 2,000 keyframes detect-only on CPU: bounded wall clock
    and bounded peak memory (the capacity story's measured point)."""
    R, T, W = 6, 2000, 64
    cfg = FrontendConfig(bow_capacity=W)
    args = _synth_bows(R, T, W, n_words=20000, seed=1)
    detect = make_detector(R, T, cfg)  # auto db_block = 512

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.perf_counter()
    out, _db = detect(*args)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    # wall-clock bound: generous CI margin over the measured point; the
    # point of the bound is catching a complexity regression (an O(T)
    # blowup in live memory thrashes, an accidental O(T^3) never ends)
    assert wall < 600.0, f"campus-scale detect took {wall:.0f}s"
    # peak-RSS growth bound: the blocked step's live set is
    # O(R^2 * db_block * W) (~50 MB total at these shapes) + the
    # (R, T, W) DB (~12 MB); a naive unblocked step at T=2000 would
    # add >= R^2 * T * W * 4 B * several live intermediates (~3.7 GB).
    # ru_maxrss is KiB on Linux.
    growth_mb = (rss1 - rss0) / 1024.0
    assert growth_mb < 2048.0, f"detect peak RSS grew {growth_mb:.0f} MB"
    # sanity: the run actually did full-DB work
    assert out.detected.shape == (T, R, R, 1)
