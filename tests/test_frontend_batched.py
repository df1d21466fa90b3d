"""Batched front-end == sequential front-end (fixed seed), plus the
temporal-constraint semantics (checkTemporalConstraint, drawio:1565)."""

import jax.numpy as jnp
import numpy as np
import pytest

from kimera_multi_tpu.frontend import batched, dlc, lcd, vocab as vocab_mod
from kimera_multi_tpu.io import sim_world


@pytest.fixture(scope="module")
def world_and_vocab():
    world = sim_world.make_world(n_robots=2, n_steps=30, features_per_kf=64,
                                 seed=1)
    corpus = world.descriptors[world.obs_valid].reshape(-1, 32)
    sub = corpus[:: max(1, len(corpus) // 4000)]
    voc = vocab_mod.build_vocabulary(sub, k=8, depth=3, seed=1)
    return world, voc


def _run_sequential(world, voc, cfg):
    fe = dlc.DistributedFrontend(2, 30, voc, cfg)
    for k in range(30):
        for r in range(2):
            if not world.obs_valid[r, k].any():
                continue
            fe.process_keyframe(
                r, k, world.descriptors[r, k], world.bearings_local[r, k],
                world.landmarks_local[r, k], world.obs_valid[r, k])
    return fe


def _run_batched(world, voc, cfg):
    fe = batched.BatchedFrontend(2, 30, voc, cfg)
    fe.process_all(world.descriptors, world.bearings_local,
                   world.landmarks_local, world.obs_valid)
    return fe


def _attempt_key(lc):
    return (lc.robot_a, lc.frame_a, lc.robot_b, lc.frame_b, lc.status,
            lc.mono_inliers, lc.stereo_inliers, lc.accepted)


@pytest.mark.parametrize("mtm", [1, 2])
def test_batched_matches_sequential(world_and_vocab, mtm):
    """Equality across BOTH temporal-constraint modes: pass-through
    (mtm=1) and the consecutive-consistency counter (mtm=2; the sequential
    path threads the same per-(robot, target) state, VERDICT r2 item 8)."""
    world, voc = world_and_vocab
    cfg = dlc.FrontendConfig(
        base_seed=1, lcd=lcd.LcdParams(min_temporal_matches=mtm))
    seq = _run_sequential(world, voc, cfg)
    bat = _run_batched(world, voc, cfg)

    assert len(bat.lcd_attempts) == len(seq.lcd_attempts)
    assert len(bat.lcd_attempts) > 0, "fixture produced no candidates"
    for a, b in zip(seq.lcd_attempts, bat.lcd_attempts):
        assert _attempt_key(a) == _attempt_key(b)
        np.testing.assert_allclose(a.R, b.R, atol=1e-5)
        np.testing.assert_allclose(a.t, b.t, atol=1e-5)
        assert abs(a.bow_score - b.bow_score) < 1e-5
    assert [(_attempt_key(x)) for x in bat.loops] == [
        (_attempt_key(x)) for x in seq.loops]
    assert bat.bow_overflow == seq.bow_overflow
    # the whole verification ran as ONE device dispatch
    assert bat.stats["n_candidates"] == len(seq.lcd_attempts)
    assert bat.stats["verifications_per_s"] > 0


def test_batched_pose_graph_matches(world_and_vocab):
    world, voc = world_and_vocab
    cfg = dlc.FrontendConfig(base_seed=1)
    seq = _run_sequential(world, voc, cfg)
    bat = _run_batched(world, voc, cfg)
    e1 = seq.build_pose_graph(world.R_odo, world.t_odo)
    e2 = bat.build_pose_graph(world.R_odo, world.t_odo)
    np.testing.assert_array_equal(np.asarray(e1.etype), np.asarray(e2.etype))
    np.testing.assert_allclose(np.asarray(e1.R), np.asarray(e2.R), atol=1e-5)


def test_temporal_constraint_gates_detections():
    """A one-off high-score match must be rejected until it is temporally
    confirmed min_temporal_matches times (reference drawio:1565;
    LcdParams.yaml:13)."""
    params = lcd.LcdParams(min_temporal_matches=2, recent_frames_window=2,
                           alpha=0.1)
    cfg = dlc.FrontendConfig(lcd=params, bow_capacity=16)
    R, T, W = 2, 6, 16
    det_fn = batched.make_detector(R, T, cfg)

    # hand-built BoW streams: robot 0's frames all share word w; robot 1
    # queries the same word from frame 2 on -> every query matches robot
    # 0's island, but the FIRST consistent match (frame 2) must be gated.
    ids = np.full((R, T, W), -1, np.int32)
    weights = np.zeros((R, T, W), np.float32)
    for k in range(T):
        ids[0, k, 0] = 5
        weights[0, k, 0] = 1.0
        ids[1, k, 0] = 5 if k >= 2 else 9
        weights[1, k, 0] = 1.0
    kf_valid = np.ones((R, T), bool)
    qids = np.where(ids >= 0, ids, 2 ** 30)
    out, _ = det_fn(jnp.asarray(ids), jnp.asarray(weights),
                    jnp.asarray(qids), jnp.asarray(weights),
                    jnp.asarray(kf_valid))
    det = np.asarray(out.detected)[:, 1, 0, 0]  # robot1 querying robot0's DB
    # frame 2: nss factor 0 (prev BoW shares no words) -> no match.
    # frame 3: FIRST consistent match -> consec=1 < 2 -> gated.
    # frame 4+: temporally confirmed -> detected.
    assert not det[2] and not det[3]
    assert det[4] and det[5]

    # with min_temporal_matches=1 the first match fires immediately
    det_fn1 = batched.make_detector(
        R, T, dlc.FrontendConfig(lcd=lcd.LcdParams(
            min_temporal_matches=1, recent_frames_window=2, alpha=0.1),
            bow_capacity=16))
    out1, _ = det_fn1(jnp.asarray(ids), jnp.asarray(weights),
                      jnp.asarray(qids), jnp.asarray(weights),
                      jnp.asarray(kf_valid))
    assert np.asarray(out1.detected)[3, 1, 0, 0]


def test_candidate_list_mode(world_and_vocab):
    """n_candidates > 1 surfaces additional (lower-score) islands; the
    best-island candidate set matches the single-candidate mode."""
    world, voc = world_and_vocab
    cfg = dlc.FrontendConfig(base_seed=1)
    fe1 = batched.BatchedFrontend(2, 30, voc, cfg, n_candidates=1)
    fe3 = batched.BatchedFrontend(2, 30, voc, cfg, n_candidates=3)
    fe1.process_all(world.descriptors, world.bearings_local,
                    world.landmarks_local, world.obs_valid)
    fe3.process_all(world.descriptors, world.bearings_local,
                    world.landmarks_local, world.obs_valid)
    k1 = {(a.robot_a, a.frame_a, a.robot_b, a.frame_b)
          for a in fe1.lcd_attempts}
    k3 = {(a.robot_a, a.frame_a, a.robot_b, a.frame_b)
          for a in fe3.lcd_attempts}
    assert k1 <= k3
