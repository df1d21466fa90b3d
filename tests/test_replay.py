"""Replay-acceptance harness tests (VERDICT round-1 item 2).

1. Round-trip: a sim run's own logs + observation streams replay to
   bit-identical statuses and inlier counts (the determinism contract —
   RNG is structural, keyed by (robot, frame, target, match)).
2. Reference-schema fixture: CSVs hand-written in the reference's exact
   column layout (evaluation/lc_result.py:121-155) parse, join, and diff
   against an independently generated observation stream.
"""

import json
import os

import numpy as np
import pytest

from kimera_multi_tpu.cli import replay as replay_cli, run as run_cli
from kimera_multi_tpu.core.containers import (
    LCD_FAILED_GEOM_VERIFICATION,
    LCD_LOOP_DETECTED,
    LCD_STATUS_NAMES,
)
from kimera_multi_tpu.frontend.dlc import FrontendConfig
from kimera_multi_tpu.io import logs, replay as replay_mod


@pytest.fixture(scope="module")
def sim_run(tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("replay_logs"))
    obs_dir = os.path.join(log_dir, "obs")
    run_cli.main([
        "--mode", "sim", "--robots", "2", "--steps", "40",
        "--features", "64", "--seed", "3", "--gnc-rounds", "10",
        "--log-dir", log_dir, "--save-obs", obs_dir,
    ])
    return log_dir, obs_dir


def test_roundtrip_bit_exact(sim_run):
    log_dir, obs_dir = sim_run
    rep = replay_mod.replay_verify(
        log_dir, obs_dir, 2, FrontendConfig(base_seed=3), inlier_tol=0)
    assert rep.n_candidates > 0
    assert rep.n_status_match == rep.n_candidates
    assert rep.n_mono_exact == rep.n_candidates
    assert rep.n_stereo_exact == rep.n_candidates
    assert rep.max_trans_delta < 1e-4


def test_cli_gate_and_csv(sim_run, tmp_path, capsys):
    log_dir, obs_dir = sim_run
    out_csv = str(tmp_path / "diff.csv")
    rc = replay_cli.main([
        "--log-dir", log_dir, "--obs-dir", obs_dir, "--robots", "2",
        "--seed", "3", "--out-csv", out_csv])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip())
    assert summary["accepted"] is True
    assert summary["n_candidates"] == summary["n_mono_exact"]
    cols = logs.read_csv(out_csv)
    assert "status_recorded" in cols and "mono_replayed" in cols


def _hard_pair(npr, K=64, outlier_frac=0.5, noise=8e-4):
    """A frame pair whose RANSAC consensus set depends on sampling order:
    ~50% of matches are geometric outliers (same descriptor, clutter 3D
    point) and inlier bearings carry noise near the mono threshold
    (sqrt(1e-6) = 1e-3, LcdParams.yaml:55), so different winning
    hypotheses include/exclude different borderline points."""
    from kimera_multi_tpu.core import lie
    import jax.numpy as jnp

    P = npr.uniform(-2, 2, (K, 3)).astype(np.float32)
    P[:, 2] += 6.0
    w = npr.normal(0, 0.3, 3).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    t = npr.uniform(-0.5, 0.5, 3).astype(np.float32)
    Pb = (P - t) @ R
    ba = P / np.linalg.norm(P, axis=1, keepdims=True)
    bb = Pb / np.linalg.norm(Pb, axis=1, keepdims=True)
    ba = ba + npr.normal(0, noise, (K, 3)).astype(np.float32)
    bb = bb + npr.normal(0, noise, (K, 3)).astype(np.float32)
    ba /= np.linalg.norm(ba, axis=1, keepdims=True)
    bb /= np.linalg.norm(bb, axis=1, keepdims=True)
    n_out = int(K * outlier_frac)
    idx = npr.choice(K, n_out, replace=False)
    Pb_out = npr.uniform(-2, 2, (n_out, 3)).astype(np.float32)
    Pb_out[:, 2] += 6.0
    Pb[idx] = Pb_out
    bb[idx] = Pb_out / np.linalg.norm(Pb_out, axis=1, keepdims=True)
    desc = npr.integers(0, 256, (K, 32), dtype=np.uint8)
    return desc, ba.astype(np.float32), bb.astype(np.float32), \
        P.astype(np.float32), Pb.astype(np.float32)


def test_wrong_seed_is_rejected(tmp_path):
    """A different base seed changes RANSAC sampling -> the gate must be
    able to fail (proves the acceptance gate is not vacuous). The sim-run
    candidates are too clean for this (the GN-polished 5pt solutions are
    seed-insensitive there), so this uses a dedicated high-outlier
    near-threshold fixture."""
    npr = np.random.default_rng(7)
    n_pairs, K = 8, 64
    T = 2 * n_pairs
    desc = np.zeros((T, K, 32), np.uint8)
    bear = np.zeros((T, K, 3), np.float32)
    lm = np.zeros((T, K, 3), np.float32)
    for p in range(n_pairs):
        d, ba, bb, Pa, Pb = _hard_pair(npr)
        desc[2 * p], desc[2 * p + 1] = d, d
        bear[2 * p], bear[2 * p + 1] = ba, bb
        lm[2 * p], lm[2 * p + 1] = Pa, Pb
    obs = replay_mod.ObservationStream(
        descriptors=desc, bearings=bear, landmarks=lm,
        valid=np.ones((T, K), bool),
        timestamps=np.arange(T, dtype=np.float64))
    obs_dir = str(tmp_path / "obs")
    replay_mod.save_observations(replay_mod.obs_path(obs_dir, 0), obs)

    # record: write the candidates with dummy counts, replay once under
    # the "true" seed, then persist those counts as the recorded run
    def write_sidecar(counts):
        rows = []
        for p in range(n_pairs):
            mono, stereo = counts[p] if counts else (0, 0)
            rows.append(dict(robot_a=0, frame_a=2 * p, robot_b=0,
                             frame_b=2 * p + 1, lcd_status="LOOP_DETECTED",
                             mono_inliers=mono, stereo_inliers=stereo,
                             norm_bow_score=0.9))
        logs.write_lcd_attempts_csv(
            str(tmp_path / "robot0" / "distributed" / "lcd_attempts.csv"),
            rows)

    write_sidecar(None)
    first = replay_mod.replay_verify(str(tmp_path), obs_dir, 1,
                                     FrontendConfig(base_seed=3))
    write_sidecar([(r["mono_replayed"], r["stereo_replayed"])
                   for r in first.rows])

    # right seed: bit-exact (the determinism contract)
    rep = replay_mod.replay_verify(str(tmp_path), obs_dir, 1,
                                   FrontendConfig(base_seed=3),
                                   inlier_tol=0)
    assert rep.n_mono_exact == rep.n_candidates
    assert rep.n_stereo_exact == rep.n_candidates
    # wrong seed: the gate must fail on exact inlier counts
    rep99 = replay_mod.replay_verify(str(tmp_path), obs_dir, 1,
                                     FrontendConfig(base_seed=99),
                                     inlier_tol=0)
    assert (rep99.n_mono_exact < rep99.n_candidates
            or rep99.n_stereo_exact < rep99.n_candidates)


def test_reference_schema_fixture(tmp_path):
    """Hand-written reference-format CSVs parse and join: exact headers
    from evaluation/lc_result.py:121-155, including a rejected status row
    that only exists in output_lcd_status.csv."""
    npr = np.random.default_rng(0)
    K, T = 48, 6
    desc = npr.integers(0, 256, (T, K, 32), dtype=np.uint8)
    desc[4] = desc[1]  # frame 4 revisits frame 1
    P = npr.uniform(-2, 2, (T, K, 3)).astype(np.float32)
    P[..., 2] += 6.0
    P[4] = P[1]
    bear = P / np.linalg.norm(P, axis=-1, keepdims=True)
    obs = replay_mod.ObservationStream(
        descriptors=desc, bearings=bear.astype(np.float32), landmarks=P,
        valid=np.ones((T, K), bool),
        timestamps=np.arange(T, dtype=np.float64))
    obs_dir = str(tmp_path / "obs")
    replay_mod.save_observations(replay_mod.obs_path(obs_dir, 0), obs)

    ldir = tmp_path / "robot0"
    (ldir / "distributed").mkdir(parents=True)
    (ldir / "single").mkdir(parents=True)
    with open(ldir / "distributed" / "loop_closures.csv", "w") as f:
        f.write("robot1,pose1,robot2,pose2,qx,qy,qz,qw,tx,ty,tz,"
                "norm_bow_score,mono_inliers,stereo_inliers,stamp_ns\n")
        f.write("0,4,0,1,0.0,0.0,0.0,1.0,0.0,0.0,0.0,0.9,40,40,"
                "4000000000\n")
    with open(ldir / "single" / "output_lcd_status.csv", "w") as f:
        f.write("lcd_status,query_id,match_id,mono_inliers,"
                "stereo_inliers\n")
        f.write("LOOP_DETECTED,4,1,40,40\n")
        f.write("FAILED_GEOM_VERIFICATION,5,0,3,0\n")

    cands = replay_mod.read_recorded_candidates(str(tmp_path), 1)
    # the LOOP_DETECTED status row deduplicates against loop_closures.csv
    assert len(cands) == 2
    assert cands[0].status == LCD_LOOP_DETECTED and cands[0].R is not None
    assert cands[1].status == LCD_FAILED_GEOM_VERIFICATION

    rep = replay_mod.replay_verify(str(tmp_path), obs_dir, 1,
                                   FrontendConfig(base_seed=0),
                                   inlier_tol=50)
    assert rep.n_candidates == 2
    # identical frames: the true loop must re-verify as LOOP_DETECTED; the
    # random pair must fail again
    assert rep.rows[0]["status_replayed"] == "LOOP_DETECTED"
    assert rep.rows[1]["status_replayed"] != "LOOP_DETECTED"
