"""End-to-end acceptance (replay tier, SURVEY.md section 4): synthetic
world -> front-end (BoW LCD + RANSAC) -> back-end (robust PGO / sharded
RBCD) -> reference-schema logs -> APE."""

import os

import numpy as np

from kimera_multi_tpu.cli import run as cli_run
from kimera_multi_tpu.io import logs


def _args(tmp_path, mode, robots=2, steps=30):
    return [
        "--mode", mode, "--robots", str(robots), "--steps", str(steps),
        "--features", "64", "--log-dir", str(tmp_path), "--seed", "1",
    ]


def test_e2e_sim_pipeline(tmp_path):
    cli_run.main(_args(tmp_path, "sim"))
    # logs exist in the reference schema
    for r in range(2):
        base = os.path.join(str(tmp_path), f"robot{r}")
        import glob
        tums = sorted(glob.glob(os.path.join(
            base, "distributed", "kimera_distributed_poses_tum_*.tum")))
        assert tums
        ts, t, q = logs.read_tum(tums[-1])
        assert len(ts) == 30
        lc = logs.read_csv(os.path.join(base, "distributed",
                                        "loop_closures.csv"))
        status = logs.read_csv(os.path.join(base, "single",
                                            "output_lcd_status.csv"))
        assert list(lc.keys()) == logs.LOOP_CLOSURES_HEADER.split(",")
        assert list(status.keys()) == logs.LCD_STATUS_HEADER.split(",")
        # APE written and small
        ape = logs.read_csv(os.path.join(str(tmp_path), f"ape_robot{r}.csv"))
        assert ape["rmse_trans"][0] < 0.15
    # accepted loops satisfy reference acceptance gates
    all_lc = logs.read_csv(os.path.join(str(tmp_path), "robot0",
                                        "distributed", "loop_closures.csv"))
    if len(np.atleast_1d(all_lc["mono_inliers"])):
        assert (np.atleast_1d(all_lc["mono_inliers"]) >= 10).all()
        assert (np.atleast_1d(all_lc["stereo_inliers"]) >= 5).all()


def test_e2e_sim_sharded_backend(tmp_path):
    cli_run.main(_args(tmp_path, "sim-sharded"))
    for r in range(2):
        ape = logs.read_csv(os.path.join(str(tmp_path), f"ape_robot{r}.csv"))
        assert ape["rmse_trans"][0] < 0.3
