"""LC forensics over a real sim run's logs."""

import os

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.cli import run as cli_run
from kimera_multi_tpu.core import lie
from kimera_multi_tpu.eval import lc_forensics
from kimera_multi_tpu.io import logs, sim_world


def test_forensics_on_sim_run(tmp_path):
    # 40 steps: the 5-pt mono gate (FrontendConfig.use_5pt default) commits
    # 17 loops on this fixture — comfortably above the n_total > 5 floor
    # (the old 30-step fixture yielded exactly 5 under 5pt).
    log_dir = str(tmp_path / "logs")
    cli_run.main(["--mode", "sim", "--robots", "2", "--steps", "40",
                  "--features", "64", "--log-dir", log_dir, "--seed", "1"])
    # write GT TUMs from the same world
    world = sim_world.make_world(n_robots=2, n_steps=40, features_per_kf=64,
                                 seed=1)
    gt = {}
    for r in range(2):
        p = str(tmp_path / f"gt_{r}.tum")
        q = np.asarray(lie.rot_to_quat(jnp.asarray(world.R_gt[r])))
        logs.write_tum(p, world.timestamps[r], world.t_gt[r], q)
        gt[r] = p
    out_csv = str(tmp_path / "lc_forensics.csv")
    res = lc_forensics.analyze_run(log_dir, gt, 2, out_csv=out_csv)
    assert res.n_total > 5  # 17 on this fixture under the 5pt default
    assert res.n_inter > 0
    # committed loops in the sim are genuine: small errors, close pairs
    assert np.median(res.rot_err_deg) < 2.0
    assert np.median(res.trans_err) < 0.1
    assert not res.suspicious.any()
    assert os.path.exists(out_csv)
    hist = lc_forensics.inlier_histogram(res)
    assert hist["0-10"]["count"] == res.n_total
    assert hist["0-10"]["mono_below_10"] == 0
