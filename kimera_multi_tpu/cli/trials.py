"""Repeated-trial harness + median statistics.

Role of the reference's `run_multi_times.sh` (>= 3 trials, archived log
dirs) and `evo_median.py` (median-of-trials APE statistics) —
SURVEY.md section 2.2, 4.4.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..io import logs


def run_trials(base_args, n_trials: int, log_root: str, vary_seed=True):
    """Run the sim CLI n_trials times, archiving logs per trial
    (run_multi_times.sh equivalent)."""
    from . import run as cli_run

    trial_dirs = []
    for i in range(n_trials):
        d = os.path.join(log_root, f"trial_{i:03d}")
        argv = list(base_args) + ["--log-dir", d]
        if vary_seed:
            argv += ["--seed", str(1000 + i)]
        print(f"[trials] trial {i}: {' '.join(argv)}", file=sys.stderr)
        cli_run.main(argv)
        trial_dirs.append(d)
    return trial_dirs


def median_stats(trial_dirs, n_robots: int):
    """Per-robot median APE across trials (evo_median.py:33-43: requires
    multiple trials, reports the median trial)."""
    out = {}
    for r in range(n_robots):
        vals = []
        for d in trial_dirs:
            p = os.path.join(d, f"ape_robot{r}.csv")
            if not os.path.exists(p):
                continue
            cols = logs.read_csv(p)
            vals.append(float(np.atleast_1d(cols["rmse_trans"])[-1]))
        if vals:
            out[r] = dict(
                median=float(np.median(vals)),
                mean=float(np.mean(vals)),
                min=float(np.min(vals)),
                max=float(np.max(vals)),
                n_trials=len(vals),
            )
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="repeated-trial harness")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--robots", type=int, default=2)
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--mode", default="sim")
    p.add_argument("--log-root", default="/tmp/kimera_multi_tpu_trials")
    args = p.parse_args(argv)
    base = ["--mode", args.mode, "--robots", str(args.robots),
            "--steps", str(args.steps)]
    dirs = run_trials(base, args.trials, args.log_root)
    stats = median_stats(dirs, args.robots)
    for r, s in stats.items():
        print(f"robot {r}: median APE {s['median']:.4f} m over "
              f"{s['n_trials']} trials (min {s['min']:.4f}, "
              f"max {s['max']:.4f})")
    return stats


if __name__ == "__main__":
    main()
