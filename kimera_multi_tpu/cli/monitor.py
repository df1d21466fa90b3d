"""Live APE monitor — the evo_real_time.py equivalent.

Role of the reference's live evaluator (SURVEY.md section 3.5): every
`--interval` seconds, find each robot's newest
`kimera_distributed_poses_tum_*.tum`, GC older dumps (keep oldest +
newest, del_poses_files.sh semantics), associate to GT (max_diff 0.01 s),
SE(3)-align, compute APE translation + full RMSE, and append
`ape_<robot>.csv`. Exits when the log dir stops changing for
`--idle-exit` seconds (the file-index kill-guard analogue).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

from ..eval import ape as ape_mod


def newest_tum(robot_dir: str):
    pat = os.path.join(robot_dir, "distributed",
                       "kimera_distributed_poses_tum_*.tum")
    files = sorted(glob.glob(pat),
                   key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    return files


def gc_dumps(files):
    """Keep oldest + newest (del_poses_files.sh:12-37 semantics)."""
    for p in files[1:-1]:
        try:
            os.remove(p)
        except OSError:
            pass


def monitor(log_dir: str, gt: dict, interval: float = 5.0,
            idle_exit: float = 30.0, max_iters: int | None = None):
    last_change = time.monotonic()
    seen: dict = {}
    it = 0
    while True:
        it += 1
        for r, gt_path in gt.items():
            rdir = os.path.join(log_dir, f"robot{r}")
            files = newest_tum(rdir)
            if not files:
                continue
            latest = files[-1]
            mtime = os.path.getmtime(latest)
            if seen.get(r) == (latest, mtime):
                continue
            seen[r] = (latest, mtime)
            last_change = time.monotonic()
            gc_dumps(files)
            try:
                res = ape_mod.ape_from_tum(latest, gt_path)
            except Exception as e:
                print(f"[monitor] robot {r}: {e}", file=sys.stderr)
                continue
            out = os.path.join(log_dir, f"ape_robot{r}.csv")
            new = not os.path.exists(out)
            with open(out, "a") as f:
                if new:
                    f.write("timestamp,rmse_trans,rmse_full,n_matched\n")
                f.write(f"{time.time()},{res.rmse_trans},{res.rmse_full},"
                        f"{res.n_matched}\n")
            print(f"[monitor] robot {r}: APE {res.rmse_trans:.4f} m "
                  f"({res.n_matched} poses)", file=sys.stderr)
        if max_iters is not None and it >= max_iters:
            return
        if time.monotonic() - last_change > idle_exit:
            print("[monitor] idle — exiting", file=sys.stderr)
            return
        time.sleep(interval)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--log-dir", required=True)
    p.add_argument("--gt", nargs="+", required=True,
                   help="robot=path pairs, e.g. 0=/path/gt0.tum")
    p.add_argument("--interval", type=float, default=5.0)
    p.add_argument("--idle-exit", type=float, default=30.0)
    args = p.parse_args(argv)
    gt = {}
    for spec in args.gt:
        r, path = spec.split("=", 1)
        gt[int(r)] = path
    monitor(args.log_dir, gt, args.interval, args.idle_exit)


if __name__ == "__main__":
    main()
