"""Replay-acceptance CLI: diff a recorded run against a re-verification.

The consumer of real reference logs the moment data is available
(VERDICT.md round-1 item 2; north-star acceptance BASELINE.json): point it
at a log directory in the reference schema (evaluation/lc_result.py
formats) plus recorded observation streams, and it re-runs every recorded
loop-closure candidate through the batched verifier and reports
status/inlier equality row-by-row; `--gt` adds the evo-APE trajectory
acceptance (examples/evo_real_time.py:259-281).

  python -m kimera_multi_tpu.cli.replay --log-dir LOGS --obs-dir OBS \
      --robots 6 [--seed 0] [--inlier-tol 0] [--out-csv diff.csv] \
      [--gt robot0=gt0.tum ...]

Prints one JSON summary to stdout; exits nonzero if any row mismatches
beyond tolerance (so it doubles as an acceptance gate in CI).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(description="kimera_multi_tpu replay")
    p.add_argument("--log-dir", required=True)
    p.add_argument("--obs-dir", required=True)
    p.add_argument("--robots", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--inlier-tol", type=int, default=0,
                   help="allowed |recorded-replayed| inlier delta "
                        "(0 = bit-equality, own-logs acceptance)")
    p.add_argument("--out-csv", default=None,
                   help="write the row-by-row diff here")
    p.add_argument("--gt", nargs="*", default=[],
                   help="robot<k>=<gt.tum> pairs for APE acceptance")
    p.add_argument("--ape-tol", type=float, default=None,
                   help="fail if any robot's translation APE exceeds this")
    args = p.parse_args(argv)

    import jax

    from ..core.backend import configure_compilation_cache

    configure_compilation_cache()

    from ..frontend.dlc import FrontendConfig
    from ..io import replay as replay_mod

    cfg = FrontendConfig(base_seed=args.seed)
    rep = replay_mod.replay_verify(
        args.log_dir, args.obs_dir, args.robots, cfg,
        inlier_tol=args.inlier_tol, out_csv=args.out_csv)

    summary = dict(
        n_candidates=rep.n_candidates,
        n_status_match=rep.n_status_match,
        n_mono_exact=rep.n_mono_exact,
        n_stereo_exact=rep.n_stereo_exact,
        max_mono_delta=rep.max_mono_delta,
        max_stereo_delta=rep.max_stereo_delta,
        max_trans_delta=rep.max_trans_delta,
    )
    ok = (rep.n_status_match == rep.n_candidates
          and rep.n_mono_within_tol == rep.n_candidates
          and rep.n_stereo_within_tol == rep.n_candidates)

    if args.gt:
        gt = {}
        for item in args.gt:
            name, path = item.split("=", 1)
            gt[int(name.replace("robot", ""))] = path
        ape = replay_mod.replay_ape(args.log_dir, gt, args.robots)
        summary["ape"] = ape
        if args.ape_tol is not None:
            ok = ok and all(v["rmse_trans"] <= args.ape_tol
                            for v in ape.values())

    summary["accepted"] = ok
    print(json.dumps(summary))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
