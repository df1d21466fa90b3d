"""Loop-closure forensics — the evaluation/lc_result.py +
analyze_inliers.py equivalents (SURVEY.md section 2.2, 4.5).

Cross-checks every accepted/rejected loop closure against ground truth:
per-pair GT relative pose vs the estimated transform, GT distance between
the matched keyframes, inter/intra classification, and inlier-count
distributions against the mono=10 / stereo=5 acceptance boundary
(reference buckets 0-10 / 10-30 / >30 m, analyze_inliers.py:40-97;
>30 m loops are 'suspicious' per extract_lc_images.py:9).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from ..core import lie
from ..io import logs


class LcForensics(NamedTuple):
    n_total: int
    n_inter: int
    n_intra: int
    rot_err_deg: np.ndarray  # (N,) estimated-vs-GT relative rotation error
    trans_err: np.ndarray  # (N,)
    gt_distance: np.ndarray  # (N,) distance between matched GT positions
    mono_inliers: np.ndarray
    stereo_inliers: np.ndarray
    suspicious: np.ndarray  # (N,) bool — GT distance > 30 m
    rows: tuple = ()  # per-loop dicts (ids + metrics) for evidence tools


def analyze_run(
    log_dir: str,
    gt_tum: dict[int, str],
    n_robots: int,
    out_csv: str | None = None,
) -> LcForensics:
    """Join each robot's loop_closures.csv against GT trajectories.

    gt_tum: robot id -> ground-truth TUM path. GT poses are associated by
    keyframe timestamp (stamp_ns column / keyframes csv)."""
    import jax.numpy as jnp

    gt = {}
    for r, path in gt_tum.items():
        ts, t, q = logs.read_tum(path)
        gt[r] = (ts, t, np.asarray(lie.quat_to_rot(jnp.asarray(q))))

    rows = []
    for r in range(n_robots):
        lc_path = os.path.join(log_dir, f"robot{r}", "distributed",
                               "loop_closures.csv")
        kf_path = os.path.join(log_dir, f"robot{r}", "distributed",
                               "kimera_distributed_keyframes.csv")
        if not os.path.exists(lc_path):
            continue
        lc = logs.read_csv(lc_path)
        if len(np.atleast_1d(lc.get("robot1", []))) == 0:
            continue
        kfs = {}
        for rr in range(n_robots):
            p = os.path.join(log_dir, f"robot{rr}", "distributed",
                             "kimera_distributed_keyframes.csv")
            if os.path.exists(p):
                k = logs.read_csv(p)
                kfs[rr] = k
        n = len(np.atleast_1d(lc["robot1"]))
        for i in range(n):
            r1 = int(np.atleast_1d(lc["robot1"])[i])
            p1 = int(np.atleast_1d(lc["pose1"])[i])
            r2 = int(np.atleast_1d(lc["robot2"])[i])
            p2 = int(np.atleast_1d(lc["pose2"])[i])
            if r1 not in gt or r2 not in gt:
                continue
            ts1, t1, R1 = gt[r1]
            ts2, t2, R2 = gt[r2]
            if p1 >= len(ts1) or p2 >= len(ts2):
                continue
            # GT relative pose of kf p2 (robot2) in kf p1 (robot1) frame
            import jax.numpy as jnp

            Rg, tg = lie.se3_between(
                jnp.asarray(R1[p1]), jnp.asarray(t1[p1]),
                jnp.asarray(R2[p2]), jnp.asarray(t2[p2]))
            q = np.asarray([np.atleast_1d(lc[c])[i]
                            for c in ("qx", "qy", "qz", "qw")])
            te = np.asarray([np.atleast_1d(lc[c])[i]
                             for c in ("tx", "ty", "tz")])
            Re = np.asarray(lie.quat_to_rot(jnp.asarray(q, jnp.float32)))
            rot_err = float(np.degrees(np.asarray(
                lie.rotation_geodesic_distance(jnp.asarray(Re), Rg))))
            trans_err = float(np.linalg.norm(te - np.asarray(tg)))
            dist = float(np.linalg.norm(t1[p1] - t2[p2]))
            rows.append(dict(
                robot1=r1, pose1=p1, robot2=r2, pose2=p2,
                inter=int(r1 != r2), rot_err_deg=rot_err,
                trans_err=trans_err, gt_distance=dist,
                mono_inliers=int(np.atleast_1d(lc["mono_inliers"])[i]),
                stereo_inliers=int(np.atleast_1d(lc["stereo_inliers"])[i]),
            ))

    if out_csv and rows:
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        cols = list(rows[0].keys())
        with open(out_csv, "w") as f:
            f.write(",".join(cols) + "\n")
            for row in rows:
                f.write(",".join(str(row[c]) for c in cols) + "\n")

    if not rows:
        z = np.zeros(0)
        return LcForensics(0, 0, 0, z, z, z, z, z, z.astype(bool))
    a = {k: np.asarray([row[k] for row in rows]) for k in rows[0]}
    return LcForensics(
        n_total=len(rows),
        n_inter=int(a["inter"].sum()),
        n_intra=int((1 - a["inter"]).sum()),
        rot_err_deg=a["rot_err_deg"],
        trans_err=a["trans_err"],
        gt_distance=a["gt_distance"],
        mono_inliers=a["mono_inliers"],
        stereo_inliers=a["stereo_inliers"],
        suspicious=a["gt_distance"] > 30.0,
        rows=tuple(rows),
    )


def extract_lc_images(rows, image_of, out_dir: str,
                      threshold: float = 30.0) -> list[str]:
    """Image evidence for suspicious loop closures.

    Role of evaluation/extract_lc_images.py: for every loop whose GT
    keyframe distance exceeds `threshold` (reference default 30 m,
    extract_lc_images.py:52-54), merge the two keyframe images side by
    side, overlay the metadata (pair ids, GT distance, inlier counts —
    the reference's putText overlay), and save one PNG per loop. The
    reference pulls frames out of rosbags with a play/filter dance; here
    `image_of(robot, frame) -> (H, W) uint8|float` abstracts the frame
    store (rendered sequences in vio-sim, NPZ image logs for recordings).

    rows: iterables of dicts with robot1/pose1/robot2/pose2/gt_distance/
    mono_inliers/stereo_inliers (LcForensics.rows). Returns written paths.
    """
    import json

    from ..io import png

    os.makedirs(out_dir, exist_ok=True)
    written = []
    manifest = []
    for i, row in enumerate(rows):
        d = float(row["gt_distance"])
        if d <= threshold:
            continue
        r1, p1 = int(row["robot1"]), int(row["pose1"])
        r2, p2 = int(row["robot2"]), int(row["pose2"])
        im1 = image_of(r1, p1)
        im2 = image_of(r2, p2)
        if im1 is None or im2 is None:
            continue

        def to_u8(im):
            im = np.asarray(im)
            if im.dtype != np.uint8:
                lo, hi = float(im.min()), float(im.max())
                im = ((im - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
            return im

        cap = (f"r{r1}f{p1}-r{r2}f{p2} d:{d:.1f}m "
               f"mono:{int(row['mono_inliers'])} "
               f"stereo:{int(row['stereo_inliers'])}")
        img = png.annotate_pair(to_u8(im1), to_u8(im2), cap)
        name = (f"lc_{i:04d}_r{r1}f{p1}_r{r2}f{p2}_"
                f"{d:.1f}m.png")
        path = os.path.join(out_dir, name)
        png.write_png(path, img)
        written.append(path)
        manifest.append({**{k: (float(v) if isinstance(v, (np.floating,))
                                else int(v) if isinstance(v, (np.integer,))
                                else v) for k, v in row.items()},
                         "image": name})
    with open(os.path.join(out_dir, "lc_images.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return written


def inlier_histogram(res: LcForensics):
    """Inlier-count statistics per GT-distance bucket (the
    analyze_inliers.py bucketing: 0-10 / 10-30 / >30 m)."""
    buckets = [(0, 10), (10, 30), (30, np.inf)]
    out = {}
    for lo, hi in buckets:
        m = (res.gt_distance >= lo) & (res.gt_distance < hi)
        out[f"{lo}-{hi}"] = dict(
            count=int(m.sum()),
            mono_mean=float(res.mono_inliers[m].mean()) if m.any() else 0.0,
            stereo_mean=float(res.stereo_inliers[m].mean()) if m.any() else 0.0,
            mono_below_10=int((res.mono_inliers[m] < 10).sum()),
            stereo_below_5=int((res.stereo_inliers[m] < 5).sum()),
        )
    return out
