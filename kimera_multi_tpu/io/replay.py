"""Replay-acceptance harness: re-run verification on recorded candidates.

The north-star acceptance (BASELINE.json; reference examples/run.sh:17-21,
evaluation/lc_result.py:115-180) compares this framework against reference
runs by (a) inlier-set equality on every attempted loop-closure candidate
and (b) evo-ATE tolerance on the TUM trajectories. This module is the tool
that performs (a): it ingests a run's reference-schema logs
(`distributed/loop_closures.csv`, `single/output_lcd_status.csv`,
`distributed/kimera_distributed_keyframes.csv` — schemas at
evaluation/lc_result.py:121-182) plus recorded per-keyframe observation
streams (descriptors/bearings/landmarks), re-runs the batched verifier on
every recorded candidate pair, and diffs statuses and inlier counts
row-by-row.

Observation streams are stored as one `.npz` per robot
(`obs_robot<k>.npz`: descriptors (T,K,32) uint8, bearings (T,K,3) f32,
landmarks (T,K,3) f32, valid (T,K) bool, timestamps (T,) f64) — the
framework's recorded form of the reference's VLC frames
(images/kimera-multi.drawio:2601). `io/convert.py` produces the same
format from real recordings (EuRoC session trees, one per robot);
everything downstream is format-agnostic.

Replaying logs this framework produced on the same seed reproduces
statuses and inlier counts bit-exactly (RNG is structural:
(robot, frame, target, match) — core/rng.py); replaying reference logs
reports exact-match and tolerance statistics per row.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from ..core.containers import (
    LCD_FAILED_GEOM_VERIFICATION,
    LCD_FAILED_POSE_RECOVERY,
    LCD_LOOP_DETECTED,
    LCD_STATUS_NAMES,
)
from . import logs


class ObservationStream(NamedTuple):
    """Per-robot recorded keyframe observations (the VLC-frame stream)."""

    descriptors: np.ndarray  # (T, K, 32) uint8 packed ORB
    bearings: np.ndarray  # (T, K, 3) f32 unit bearings (camera frame)
    landmarks: np.ndarray  # (T, K, 3) f32 3d points (camera frame)
    valid: np.ndarray  # (T, K) bool
    timestamps: np.ndarray  # (T,) f64 seconds


def save_observations(path: str, s: ObservationStream) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path, descriptors=s.descriptors, bearings=s.bearings,
        landmarks=s.landmarks, valid=s.valid, timestamps=s.timestamps)


def load_observations(path: str) -> ObservationStream:
    z = np.load(path)
    return ObservationStream(
        descriptors=z["descriptors"], bearings=z["bearings"],
        landmarks=z["landmarks"], valid=z["valid"],
        timestamps=z["timestamps"])


def obs_path(obs_dir: str, robot: int) -> str:
    return os.path.join(obs_dir, f"obs_robot{robot}.npz")


class RecordedCandidate(NamedTuple):
    robot_a: int
    frame_a: int
    robot_b: int
    frame_b: int
    mono_inliers: int
    stereo_inliers: int
    status: int  # LCD_* code
    R: np.ndarray | None  # recorded T^a_b (None if not in the log)
    t: np.ndarray | None


_STATUS_CODES = {v: k for k, v in LCD_STATUS_NAMES.items()}


def read_recorded_candidates(log_dir: str, n_robots: int
                             ) -> list[RecordedCandidate]:
    """Collect every recorded verification attempt of a run.

    * `distributed/loop_closures.csv` rows are accepted candidates
      (status LOOP_DETECTED) with the recorded relative pose
      (lc_result.py:121-138).
    * `single/output_lcd_status.csv` rows carry the full status taxonomy
      (lc_result.py:143-155). The reference schema has no robot columns
      (it is written per robot directory); rows not already present as a
      loop-closure row are joined as same-robot attempts unless a
      matching accepted inter-robot row pins the target robot.
    """
    from ..core import lie
    import jax.numpy as jnp

    # Prefer the full-fidelity sidecar (distributed/lcd_attempts.csv,
    # logs.write_lcd_attempts_csv) when every robot directory carries it:
    # it pins the target robot of rejected inter-robot attempts, which the
    # reference schema cannot express.
    sidecars = [os.path.join(log_dir, f"robot{r}", "distributed",
                             "lcd_attempts.csv") for r in range(n_robots)]
    if all(os.path.exists(p) for p in sidecars):
        lc_pose: dict[tuple[int, int, int, int], tuple] = {}
        for r in range(n_robots):
            lp = os.path.join(log_dir, f"robot{r}", "distributed",
                              "loop_closures.csv")
            if not os.path.exists(lp):
                continue
            lc = logs.read_csv(lp)
            for i in range(len(np.atleast_1d(lc.get("robot1", [])))):
                g = lambda c: np.atleast_1d(lc[c])[i]
                q = np.asarray([g("qx"), g("qy"), g("qz"), g("qw")],
                               np.float32)
                key = (int(g("robot1")), int(g("pose1")),
                       int(g("robot2")), int(g("pose2")))
                lc_pose[key] = (
                    np.asarray(lie.quat_to_rot(jnp.asarray(q))),
                    np.asarray([g("tx"), g("ty"), g("tz")], np.float32))
        out: list[RecordedCandidate] = []
        for r, p in enumerate(sidecars):
            att = logs.read_csv(p)
            for i in range(len(np.atleast_1d(att.get("robot_a", [])))):
                g = lambda c: np.atleast_1d(att[c])[i]
                key = (int(g("robot_a")), int(g("frame_a")),
                       int(g("robot_b")), int(g("frame_b")))
                R, t = lc_pose.get(key, (None, None))
                out.append(RecordedCandidate(
                    robot_a=key[0], frame_a=key[1], robot_b=key[2],
                    frame_b=key[3],
                    mono_inliers=int(g("mono_inliers")),
                    stereo_inliers=int(g("stereo_inliers")),
                    status=_STATUS_CODES.get(str(g("lcd_status")), -1),
                    R=R, t=t))
        return out

    cands: list[RecordedCandidate] = []
    seen: set[tuple[int, int, int]] = set()  # (robot_a, frame_a, frame_b)
    for r in range(n_robots):
        lc_path = os.path.join(log_dir, f"robot{r}", "distributed",
                               "loop_closures.csv")
        if os.path.exists(lc_path):
            lc = logs.read_csv(lc_path)
            n = len(np.atleast_1d(lc.get("robot1", [])))
            for i in range(n):
                g = lambda c: np.atleast_1d(lc[c])[i]
                q = np.asarray([g("qx"), g("qy"), g("qz"), g("qw")],
                               np.float32)
                R = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
                cands.append(RecordedCandidate(
                    robot_a=int(g("robot1")), frame_a=int(g("pose1")),
                    robot_b=int(g("robot2")), frame_b=int(g("pose2")),
                    mono_inliers=int(g("mono_inliers")),
                    stereo_inliers=int(g("stereo_inliers")),
                    status=LCD_LOOP_DETECTED,
                    R=R, t=np.asarray([g("tx"), g("ty"), g("tz")],
                                      np.float32)))
                seen.add((int(g("robot1")), int(g("pose1")),
                          int(g("pose2"))))
    for r in range(n_robots):
        st_path = os.path.join(log_dir, f"robot{r}", "single",
                               "output_lcd_status.csv")
        if not os.path.exists(st_path):
            continue
        st = logs.read_csv(st_path)
        n = len(np.atleast_1d(st.get("lcd_status", [])))
        for i in range(n):
            g = lambda c: np.atleast_1d(st[c])[i]
            name = str(g("lcd_status"))
            code = _STATUS_CODES.get(name, -1)
            qa, qb = int(g("query_id")), int(g("match_id"))
            if code == LCD_LOOP_DETECTED and (r, qa, qb) in seen:
                continue  # already joined from loop_closures.csv
            cands.append(RecordedCandidate(
                robot_a=r, frame_a=qa, robot_b=r, frame_b=qb,
                mono_inliers=int(g("mono_inliers")),
                stereo_inliers=int(g("stereo_inliers")),
                status=code, R=None, t=None))
    return cands


class ReplayReport(NamedTuple):
    n_candidates: int
    n_status_match: int
    n_mono_exact: int
    n_stereo_exact: int
    n_mono_within_tol: int
    n_stereo_within_tol: int
    max_mono_delta: int
    max_stereo_delta: int
    max_trans_delta: float  # vs recorded accepted poses
    rows: list[dict]


def replay_verify(log_dir: str, obs_dir: str, n_robots: int,
                  cfg=None, inlier_tol: int = 0,
                  out_csv: str | None = None) -> ReplayReport:
    """Re-run the verifier on every recorded candidate and diff row-by-row.

    inlier_tol: allowed |recorded - replayed| inlier slack counted as
    "within tolerance" (0 = demand bit-equality, the own-logs case)."""
    import jax
    import jax.numpy as jnp

    from ..core import rng as rngmod
    from ..frontend import batched as batched_mod
    from ..frontend.dlc import FrontendConfig

    cfg = cfg or FrontendConfig()
    cands = read_recorded_candidates(log_dir, n_robots)
    streams = [load_observations(obs_path(obs_dir, r))
               for r in range(n_robots)]
    T = max(s.descriptors.shape[0] for s in streams)
    K = max(s.descriptors.shape[1] for s in streams)
    R = n_robots
    desc = np.zeros((R, T, K, 32), np.uint8)
    bear = np.zeros((R, T, K, 3), np.float32)
    lm = np.zeros((R, T, K, 3), np.float32)
    val = np.zeros((R, T, K), bool)
    for r, s in enumerate(streams):
        t, k = s.descriptors.shape[:2]
        desc[r, :t, :k] = s.descriptors
        bear[r, :t, :k] = s.bearings
        lm[r, :t, :k] = s.landmarks
        val[r, :t, :k] = s.valid

    verify = batched_mod.make_verifier(cfg)
    B = len(cands)
    if B == 0:
        return ReplayReport(0, 0, 0, 0, 0, 0, 0, 0, 0.0, [])
    pad = max(1, int(2 ** np.ceil(np.log2(B)))) - B
    qr = np.asarray([c.robot_a for c in cands] + [0] * pad, np.int32)
    qf = np.asarray([c.frame_a for c in cands] + [0] * pad, np.int32)
    tr = np.asarray([c.robot_b for c in cands] + [0] * pad, np.int32)
    tm = np.asarray([c.frame_b for c in cands] + [0] * pad, np.int32)
    # the verifier's keyframe stores are SoA (R, T, 3, K) — see
    # frontend/batched.make_verifier's layout note
    res = verify(rngmod.base_key(cfg.base_seed),
                 jnp.asarray(desc), jnp.asarray(val),
                 jnp.swapaxes(jnp.asarray(bear), -1, -2),
                 jnp.swapaxes(jnp.asarray(lm), -1, -2),
                 jnp.asarray(qr), jnp.asarray(qf),
                 jnp.asarray(tr), jnp.asarray(tm))
    res = jax.tree_util.tree_map(np.asarray, res)

    rows = []
    n_status = n_me = n_se = n_mt = n_st = 0
    dmono = dstereo = 0
    dtrans = 0.0
    for i, c in enumerate(cands):
        mono_ok = bool(res["mono_ok"][i])
        stereo_ok = bool(res["stereo_ok"][i])
        if not mono_ok:
            status = LCD_FAILED_GEOM_VERIFICATION
        elif not stereo_ok:
            status = LCD_FAILED_POSE_RECOVERY
        else:
            status = LCD_LOOP_DETECTED
        mono = int(res["mono_inliers"][i])
        stereo = int(res["stereo_inliers"][i])
        dm, ds = abs(mono - c.mono_inliers), abs(stereo - c.stereo_inliers)
        td = (float(np.linalg.norm(np.asarray(res["t"][i]) - c.t))
              if c.t is not None and status == LCD_LOOP_DETECTED else 0.0)
        n_status += int(status == c.status)
        n_me += int(dm == 0)
        n_se += int(ds == 0)
        n_mt += int(dm <= inlier_tol)
        n_st += int(ds <= inlier_tol)
        dmono, dstereo = max(dmono, dm), max(dstereo, ds)
        dtrans = max(dtrans, td)
        rows.append(dict(
            robot_a=c.robot_a, frame_a=c.frame_a, robot_b=c.robot_b,
            frame_b=c.frame_b,
            status_recorded=LCD_STATUS_NAMES.get(c.status, "UNKNOWN"),
            status_replayed=LCD_STATUS_NAMES.get(status, "UNKNOWN"),
            mono_recorded=c.mono_inliers, mono_replayed=mono,
            stereo_recorded=c.stereo_inliers, stereo_replayed=stereo,
            trans_delta=td))

    if out_csv:
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        cols = list(rows[0].keys())
        with open(out_csv, "w") as f:
            f.write(",".join(cols) + "\n")
            for row in rows:
                f.write(",".join(str(row[c]) for c in cols) + "\n")

    return ReplayReport(
        n_candidates=B, n_status_match=n_status, n_mono_exact=n_me,
        n_stereo_exact=n_se, n_mono_within_tol=n_mt,
        n_stereo_within_tol=n_st, max_mono_delta=dmono,
        max_stereo_delta=dstereo, max_trans_delta=dtrans, rows=rows)


def replay_ape(log_dir: str, gt_tum: dict[int, str], n_robots: int,
               max_diff: float = 0.01) -> dict[int, dict]:
    """Trajectory acceptance: newest TUM dump per robot vs GT
    (the evo_real_time.py association + alignment + APE contract,
    examples/evo_real_time.py:259-281)."""
    import glob

    import jax.numpy as jnp

    from ..core import lie
    from ..eval import ape as ape_mod

    out = {}
    for r in range(n_robots):
        pattern = os.path.join(log_dir, f"robot{r}", "distributed",
                               "kimera_distributed_poses_tum_*.tum")
        files = sorted(glob.glob(pattern),
                       key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
        if not files or r not in gt_tum:
            continue
        ts, t, q = logs.read_tum(files[-1])
        gts, gt_t, gt_q = logs.read_tum(gt_tum[r])
        # associate by timestamp (max_diff), evo semantics
        ii, jj = ape_mod.associate(ts, gts, max_diff=max_diff)
        R_est = np.asarray(lie.quat_to_rot(jnp.asarray(q[ii], jnp.float32)))
        R_gt = np.asarray(lie.quat_to_rot(jnp.asarray(gt_q[jj], jnp.float32)))
        res = ape_mod.ape(jnp.asarray(t[ii], jnp.float32),
                          jnp.asarray(R_est),
                          jnp.asarray(gt_t[jj], jnp.float32),
                          jnp.asarray(R_gt), align=True)
        out[r] = dict(rmse_trans=float(res.rmse_trans),
                      rmse_full=float(res.rmse_full),
                      n_matched=int(res.n_matched))
    return out
