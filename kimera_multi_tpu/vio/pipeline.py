"""The VIO pipeline: tracking front-end + fixed-lag smoother back-end.

Role of Kimera-VIO's `Pipeline`/`MonoImuPipeline` module graph (SURVEY.md
section 3.1: data-provider -> frontend (KLT, keyframe gates, RANSAC
rejection) -> backend (fixed-lag smoother) -> LCD/output queues;
images/kimera-multi.drawio:996,1406-1418,1599-1860).

The reference's threaded module pipeline with bounded queues collapses to
a host loop over jitted stages (stage fusion, SURVEY.md section 2.3 row 3);
async dispatch gives cross-stage overlap without threads.

Keyframe gates follow FrontendParams.yaml: min/max intra-keyframe time
0.2 / 5.0 s, disparity threshold; feature budget 300/frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import lie
from . import imu as imu_mod, smoother, tracking


class PipelineConfig(NamedTuple):
    gftt: tracking.GfttParams = tracking.GfttParams()
    klt: tracking.KltParams = tracking.KltParams()
    vio: smoother.VioConfig = smoother.VioConfig()
    imu: imu_mod.ImuParams = imu_mod.ImuParams()
    min_intra_keyframe_time: float = 0.2
    max_intra_keyframe_time: float = 5.0
    disparity_threshold: float = 0.5  # px mean disparity to force keyframe
    window_size: int = 8  # sliding window (reference horizon: 25 states)
    max_landmarks: int = 128
    imu_samples_per_kf: int = 128  # preintegration capacity between kfs
    # pinhole intrinsics for bearing computation
    fx: float = 200.0
    fy: float = 200.0
    cx: float = 80.0
    cy: float = 60.0


class KeyframeOutput(NamedTuple):
    """Per-keyframe product (feeds the LCD/distributed front-end)."""

    timestamp: float
    R: np.ndarray
    t: np.ndarray
    v: np.ndarray
    track_ids: np.ndarray  # (N,) persistent feature ids (-1 invalid)
    pts: np.ndarray  # (N, 2) pixel positions
    bearings: np.ndarray  # (N, 3)


class VioPipeline:
    """Host-driven monocular-inertial odometry over jitted stages."""

    def __init__(self, cfg: PipelineConfig = PipelineConfig()):
        self.cfg = cfg
        self.prev_img = None
        self.prev_ts = None
        self.last_kf_ts = None
        self.pts = None  # (N, 2)
        self.track_ids = None
        self.valid = None
        self.next_id = 0
        self.imu_buf: list = []  # (ts, gyro, accel) since last keyframe
        # window state
        W = cfg.window_size
        self.win_states: list = []  # list of dicts per keyframe
        self.win_pre: list = []
        self.keyframes: list[KeyframeOutput] = []
        self.obs: dict[int, list] = {}  # track_id -> [(kf_idx, bearing)]
        self._klt = jax.jit(
            lambda i0, i1, p, v: tracking.klt_track(i0, i1, p, v, cfg.klt))
        self._gftt = jax.jit(
            lambda img: tracking.gftt_detect(img, cfg.gftt))

    # ------------------------------------------------------------------
    def add_imu(self, ts: float, gyro, accel) -> None:
        self.imu_buf.append((ts, np.asarray(gyro, np.float32),
                             np.asarray(accel, np.float32)))

    def _bearing(self, pts: np.ndarray) -> np.ndarray:
        c = self.cfg
        x = (pts[:, 0] - c.cx) / c.fx
        y = (pts[:, 1] - c.cy) / c.fy
        b = np.stack([x, y, np.ones_like(x)], -1)
        return (b / np.linalg.norm(b, axis=1, keepdims=True)).astype(
            np.float32)

    def process_frame(self, ts: float, img: np.ndarray):
        """Returns a KeyframeOutput when this frame becomes a keyframe."""
        cfg = self.cfg
        imgj = jnp.asarray(img, jnp.float32)
        if self.prev_img is None:
            # bootstrap: detect features, first keyframe
            pts, scores, valid = self._gftt(imgj)
            self.pts = np.array(pts)
            self.valid = np.asarray(valid)
            self.track_ids = np.where(
                self.valid, np.arange(len(self.pts)) + self.next_id, -1)
            self.next_id += int(self.valid.sum())
            self.prev_img = imgj
            self.prev_ts = ts
            self.last_kf_ts = ts
            return self._make_keyframe(ts)

        # KLT track from previous frame
        pts1, tracked = self._klt(self.prev_img, imgj, jnp.asarray(self.pts),
                                  jnp.asarray(self.valid))
        pts1 = np.array(pts1)  # writable copy (np.asarray views jax buffers)
        tracked = np.asarray(tracked) & self.valid
        disparity = np.linalg.norm(
            (pts1 - self.pts)[tracked], axis=1).mean() if tracked.any() else 0.0
        self.pts = pts1
        self.valid = tracked
        self.track_ids = np.where(tracked, self.track_ids, -1)
        self.prev_img = imgj
        self.prev_ts = ts

        dt_kf = ts - self.last_kf_ts
        is_kf = (dt_kf >= cfg.min_intra_keyframe_time and
                 (disparity > cfg.disparity_threshold
                  or dt_kf >= cfg.max_intra_keyframe_time))
        if not is_kf:
            return None

        # refill features to budget before emitting the keyframe
        pts_new, scores, valid_new = self._gftt(imgj)
        pts_new, valid_new = np.asarray(pts_new), np.asarray(valid_new)
        free = ~self.valid
        take = 0
        for i in np.nonzero(free)[0]:
            # fill free slots with detections away from existing tracks
            while take < len(pts_new):
                cand = pts_new[take]
                okc = valid_new[take]
                take += 1
                if not okc:
                    continue
                d = np.linalg.norm(self.pts[self.valid] - cand, axis=1)
                if len(d) == 0 or d.min() > cfg.gftt.min_distance:
                    self.pts[i] = cand
                    self.valid[i] = True
                    self.track_ids[i] = self.next_id
                    self.next_id += 1
                    break
            else:
                break
        self.last_kf_ts = ts
        return self._make_keyframe(ts)

    # ------------------------------------------------------------------
    def _make_keyframe(self, ts: float):
        cfg = self.cfg
        kf_idx = len(self.keyframes)
        bear = self._bearing(self.pts)
        # preintegrate IMU since previous keyframe
        if kf_idx > 0 and self.imu_buf:
            S = cfg.imu_samples_per_kf
            gyro = np.zeros((S, 3), np.float32)
            accel = np.zeros((S, 3), np.float32)
            dts = np.zeros(S, np.float32)
            buf = self.imu_buf[:S]
            for i, (tsi, g, a) in enumerate(buf):
                gyro[i], accel[i] = g, a
                prev_t = buf[i - 1][0] if i > 0 else self.keyframes[-1].timestamp
                dts[i] = max(tsi - prev_t, 0.0)
            pre = imu_mod.preintegrate(
                jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
                jnp.zeros(3), jnp.zeros(3), cfg.imu)
        else:
            pre = None
        self.imu_buf = []

        # propagate pose guess from last state + preintegration
        if kf_idx == 0:
            R0, t0, v0 = np.eye(3, dtype=np.float32), np.zeros(3, np.float32), \
                np.zeros(3, np.float32)
        else:
            prev = self.keyframes[-1]
            if pre is not None:
                dt = float(pre.dt)
                g = np.asarray(imu_mod.GRAVITY)
                R0 = prev.R @ np.asarray(pre.dR)
                v0 = prev.v + g * dt + prev.R @ np.asarray(pre.dv)
                t0 = (prev.t + prev.v * dt + 0.5 * g * dt * dt
                      + prev.R @ np.asarray(pre.dp))
            else:
                R0, t0, v0 = prev.R, prev.t, prev.v
        kf = KeyframeOutput(
            timestamp=ts, R=np.asarray(R0, np.float32),
            t=np.asarray(t0, np.float32), v=np.asarray(v0, np.float32),
            track_ids=self.track_ids.copy(), pts=self.pts.copy(),
            bearings=bear)
        self.keyframes.append(kf)
        self.win_pre.append(pre)
        for slot, tid in enumerate(self.track_ids):
            if tid >= 0 and self.valid[slot]:
                self.obs.setdefault(int(tid), []).append((kf_idx, bear[slot]))

        # run the smoother over the trailing window
        if kf_idx >= 1:
            self._optimize_window()
        return self.keyframes[-1]

    def _optimize_window(self):
        cfg = self.cfg
        W = min(cfg.window_size, len(self.keyframes))
        base = len(self.keyframes) - W
        kfs = self.keyframes[base:]
        pres = self.win_pre[base + 1 : base + W]
        if any(p is None for p in pres) or len(pres) != W - 1:
            imu_valid = np.asarray([p is not None for p in pres])
            pres = [p if p is not None else _dummy_pre() for p in pres]
        else:
            imu_valid = np.ones(W - 1, bool)
        pre = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)

        # landmarks with >= 2 obs inside the window
        L = cfg.max_landmarks
        bear = np.zeros((L, W, 3), np.float32)
        ovalid = np.zeros((L, W), bool)
        li = 0
        for tid, obs in self.obs.items():
            inwin = [(k - base, b) for k, b in obs if k >= base]
            if len(inwin) < 2:
                continue
            if li >= L:
                break
            for k, b in inwin:
                bear[li, k] = b
                ovalid[li, k] = True
            li += 1

        state0 = smoother.VioState(
            R=jnp.asarray(np.stack([k.R for k in kfs])),
            t=jnp.asarray(np.stack([k.t for k in kfs])),
            v=jnp.asarray(np.stack([k.v for k in kfs])),
            bg=jnp.zeros((W, 3)),
            ba=jnp.zeros((W, 3)),
        )
        win = smoother.VioWindow(
            pre=pre,
            imu_valid=jnp.asarray(imu_valid),
            bearings=jnp.asarray(bear),
            obs_valid=jnp.asarray(ovalid),
            odo_R=jnp.broadcast_to(jnp.eye(3), (W - 1, 3, 3)),
            odo_t=jnp.zeros((W - 1, 3)),
            odo_valid=jnp.zeros(W - 1, bool),
            zero_vel=jnp.zeros(W, bool),
            anchor=smoother.VioState(
                R=state0.R[:1], t=state0.t[:1], v=state0.v[:1],
                bg=state0.bg[:1], ba=state0.ba[:1]),
        )
        solved = smoother.solve_window(state0, win, cfg.vio)
        R_s = np.asarray(solved.R)
        t_s = np.asarray(solved.t)
        v_s = np.asarray(solved.v)
        for i, k in enumerate(range(base, base + W)):
            self.keyframes[k] = self.keyframes[k]._replace(
                R=R_s[i], t=t_s[i], v=v_s[i])


def _dummy_pre():
    import jax.numpy as jnp

    return imu_mod.Preintegrated(
        dR=jnp.eye(3), dv=jnp.zeros(3), dp=jnp.zeros(3),
        dt=jnp.asarray(0.0), dR_dbg=jnp.zeros((3, 3)),
        dv_dbg=jnp.zeros((3, 3)), dv_dba=jnp.zeros((3, 3)),
        dp_dbg=jnp.zeros((3, 3)), dp_dba=jnp.zeros((3, 3)),
        cov=jnp.eye(9) * 1e-4)
