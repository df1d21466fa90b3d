"""Stereo VIO on rendered imagery: drift, outlier rejection, LCD feed.

The rendered-scene tier (io/render.py) substitutes for the reference's
rosbag replays: GT trajectory + consistent stereo imagery + analytic IMU.
Asserts (VERDICT round-1 item 3 "done" criteria):
  * stereo+IMU VIO drift bounded on a rendered sequence,
  * the in-pipeline RANSAC rejection stage removes injected outlier
    tracks while keeping clean ones,
  * keyframe products (BRIEF descriptors + bearings + stereo landmarks)
    feed the LCD verification path: a revisit pair passes the
    mono+stereo gates.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from kimera_multi_tpu.core import lie, rng as rngmod
from kimera_multi_tpu.io import render
from kimera_multi_tpu.kernels import hamming, ransac
from kimera_multi_tpu.vio import descriptors as desc_mod, pipeline
from kimera_multi_tpu.vio.undistort import CameraModel


H, W = 96, 128
CAM = CameraModel(fx=110.0, fy=110.0, cx=W / 2, cy=H / 2)
RIG = render.StereoRig(cam=CAM, H=H, W=W, baseline=0.2)


def _small_cfg(**kw):
    base = dict(
        cam=CAM, baseline=RIG.baseline, window_size=8, max_features=96,
        gftt=pipeline.tracking.GfttParams(max_features=96, min_distance=6,
                                          quality_level=0.001),
        klt=pipeline.tracking.KltParams(win_size=12, max_level=3,
                                        max_iter=20),
        min_intra_keyframe_time=0.0, disparity_threshold=0.0,
        ransac_iterations=200, min_mono_inliers=8, min_stereo_inliers=4,
        vio=pipeline.smoother.VioConfig(gn_iters=12),
        # the rendered IMU is exact; what the factor must absorb is the
        # preintegration discretization error at 100 Hz, so the noise
        # params are calibrated to that, not to the D455 datasheet
        imu=pipeline.imu_mod.ImuParams(gyro_noise=2e-3, accel_noise=2e-2),
    )
    base.update(kw)
    return pipeline.PipelineConfig(**base)


@pytest.fixture(scope="module")
def seq():
    scene = render.make_scene(seed=4, n_points=350)
    return render.render_sequence(
        scene, RIG, n_frames=24, rate_hz=10.0, imu_rate_hz=100.0,
        speed=0.6, yaw_rate=0.1)


def test_stereo_vio_drift_bounded(seq):
    vio = pipeline.VioPipeline(_small_cfg())
    imu_i = 0
    for k in range(len(seq.timestamps)):
        ts = seq.timestamps[k]
        while imu_i < len(seq.imu_ts) and seq.imu_ts[imu_i] <= ts:
            vio.add_imu(seq.imu_ts[imu_i], seq.gyro[imu_i],
                        seq.accel[imu_i])
            imu_i += 1
        vio.process_frame(ts, seq.left[k], seq.right[k])
    assert len(vio.keyframes) >= 10
    # associate keyframes to GT frames by timestamp; the VIO world is a
    # gravity-aligned frame with free yaw — align SE(3) before comparing
    # (the evo protocol, examples/evo_real_time.py:264-266)
    from kimera_multi_tpu.eval import ape as ape_mod

    kf_ts = np.asarray([kf.timestamp for kf in vio.keyframes])
    gt_idx = np.searchsorted(seq.timestamps, kf_ts)
    gt_idx = np.clip(gt_idx, 0, len(seq.timestamps) - 1)
    t_est = np.stack([kf.t for kf in vio.keyframes])
    R_est = np.stack([kf.R for kf in vio.keyframes])
    t_gt = seq.t_gt[gt_idx]
    path_len = np.linalg.norm(np.diff(t_gt, axis=0), axis=1).sum()
    res = ape_mod.ape(jnp.asarray(t_est), jnp.asarray(R_est),
                      jnp.asarray(t_gt), jnp.asarray(seq.R_gt[gt_idx]),
                      align=True)
    # drift under 10% of path length (structureless GN + stereo depth)
    assert float(res.rmse_trans) < 0.10 * path_len, (
        float(res.rmse_trans), path_len)
    # stereo landmarks carry sane depth
    kf = vio.keyframes[-1]
    z = kf.landmarks[kf.lm_valid][:, 2]
    assert z.size >= 10 and (z > 0.5).all() and (z < 40).all()


def test_rejection_removes_injected_outliers(seq):
    """Corrupt a third of the correspondences feeding the rejection stage;
    the mono+stereo gates must drop most corrupted and keep most clean."""
    cfg = _small_cfg()
    vio = pipeline.VioPipeline(cfg)
    npr = np.random.default_rng(0)
    N = cfg.max_features
    # synthetic geometry: points ahead, pure translation between frames
    P = npr.uniform(-3, 3, (N, 3)).astype(np.float32)
    P[:, 2] = npr.uniform(3, 9, N)
    t_rel = np.asarray([0.25, 0.0, 0.4], np.float32)
    P2 = P - t_rel[None]
    bear1 = P / np.linalg.norm(P, axis=1, keepdims=True)
    bear2 = P2 / np.linalg.norm(P2, axis=1, keepdims=True)
    corrupt = npr.uniform(size=N) < 0.33
    bear2_bad = bear2.copy()
    P2_bad = P2.copy()
    idx = np.nonzero(corrupt)[0]
    perm = npr.permutation(idx)
    bear2_bad[idx] = bear2[perm]  # wrong associations
    P2_bad[idx] = P2[perm]
    out = vio._reject(
        rngmod.derive(rngmod.base_key(0), rngmod.Stream.VIO, 1),
        jnp.asarray(bear1), jnp.asarray(bear2_bad),
        jnp.asarray(P), jnp.asarray(P2_bad),
        jnp.ones(N, bool), jnp.ones(N, bool),
        jnp.eye(3), jnp.asarray(True))
    keep = np.asarray(out["keep"])
    clean = ~corrupt
    kept_clean = keep[clean].mean()
    kept_bad = keep[corrupt].mean()
    assert kept_clean > 0.8, kept_clean
    assert kept_bad < 0.2, kept_bad
    assert bool(out["mono_ok"]) and bool(out["stereo_ok"])
    # the stereo relative pose doubles as the between measurement
    assert np.allclose(np.asarray(out["t_rel"]), t_rel, atol=0.05)


def test_keyframes_feed_lcd(seq):
    """Descriptors + bearings + landmarks from two renders of the SAME
    pose (a perfect revisit) pass the LCD verification gates."""
    vio = pipeline.VioPipeline(_small_cfg())
    # two keyframes at identical pose, independent feature detections
    kf1 = vio.process_frame(0.0, seq.left[0], seq.right[0])
    vio2 = pipeline.VioPipeline(_small_cfg())
    kf2 = vio2.process_frame(0.0, seq.left[0], seq.right[0])
    m, _ = hamming.knn2_lowe_match(
        jnp.asarray(kf1.descriptors), jnp.asarray(kf1.valid),
        jnp.asarray(kf2.descriptors), jnp.asarray(kf2.valid),
        lowe_ratio=0.8)
    matched = m >= 0
    assert int(matched.sum()) >= 12
    idx = jnp.maximum(m, 0)
    key = rngmod.derive(rngmod.base_key(0), 0, 0, 1, 0)
    mono = ransac.ransac_essential(
        rngmod.derive(key, rngmod.Stream.RANSAC_MONO),
        jnp.asarray(kf1.bearings).T, jnp.asarray(kf2.bearings)[idx].T,
        matched, n_hyp=200, min_inliers=8)
    st = ransac.ransac_arun(
        rngmod.derive(key, rngmod.Stream.RANSAC_STEREO),
        jnp.asarray(kf1.landmarks).T, jnp.asarray(kf2.landmarks)[idx].T,
        matched & jnp.asarray(kf1.lm_valid)
        & jnp.asarray(kf2.lm_valid)[idx],
        n_hyp=200, min_inliers=4, threshold=0.5)
    assert bool(mono["ok"]), int(mono["n_inliers"])
    assert bool(st["ok"]), int(st["n_inliers"])
    # recovered transform ~ identity (same pose)
    assert float(jnp.linalg.norm(st["t"])) < 0.3
    ang = float(lie.rotation_geodesic_distance(st["R"], jnp.eye(3)))
    assert ang < 0.1


def test_config_from_reference_params():
    cfg = pipeline.PipelineConfig.from_params_folder(
        "/root/reference/params/D455")
    assert cfg.window_size == 25
    assert cfg.max_features == 300
    assert cfg.klt.win_size == 24 and cfg.klt.max_level == 4
    assert abs(cfg.cam.fx - 377.229220831) < 1e-6
    assert abs(cfg.cam.k1 + 0.00439906) < 1e-9
    assert cfg.ransac_iterations == 500
    assert abs(cfg.ransac_stereo_threshold - 0.8) < 1e-9
    assert not cfg.ransac_use_1point_stereo
