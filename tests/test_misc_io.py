"""Undistortion, EuRoC reader, trial harness."""

import os

import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.cli import trials
from kimera_multi_tpu.io import dataset
from kimera_multi_tpu.vio import undistort


def test_undistort_roundtrip():
    cam = undistort.CameraModel(fx=150.0, fy=150.0, cx=80.0, cy=60.0,
                                k1=-0.05, k2=0.01, p1=0.001, p2=-0.002)
    # distort then undistort normalized points -> identity
    npr = np.random.default_rng(0)
    pts = npr.uniform([20, 20], [140, 100], (50, 2)).astype(np.float32)
    x = (pts[:, 0] - cam.cx) / cam.fx
    y = (pts[:, 1] - cam.cy) / cam.fy
    xd, yd = undistort.distort_normalized(jnp.asarray(x), jnp.asarray(y), cam)
    dist_px = np.stack([np.asarray(xd) * cam.fx + cam.cx,
                        np.asarray(yd) * cam.fy + cam.cy], -1)
    rect = np.asarray(undistort.undistort_points(jnp.asarray(dist_px), cam))
    assert np.allclose(rect, pts, atol=0.05)

    # remap grid maps a rendered distorted image back to straight lines
    mu, mv = undistort.undistort_map(cam, 120, 160)
    assert mu.shape == (120, 160)
    # center pixel maps near itself
    assert abs(float(mu[60, 80]) - 80) < 1.0
    img = jnp.asarray(npr.uniform(size=(120, 160)).astype(np.float32))
    out = undistort.remap(img, mu, mv)
    assert out.shape == img.shape


def test_euroc_reader(tmp_path):
    mav = tmp_path / "mav0"
    (mav / "cam0" / "data").mkdir(parents=True)
    (mav / "imu0").mkdir()
    (mav / "state_groundtruth_estimate0").mkdir()
    with open(mav / "cam0" / "data.csv", "w") as f:
        f.write("#timestamp [ns],filename\n")
        for i in range(5):
            f.write(f"{i * 50000000},{i}.png\n")
    with open(mav / "imu0" / "data.csv", "w") as f:
        f.write("#ts,wx,wy,wz,ax,ay,az\n")
        for i in range(20):
            f.write(f"{i * 5000000},0.1,0.2,0.3,0.0,0.0,9.81\n")
    with open(mav / "state_groundtruth_estimate0" / "data.csv", "w") as f:
        f.write("#ts,px,py,pz,qw,qx,qy,qz,...\n")
        for i in range(5):
            f.write(f"{i * 50000000},{i * 0.1},0,0,1,0,0,0,0,0,0\n")
    s = dataset.load_euroc(str(tmp_path))
    assert len(s.cam_ts) == 5
    assert abs(s.cam_ts[1] - 0.05) < 1e-9
    assert s.gyro.shape == (20, 3)
    assert abs(s.accel[0, 2] - 9.81) < 1e-6
    assert s.gt_t.shape == (5, 3)
    # quaternion reordered to (qx, qy, qz, qw)
    assert s.gt_q[0, 3] == 1.0


def test_trial_harness(tmp_path):
    base = ["--mode", "sim", "--robots", "2", "--steps", "25",
            "--features", "64"]
    dirs = trials.run_trials(base, 2, str(tmp_path))
    assert len(dirs) == 2
    stats = trials.median_stats(dirs, 2)
    assert set(stats) == {0, 1}
    for s in stats.values():
        assert s["n_trials"] == 2
        assert s["median"] < 0.5


def test_live_monitor(tmp_path):
    """evo_real_time equivalent: watches dumps, GCs, appends APE rows."""
    import jax.numpy as jnp

    from kimera_multi_tpu.cli import monitor
    from kimera_multi_tpu.core import lie
    from kimera_multi_tpu.io import logs

    npr = np.random.default_rng(0)
    n = 30
    ts = np.arange(n) * 0.5
    t = np.cumsum(npr.normal(0, 0.1, (n, 3)), 0).astype(np.float32)
    q = np.asarray(lie.rot_to_quat(jnp.broadcast_to(jnp.eye(3), (n, 3, 3))))
    gt_path = str(tmp_path / "gt0.tum")
    logs.write_tum(gt_path, ts, t, q)
    rdir = tmp_path / "robot0" / "distributed"
    rdir.mkdir(parents=True)
    # three successive dumps
    for k in range(3):
        logs.write_tum(str(rdir / f"kimera_distributed_poses_tum_{k}.tum"),
                       ts, t, q)
    monitor.monitor(str(tmp_path), {0: gt_path}, interval=0.01,
                    idle_exit=0.5, max_iters=1)
    ape = logs.read_csv(str(tmp_path / "ape_robot0.csv"))
    assert ape["rmse_trans"][-1] < 1e-4
    # GC kept oldest + newest only
    left = sorted(p.name for p in rdir.iterdir())
    assert left == ["kimera_distributed_poses_tum_0.tum",
                    "kimera_distributed_poses_tum_2.tum"]
