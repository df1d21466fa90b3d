"""EuRoC -> replay-format converter (io/convert.py) on a synthetic EuRoC
tree: rendered stereo frames written as PGM + IMU/GT CSVs in the exact ASL
layout, converted to obs_robot<k>.npz, then gated by the replay-acceptance
harness with no code changes (VERDICT round-2 item 6 done-criterion)."""

import os

import numpy as np

from kimera_multi_tpu.io import convert as convert_mod, dataset, logs, \
    render, replay as replay_mod
from kimera_multi_tpu.vio.undistort import CameraModel


H, W = 96, 128
FX = FY = 110.0


def _write_pgm(path, img):
    # rendered sprite images are O(1)-amplitude floats; a FIXED gain maps
    # them onto the 8-bit range (per-frame normalization would make
    # brightness flicker and break KLT)
    arr = np.clip(np.asarray(img) * 120.0, 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]))
        f.write(arr.tobytes())


def _make_euroc_tree(root, seq, n_frames):
    """Write a rendered sequence as an ASL-layout EuRoC session."""
    mav = os.path.join(root, "mav0")
    for cam, frames in (("cam0", seq.left), ("cam1", seq.right)):
        ddir = os.path.join(mav, cam, "data")
        os.makedirs(ddir, exist_ok=True)
        with open(os.path.join(mav, cam, "data.csv"), "w") as f:
            f.write("#timestamp [ns],filename\n")
            for k in range(n_frames):
                ns = int(seq.timestamps[k] * 1e9)
                name = f"{ns}.pgm"
                _write_pgm(os.path.join(ddir, name), frames[k])
                f.write(f"{ns},{name}\n")
    # sensor.yaml with intrinsics + T_BS (baseline on x)
    with open(os.path.join(mav, "cam0", "sensor.yaml"), "w") as f:
        f.write("sensor_type: camera\nT_BS:\n  cols: 4\n  rows: 4\n"
                "  data: [1.0, 0.0, 0.0, 0.0,\n"
                "         0.0, 1.0, 0.0, 0.0,\n"
                "         0.0, 0.0, 1.0, 0.0,\n"
                "         0.0, 0.0, 0.0, 1.0]\n"
                f"intrinsics: [{FX}, {FY}, {W / 2}, {H / 2}]\n")
    with open(os.path.join(mav, "cam1", "sensor.yaml"), "w") as f:
        f.write("sensor_type: camera\nT_BS:\n  cols: 4\n  rows: 4\n"
                "  data: [1.0, 0.0, 0.0, 0.2,\n"
                "         0.0, 1.0, 0.0, 0.0,\n"
                "         0.0, 0.0, 1.0, 0.0,\n"
                "         0.0, 0.0, 0.0, 1.0]\n"
                f"intrinsics: [{FX}, {FY}, {W / 2}, {H / 2}]\n")
    idir = os.path.join(mav, "imu0")
    os.makedirs(idir, exist_ok=True)
    with open(os.path.join(idir, "data.csv"), "w") as f:
        f.write("#timestamp [ns],w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(len(seq.imu_ts)):
            f.write(f"{int(seq.imu_ts[i] * 1e9)},"
                    + ",".join(f"{x:.8f}" for x in seq.gyro[i])
                    + "," + ",".join(f"{x:.8f}" for x in seq.accel[i])
                    + "\n")
    gdir = os.path.join(mav, "state_groundtruth_estimate0")
    os.makedirs(gdir, exist_ok=True)
    with open(os.path.join(gdir, "data.csv"), "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        for k in range(n_frames):
            # identity quaternion is enough for a parse/shape test
            f.write(f"{int(seq.timestamps[k] * 1e9)},"
                    + ",".join(f"{x:.6f}" for x in seq.t_gt[k])
                    + ",1,0,0,0\n")


def test_euroc_convert_and_replay_gate(tmp_path):
    cam = CameraModel(fx=FX, fy=FY, cx=W / 2, cy=H / 2)
    rig = render.StereoRig(cam=cam, H=H, W=W, baseline=0.2)
    scene = render.make_scene(seed=4, n_points=350)
    n_frames = 12
    seq = render.render_sequence(scene, rig, n_frames=n_frames,
                                 rate_hz=10.0, imu_rate_hz=100.0,
                                 speed=0.6, yaw_rate=0.1)
    root = str(tmp_path / "session0")
    _make_euroc_tree(root, seq, n_frames)

    # parse tier: reader sees both cams, intrinsics, baseline, GT
    s = dataset.load_euroc(root)
    assert len(s.cam_files) == n_frames
    assert len(s.cam1_files) == n_frames
    assert s.intrinsics[0] == FX
    assert abs(s.baseline - 0.2) < 1e-6
    assert len(s.gt_ts) == n_frames
    # PGM round-trip is exact
    img = convert_mod.load_image(s.cam_files[0])
    assert img.shape == (H, W)

    # convert tier: obs stream + GT TUM in the replay layout
    out_dir = str(tmp_path / "converted")
    res = convert_mod.convert_sessions([root], out_dir,
                                       log=lambda m: None)
    assert res[0]["n_keyframes"] >= 8
    obs = replay_mod.load_observations(replay_mod.obs_path(out_dir, 0))
    assert obs.descriptors.dtype == np.uint8
    assert obs.valid.any()
    ts, t, q = logs.read_tum(res[0]["gt"])
    assert len(ts) == n_frames

    # acceptance tier: record verification attempts over the converted
    # stream, then the replay gate must accept bit-exactly with no code
    # changes (the done-criterion for the converter)
    from kimera_multi_tpu.frontend.dlc import FrontendConfig

    T = obs.descriptors.shape[0]
    pairs = [(i, j) for i in range(T) for j in range(i + 2, T)][:6]

    def write_sidecar(counts):
        rows = []
        for p_i, (a, b) in enumerate(pairs):
            mono, stereo = counts[p_i] if counts else (0, 0)
            rows.append(dict(robot_a=0, frame_a=a, robot_b=0, frame_b=b,
                             lcd_status="LOOP_DETECTED",
                             mono_inliers=mono, stereo_inliers=stereo,
                             norm_bow_score=0.5))
        logs.write_lcd_attempts_csv(
            os.path.join(str(tmp_path), "robot0", "distributed",
                         "lcd_attempts.csv"), rows)

    write_sidecar(None)
    first = replay_mod.replay_verify(str(tmp_path), out_dir, 1,
                                     FrontendConfig(base_seed=0))
    write_sidecar([(r["mono_replayed"], r["stereo_replayed"])
                   for r in first.rows])
    rep = replay_mod.replay_verify(str(tmp_path), out_dir, 1,
                                   FrontendConfig(base_seed=0),
                                   inlier_tol=0)
    assert rep.n_candidates == len(pairs)
    assert rep.n_mono_exact == rep.n_candidates
    assert rep.n_stereo_exact == rep.n_candidates


def test_euroc_mode_end_to_end(tmp_path):
    """--mode euroc: recorded ASL-layout sessions flow VIO -> distributed
    LCD -> PGO in one command (the kimera_ros real-data path; two
    staggered sessions of the same scene guarantee inter-robot loops)."""
    from kimera_multi_tpu.cli import run as run_mod

    cam = CameraModel(fx=FX, fy=FY, cx=W / 2, cy=H / 2)
    rig = render.StereoRig(cam=cam, H=H, W=W, baseline=0.2)
    scene = render.make_scene(seed=3, n_points=350)
    F, stride = 20, 8
    seq = render.render_sequence(scene, rig, n_frames=F + stride,
                                 rate_hz=10.0, imu_rate_hz=100.0,
                                 speed=0.6, yaw_rate=0.1)
    roots = []
    for r in range(2):
        sl = slice(r * stride, r * stride + F)
        sub = seq._replace(
            left=seq.left[sl], right=seq.right[sl],
            timestamps=seq.timestamps[sl],
            R_gt=seq.R_gt[sl], t_gt=seq.t_gt[sl])
        root = str(tmp_path / f"sess{r}")
        _make_euroc_tree(root, sub, F)
        roots.append(root)

    res = run_mod.main(["--mode", "euroc", "--euroc-roots", *roots,
                        "--log-dir", str(tmp_path / "logs"),
                        "--gnc-rounds", "20"])
    assert res["n_inter_loops"] >= 1
    for r in range(2):
        assert res["ape"][r].rmse_trans < 0.5
        ddir = tmp_path / "logs" / f"robot{r}" / "distributed"
        assert list(ddir.glob("kimera_distributed_poses_tum_*.tum"))
