"""rosbag1 ingestion (io/rosbag.py): container round-trip, compressed
chunks, and the full chain bag -> ASL tree -> VIO converter -> replay
observation stream — unblocking the reference's rosbag replay tier
(examples/1014-example.yaml:92-97, mit_rosbag.launch; VERDICT r3
missing 3 / item 6)."""

import bz2
import os
import struct

import numpy as np

from kimera_multi_tpu.io import convert as convert_mod, dataset, render, \
    replay as replay_mod, rosbag
from kimera_multi_tpu.vio.undistort import CameraModel

H, W = 96, 128
FX = FY = 110.0


def test_bag_roundtrip_all_message_types(tmp_path):
    path = str(tmp_path / "t.bag")
    w = rosbag.BagWriter(path)
    img = (np.arange(H * W, dtype=np.float32).reshape(H, W) % 251)
    w.write("/cam0/image_raw", "sensor_msgs/Image", 1_000_000_000,
            rosbag.BagWriter.ser_image(1_000_000_000, img))
    w.write("/imu0", "sensor_msgs/Imu", 1_000_500_000,
            rosbag.BagWriter.ser_imu(1_000_500_000, [0.1, -0.2, 0.3],
                                     [9.0, 0.5, -0.25]))
    w.write("/cam0/camera_info", "sensor_msgs/CameraInfo", 1_000_000_000,
            rosbag.BagWriter.ser_camera_info(
                1_000_000_000, W, H, FX, FY, W / 2, H / 2, baseline=0.2))
    w.write("/odom", "nav_msgs/Odometry", 1_000_000_000,
            rosbag.BagWriter.ser_odometry(
                1_000_000_000, [1.0, 2.0, 3.0], [0.0, 0.0, 0.0, 1.0]))
    w.close()

    topics = rosbag.bag_topics(path)
    assert topics["/cam0/image_raw"] == ("sensor_msgs/Image", 1)
    assert topics["/imu0"] == ("sensor_msgs/Imu", 1)

    conns, msgs = rosbag.read_bag(path)
    by_topic = {conns[m.conn_id].topic: m for m in msgs}
    ts, img2 = rosbag.parse_image(by_topic["/cam0/image_raw"].data)
    assert ts == 1_000_000_000
    np.testing.assert_array_equal(img2, img)
    ts, gyro, accel = rosbag.parse_imu(by_topic["/imu0"].data)
    assert ts == 1_000_500_000
    np.testing.assert_allclose(gyro, [0.1, -0.2, 0.3], atol=1e-7)
    np.testing.assert_allclose(accel, [9.0, 0.5, -0.25], atol=1e-7)
    info = rosbag.parse_camera_info(by_topic["/cam0/camera_info"].data)
    assert info["K"][0, 0] == FX and info["width"] == W
    assert abs(-info["P"][0, 3] / FX - 0.2) < 1e-9
    ts, t, q = rosbag.parse_odometry(by_topic["/odom"].data)
    np.testing.assert_allclose(t, [1.0, 2.0, 3.0])
    np.testing.assert_allclose(q, [0, 0, 0, 1])


def test_bag_bz2_chunk(tmp_path):
    """bz2-compressed chunks decode identically (the stdlib codec path)."""
    plain = str(tmp_path / "plain.bag")
    w = rosbag.BagWriter(plain)
    w.write("/imu0", "sensor_msgs/Imu", 42,
            rosbag.BagWriter.ser_imu(42, [1, 2, 3], [4, 5, 6]))
    chunk_bytes = bytes(w._chunk)
    w.close()

    comp = str(tmp_path / "comp.bag")
    with open(comp, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(rosbag.BagWriter._rec(
            {"op": bytes([rosbag.OP_CHUNK]), "compression": b"bz2",
             "size": struct.pack("<I", len(chunk_bytes))},
            bz2.compress(chunk_bytes)))
    c1, m1 = rosbag.read_bag(plain)
    c2, m2 = rosbag.read_bag(comp)
    assert len(m1) == len(m2) == 1
    assert m1[0].data == m2[0].data


def _render_split(seed=5, F=12):
    cam = CameraModel(fx=FX, fy=FY, cx=W / 2, cy=H / 2)
    rig = render.StereoRig(cam=cam, H=H, W=W, baseline=0.2)
    scene = render.make_scene(seed=seed, n_points=350)
    return render.render_sequence(scene, rig, n_frames=F, rate_hz=10.0,
                                  imu_rate_hz=100.0, speed=0.6,
                                  yaw_rate=0.1)


def _write_fixture_bag(path, seq, n_frames):
    w = rosbag.BagWriter(path)
    # fixed gain onto the 8-bit range (same rationale as the ASL fixture:
    # per-frame normalization would flicker and break KLT)
    for k in range(n_frames):
        ns = int(seq.timestamps[k] * 1e9)
        for topic, frames in (("/cam0/image_raw", seq.left),
                              ("/cam1/image_raw", seq.right)):
            w.write(topic, "sensor_msgs/Image", ns,
                    rosbag.BagWriter.ser_image(
                        ns, np.asarray(frames[k]) * 120.0))
        w.write("/odom", "nav_msgs/Odometry", ns,
                rosbag.BagWriter.ser_odometry(
                    ns, seq.t_gt[k], [0.0, 0.0, 0.0, 1.0]))
    for i in range(len(seq.imu_ts)):
        ns = int(seq.imu_ts[i] * 1e9)
        w.write("/imu0", "sensor_msgs/Imu", ns,
                rosbag.BagWriter.ser_imu(ns, seq.gyro[i], seq.accel[i]))
    ns0 = int(seq.timestamps[0] * 1e9)
    w.write("/cam0/camera_info", "sensor_msgs/CameraInfo", ns0,
            rosbag.BagWriter.ser_camera_info(ns0, W, H, FX, FY, W / 2,
                                             H / 2, baseline=0.0))
    w.write("/cam1/camera_info", "sensor_msgs/CameraInfo", ns0,
            rosbag.BagWriter.ser_camera_info(ns0, W, H, FX, FY, W / 2,
                                             H / 2, baseline=0.2))
    w.close()


def test_bag_to_asl_to_replay_gate(tmp_path):
    """The done-criterion: a .bag flows through the EXISTING converter
    (bag -> ASL tree -> VIO -> obs_robot<k>.npz) and the replay gate
    accepts it unchanged."""
    n_frames = 12
    seq = _render_split(F=n_frames)
    bag = str(tmp_path / "robot0.bag")
    _write_fixture_bag(bag, seq, n_frames)

    # bag -> ASL tree; the EuRoC reader must see the same session shape
    # the ASL fixture produces (cams, intrinsics from CameraInfo,
    # baseline from the projection matrix, GT from Odometry)
    root = rosbag.rosbag_to_asl(bag, str(tmp_path / "asl"))
    s = dataset.load_euroc(root)
    assert len(s.cam_files) == n_frames
    assert len(s.cam1_files) == n_frames
    assert s.intrinsics is not None and s.intrinsics[0] == FX
    assert abs(s.baseline - 0.2) < 1e-6
    assert len(s.gt_ts) == n_frames
    img = convert_mod.load_image(s.cam_files[0])
    assert img.shape == (H, W)

    # the CLI accepts --bag directly (resolve_session_root path)
    out_dir = str(tmp_path / "converted")
    rc = convert_mod.main(["--bag", bag, "--out", out_dir])
    assert rc == 0
    obs = replay_mod.load_observations(replay_mod.obs_path(out_dir, 0))
    assert obs.descriptors.shape[0] >= 8
    assert obs.valid.any()

    # replay-acceptance gate over the bag-derived stream (bit-exact,
    # same discipline as the ASL chain in test_convert.py)
    from kimera_multi_tpu.frontend.dlc import FrontendConfig
    from kimera_multi_tpu.io import logs

    T = obs.descriptors.shape[0]
    pairs = [(i, j) for i in range(T) for j in range(i + 2, T)][:4]

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
