"""Native C++ serialization + replayer (builds via cmake in-test)."""

import numpy as np
import pytest

from kimera_multi_tpu.io import native, synthetic

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def test_edge_serialization_roundtrip():
    g = synthetic.multi_robot_graph(seed=0, n_robots=2, n_poses=16)
    buf = native.Buffer()
    buf.write_edges(g.edges)
    data = buf.tobytes()
    assert len(data) > 0
    buf2 = native.Buffer()
    buf2.load(data)
    edges2 = buf2.read_edges(g.edges.capacity + 10)
    assert edges2.capacity == g.edges.capacity
    np.testing.assert_array_equal(np.asarray(edges2.src_pose),
                                  np.asarray(g.edges.src_pose))
    np.testing.assert_array_equal(np.asarray(edges2.etype),
                                  np.asarray(g.edges.etype))
    np.testing.assert_allclose(np.asarray(edges2.R), np.asarray(g.edges.R),
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(edges2.t), np.asarray(g.edges.t),
                               rtol=0, atol=0)


def test_vlc_roundtrip_and_replayer(tmp_path):
    npr = np.random.default_rng(0)
    K = 64
    buf = native.Buffer()
    frames = []
    for i in range(5):
        desc = npr.integers(0, 256, (K, 32), dtype=np.uint8)
        be = npr.normal(size=(K, 3)).astype(np.float32)
        lm = npr.normal(size=(K, 3)).astype(np.float32)
        va = npr.uniform(size=K) > 0.2
        frames.append((desc, be, lm, va))
        buf.write_vlc(1, i, desc, be, lm, va)
    path = str(tmp_path / "vlc.kmt")
    buf.write_file(path)

    # stream it back through the background-thread replayer
    got = 0
    for ptype, pbuf in native.Replayer(path, queue_capacity=2):
        assert ptype == 2
        rec = pbuf.read_vlc(K)
        assert rec is not None
        desc, be, lm, va = frames[rec["frame"]]
        assert rec["robot"] == 1
        np.testing.assert_array_equal(rec["descriptors"], desc)
        np.testing.assert_allclose(rec["bearings"], be)
        np.testing.assert_array_equal(rec["valid"], va)
        got += 1
    assert got == 5
