"""eval.ape + io.logs round-trips (the acceptance-metric plumbing)."""

import numpy as np
import jax.numpy as jnp

from kimera_multi_tpu.core import lie
from kimera_multi_tpu.eval import ape as ape_mod
from kimera_multi_tpu.io import logs


def _traj(n, seed=0, offset=0.0):
    npr = np.random.default_rng(seed)
    ts = np.arange(n) * 0.05 + offset
    t = np.cumsum(npr.normal(0, 0.1, (n, 3)), axis=0).astype(np.float32)
    w = npr.normal(0, 0.2, (n, 3)).astype(np.float32)
    R = np.asarray(lie.so3_exp(jnp.asarray(w)))
    q = np.asarray(lie.rot_to_quat(jnp.asarray(R)))
    return ts, t, R, q


def test_tum_roundtrip(tmp_path):
    ts, t, R, q = _traj(40, seed=1)
    p = str(tmp_path / "traj_pgo.tum")
    logs.write_tum(p, ts, t, q)
    ts2, t2, q2 = logs.read_tum(p)
    assert np.allclose(ts, ts2)
    assert np.allclose(t, t2, atol=1e-8)
    assert np.allclose(q, q2, atol=1e-8)


def test_ape_identity():
    ts, t, R, q = _traj(50, seed=2)
    res = ape_mod.ape(jnp.asarray(t), jnp.asarray(R), jnp.asarray(t),
                      jnp.asarray(R), align=True)
    assert res.rmse_trans < 1e-5
    assert res.rmse_full < 1e-4


def test_ape_detects_transformed_copy():
    """A rigidly-transformed copy must align to ~zero APE; a corrupted one
    must not."""
    ts, t, R, q = _traj(60, seed=3)
    Rg = np.asarray(lie.so3_exp(jnp.asarray([0.2, -0.1, 0.9], jnp.float32)))
    tg = np.array([5.0, -2.0, 1.0], np.float32)
    t2 = t @ Rg.T + tg
    R2 = np.einsum("ij,kjl->kil", Rg, R)
    res = ape_mod.ape(jnp.asarray(t2), jnp.asarray(R2), jnp.asarray(t),
                      jnp.asarray(R), align=True)
    assert res.rmse_trans < 1e-4
    t3 = t2.copy()
    t3[10:20] += 3.0
    res_bad = ape_mod.ape(jnp.asarray(t3), jnp.asarray(R2), jnp.asarray(t),
                          jnp.asarray(R), align=True)
    assert res_bad.rmse_trans > 0.5


def test_associate_max_diff():
    ts_ref = np.arange(100) * 0.05
    ts_est = ts_ref[::2] + 0.004  # within 0.01
    ie, ir = ape_mod.associate(ts_est, ts_ref, max_diff=0.01)
    assert len(ie) == 50
    assert np.array_equal(ir, np.arange(0, 100, 2))
    ts_far = ts_ref[::2] + 0.02  # outside window
    ie2, _ = ape_mod.associate(ts_far, ts_ref, max_diff=0.01)
    assert len(ie2) == 0


def test_ape_from_tum_pipeline(tmp_path):
    ts, t, R, q = _traj(80, seed=4)
    ref = str(tmp_path / "gt.tum")
    est = str(tmp_path / "est.tum")
    logs.write_tum(ref, ts, t, q)
    # estimate: offset timestamps slightly + rigid transform
    Rg = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.0, 0.5], jnp.float32)))
    logs.write_tum(est, ts + 0.003, t @ Rg.T, np.asarray(
        lie.rot_to_quat(jnp.asarray(np.einsum("ij,kjl->kil", Rg, R)))))
    res = ape_mod.ape_from_tum(est, ref)
    assert res.n_matched == 80
    assert res.rmse_trans < 1e-4


def test_csv_schemas(tmp_path):
    p = str(tmp_path / "loop_closures.csv")
    rows = [dict(robot1=0, pose1=5, robot2=1, pose2=9, qx=0.0, qy=0.0, qz=0.0,
                 qw=1.0, tx=1.5, ty=0.0, tz=-0.25, norm_bow_score=0.31,
                 mono_inliers=22, stereo_inliers=11, stamp_ns=123456789)]
    logs.write_loop_closures_csv(p, rows)
    txt = open(p).read().splitlines()
    assert txt[0] == logs.LOOP_CLOSURES_HEADER
    cols = logs.read_csv(p)
    assert cols["mono_inliers"][0] == 22
    assert abs(cols["norm_bow_score"][0] - 0.31) < 1e-9
