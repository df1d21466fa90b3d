"""VIO: IMU preintegration vs direct integration oracle; windowed smoother
recovery on synthetic visual-inertial data."""

import jax
import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import lie
from kimera_multi_tpu.vio import imu as imu_mod, smoother


def _simulate_imu(T=2.0, hz=200, seed=0):
    """Ground-truth trajectory + perfect IMU samples (body frame)."""
    n = int(T * hz)
    dt = 1.0 / hz
    g = np.asarray(imu_mod.GRAVITY)
    w_body = np.array([0.1, -0.2, 0.4], np.float32)  # constant gyro
    R = [np.eye(3, dtype=np.float32)]
    v = [np.zeros(3, np.float32)]
    p = [np.zeros(3, np.float32)]
    accel_samples = []
    ts = np.arange(n) * dt
    for k in range(n):
        a_world = np.array(
            [0.5 * np.sin(2 * ts[k]), 0.3 * np.cos(ts[k]), 0.1], np.float32)
        # IMU measures specific force in body frame: R^T (a_world - g)
        accel_samples.append(R[-1].T @ (a_world - g))
        Rn = R[-1] @ np.asarray(lie.so3_exp(jnp.asarray(w_body * dt)))
        vn = v[-1] + a_world * dt
        pn = p[-1] + v[-1] * dt + 0.5 * a_world * dt * dt
        R.append(Rn.astype(np.float32))
        v.append(vn.astype(np.float32))
        p.append(pn.astype(np.float32))
    gyro = np.tile(w_body, (n, 1))
    return (np.stack(R), np.stack(v), np.stack(p),
            gyro.astype(np.float32), np.stack(accel_samples),
            np.full(n, dt, np.float32))


def test_preintegration_matches_direct_integration():
    R, v, p, gyro, accel, dts = _simulate_imu()
    pre = imu_mod.preintegrate(
        jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts),
        jnp.zeros(3), jnp.zeros(3))
    n = len(dts)
    T = float(np.sum(dts))
    g = np.asarray(imu_mod.GRAVITY)
    # oracle deltas from GT states
    dR_gt = R[0].T @ R[n]
    dv_gt = R[0].T @ (v[n] - v[0] - g * T)
    dp_gt = R[0].T @ (p[n] - p[0] - v[0] * T - 0.5 * g * T * T)
    assert np.allclose(np.asarray(pre.dR), dR_gt, atol=2e-3)
    assert np.allclose(np.asarray(pre.dv), dv_gt, atol=2e-2)
    assert np.allclose(np.asarray(pre.dp), dp_gt, atol=2e-2)
    # residual at GT states ~ 0
    r = imu_mod.imu_residual(
        pre, jnp.asarray(R[0]), jnp.asarray(p[0]), jnp.asarray(v[0]),
        jnp.zeros(3), jnp.zeros(3), jnp.asarray(R[n]), jnp.asarray(p[n]),
        jnp.asarray(v[n]))
    assert float(jnp.abs(r).max()) < 5e-2
    # padding invariance
    gyro_p = np.concatenate([gyro, np.zeros((13, 3), np.float32)])
    accel_p = np.concatenate([accel, np.zeros((13, 3), np.float32)])
    dts_p = np.concatenate([dts, np.zeros(13, np.float32)])
    pre_p = imu_mod.preintegrate(
        jnp.asarray(gyro_p), jnp.asarray(accel_p), jnp.asarray(dts_p),
        jnp.zeros(3), jnp.zeros(3))
    assert np.allclose(np.asarray(pre_p.dR), np.asarray(pre.dR), atol=1e-6)
    assert np.allclose(np.asarray(pre_p.dp), np.asarray(pre.dp), atol=1e-6)


def _make_window(W=6, hz=100, kf_dt=0.3, seed=0):
    npr = np.random.default_rng(seed)
    T = W * kf_dt
    R, v, p, gyro, accel, dts = _simulate_imu(T=T + 0.1, hz=hz, seed=seed)
    S = int(kf_dt * hz)
    pres = []
    for k in range(W - 1):
        sl = slice(k * S, (k + 1) * S)
        pres.append(imu_mod.preintegrate(
            jnp.asarray(gyro[sl]), jnp.asarray(accel[sl]),
            jnp.asarray(dts[sl]), jnp.zeros(3), jnp.zeros(3)))
    pre = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *pres)
    kf_idx = np.arange(W) * S
    R_kf, t_kf, v_kf = R[kf_idx], p[kf_idx], v[kf_idx]

    # landmarks ahead of the trajectory, observed as bearings
    L = 24
    X = npr.uniform(-3, 3, (L, 3)).astype(np.float32) + np.array([2, 2, 3])
    bear = np.zeros((L, W, 3), np.float32)
    for k in range(W):
        d = np.einsum("ji,lj->li", R_kf[k], X - t_kf[k])
        bear[:, k] = d / np.linalg.norm(d, axis=1, keepdims=True)
    obs_valid = np.ones((L, W), bool)

    win = smoother.VioWindow(
        pre=pre,
        imu_valid=jnp.ones(W - 1, bool),
        bearings=jnp.asarray(bear),
        obs_valid=jnp.asarray(obs_valid),
        odo_R=jnp.broadcast_to(jnp.eye(3), (W - 1, 3, 3)),
        odo_t=jnp.zeros((W - 1, 3)),
        odo_valid=jnp.zeros(W - 1, bool),
        zero_vel=jnp.zeros(W, bool),
        anchor=smoother.VioState(
            R=jnp.asarray(R_kf[:1]), t=jnp.asarray(t_kf[:1]),
            v=jnp.asarray(v_kf[:1]), bg=jnp.zeros((1, 3)),
            ba=jnp.zeros((1, 3))),
    )
    gt = smoother.VioState(
        R=jnp.asarray(R_kf), t=jnp.asarray(t_kf), v=jnp.asarray(v_kf),
        bg=jnp.zeros((W, 3)), ba=jnp.zeros((W, 3)))
    return win, gt


def test_triangulation():
    npr = np.random.default_rng(1)
    X_gt = np.array([1.0, 2.0, 5.0], np.float32)
    W = 5
    t = npr.uniform(-1, 1, (W, 3)).astype(np.float32)
    R = np.stack([np.asarray(lie.so3_exp(jnp.asarray(
        npr.normal(0, 0.2, 3).astype(np.float32)))) for _ in range(W)])
    bear = np.einsum("kji,kj->ki", R, X_gt[None] - t)
    bear /= np.linalg.norm(bear, axis=1, keepdims=True)
    X, ok = smoother.triangulate(jnp.asarray(bear), jnp.asarray(R),
                                 jnp.asarray(t), jnp.ones(W, bool))
    assert bool(ok)
    assert np.allclose(np.asarray(X), X_gt, atol=1e-3)


def test_smoother_recovers_trajectory():
    win, gt = _make_window()
    npr = np.random.default_rng(2)
    W = gt.R.shape[0]
    # perturb all states except the anchored first
    dR = np.stack([np.asarray(lie.so3_exp(jnp.asarray(
        npr.normal(0, 0.03, 3).astype(np.float32)))) for _ in range(W)])
    dR[0] = np.eye(3)
    noisy = smoother.VioState(
        R=jnp.asarray(np.einsum("kij,kjl->kil", dR, np.asarray(gt.R))),
        t=gt.t + jnp.asarray(
            np.concatenate([np.zeros((1, 3)),
                            npr.normal(0, 0.15, (W - 1, 3))]).astype(np.float32)),
        v=gt.v + jnp.asarray(
            npr.normal(0, 0.1, (W, 3)).astype(np.float32)),
        bg=jnp.zeros((W, 3)),
        ba=jnp.zeros((W, 3)),
    )
    solved = smoother.solve_window(noisy, win)
    t_err0 = float(jnp.max(jnp.linalg.norm(noisy.t - gt.t, axis=-1)))
    t_err = float(jnp.max(jnp.linalg.norm(solved.t - gt.t, axis=-1)))
    r_err = float(jnp.max(lie.rotation_geodesic_distance(solved.R, gt.R)))
    assert t_err < 0.25 * t_err0  # large improvement
    assert t_err < 0.05
    assert r_err < 0.02
