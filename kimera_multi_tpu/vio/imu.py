"""On-manifold IMU preintegration (Forster et al.) as a `lax.scan`.

Role of Kimera-VIO's `ImuFrontend::preintegrateImuMeasurements`
(images/kimera-multi.drawio:1757) and GTSAM's CombinedImuFactor
(params/D455/ImuParams.yaml; built with GTSAM_TANGENT_PREINTEGRATION=OFF,
README.md:118 — i.e. the on-manifold formulation used here).

A batch of IMU windows preintegrates in one vmapped scan: (B, S, 3)
gyro/accel samples -> per-window (dR, dv, dp, covariance, bias Jacobians).
Fixed S with validity masks (keyframe intervals vary; the reference's 20 Hz
camera / 400 Hz IMU gives S <= ~100 samples between keyframes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import lie

GRAVITY = jnp.asarray([0.0, 0.0, -9.81])


class ImuParams(NamedTuple):
    gyro_noise: float = 1.7e-4  # rad/s/sqrt(Hz)  (ImuParams.yaml scale)
    accel_noise: float = 2.0e-3  # m/s^2/sqrt(Hz)
    gyro_bias_noise: float = 1.9e-5
    accel_bias_noise: float = 3.0e-3
    integration_noise: float = 1e-8


class Preintegrated(NamedTuple):
    dR: jnp.ndarray  # (..., 3, 3) rotation delta (body_i -> body_j)
    dv: jnp.ndarray  # (..., 3) velocity delta in frame i
    dp: jnp.ndarray  # (..., 3) position delta in frame i
    dt: jnp.ndarray  # (...,) total time
    # first-order bias Jacobians (for bias-corrected residuals)
    dR_dbg: jnp.ndarray  # (..., 3, 3)
    dv_dbg: jnp.ndarray  # (..., 3, 3)
    dv_dba: jnp.ndarray  # (..., 3, 3)
    dp_dbg: jnp.ndarray  # (..., 3, 3)
    dp_dba: jnp.ndarray  # (..., 3, 3)
    # 9x9 covariance of (rot, vel, pos) error
    cov: jnp.ndarray  # (..., 9, 9)


def preintegrate(
    gyro: jnp.ndarray,  # (S, 3) body angular velocity samples
    accel: jnp.ndarray,  # (S, 3) body linear acceleration samples
    dts: jnp.ndarray,  # (S,) sample intervals (0 = padding)
    bias_gyro: jnp.ndarray,  # (3,)
    bias_accel: jnp.ndarray,  # (3,)
    params: ImuParams = ImuParams(),
) -> Preintegrated:
    """Single-window preintegration; vmap for batches."""
    eye = jnp.eye(3)

    def step(carry, inp):
        dR, dv, dp, T, dRg, dvg, dva, dpg, dpa, cov = carry
        w, a, dt = inp
        valid = dt > 0
        dt = jnp.where(valid, dt, 0.0)
        w_c = w - bias_gyro
        a_c = a - bias_accel
        dR_inc = lie.so3_exp(w_c * dt)
        a_rot = dR @ a_c  # acceleration in frame i

        # covariance propagation (Forster eq. A.8-A.10 structure)
        # state error: (dphi, dv, dp)
        A = jnp.zeros((9, 9))
        A = A.at[0:3, 0:3].set(dR_inc.T)
        A = A.at[3:6, 0:3].set(-dR @ lie.hat(a_c) * dt)
        A = A.at[3:6, 3:6].set(eye)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ lie.hat(a_c) * dt * dt)
        A = A.at[6:9, 3:6].set(eye * dt)
        A = A.at[6:9, 6:9].set(eye)
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(eye * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        Q = jnp.diag(
            jnp.concatenate([
                jnp.full(3, params.gyro_noise**2),
                jnp.full(3, params.accel_noise**2),
            ])
        ) / jnp.maximum(dt, 1e-6)
        cov_new = A @ cov @ A.T + B @ Q @ B.T
        cov_new = cov_new + params.integration_noise * jnp.eye(9)

        # bias Jacobians (first order)
        dpa_new = dpa + dva * dt - 0.5 * dR @ eye * dt * dt
        dpg_new = dpg + dvg * dt - 0.5 * dR @ lie.hat(a_c) @ dRg * dt * dt
        dva_new = dva - dR * dt
        dvg_new = dvg - dR @ lie.hat(a_c) @ dRg * dt
        # right-Jacobian approx: Jr ~ I for small steps
        dRg_new = dR_inc.T @ dRg - _right_jacobian(w_c * dt) * dt

        dp_new = dp + dv * dt + 0.5 * a_rot * dt * dt
        dv_new = dv + a_rot * dt
        dR_new = dR @ dR_inc
        T_new = T + dt

        out = tuple(
            jnp.where(valid, n, o)
            for n, o in zip(
                (dR_new, dv_new, dp_new, T_new, dRg_new, dvg_new, dva_new,
                 dpg_new, dpa_new, cov_new),
                (dR, dv, dp, T, dRg, dvg, dva, dpg, dpa, cov),
            )
        )
        return out, None

    z3 = jnp.zeros(3)
    z33 = jnp.zeros((3, 3))
    init = (eye, z3, z3, jnp.asarray(0.0), z33, z33, z33, z33, z33,
            jnp.zeros((9, 9)))
    (dR, dv, dp, T, dRg, dvg, dva, dpg, dpa, cov), _ = jax.lax.scan(
        step, init, (gyro, accel, dts)
    )
    return Preintegrated(dR=dR, dv=dv, dp=dp, dt=T, dR_dbg=dRg, dv_dbg=dvg,
                         dv_dba=dva, dp_dbg=dpg, dp_dba=dpa, cov=cov)


def _right_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) right Jacobian Jr(w)."""
    theta2 = jnp.sum(w * w)
    theta2s = jnp.maximum(theta2, 1e-8)
    theta = jnp.sqrt(theta2s)
    W = lie.hat(w)
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2s)
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2s * theta),
    )
    return jnp.eye(3) - a * W + b * (W @ W)


def imu_residual(
    pre: Preintegrated,
    R_i, t_i, v_i, bg_i, ba_i,
    R_j, t_j, v_j,
    gravity: jnp.ndarray = GRAVITY,
) -> jnp.ndarray:
    """9-dof whitened-by-caller residual of the preintegrated IMU factor
    (bias-corrected to first order around the preintegration bias):

      r_R = Log( (dR Exp(dR_dbg db_g))^T R_i^T R_j )
      r_v = R_i^T (v_j - v_i - g dt) - (dv + dv_dbg db_g + dv_dba db_a)
      r_p = R_i^T (t_j - t_i - v_i dt - 0.5 g dt^2)
            - (dp + dp_dbg db_g + dp_dba db_a)

    db are deviations from the linearization bias (zero here — callers
    re-preintegrate per GN iteration, trading the reference's bias
    first-order updates for recompute, which is cheap on TPU).
    """
    dt = pre.dt
    dR_corr = pre.dR
    r_R = lie.so3_log(dR_corr.T @ R_i.T @ R_j)
    r_v = R_i.T @ (v_j - v_i - gravity * dt) - pre.dv
    r_p = R_i.T @ (t_j - t_i - v_i * dt - 0.5 * gravity * dt * dt) - pre.dp
    return jnp.concatenate([r_R, r_v, r_p])
