"""World-frame correction: odometry frame -> optimized (dpgo) frame.

Role of kimera_distributed's `tfTimerCallback` family
(`publishOdomToWorld / publishLatestKFToOdom / publishWorldToDpgoCorrection`
updating `T_world_dpgo_`, images/kimera-multi.drawio:596-620): each robot
continuously maintains the transform that carries its live odometry
estimate into the globally-optimized frame, so downstream consumers (mesh
deformation, navigation) can correct poses between back-end rounds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import lie


class WorldCorrection(NamedTuple):
    R: jnp.ndarray  # (3, 3) T_world_odom rotation
    t: jnp.ndarray  # (3,)


def world_to_odom_correction(
    R_odom_kf: jnp.ndarray,  # latest keyframe pose in the ODOMETRY frame
    t_odom_kf: jnp.ndarray,
    R_world_kf: jnp.ndarray,  # same keyframe, optimized WORLD frame
    t_world_kf: jnp.ndarray,
) -> WorldCorrection:
    """T_world_odom = T_world_kf * T_odom_kf^{-1}."""
    Ri, ti = lie.se3_inverse(R_odom_kf, t_odom_kf)
    R, t = lie.se3_compose(R_world_kf, t_world_kf, Ri, ti)
    return WorldCorrection(R=R, t=t)


def apply_correction(corr: WorldCorrection, R_odom, t_odom):
    """Carry odometry-frame poses (..., 3, 3)/(..., 3) into the world."""
    n = R_odom.shape[:-2]
    R = jnp.broadcast_to(corr.R, n + (3, 3))
    t = jnp.broadcast_to(corr.t, n + (3,))
    return lie.se3_compose(R, t, R_odom, t_odom)
