"""Batched SO(3)/SE(3) Lie-group operations.

The base math layer of the framework (role of minkindr/Eigen SE(3) types in
the reference, SURVEY.md L2/`minkindr`; reference decl `kimera_multi.repos:90-97`).

Conventions:
  * Rotations are (..., 3, 3) float matrices; translations (..., 3).
  * Quaternions are (..., 4) in (qx, qy, qz, qw) order — matching the TUM
    trajectory format (`timestamp x y z qx qy qz qw`) and the reference's
    loop_closures.csv column order (SURVEY.md section 5, lc_result.py:121-138).
  * All functions broadcast over leading batch dimensions and are jit/vmap
    safe (no data-dependent Python control flow).

Small-angle branches use Taylor expansions selected with `jnp.where` over a
safe-epsilon mask so gradients stay finite.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _check_last(x: jnp.ndarray, dims: tuple, name: str) -> None:
    """Static shape validation (trace-time; JAX clamps OOB indices silently
    otherwise, turning shape bugs into wrong numbers)."""
    if x.shape[-len(dims):] != dims:
        raise ValueError(f"{name}: expected trailing shape {dims}, got {x.shape}")


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    _check_last(w, (3,), "hat")
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) axis-angle -> (..., 3, 3) rotation."""
    _check_last(w, (3,), "so3_exp")
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]  # (...,1,1)
    # _safe denominators: the UNselected where-branch is still differentiated,
    # and 0/0 there turns into NaN * 0 = NaN in the VJP.
    theta2s = jnp.maximum(theta2, _EPS)  # floor 1e-8: keeps den**2 in the quotient-rule VJP from underflowing f32
    theta = jnp.sqrt(theta2s)
    small = theta2 < _EPS
    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2s)
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Log map: (..., 3, 3) rotation -> (..., 3) axis-angle.

    Robust for angles near 0 and near pi (uses the diagonal-based branch at
    pi, selected branchlessly).
    """
    _check_last(R, (3, 3), "so3_log")
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2)) * 0.5  # = sin(theta) * axis
    # atan2 formulation: well-conditioned at both 0 and pi (arccos is not).
    # eps inside the sqrt keeps the VJP finite at theta = 0 (norm is not
    # differentiable at zero; the NaN would leak through jnp.where).
    sin_t = jnp.sqrt(jnp.sum(w_skew * w_skew, axis=-1) + 1e-24)
    theta = jnp.arctan2(sin_t, cos_t)  # (...,)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3

    # Generic branch: w = theta / (2 sin theta) * vee(R - R^T)
    scale = jnp.where(
        small,
        1.0 + theta * theta / 6.0,  # theta/sin(theta) Taylor
        theta / jnp.where(jnp.abs(sin_t) < _EPS, _EPS, sin_t),
    )
    w_generic = w_skew * scale[..., None]

    # Near-pi branch: recover aa^T from the symmetric part of R.
    # (R + R^T)/2 = cos(t) I + (1 - cos(t)) aa^T exactly, so
    # aa^T = ((R + R^T)/2 - cos I) / (1 - cos) — well-conditioned near pi
    # (1 - cos ~ 2), unlike column-of-(R+I) extraction which carries an
    # O(pi - t) skew contamination.
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    one_minus_c = jnp.maximum(1.0 - cos_t, _EPS)[..., None, None]
    aaT = ((R + jnp.swapaxes(R, -1, -2)) * 0.5 - cos_t[..., None, None] * eye3) / one_minus_c
    diag = jnp.stack([aaT[..., 0, 0], aaT[..., 1, 1], aaT[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.maximum(diag, 1e-12))  # eps: finite VJP off-branch
    # Column k of aa^T is a * a_k; pick the largest-|a_k| column.
    k = jnp.argmax(axis_abs, axis=-1)
    Bk = jnp.take_along_axis(aaT, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    denom = jnp.take_along_axis(axis_abs, k[..., None], axis=-1)
    axis = Bk / jnp.maximum(denom, _EPS)
    norm = jnp.sqrt(jnp.sum(axis * axis, axis=-1, keepdims=True) + 1e-24)
    axis = axis / jnp.maximum(norm, _EPS)
    # Sign of the axis is aligned with w_skew where it is nonzero.
    sign = jnp.where(jnp.sum(axis * w_skew, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    w_pi = axis * sign * theta[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """(qx, qy, qz, qw) -> (..., 3, 3). Normalizes the quaternion first."""
    _check_last(q, (4,), "quat_to_rot")
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1),
            jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1),
            jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (qx, qy, qz, qw), qw >= 0.

    Branchless Shepperd's method: compute all four candidate quaternions and
    select by the largest denominator (numerically stable for all rotations).
    """
    _check_last(R, (3, 3), "rot_to_quat")
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by its own 4*q_k^2 = 1 + 2 m_kk - tr (or 1+tr)
    def _cand(t, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(t, _EPS)) * 2.0  # s = 4 |q_k|
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1)

    qw_c = _cand(1.0 + tr, m21 - m12, m02 - m20, m10 - m01, 1.0 + tr)
    qx_c = _cand(1.0 + m00 - m11 - m22, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12)
    qy_c = _cand(1.0 - m00 + m11 - m22, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20)
    qz_c = _cand(1.0 - m00 - m11 + m22, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    k = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw_c, qx_c, qy_c, qz_c], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, k[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return jnp.where(q[..., 3:4] < 0.0, -q, q)


def se3_compose(R1, t1, R2, t2):
    """(R1,t1) * (R2,t2) = (R1 R2, R1 t2 + t1)."""
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_between(Ra, ta, Rb, tb):
    """Relative transform a^-1 * b (the 'between' of GTSAM BetweenFactor)."""
    Ri, ti = se3_inverse(Ra, ta)
    return se3_compose(Ri, ti, Rb, tb)


def se3_apply(R, t, p):
    """Apply transform to points p (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def so3_project(M: jnp.ndarray) -> jnp.ndarray:
    """Project an arbitrary (..., 3, 3) matrix onto SO(3).

    Uses SVD (supported on TPU via XLA) with determinant correction — the
    standard rounding step of chordal initialization.
    """
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1,
    )
    return (U * D[..., None, :]) @ Vt


def se3_exp(xi: jnp.ndarray):
    """se(3) exp: xi = (..., 6) as (rho, w) translation-first? No:

    Convention: xi[..., :3] = w (rotation), xi[..., 3:] = v (translation),
    matching GTSAM's Pose3::Expmap ordering (rotation first).
    Returns (R, t).
    """
    w = xi[..., :3]
    v = xi[..., 3:]
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta2s = jnp.maximum(theta2, _EPS)  # floor 1e-8: keeps den**2 in the quotient-rule VJP from underflowing f32
    theta = jnp.sqrt(theta2s)
    small = theta2 < _EPS
    W = hat(w)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2s)
    c = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2s * theta)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b * W + c * (W @ W)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of se3_exp: returns (..., 6) = (w, v)."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1, keepdims=True)[..., None]
    theta2s = jnp.maximum(theta2, _EPS)  # floor 1e-8: keeps den**2 in the quotient-rule VJP from underflowing f32
    theta = jnp.sqrt(theta2s)
    small = theta2 < _EPS
    W = hat(w)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin / (2(1-cos))) W^2
    half_t = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_t * jnp.cos(half_t) / jnp.maximum(jnp.sin(half_t), _EPS)) / theta2s,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    Vinv = eye - 0.5 * W + cot_term * (W @ W)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def rotation_geodesic_distance(Ra: jnp.ndarray, Rb: jnp.ndarray) -> jnp.ndarray:
    """Angle (radians) between two rotations."""
    Rrel = jnp.swapaxes(Ra, -1, -2) @ Rb
    trace = Rrel[..., 0, 0] + Rrel[..., 1, 1] + Rrel[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))
