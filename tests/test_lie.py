"""Unit tests for core.lie vs NumPy/closed-form oracles (SURVEY.md section 4
tier (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kimera_multi_tpu.core import lie


def random_rotations(seed, n):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3))
    return np.asarray(lie.so3_exp(jnp.asarray(w, jnp.float32)))


def test_hat_vee_roundtrip():
    w = jnp.asarray(np.random.default_rng(0).normal(size=(17, 3)), jnp.float32)
    assert np.allclose(lie.vee(lie.hat(w)), w)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    # Include tiny, moderate, and near-pi angles
    axes = rng.normal(size=(64, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = np.concatenate(
        [
            rng.uniform(1e-6, 1e-4, 16),
            rng.uniform(0.1, 3.0, 32),
            rng.uniform(np.pi - 1e-3, np.pi - 1e-5, 16),
        ]
    )
    w = jnp.asarray(axes * angles[:, None], jnp.float32)
    R = lie.so3_exp(w)
    w2 = lie.so3_log(R)
    R2 = lie.so3_exp(w2)
    # Compare rotations (axis-angle may flip sign at pi)
    assert np.allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_so3_exp_is_rotation():
    w = jnp.asarray(np.random.default_rng(2).normal(size=(32, 3)) * 2, jnp.float32)
    R = lie.so3_exp(w)
    eye = jnp.broadcast_to(jnp.eye(3), R.shape)
    assert np.allclose(jnp.swapaxes(R, -1, -2) @ R, eye, atol=1e-5)
    assert np.allclose(jnp.linalg.det(R), 1.0, atol=1e-5)


def test_quat_roundtrip():
    R = jnp.asarray(random_rotations(3, 50), jnp.float32)
    q = lie.rot_to_quat(R)
    R2 = lie.quat_to_rot(q)
    assert np.allclose(R, R2, atol=1e-5)
    # qw >= 0 convention
    assert jnp.all(q[..., 3] >= 0)


def test_quat_matches_scipy_convention():
    # Oracle: rotation about z by 90deg -> q = (0, 0, sin(45), cos(45))
    Rz = jnp.asarray(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32
    )
    q = lie.rot_to_quat(Rz)
    s = np.sin(np.pi / 4)
    assert np.allclose(np.asarray(q), [0, 0, s, s], atol=1e-6)


def test_se3_compose_inverse():
    rng = np.random.default_rng(4)
    R1 = jnp.asarray(random_rotations(5, 8), jnp.float32)
    t1 = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    Ri, ti = lie.se3_inverse(R1, t1)
    Rc, tc = lie.se3_compose(R1, t1, Ri, ti)
    assert np.allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
    assert np.allclose(tc, 0.0, atol=1e-5)


def test_se3_between_oracle():
    R1 = jnp.asarray(random_rotations(6, 4), jnp.float32)
    R2 = jnp.asarray(random_rotations(7, 4), jnp.float32)
    rng = np.random.default_rng(8)
    t1 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    t2 = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    Rb, tb = lie.se3_between(R1, t1, R2, t2)
    # a * between = b
    Rc, tc = lie.se3_compose(R1, t1, Rb, tb)
    assert np.allclose(Rc, R2, atol=1e-5)
    assert np.allclose(tc, t2, atol=1e-5)


def test_se3_exp_log_roundtrip():
    # Angles may exceed pi, where log returns the principal value — so
    # compare after re-exponentiation, not in tangent space.
    xi = jnp.asarray(np.random.default_rng(9).normal(size=(32, 6)), jnp.float32)
    R, t = lie.se3_exp(xi)
    xi2 = lie.se3_log(R, t)
    R2, t2 = lie.se3_exp(xi2)
    assert np.allclose(R, R2, atol=1e-4)
    assert np.allclose(t, t2, atol=1e-4)
    # And principal-range tangents do roundtrip exactly
    xi_small = xi * 0.4
    Rs, ts = lie.se3_exp(xi_small)
    assert np.allclose(lie.se3_log(Rs, ts), xi_small, atol=1e-4)


def test_so3_project():
    rng = np.random.default_rng(10)
    R = jnp.asarray(random_rotations(11, 16), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(16, 3, 3)) * 0.05, jnp.float32)
    Rp = lie.so3_project(R + noise)
    eye = jnp.broadcast_to(jnp.eye(3), Rp.shape)
    assert np.allclose(jnp.swapaxes(Rp, -1, -2) @ Rp, eye, atol=1e-5)
    assert np.allclose(jnp.linalg.det(Rp), 1.0, atol=1e-5)
    # Should be close to the original rotation
    assert float(jnp.max(lie.rotation_geodesic_distance(R, Rp))) < 0.2


def test_jit_compatible():
    f = jax.jit(lambda w: lie.so3_log(lie.so3_exp(w)))
    w = jnp.asarray([[0.1, -0.2, 0.3]], jnp.float32)
    assert np.allclose(f(w), w, atol=1e-5)
