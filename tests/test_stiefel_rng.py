import jax
import jax.numpy as jnp
import numpy as np

from kimera_multi_tpu.core import lie, rng, stiefel


def test_stiefel_project_orthonormal():
    g = jax.random.normal(jax.random.key(0), (10, 5, 3))
    Y = stiefel.stiefel_project(g)
    eye = jnp.broadcast_to(jnp.eye(3), (10, 3, 3))
    assert np.allclose(jnp.swapaxes(Y, -1, -2) @ Y, eye, atol=1e-5)


def test_tangent_projection_is_tangent():
    g = jax.random.normal(jax.random.key(1), (4, 5, 3))
    Y = stiefel.stiefel_project(g)
    V = jax.random.normal(jax.random.key(2), (4, 5, 3))
    T = stiefel.stiefel_tangent_project(Y, V)
    # Y^T T + T^T Y = 0
    S = jnp.swapaxes(Y, -1, -2) @ T
    assert np.allclose(S + jnp.swapaxes(S, -1, -2), 0.0, atol=1e-5)
    # Idempotent
    T2 = stiefel.stiefel_tangent_project(Y, T)
    assert np.allclose(T, T2, atol=1e-5)


def test_lift_round_trip():
    key = jax.random.key(3)
    r, d, n = 5, 3, 12
    ylift = stiefel.random_lifting_matrix(key, r, d)
    assert np.allclose(ylift.T @ ylift, jnp.eye(d), atol=1e-5)
    w = jax.random.normal(jax.random.key(4), (n, 3)) * 0.5
    R = lie.so3_exp(w)
    t = jax.random.normal(jax.random.key(5), (n, 3))
    Y = stiefel.lift_poses(R, t, ylift)
    assert Y.shape == (n, r, d + 1)
    R2, t2 = stiefel.round_solution(Y, d)
    # Rounding recovers poses up to a global O(d) gauge; fix gauge via first pose
    Rg = R2[0] @ R[0].T
    R2_fixed = jnp.einsum("de,nef->ndf", Rg.T, R2)
    t2_fixed = jnp.einsum("de,ne->nd", Rg.T, t2)
    assert np.allclose(R2_fixed, R, atol=1e-4)
    assert np.allclose(t2_fixed, t, atol=1e-4)


def test_minimal_sample_indices_deterministic_distinct():
    key = rng.derive(rng.base_key(7), 2, 31, rng.Stream.RANSAC_MONO)
    idx1 = rng.minimal_sample_indices(key, 200, 500, 5)
    idx2 = rng.minimal_sample_indices(key, 200, 500, 5)
    assert idx1.shape == (500, 5)
    assert np.array_equal(idx1, idx2)
    # Distinct within each hypothesis
    srt = jnp.sort(idx1, axis=1)
    assert bool(jnp.all(srt[:, 1:] != srt[:, :-1]))
    assert int(idx1.min()) >= 0 and int(idx1.max()) < 200
    # Different structural address -> different table
    key2 = rng.derive(rng.base_key(7), 2, 32, rng.Stream.RANSAC_MONO)
    idx3 = rng.minimal_sample_indices(key2, 200, 500, 5)
    assert not np.array_equal(idx1, idx3)
