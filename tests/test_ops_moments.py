"""Parity tests for joint-moment assembly against a NumPy oracle.

Oracle reproduces the *semantics* of the reference recursions
(marginalizable_state_space_model.py:32-364): Var chain, A-power cross-covs,
block assembly — written independently in NumPy here.
"""

import numpy as np
import jax.numpy as jnp

from multimodal_trajectory_modeling_tpu import ops


def _np_var_chain(T, S, A, G):
    Vs = [np.asarray(S, dtype=float)]
    for _ in range(T - 1):
        Vs.append(G + A.T @ Vs[-1] @ A)
    return Vs


def _np_joint_moments(T, m, S, A, G, H, L):
    d, l = A.shape[0], H.shape[1]
    Vs = _np_var_chain(T, S, A, G)
    mus = [np.asarray(m, dtype=float)]
    for _ in range(T - 1):
        mus.append(mus[-1] @ A)
    mean = np.concatenate([np.concatenate(mus), np.concatenate([mu @ H for mu in mus])])

    CZZ = np.zeros((T * d, T * d))
    for i in range(T):
        for j in range(i, T):
            blk = Vs[i] @ np.linalg.matrix_power(A, j - i)
            CZZ[i * d : (i + 1) * d, j * d : (j + 1) * d] = blk
            CZZ[j * d : (j + 1) * d, i * d : (i + 1) * d] = blk.T
    CZX = np.zeros((T * d, T * l))
    for i in range(T):
        for j in range(T):
            blk = CZZ[i * d : (i + 1) * d, j * d : (j + 1) * d] @ H
            CZX[i * d : (i + 1) * d, j * l : (j + 1) * l] = blk
    CXX = np.zeros((T * l, T * l))
    for i in range(T):
        for j in range(T):
            blk = H.T @ CZZ[i * d : (i + 1) * d, j * d : (j + 1) * d] @ H
            if i == j:
                blk = blk + L
            CXX[i * l : (i + 1) * l, j * l : (j + 1) * l] = blk
    cov = np.block([[CZZ, CZX], [CZX.T, CXX]])
    return mean, cov


def _params(rng, d=3, l=2):
    A = rng.normal(scale=0.5, size=(d, d))
    G = np.eye(d) / 2.0
    H = rng.normal(size=(d, l))
    L = np.eye(l) / 3.0
    m = rng.normal(size=(d,))
    X = rng.normal(size=(d, d))
    S = X @ X.T / d + np.eye(d) / 5.0
    return m, S, A, G, H, L


def test_joint_moments_match_numpy_oracle():
    rng = np.random.default_rng(0)
    m, S, A, G, H, L = _params(rng)
    for T in (1, 2, 5, 10):
        mean_np, cov_np = _np_joint_moments(T, m, S, A, G, H, L)
        mean_j = ops.joint_mean(T, jnp.asarray(m), jnp.asarray(A), jnp.asarray(H))
        cov_j = ops.joint_cov(T, *map(jnp.asarray, (S, A, G, H, L)))
        np.testing.assert_allclose(np.asarray(mean_j), mean_np, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(cov_j), cov_np, rtol=1e-12, atol=1e-12)


def test_joint_cov_is_symmetric_pd():
    rng = np.random.default_rng(1)
    m, S, A, G, H, L = _params(rng, d=5, l=3)
    T = 10
    cov = np.asarray(ops.joint_cov(T, *map(jnp.asarray, (S, A, G, H, L))))
    np.testing.assert_allclose(cov, cov.T, atol=1e-12)
    assert np.all(np.linalg.eigvalsh(cov) > 0)


def test_observed_moments_are_marginal_of_joint():
    rng = np.random.default_rng(2)
    m, S, A, G, H, L = _params(rng)
    T, d, l = 4, 3, 2
    mean, cov = _np_joint_moments(T, m, S, A, G, H, L)
    om = np.asarray(ops.observed_mean(T, jnp.asarray(m), jnp.asarray(A), jnp.asarray(H)))
    oc = np.asarray(ops.observed_cov(T, *map(jnp.asarray, (S, A, G, H, L))))
    np.testing.assert_allclose(om, mean[T * d :], rtol=1e-12)
    np.testing.assert_allclose(oc, cov[T * d :, T * d :], rtol=1e-12, atol=1e-12)


def test_empirical_moments_match_analytic():
    """Monte-carlo consistency: sampled trajectories reproduce mm/CC
    (reference self-test, marginalizable_state_space_model.py:977-991)."""
    import jax

    rng = np.random.default_rng(3)
    m, S, A, G, H, L = _params(rng, d=4, l=2)
    T, n = 6, 200_000
    z, x = ops.sample_trajectories(
        jax.random.PRNGKey(0), n, T, *map(jnp.asarray, (m, S, A, G, H, L))
    )
    v = np.concatenate(
        [
            np.asarray(z).transpose(1, 0, 2).reshape(n, -1),
            np.asarray(x).transpose(1, 0, 2).reshape(n, -1),
        ],
        axis=1,
    )
    mean = np.asarray(ops.joint_mean(T, jnp.asarray(m), jnp.asarray(A), jnp.asarray(H)))
    cov = np.asarray(ops.joint_cov(T, *map(jnp.asarray, (S, A, G, H, L))))
    np.testing.assert_allclose(v.mean(axis=0), mean, rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.cov(v, rowvar=False), cov, rtol=0.08, atol=0.08)
