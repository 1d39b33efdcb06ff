"""The O(T) Kalman-filter x-marginal must equal the dense observed
-moments masked-Gaussian path exactly (f64) for suffix missingness, and
scale to T where the dense (T·l)² covariance cannot go."""

import numpy as np
import jax.numpy as jnp

from multimodal_trajectory_modeling_tpu import ops
from multimodal_trajectory_modeling_tpu.models import em
from multimodal_trajectory_modeling_tpu.ops import kalman

from tests.test_ops_markov import _mixture


def _dense_observed_logliks(x, params_t):
    m, S, A, G, H, L = params_t
    T = x.shape[0]
    vx = em.pack_observed(x)
    patterns, pid = ops.pattern_groups(np.asarray(vx))
    patterns, pid = jnp.asarray(patterns), jnp.asarray(pid)
    rows = []
    for c in range(m.shape[0]):
        mean = ops.observed_mean(T, m[c], A[c], H[c])
        cov = ops.observed_cov(T, S[c], A[c], G[c], H[c], L[c])
        rows.append(
            ops.masked_mvn_logpdf_grouped(
                vx, mean, cov, patterns, pid, method="solve"
            )
        )
    return jnp.stack(rows)


def test_kalman_equals_dense_observed():
    z, x, lens, params_t = _mixture(0, C=3, T=7, n=200, d=2, l=3)
    got = np.asarray(kalman.kalman_observed_logliks(x, lens, *params_t))
    want = np.asarray(_dense_observed_logliks(x, params_t))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_kalman_length_one_and_d_gt_l():
    z, x, lens, params_t = _mixture(1, C=2, T=5, n=64, d=4, l=2)
    lens = lens.at[:6].set(1)
    x = x.at[1:, :6].set(jnp.nan)
    got = np.asarray(kalman.kalman_observed_logliks(x, lens, *params_t))
    want = np.asarray(_dense_observed_logliks(x, params_t))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_kalman_long_T():
    """T=96: exact vs the (288)² dense observed covariance; T=2048 runs
    in O(T) (dense would need a 6144² matrix per cluster)."""
    z, x, lens, params_t = _mixture(2, C=2, T=96, n=24, d=2, l=3, min_len=30)
    got = np.asarray(kalman.kalman_observed_logliks(x, lens, *params_t))
    want = np.asarray(_dense_observed_logliks(x, params_t))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)

    T_big = 2048
    rng = np.random.default_rng(3)
    m, S, A, G, H, L = (np.asarray(p) for p in params_t)
    A = 0.4 * A / np.abs(np.linalg.eigvals(A)).max(axis=-1)[:, None, None]
    xb = jnp.asarray(rng.normal(size=(T_big, 8, 3)))
    lens_b = jnp.full((8,), T_big, jnp.int32)
    ll = kalman.kalman_observed_logliks(
        xb, lens_b, *map(jnp.asarray, (m, S, A, G, H, L))
    )
    assert np.all(np.isfinite(np.asarray(ll)))


def test_em_observed_logliks_kalman_wrapper():
    """The em-level wrapper must match the dense observed_logliks on
    MixtureParams input (f64, suffix missingness)."""
    from multimodal_trajectory_modeling_tpu.models import em

    rng = np.random.default_rng(30)
    z, x, lens, params_t = _mixture(31, C=3, T=6, n=150, d=2, l=3)
    m, S, A, G, H, L = params_t
    pi = jnp.asarray(rng.dirichlet(np.ones(3)))
    params = em.MixtureParams(pi=pi, m=m, S=S, A=A, G=G, H=H, L=L)
    got = np.asarray(em.observed_logliks_kalman(params, x, lens))
    vx = em.pack_observed(x)
    patterns, pid = ops.pattern_groups(np.asarray(vx))
    want = np.asarray(
        em.observed_logliks(
            params, vx, jnp.asarray(patterns), jnp.asarray(pid), T=6
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
