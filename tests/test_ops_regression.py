"""Parity tests for the masked batched regression vs NumPy/sklearn oracles."""

import numpy as np
import jax.numpy as jnp
import sklearn.linear_model as skl_lm

from multimodal_trajectory_modeling_tpu import ops


def _data(rng, N=400, p=3, q=2, nan_frac=0.1):
    X = rng.normal(size=(N, p))
    A = rng.normal(size=(p, q))
    Y = X @ A + 0.1 * rng.normal(size=(N, q))
    X[rng.random(size=X.shape) < nan_frac] = np.nan
    Y[rng.random(size=Y.shape) < nan_frac] = np.nan
    return X, Y


def _np_drop(X, Y):
    idx = np.isfinite(np.column_stack([X, Y])).all(axis=1)
    return X[idx], Y[idx]


def test_lstsq_mode_matches_numpy_lstsq():
    rng = np.random.default_rng(0)
    X, Y = _data(rng)
    Xf, Yf = _np_drop(X, Y)
    A_np = np.linalg.lstsq(Xf, Yf, rcond=-1)[0]
    S_np = np.cov(Yf - Xf @ A_np, rowvar=False)
    A, S = ops.regress(jnp.asarray(X), jnp.asarray(Y), mode="lstsq")
    np.testing.assert_allclose(np.asarray(A), A_np, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(S), S_np, rtol=1e-9, atol=1e-9)


def test_lstsq_mode_matches_min_norm_on_rank_deficient():
    rng = np.random.default_rng(5)
    X = rng.normal(size=(50, 3))
    X[:, 2] = X[:, 0] + X[:, 1]  # rank 2
    Y = rng.normal(size=(50, 2))
    A_np = np.linalg.lstsq(X, Y, rcond=None)[0]
    A, _ = ops.regress(jnp.asarray(X), jnp.asarray(Y), mode="lstsq")
    np.testing.assert_allclose(np.asarray(A), A_np, rtol=1e-8, atol=1e-8)


def test_eps_mode_matches_util_regress():
    """util.regress solves (X^T X + 1e-6 I) A = X^T Y
    (util_state_space.py:33-61)."""
    rng = np.random.default_rng(1)
    X, Y = _data(rng)
    Xf, Yf = _np_drop(X, Y)
    A_np = np.linalg.lstsq(
        Xf.T @ Xf + 1e-6 * np.eye(Xf.shape[1]), Xf.T @ Yf, rcond=-1
    )[0]
    S_np = np.cov(Yf - Xf @ A_np, rowvar=False)
    A, S = ops.regress(jnp.asarray(X), jnp.asarray(Y), mode="eps")
    np.testing.assert_allclose(np.asarray(A), A_np, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(S), S_np, rtol=1e-9, atol=1e-9)


def test_ridge_mode_matches_sklearn():
    rng = np.random.default_rng(2)
    X, Y = _data(rng)
    Xf, Yf = _np_drop(X, Y)
    alpha = 1.0
    A_skl = (
        skl_lm.Ridge(alpha=alpha, fit_intercept=False).fit(Xf, Yf).coef_.T
    )
    A, _ = ops.regress(jnp.asarray(X), jnp.asarray(Y), mode="ridge", alpha=alpha)
    np.testing.assert_allclose(np.asarray(A), A_skl, rtol=1e-7, atol=1e-8)


def test_weighted_stats_per_cluster_match_loop():
    rng = np.random.default_rng(3)
    X, Y = _data(rng, N=600)
    assign = rng.integers(0, 3, size=600)
    W = jnp.asarray(np.eye(3)[assign])
    stats = ops.weighted_regression_stats(jnp.asarray(X), jnp.asarray(Y), W)
    A, S = ops.solve_regression(stats, mode="lstsq")
    for c in range(3):
        Xc, Yc = _np_drop(X[assign == c], Y[assign == c])
        A_np = np.linalg.lstsq(Xc, Yc, rcond=-1)[0]
        S_np = np.cov(Yc - Xc @ A_np, rowvar=False)
        np.testing.assert_allclose(np.asarray(A[c]), A_np, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(S[c]), S_np, rtol=1e-8, atol=1e-8)


def test_masked_mean_and_cov_matches_numpy():
    rng = np.random.default_rng(4)
    Z = rng.normal(size=(300, 4))
    Z[rng.random(size=Z.shape) < 0.15] = np.nan
    assign = rng.integers(0, 2, size=300)
    W = jnp.asarray(np.eye(2)[assign])
    mean, cov = ops.masked_mean_and_cov(jnp.asarray(Z), W)
    for c in range(2):
        Zc = Z[assign == c]
        Zc = Zc[np.isfinite(Zc).all(axis=1)]
        np.testing.assert_allclose(np.asarray(mean[c]), Zc.mean(axis=0), rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(cov[c]), np.cov(Zc, rowvar=False), rtol=1e-9, atol=1e-10
        )


def test_gram_stats_match_timebatched():
    """impl="gram" (single fused Gram einsum) must reproduce the six-einsum
    time-batched statistics exactly in f64, NaNs included."""
    from multimodal_trajectory_modeling_tpu.ops import regression as rops

    rng = np.random.default_rng(5)
    Tp, n, p, q, C = 4, 200, 3, 2, 3
    X = rng.normal(size=(Tp, n, p))
    Y = rng.normal(size=(Tp, n, q))
    X[rng.random(size=X.shape) < 0.1] = np.nan
    Y[rng.random(size=Y.shape) < 0.1] = np.nan
    assign = rng.integers(0, C, size=n)
    W = jnp.asarray(np.eye(C)[assign])
    a = rops.weighted_regression_stats_timebatched(
        jnp.asarray(X), jnp.asarray(Y), W
    )
    b = rops.weighted_regression_stats_gram(jnp.asarray(X), jnp.asarray(Y), W)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=1e-12, atol=1e-12
        )


def test_mstep_gram_impl_matches_xla():
    from multimodal_trajectory_modeling_tpu.models import em

    rng = np.random.default_rng(6)
    T, n, d, l, C = 5, 150, 3, 2, 2
    z = rng.normal(size=(T, n, d))
    x = rng.normal(size=(T, n, l))
    lens = rng.choice([3, 5], size=n)
    tmask = np.arange(T)[:, None] < lens[None, :]
    z[~tmask] = np.nan
    x[~tmask] = np.nan
    assign = jnp.asarray(rng.integers(0, C, size=n), jnp.int32)
    pa = em.mstep(jnp.asarray(z), jnp.asarray(x), assign, n_clusters=C)
    pb = em.mstep(
        jnp.asarray(z), jnp.asarray(x), assign, n_clusters=C, impl="gram"
    )
    for fa, fb in zip(pa, pb):
        np.testing.assert_allclose(
            np.asarray(fa), np.asarray(fb), rtol=1e-10, atol=1e-12
        )


def test_chol_mode_matches_eps():
    """mode="chol" solves the same eps-ridged normal equations as
    mode="eps" (fast Cholesky instead of eigh-pinv)."""
    rng = np.random.default_rng(7)
    X, Y = _data(rng, N=400)
    W = jnp.ones((400, 1))
    stats = ops.weighted_regression_stats(jnp.asarray(X), jnp.asarray(Y), W)
    A1, S1 = ops.solve_regression(stats, mode="eps")
    A2, S2 = ops.solve_regression(stats, mode="chol")
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), rtol=1e-9, atol=1e-10)
