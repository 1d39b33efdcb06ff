"""Parity tests at the function-level L0 API (the reference's module-level
surface and its __main__ self-test battery,
marginalizable_state_space_model.py:947-1187)."""

import numpy as np
import pytest
import scipy.stats as sp_stats

from framework import marginalizable_state_space_model as ss  # compat path


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(42)
    d, l = 5, 3
    return dict(
        A=rng.normal(scale=0.5, size=(d, d)),
        G=np.eye(d) / 2.0,
        H=rng.normal(size=(d, l)),
        L=np.eye(l) / 3.0,
        m=rng.normal(size=d),
        S=np.eye(d) / 5.0,
        d=d,
        l=l,
    )


@pytest.fixture(scope="module")
def sample(model):
    T, n = 10, 100_000
    z, x = ss.sample_trajectory(
        n,
        T,
        model["m"],
        model["S"],
        model["A"],
        model["G"],
        model["H"],
        model["L"],
        rng=np.random.default_rng(42),
    )
    return z, x, T


def test_cc_valid_covariance(model, sample):
    *_, T = sample
    CC = ss.CC(T, model["S"], model["A"], model["G"], model["H"], model["L"])
    assert np.all(np.linalg.eigvalsh(CC) > 0)
    np.testing.assert_allclose(CC, CC.T, atol=1e-12)


def test_empirical_vs_analytic_moments(model, sample):
    z, x, T = sample
    emp_mean = np.hstack((*z.mean(axis=1), *x.mean(axis=1)))
    np.testing.assert_allclose(
        emp_mean,
        ss.mm(T, model["m"], model["A"], model["H"]),
        rtol=0.05,
        atol=0.05,
    )
    emp_cov = np.cov(np.hstack((*z, *x)), rowvar=False)
    np.testing.assert_allclose(
        emp_cov,
        ss.CC(T, model["S"], model["A"], model["G"], model["H"], model["L"]),
        rtol=0.1,
        atol=0.1,
    )


def test_analytic_equals_composite(model, sample):
    z, x, T = sample
    z, x = z[:, :500], x[:, :500]
    a = ss.full_log_prob(
        z, x, T, model["m"], model["S"], model["A"], model["G"], model["H"],
        model["L"],
    )
    b = ss.composite_log_prob(
        z, x, T, model["m"], model["S"], model["A"], model["G"], model["H"],
        model["L"],
    )
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-6)
    ah = ss.hidden_log_prob(
        z, T, model["m"], model["S"], model["A"], model["G"]
    )
    bh = ss.composite_hidden_log_prob(
        z, T, model["m"], model["S"], model["A"], model["G"]
    )
    np.testing.assert_allclose(ah, bh, rtol=1e-8, atol=1e-6)


def test_marginalizable_equals_full_on_complete(model, sample):
    z, x, T = sample
    z, x = z[:, :100], x[:, :100]
    a = ss.full_log_prob(
        z, x, T, model["m"], model["S"], model["A"], model["G"], model["H"],
        model["L"],
    )
    b = ss.full_marginalizable_log_prob(
        z, x, T, model["m"], model["S"], model["A"], model["G"], model["H"],
        model["L"],
    )
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-6)


def test_marginalizable_finite_with_nans(model, sample):
    z, x, T = sample
    z, x = z[:, :1].copy(), x[:, :1].copy()
    z[1, 0, :] = z[3, 0, :] = z[5, 0, :] = np.nan
    x[2, 0, :] = x[4, 0, :] = x[6, 0, :] = np.nan
    out = ss.full_marginalizable_log_prob(
        z, x, T, model["m"], model["S"], model["A"], model["G"], model["H"],
        model["L"],
    )
    assert np.isfinite(out.ravel()[0])


def test_hot_kernel_against_scipy(model, sample):
    z, _, _ = sample
    p = ss.multivariate_normal_log_likelihood(
        z[0, :500, :], model["m"], model["S"], np.zeros(500)
    )
    want = sp_stats.multivariate_normal(
        mean=model["m"], cov=model["S"]
    ).logpdf(z[0, :500, :])
    np.testing.assert_allclose(p, want, rtol=1e-8, atol=1e-8)


def test_hot_kernel_marginalization_consistency():
    rng = np.random.default_rng(0)
    Xi = np.diag([1.0, 2.0, 3.0])
    zeta = rng.multivariate_normal(np.zeros(3), Xi, size=4)
    zeta[0, 1] = zeta[1, 2] = zeta[3, 2] = np.nan
    p = ss.multivariate_normal_log_likelihood(
        zeta, np.zeros(3), Xi, np.zeros(4)
    )
    want0 = sp_stats.multivariate_normal(
        mean=np.zeros(2), cov=np.diag([1.0, 3.0])
    ).logpdf(zeta[0][np.isfinite(zeta[0])])
    np.testing.assert_allclose(p[0], want0, rtol=1e-10)


def test_nan_column_invariance():
    rng = np.random.default_rng(1)
    w2 = rng.normal(size=(10, 2))
    w3 = np.column_stack((w2, np.full(10, np.nan)))
    w4 = np.column_stack((w3, np.full(10, np.nan)))
    np.testing.assert_allclose(
        ss.marginalizable_gaussian_log_prob(w2),
        ss.marginalizable_gaussian_log_prob(w3),
    )
    np.testing.assert_allclose(
        ss.marginalizable_gaussian_log_prob(w3),
        ss.marginalizable_gaussian_log_prob(w4),
    )
    np.testing.assert_allclose(
        ss.multivariate_normal_log_likelihood(
            w4, np.zeros(4), np.eye(4), np.zeros(10)
        ),
        ss.marginalizable_gaussian_log_prob(w4),
    )


def test_nonlinear_sampler_equals_linear_on_linear_model(model):
    T, n = 6, 500
    rng1 = np.random.default_rng(7)
    z, x = ss.sample_trajectory(
        n, T, model["m"], model["S"], model["A"], model["G"], model["H"],
        model["L"], rng=rng1,
    )
    rng2 = np.random.default_rng(7)
    z0, x0 = ss.sample_nonlinear_nongaussian_trajectory(
        n,
        model["d"],
        model["l"],
        T,
        lambda size, rng: rng.multivariate_normal(
            model["m"], model["S"], size=size
        ),
        lambda zz: zz @ model["A"],
        lambda size, rng: rng.multivariate_normal(
            np.zeros(model["d"]), model["G"], size=size
        ),
        lambda zz: zz @ model["H"],
        lambda size, rng: rng.multivariate_normal(
            np.zeros(model["l"]), model["L"], size=size
        ),
        rng=rng2,
    )
    np.testing.assert_allclose(z, z0, atol=1e-10)
    np.testing.assert_allclose(x, x0, atol=1e-10)


def test_scalar_1d_shapes(model, sample):
    z, x, T = sample
    z1, x1 = z[..., 0][:, :200], x[..., 0][:, :200]
    a = ss.full_log_prob(
        z1, x1, T, model["m"][0], model["S"][0, 0], model["A"][0, 0],
        model["G"][0, 0], model["H"][0, 0], model["L"][0, 0],
    )
    b = ss.composite_log_prob(
        z1, x1, T, model["m"][0], model["S"][0, 0], model["A"][0, 0],
        model["G"][0, 0], model["H"][0, 0], model["L"][0, 0],
    )
    np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-6)


def test_kde_cross_check(model, sample):
    """Log-density ranking agrees with a nonparametric KDE estimate
    (reference self-test, statespace:1060-1109, R² > 0.99 there with
    statsmodels; scipy's gaussian_kde on the stacked vector here)."""
    z, x, T = sample
    v = np.hstack((*z[:, :3000], *x[:, :3000]))
    # fit KDE on a subsample of the stacked joint vectors
    kde = sp_stats.gaussian_kde(v[:1500].T)
    lp_kde = np.log(kde(v[1500:2500].T) + 1e-300)
    lp_true = ss.full_log_prob(
        z[:, 1500:2500], x[:, 1500:2500], T, model["m"], model["S"],
        model["A"], model["G"], model["H"], model["L"],
    )
    keep = np.isfinite(lp_kde)
    r = np.corrcoef(lp_kde[keep], lp_true[keep])[0, 1]
    assert r > 0.7  # D=80 KDE is coarse; ranking must still agree strongly
