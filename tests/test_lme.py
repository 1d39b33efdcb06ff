"""Tests for the random-intercept LME module (statsmodels/lme4 stand-in)."""

import numpy as np
import pandas as pd

from multimodal_trajectory_modeling_tpu.utils.lme import build_design, mixedlm


def _sim_lme(n_groups=120, per_group=5, tau=0.8, sigma=0.5, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for gi in range(n_groups):
        b = rng.normal(scale=tau)
        cl = rng.choice(["A", "B", "C"])
        for _ in range(per_group):
            xv = rng.normal()
            # true model: y = 1 + 0.5 x + 1.0·[B] + 2.0·[C] + (−0.7·[C])·x
            y = (
                1.0
                + 0.5 * xv
                + {"A": 0.0, "B": 1.0, "C": 2.0}[cl]
                + {"A": 0.0, "B": 0.0, "C": -0.7}[cl] * xv
                + b
                + rng.normal(scale=sigma)
            )
            rows.append((gi, cl, xv, y))
    return pd.DataFrame(rows, columns=["id", "cluster", "x", "y"])


def test_design_builder_matches_patsy_layout():
    df = _sim_lme(n_groups=10, per_group=2)
    y, X, names = build_design("y ~ cluster * x", df)
    assert names == [
        "Intercept",
        "cluster[T.B]",
        "cluster[T.C]",
        "x",
        "cluster[T.B]:x",
        "cluster[T.C]:x",
    ]
    assert X.shape == (len(df), 6)
    np.testing.assert_array_equal(X[:, 0], 1.0)


def test_lme_recovers_fixed_effects_and_variances():
    df = _sim_lme()
    res = mixedlm("y ~ cluster * x", df, groups=df["id"]).fit()
    p = res.params
    assert abs(p["Intercept"] - 1.0) < 0.25
    assert abs(p["cluster[T.B]"] - 1.0) < 0.25
    assert abs(p["cluster[T.C]"] - 2.0) < 0.25
    assert abs(p["x"] - 0.5) < 0.1
    assert abs(p["cluster[T.C]:x"] + 0.7) < 0.15
    assert abs(np.sqrt(res.tau2) - 0.8) < 0.2
    assert abs(np.sqrt(res.sigma2) - 0.5) < 0.1


def test_lme_wald_interaction_test():
    df = _sim_lme()
    res = mixedlm("y ~ cluster * x", df, groups=df["id"]).fit()
    stat, pval = res.wald_test_terms(["cluster[T.B]:x", "cluster[T.C]:x"])
    assert pval < 1e-6  # C:x is truly nonzero
    # null simulation: interaction absent
    rng = np.random.default_rng(1)
    df0 = df.copy()
    df0["y"] = (
        1.0 + 0.5 * df0.x + rng.normal(scale=1.0, size=len(df0))
    )
    res0 = mixedlm("y ~ cluster * x", df0, groups=df0["id"]).fit()
    _, pval0 = res0.wald_test_terms(["cluster[T.B]:x", "cluster[T.C]:x"])
    assert pval0 > 0.01


def test_lme_matches_ols_when_no_group_variance():
    rng = np.random.default_rng(2)
    n = 400
    df = pd.DataFrame(
        {
            "id": np.arange(n),  # singleton groups → no shrinkage info
            "x": rng.normal(size=n),
        }
    )
    df["y"] = 2.0 + 3.0 * df.x + rng.normal(scale=0.3, size=n)
    res = mixedlm("y ~ x", df, groups=df["id"]).fit()
    beta_ols = np.linalg.lstsq(
        np.column_stack([np.ones(n), df.x]), df.y, rcond=None
    )[0]
    np.testing.assert_allclose(
        res.params.values, beta_ols, rtol=1e-4, atol=1e-4
    )
