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


def test_satterthwaite_df_balanced_one_way():
    """On a balanced one-way random-intercept design the intercept's t-test
    has exactly n_groups − 1 denominator dof (between-group stratum) and a
    group-constant-free covariate has ~ the within-group residual dof —
    Satterthwaite must recover both (lmerTest semantics)."""
    rng = np.random.default_rng(0)
    g, per = 30, 5
    groups = np.repeat(np.arange(g), per)
    b = rng.normal(0, 1.3, g)
    y = 2.0 + b[groups] + rng.normal(0, 0.8, g * per)
    df = pd.DataFrame({"y": y, "x": rng.normal(size=g * per)})
    res = mixedlm("y ~ x", df, groups=groups).fit()
    dofs = res.coef_df()
    assert abs(dofs["Intercept"] - (g - 1)) < 0.5
    assert g * per * 0.7 < dofs["x"] < g * per


def test_contest_single_vs_multi_df():
    df = _sim_lme()
    res = mixedlm("y ~ cluster * x", df, groups=df["id"]).fit()
    p = len(res.names)
    # single contrast: F == t² of the coefficient, DenDF == its Satterthwaite
    one = np.zeros(p)
    one[res.names.index("x")] = 1.0
    row = res.contest(one).iloc[0]
    t = res.tvalues()["x"]
    np.testing.assert_allclose(row["F value"], t * t, rtol=1e-10)
    np.testing.assert_allclose(
        row["DenDF"], res.satterthwaite_df(one), rtol=1e-10
    )
    # multi-row contrast: eigen-combined DenDF lies within the per-row range
    L = np.zeros((2, p))
    L[0, res.names.index("cluster[T.B]:x")] = 1.0
    L[1, res.names.index("cluster[T.C]:x")] = 1.0
    row = res.contest(L).iloc[0]
    nus = [res.satterthwaite_df(L[i]) for i in range(2)]
    assert min(nus) * 0.8 <= row["DenDF"] <= max(nus) * 1.2
    # Sum Sq convention: SS = F · q · σ̂²
    np.testing.assert_allclose(
        row["Sum Sq"], row["F value"] * 2 * res.sigma2, rtol=1e-12
    )


def test_anova_type3_table_shape_and_time_hypothesis():
    """anova() tests the level-averaged slope for the numeric main effect:
    on a fit where per-level slopes cancel, the numeric row must be null
    while the interaction row is hot."""
    rng = np.random.default_rng(3)
    g = 200
    rows = []
    for gi in range(g):
        cl = ["A", "B"][gi % 2]
        slope = {"A": 1.0, "B": -1.0}[cl]  # average slope == 0
        b = rng.normal(0, 0.5)
        for _ in range(4):
            xv = rng.normal()
            rows.append(
                (gi, cl, xv, slope * xv + b + rng.normal(scale=0.3))
            )
    df = pd.DataFrame(rows, columns=["id", "cluster", "x", "y"])
    res = mixedlm("y ~ cluster * x", df, groups=df["id"]).fit()
    tbl = res.anova()
    assert list(tbl.index) == ["cluster", "x", "cluster:x"]
    assert tbl.loc["x", "Pr(>F)"] > 0.01  # mean slope ≈ 0
    assert tbl.loc["cluster:x", "Pr(>F)"] < 1e-10
