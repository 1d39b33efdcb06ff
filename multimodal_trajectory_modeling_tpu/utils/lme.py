"""Random-intercept linear mixed-effects models.

Replaces the two external LME dependencies of the reference pipeline that
are unavailable here:

- statsmodels ``smf.mixedlm("y ~ cluster * x", df, groups=...)`` used by the
  collate driver (inference-adni-xval-collate-results.py:602-787);
- the lme4/lmerTest R scripts (posthoc/lme_*.R) fitting
  ``y ~ cluster * time + (1 | id)`` with tests of the interaction.

Model: ``y = X β + b_g + ε`` with ``b_g ~ N(0, τ²)`` per group and
``ε ~ N(0, σ²)``.  REML estimation by profiling: for a given variance ratio
``λ = τ²/σ²`` the per-group GLS solve is rank-one (Sherman—Morrison), so
the whole profile likelihood is closed-form; a scalar bounded optimization
over ``log λ`` finishes the job.  Fixed-effect naming follows patsy
(``Intercept``, ``cluster[T.B]``, ``x``, ``cluster[T.B]:x``) so downstream
code written against statsmodels results objects keeps working.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import scipy.optimize as sp_opt
import scipy.stats as sp_stats

__all__ = ["mixedlm", "MixedLMResult", "build_design", "emtrends"]


def build_design(
    formula: str, df: pd.DataFrame
) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """Tiny patsy-like design builder supporting ``y ~ a * b``, ``y ~ a + b``
    and single-term formulas, with treatment coding for
    categorical/object-typed columns (first sorted level is the baseline)."""
    lhs, rhs = [s.strip() for s in formula.split("~")]
    y = df[lhs].to_numpy(dtype=float)

    def is_cat(col):
        return not pd.api.types.is_numeric_dtype(df[col])

    def levels_of(col):
        return sorted(pd.unique(df[col].astype(str)))

    def encode(col, drop_first=True):
        s = df[col]
        if is_cat(col):
            lvls = levels_of(col)
            keep = lvls[1:] if drop_first else lvls
            tag = "[T.{}]" if drop_first else "[{}]"
            return [
                (f"{col}{tag.format(lv)}", (s.astype(str) == lv).to_numpy(float))
                for lv in keep
            ]
        return [(col, s.to_numpy(dtype=float))]

    names = ["Intercept"]
    columns = [np.ones(len(df))]

    if "*" in rhs:
        # a * b → a + b + a:b (both main effects + treatment-coded interaction)
        terms = [t.strip() for t in rhs.split("*")]
        encoded = [encode(t) for t in terms]
        for enc in encoded:
            for nm, colv in enc:
                names.append(nm)
                columns.append(colv)
        for nm1, c1 in encoded[0]:
            for nm2, c2 in encoded[1]:
                names.append(f"{nm1}:{nm2}")
                columns.append(c1 * c2)
    else:
        # additive terms; a pure interaction term ``num:cat`` (without the
        # numeric main effect) gets one slope per *full* categorical level —
        # the patsy/lme4 rule used by ``y ~ x:cluster + cluster``
        terms = [t.strip() for t in rhs.split("+")]
        plain = [t for t in terms if ":" not in t]
        for t in plain:
            for nm, colv in encode(t):
                names.append(nm)
                columns.append(colv)
        for t in terms:
            if ":" not in t:
                continue
            a, b = [s.strip() for s in t.split(":")]
            if is_cat(b) and not is_cat(a):
                a, b = b, a  # put the categorical first
            if is_cat(a) and not is_cat(b):
                num = df[b].to_numpy(dtype=float)
                for lv in levels_of(a):
                    names.append(f"{b}:{a}[{lv}]")
                    columns.append(
                        (df[a].astype(str) == lv).to_numpy(float) * num
                    )
            else:
                enc_a, enc_b = encode(a), encode(b)
                for nm1, c1 in enc_a:
                    for nm2, c2 in enc_b:
                        names.append(f"{nm1}:{nm2}")
                        columns.append(c1 * c2)
    X = np.column_stack(columns)
    return y, X, names


@dataclass
class MixedLMResult:
    params: pd.Series
    bse: pd.Series
    cov_params_: pd.DataFrame
    sigma2: float
    tau2: float
    loglike: float
    n_groups: int
    n_obs: int
    names: list[str] = field(default_factory=list)

    def tvalues(self) -> pd.Series:
        return self.params / self.bse

    def pvalues(self) -> pd.Series:
        z = self.tvalues()
        return pd.Series(
            2 * sp_stats.norm.sf(np.abs(z.values)), index=z.index
        )

    def wald_test_terms(self, term_names: list[str]) -> tuple[float, float]:
        """Joint Wald test that the named coefficients are all zero;
        returns (F-like statistic, p-value) with chi²/q reference — the
        stand-in for lmerTest's Satterthwaite F (documented approximation)."""
        idx = [self.names.index(nm) for nm in term_names]
        b = self.params.values[idx]
        Vs = self.cov_params_.values[np.ix_(idx, idx)]
        stat = float(b @ np.linalg.solve(Vs, b))
        q = len(idx)
        p = float(sp_stats.chi2.sf(stat, q))
        return stat / q, p

    def summary(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "coef": self.params,
                "se": self.bse,
                "z": self.tvalues(),
                "p": self.pvalues(),
            }
        )


def _profile_reml(lam, y, X, group_sizes, group_slices):
    """−2·REML log-likelihood (up to constants) for variance ratio λ, plus
    the GLS β and variance estimates.  Rank-one per-group inverse:
    V_g⁻¹ = I − (λ / (1 + λ n_g)) 1 1ᵀ."""
    n, p = X.shape
    XtVX = np.zeros((p, p))
    XtVy = np.zeros(p)
    ytVy = 0.0
    logdetV = 0.0
    for (lo, hi), ng in zip(group_slices, group_sizes):
        Xg = X[lo:hi]
        yg = y[lo:hi]
        c = lam / (1.0 + lam * ng)
        sx = Xg.sum(axis=0)
        sy = yg.sum()
        XtVX += Xg.T @ Xg - c * np.outer(sx, sx)
        XtVy += Xg.T @ yg - c * sx * sy
        ytVy += yg @ yg - c * sy * sy
        logdetV += np.log1p(lam * ng)
    beta = np.linalg.solve(XtVX, XtVy)
    rss = ytVy - beta @ XtVy  # y' V⁻¹ y − β' X' V⁻¹ y
    sigma2 = rss / (n - p)  # REML variance estimate
    sign, logdetXtVX = np.linalg.slogdet(XtVX)
    neg2reml = (
        (n - p) * np.log(sigma2) + logdetV + logdetXtVX + (n - p)
    )
    return neg2reml, beta, sigma2, XtVX


def emtrends(
    res: MixedLMResult, var: str, factor: str = "cluster"
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Per-level slopes of ``var`` with SEs, plus Tukey-adjusted pairwise
    contrasts — the pipeline's use of emmeans::emtrends
    (posthoc/lme_*.R).  Degrees of freedom use the residual count (the
    Satterthwaite refinement changes them by <2% at these sample sizes).
    """
    names = res.names
    cov = res.cov_params_.values
    p = len(names)
    dof = res.n_obs - p

    # discover levels from coefficient names
    weights = {}
    if var in names:  # a*b coding: baseline slope is `var`
        base_levels = sorted(
            {
                nm.split("[T.")[1].split("]")[0]
                for nm in names
                if nm.startswith(f"{factor}[T.") and ":" not in nm
            }
        )
        # baseline level name: the letter preceding the first coded level
        # (cluster levels are single letters A.. in this pipeline)
        inferred_base = chr(min(ord(lv[0]) for lv in base_levels) - 1)
        all_levels = [inferred_base] + base_levels
        for lv in all_levels:
            w = np.zeros(p)
            w[names.index(var)] = 1.0
            inter = f"{factor}[T.{lv}]:{var}"
            if inter in names:
                w[names.index(inter)] = 1.0
            weights[lv] = w
    else:  # num:cat coding: one slope per full level `var:factor[L]`
        for nm in names:
            if nm.startswith(f"{var}:{factor}["):
                lv = nm.split("[")[1].split("]")[0]
                w = np.zeros(p)
                w[names.index(nm)] = 1.0
                weights[lv] = w

    rows = []
    for lv, w in sorted(weights.items()):
        est = float(w @ res.params.values)
        se = float(np.sqrt(w @ cov @ w))
        t_lo, t_hi = sp_stats.t.interval(0.95, dof)
        rows.append((lv, est, se, dof, est + t_lo * se, est + t_hi * se))
    trends = pd.DataFrame(
        rows,
        columns=[factor, f"{var}.trend", "SE", "df", "lower.CL", "upper.CL"],
    )

    lv_list = sorted(weights)
    k = len(lv_list)
    crows = []
    for i in range(k):
        for j in range(i + 1, k):
            w = weights[lv_list[i]] - weights[lv_list[j]]
            est = float(w @ res.params.values)
            se = float(np.sqrt(w @ cov @ w))
            t = est / se
            # Tukey adjustment over a family of k estimates
            pval = float(
                sp_stats.studentized_range.sf(abs(t) * np.sqrt(2), k, dof)
            )
            crows.append(
                (f"{lv_list[i]} - {lv_list[j]}", est, se, dof, t, pval)
            )
    contrasts = pd.DataFrame(
        crows,
        columns=["contrast", "estimate", "SE", "df", "t.ratio", "p.value"],
    )
    return trends, contrasts


def mixedlm(
    formula: str,
    df: pd.DataFrame,
    groups: pd.Series | np.ndarray,
) -> "_MixedLM":
    """statsmodels-like entry point: ``mixedlm(formula, df, groups).fit()``."""
    return _MixedLM(formula, df, np.asarray(groups))


class _MixedLM:
    def __init__(self, formula, df, groups):
        self.formula = formula
        self.df = df
        self.groups = groups

    def fit(self) -> MixedLMResult:
        y, X, names = build_design(self.formula, self.df)
        order = np.argsort(self.groups, kind="stable")
        y, X, g = y[order], X[order], self.groups[order]
        uniq, starts = np.unique(g, return_index=True)
        starts = np.sort(starts)
        bounds = list(starts) + [len(g)]
        group_slices = [
            (bounds[i], bounds[i + 1]) for i in range(len(uniq))
        ]
        group_sizes = [hi - lo for lo, hi in group_slices]

        def objective(log_lam):
            lam = np.exp(log_lam)
            return _profile_reml(lam, y, X, group_sizes, group_slices)[0]

        res = sp_opt.minimize_scalar(
            objective, bounds=(-10.0, 10.0), method="bounded"
        )
        lam = float(np.exp(res.x))
        neg2reml, beta, sigma2, XtVX = _profile_reml(
            lam, y, X, group_sizes, group_slices
        )
        cov = np.linalg.inv(XtVX) * sigma2
        return MixedLMResult(
            params=pd.Series(beta, index=names),
            bse=pd.Series(np.sqrt(np.diag(cov)), index=names),
            cov_params_=pd.DataFrame(cov, index=names, columns=names),
            sigma2=float(sigma2),
            tau2=float(lam * sigma2),
            loglike=-0.5 * float(neg2reml),
            n_groups=len(uniq),
            n_obs=len(y),
            names=names,
        )
