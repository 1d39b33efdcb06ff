#!/usr/bin/env python3
"""Dependent-correlation comparisons: does the model index correlate more
strongly with cognitive decline than MMSE/MoCA do?

Python equivalent of posthoc/prognostic_corr_adni.R (cocor's
steiger1980 test): Steiger's (1980) modification of Dunn & Clark's z using
average correlations, plus plain Pearson correlation tests.
"""

import pathlib

import numpy as np
import pandas as pd
import scipy.stats as sp_stats

whereami = pathlib.Path(__file__).absolute().parent


def steiger1980(r_jk: float, r_jh: float, r_kh: float, n: int):
    """Steiger's (1980) z for two overlapping dependent correlations
    (difference r_jk − r_jh sharing variable j), using the average
    correlation r̄ = (r_jk + r_jh)/2."""
    r_bar = (r_jk + r_jh) / 2.0
    det = (
        (1 - r_bar**2 - r_bar**2 - r_kh**2)
        + 2 * r_bar * r_bar * r_kh
    )
    cov_term = (
        r_kh * (1 - 2 * r_bar**2) - 0.5 * r_bar**2 * (1 - 2 * r_bar**2 - r_kh**2)
    )
    s = cov_term / (1 - r_bar**2) ** 2
    z_jk = np.arctanh(r_jk)
    z_jh = np.arctanh(r_jh)
    z = (z_jk - z_jh) * np.sqrt((n - 3) / (2 - 2 * s))
    p = 2 * sp_stats.norm.sf(abs(z))
    return float(z), float(p)


def _drop_outliers(df, col):
    v = df[col]
    return df[np.abs(v - v.mean()) < 3 * v.std()]


def _cor_test(a, b):
    keep = np.isfinite(a) & np.isfinite(b)
    r, p = sp_stats.pearsonr(a[keep], b[keep])
    n = keep.sum()
    z = np.arctanh(r)
    zcrit = sp_stats.norm.ppf(0.975)
    lo, hi = np.tanh(z - zcrit / np.sqrt(n - 3)), np.tanh(
        z + zcrit / np.sqrt(n - 3)
    )
    t = r * np.sqrt((n - 2) / (1 - r**2))
    return dict(
        estimate=r, statistic=t, p_value=p, df=n - 2, ci=(lo, hi)
    )


def main():
    df = pd.read_csv(
        whereami.joinpath("results", "prognostics_all.csv"), index_col=0
    )
    y = "ann_mmse_change_age_adjusted"
    h = "our_index_snapshot_init"

    for k in ("mmse_init", "moca_init"):
        sub = _drop_outliers(_drop_outliers(df, k), h)
        sub = sub[np.isfinite(sub[[y, k, h]]).all(axis=1)]
        r_jk = sub[y].corr(sub[k])
        r_jh = sub[y].corr(sub[h])
        r_kh = sub[k].corr(sub[h])
        z, p = steiger1980(r_jk, r_jh, r_kh, len(sub))
        print(
            f"Comparison r({y},{k}) = {r_jk:.4f} vs r({y},{h}) = {r_jh:.4f}"
            f"  (r_kh = {r_kh:.4f}, n = {len(sub)})"
        )
        print(f"  steiger1980: z = {z:.4f}, p-value = {p:.4f}")

    for col in (h, "mmse_init", "moca_init"):
        sub = _drop_outliers(df, col)
        res = _cor_test(sub[col].to_numpy(), sub[y].to_numpy())
        print(
            f"Pearson cor({col}, {y}): r = {res['estimate']:.3f}, "
            f"t = {res['statistic']:.2f}, p = {res['p_value']:.3g}, "
            f"df = {res['df']}, CI = ({res['ci'][0]:.3f}, {res['ci'][1]:.3f})"
        )


if __name__ == "__main__":
    main()
