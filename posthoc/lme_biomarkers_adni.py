#!/usr/bin/env python3
"""Mixed-effects biomarker cascade analysis.

Python equivalent of the reference's R script
(posthoc/lme_biomarkers_adni.R): random-intercept LMEs of
``gm_diff ~ amyl_prev:cluster + cluster`` and
``adni_mem_diff ~ gm_diff:cluster + cluster`` with per-cluster slope
estimates (emtrends equivalent)."""

import pathlib
import sys

import numpy as np
import pandas as pd

whereami = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(whereami.parent))

from multimodal_trajectory_modeling_tpu.utils import lme  # noqa: E402

pd.options.display.width = 100
pd.options.display.float_format = "{:,.6g}".format


def _fit_and_report(df, formula, slope_var):
    res = lme.mixedlm(formula, df, groups=df["ids"].to_numpy()).fit()
    print("=" * 72)
    print(formula, "+ (1 | ids)")
    names = res.names
    cluster_terms = [
        nm for nm in names if nm.startswith("cluster[") and ":" not in nm
    ]
    slope_terms = [nm for nm in names if nm.startswith(f"{slope_var}:")]
    for label, terms in (
        ("cluster", cluster_terms),
        (f"{slope_var}:cluster", slope_terms),
    ):
        stat, p = res.wald_test_terms(terms)
        print(f"  {label:24s} F≈{stat:9.4f}  p={p:.3e}")
    print(res.summary())
    print(
        f"Random effects: ids sd={np.sqrt(res.tau2):.6g}  "
        f"residual sd={np.sqrt(res.sigma2):.6g}  n={res.n_obs}"
    )
    trends, _ = lme.emtrends(res, slope_var, "cluster")
    print("Per-cluster slopes:")
    print(trends)


def main():
    df = pd.read_csv(
        whereami.joinpath("results", "biomarkers_by_cluster_over_time.csv")
    )
    _fit_and_report(df, "gm_diff ~ amyl_prev:cluster + cluster", "amyl_prev")
    _fit_and_report(
        df, "adni_mem_diff ~ gm_diff:cluster + cluster", "gm_diff"
    )


if __name__ == "__main__":
    main()
