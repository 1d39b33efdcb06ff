#!/usr/bin/env python3
"""Mixed-effects analysis of age-adjusted MMSE over time by cluster.

Python equivalent of the reference's R script (posthoc/lme_mmse_adni.R):
``mmse_age_adjusted ~ cluster * time_in_years + (1 | id)`` — REML fit,
per-term Wald F tests (stand-in for lmerTest's Satterthwaite ANOVA; the
reference reports a cluster×time interaction of F = 64.1, p < 2.2e-16),
the A-vs-D initial contrast, and emtrends-style per-cluster time slopes
with Tukey-adjusted pairwise contrasts.
"""

import pathlib
import sys

import numpy as np
import pandas as pd

whereami = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(whereami.parent))

from multimodal_trajectory_modeling_tpu.utils import lme  # noqa: E402

pd.options.display.width = 100
pd.options.display.float_format = "{:,.4f}".format


def main():
    df = pd.read_csv(
        whereami.joinpath("results", "mmse_by_cluster_over_time.csv")
    )
    res = lme.mixedlm(
        "mmse_age_adjusted ~ cluster * time_in_years",
        df,
        groups=df["id"].to_numpy(),
    ).fit()

    print("Wald F-tests (chi²/q approximation of Satterthwaite ANOVA):")
    names = res.names
    cluster_terms = [
        nm for nm in names if nm.startswith("cluster[") and ":" not in nm
    ]
    inter_terms = [nm for nm in names if ":" in nm]
    for label, terms in (
        ("cluster", cluster_terms),
        ("time_in_years", ["time_in_years"]),
        ("cluster:time_in_years", inter_terms),
    ):
        stat, p = res.wald_test_terms(terms)
        print(f"  {label:24s} F≈{stat:8.3f}  p={p:.3e}")

    print("\nFixed effects:")
    print(res.summary())
    print(
        f"\nRandom effects: id sd={np.sqrt(res.tau2):.3f}  "
        f"residual sd={np.sqrt(res.sigma2):.3f}  "
        f"n_obs={res.n_obs}  groups={res.n_groups}"
    )

    # A_init vs D_init contrast: Intercept − (Intercept + cluster[T.D])
    stat, p = res.wald_test_terms(["cluster[T.D]"])
    print(f"\nA_init vs. D_init: F≈{stat:.3f}  p={p:.3e}")

    trends, contrasts = lme.emtrends(res, "time_in_years", "cluster")
    print("\nPer-cluster time trends:")
    print(trends)
    print("\nPairwise trend contrasts (Tukey-adjusted):")
    print(contrasts)


if __name__ == "__main__":
    main()
