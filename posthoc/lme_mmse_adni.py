#!/usr/bin/env python3
"""Mixed-effects analysis of age-adjusted MMSE over time by cluster.

Python equivalent of the reference's R script (posthoc/lme_mmse_adni.R):
``mmse_age_adjusted ~ cluster * time_in_years + (1 | id)`` — REML fit,
Type III ANOVA with Satterthwaite denominator dof (the reference reports
a cluster×time interaction of F = 64.127 on (3, 929.1) dof), the
``contest`` A-vs-D initial contrast, and emtrends-style per-cluster time
slopes with Tukey-adjusted pairwise contrasts.
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

    print("Type III Analysis of Variance Table with Satterthwaite's method")
    print(res.anova())

    print("\nFixed effects:")
    print(res.summary())
    print(
        f"\nRandom effects: id sd={np.sqrt(res.tau2):.3f}  "
        f"residual sd={np.sqrt(res.sigma2):.3f}  "
        f"n_obs={res.n_obs}  groups={res.n_groups}"
    )

    # contest(list(`A_init vs. D_init` = c(1, 0, 0, -1, 0, 0, 0, 0)))
    L = np.zeros(len(res.names))
    L[res.names.index("Intercept")] = 1.0
    L[res.names.index("cluster[T.D]")] = -1.0
    print("\nA_init vs. D_init:")
    print(res.contest(L).rename(index={0: "A_init vs. D_init"}))

    trends, contrasts = lme.emtrends(res, "time_in_years", "cluster")
    print("\nPer-cluster time trends:")
    print(trends)
    print("\nPairwise trend contrasts (Tukey-adjusted):")
    print(contrasts)


if __name__ == "__main__":
    main()
