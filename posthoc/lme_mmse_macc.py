#!/usr/bin/env python3
"""Mixed-effects MMSE-over-time analysis on the MACC cohort (Python
equivalent of posthoc/lme_mmse_macc.R:
``mmse_age_adjusted ~ cluster:time_in_years + cluster + (1 | index)``).
Gated on the MACC transfer outputs being present (the MACC data are not
shipped)."""

import pathlib
import sys

import pandas as pd

whereami = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(whereami.parent))

from multimodal_trajectory_modeling_tpu.utils import lme  # noqa: E402


def main():
    src = whereami.joinpath("results", "mmse_by_cluster_over_time_macc.csv")
    if not src.exists():
        print(
            "MACC MMSE table not found (MACC data are not shipped); skipping."
        )
        return
    df = pd.read_csv(src)
    res = lme.mixedlm(
        "mmse_age_adjusted ~ time_in_years:cluster + cluster",
        df,
        groups=df["index"].to_numpy(),
    ).fit()
    names = res.names
    cluster_terms = [
        nm for nm in names if nm.startswith("cluster[") and ":" not in nm
    ]
    slope_terms = [nm for nm in names if nm.startswith("time_in_years:")]
    for label, terms in (
        ("cluster", cluster_terms),
        ("cluster:time_in_years", slope_terms),
    ):
        stat, p = res.wald_test_terms(terms)
        print(f"  {label:24s} F≈{stat:9.4f}  p={p:.3e}")
    print(res.summary())
    trends, contrasts = lme.emtrends(res, "time_in_years", "cluster")
    print(trends)
    print(contrasts)


if __name__ == "__main__":
    main()
