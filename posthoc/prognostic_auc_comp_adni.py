#!/usr/bin/env python3
"""Paired comparisons of cross-validated AD-conversion AUCs vs the
model-derived index (Python equivalent of
posthoc/prognostic_auc_comp_adni.R; reference headline: model index AUC
0.878 at baseline)."""

import pathlib

import pandas as pd
import scipy.stats as sp_stats

whereami = pathlib.Path(__file__).absolute().parent

pd.options.display.float_format = "{:,.4f}".format


def paired_vs_reference(df, value_col, group_col, reference_group):
    """Per-group means plus paired t-tests of every group against the
    reference group (R's pairwise.t.test(paired=TRUE) restricted to the
    rows involving the reference)."""
    means = (
        df.groupby(group_col)[value_col].mean().sort_values().rename("mean")
    )
    print(means.to_frame())
    ref = df.loc[df[group_col] == reference_group].sort_values("batch")[
        value_col
    ]
    rows = []
    for g, sub in df.groupby(group_col):
        if g == reference_group:
            continue
        other = sub.sort_values("batch")[value_col]
        t, p = sp_stats.ttest_rel(ref.to_numpy(), other.to_numpy())
        rows.append((reference_group, g, p))
    out = pd.DataFrame(rows, columns=["group1", "group2", "p.value"])
    print(out.sort_values("group2").to_string(index=False))
    return out


def main():
    df = pd.read_csv(
        whereami.joinpath(
            "results", "paired_prognostic_aucs_from_baseline_meas.csv"
        )
    )
    paired_vs_reference(df, "auc", "feature", "('our_in',)")


if __name__ == "__main__":
    main()
