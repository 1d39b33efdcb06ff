#!/usr/bin/env python3
"""Prognostic ridge models for Δ(age-adjusted MMSE) ~ baseline feature sets
(reference posthoc/prognostic_lm_adni.py:24-86; expected outputs in its
trailing docstring — headline: model index MSE 0.916 vs 1.136 for MMSE)."""

import pathlib

import numpy as np
import pandas as pd
import sklearn.linear_model as skl_lm
import sklearn.model_selection as skl_mdl_sel

pd.options.display.width = 88
pd.options.display.max_columns = 1000
pd.options.display.max_rows = 1000
pd.options.display.max_colwidth = 100
pd.options.display.float_format = "{:,.3f}".format

whereami = pathlib.Path(__file__).absolute().parent


def main():
    data = pd.read_csv(
        whereami.joinpath("results", "prognostics_all.csv"), index_col=0
    )
    data = data.loc[~data.isna().any(axis=1)]

    cog_init = ["adni_mem_init", "adni_ef_init", "moca_init", "adas13_init"]
    bio_init = ["amyloid_init", "gm_init"]

    cv_mse = {
        tuple(v[:6] for v in c): -skl_mdl_sel.cross_val_score(
            skl_lm.Ridge(alpha=0.01),
            data[c].values,
            data.ann_mmse_change_age_adjusted.values.reshape(-1, 1),
            cv=10,
            scoring="neg_mean_squared_error",
        )
        for c in [
            ["our_index_snapshot_init"],
            *[[b] for b in bio_init],
            *[[c] for c in cog_init],
            ["mmse_init"],
            cog_init,
            bio_init,
            cog_init + bio_init,
        ]
    }

    print("-" * 79)
    print("Models by MSE:")
    print(
        pd.DataFrame.from_dict(
            data={
                k: [np.mean(v), np.std(v) / np.sqrt(len(v))]
                for k, v in cv_mse.items()
            },
            columns=["avg. MSE", "std. err."],
            orient="index",
        )
        .rename_axis("variables", axis="columns")
        .sort_values("avg. MSE", ascending=False)
    )

    pd.DataFrame.from_records(
        data=[(k, i, c) for k, v in cv_mse.items() for i, c in enumerate(v)],
        columns=["variables", "batch", "MSE"],
        index="variables",
    ).to_csv(
        whereami.joinpath("results", "paired_prognostic_mse_from_baseline.csv"),
        index_label="variables",
    )


if __name__ == "__main__":
    main()
