#!/usr/bin/env python3
"""Held-out prediction of annualized age-adjusted MMSE decline from
baseline feature sets.

Protocol (fixed by the reference experiment, posthoc/
prognostic_lm_adni.py:24-86): Ridge(alpha=0.01) under 10-fold
cross-validation scored by mean squared error, over single-feature models
(the model-derived index, each biomarker, each cognitive score, raw MMSE)
and the cognitive / biomarker / combined panels.  Expected headline from
the reference transcript: the one-number model index predicts decline at
MSE ≈ 0.916 vs 1.136 for baseline MMSE itself.
"""

import pathlib

import numpy as np
import pandas as pd
import sklearn.linear_model
import sklearn.model_selection

HERE = pathlib.Path(__file__).absolute().parent
RESULTS = HERE / "results"

TARGET = "ann_mmse_change_age_adjusted"
MODEL_INDEX = ("our_index_snapshot_init",)
COGNITIVE = ("adni_mem_init", "adni_ef_init", "moca_init", "adas13_init")
BIOMARKER = ("amyloid_init", "gm_init")
RIDGE_ALPHA = 0.01
N_FOLDS = 10
ABBREV = 6  # feature names are elided to 6 chars in tables


def candidate_feature_sets() -> list[tuple[str, ...]]:
    """The model-comparison grid: every feature alone, then the panels."""
    singles = [
        MODEL_INDEX,
        *((b,) for b in BIOMARKER),
        *((c,) for c in COGNITIVE),
        ("mmse_init",),
    ]
    panels = [COGNITIVE, BIOMARKER, COGNITIVE + BIOMARKER]
    return singles + panels


def crossval_mse(frame: pd.DataFrame, features: tuple[str, ...]) -> np.ndarray:
    """Per-fold held-out MSE of a ridge fit of the target on `features`."""
    neg_mse = sklearn.model_selection.cross_val_score(
        sklearn.linear_model.Ridge(alpha=RIDGE_ALPHA),
        frame[list(features)].values,
        frame[TARGET].values.reshape(-1, 1),
        cv=N_FOLDS,
        scoring="neg_mean_squared_error",
    )
    return -neg_mse


def summarize(per_fold: dict) -> pd.DataFrame:
    """Mean ± standard error per feature set, worst model first (the
    reference transcript's ordering)."""
    table = pd.DataFrame.from_dict(
        {
            k: [float(np.mean(v)), float(np.std(v) / np.sqrt(len(v)))]
            for k, v in per_fold.items()
        },
        columns=["avg. MSE", "std. err."],
        orient="index",
    )
    table = table.rename_axis("variables", axis="columns")
    return table.sort_values("avg. MSE", ascending=False)


def fold_records(per_fold: dict) -> pd.DataFrame:
    """Long-form (feature set, fold, score) table for downstream paired
    comparisons (consumed by prognostic_lm_comp_adni.py)."""
    rows = [
        (key, fold, mse)
        for key, folds in per_fold.items()
        for fold, mse in enumerate(folds)
    ]
    return pd.DataFrame(rows, columns=["variables", "batch", "MSE"])


def main():
    pd.options.display.width = 88
    pd.options.display.max_columns = 1000
    pd.options.display.max_rows = 1000
    pd.options.display.max_colwidth = 100
    pd.options.display.float_format = "{:,.3f}".format

    frame = pd.read_csv(RESULTS / "prognostics_all.csv", index_col=0)
    frame = frame.loc[~frame.isna().any(axis=1)]

    per_fold = {
        tuple(f[:ABBREV] for f in fs): crossval_mse(frame, fs)
        for fs in candidate_feature_sets()
    }

    print("-" * 79)
    print("Models by MSE:")
    print(summarize(per_fold))

    fold_records(per_fold).set_index("variables").to_csv(
        RESULTS / "paired_prognostic_mse_from_baseline.csv",
        index_label="variables",
    )


if __name__ == "__main__":
    main()
