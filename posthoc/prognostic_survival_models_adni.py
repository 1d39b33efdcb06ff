#!/usr/bin/env python3
"""Time-to-AD survival modelling from baseline features.

Protocol (fixed by the reference experiment, posthoc/
prognostic_survival_models_adni.py:24-146): Cox proportional-hazards
models under seeded 10-fold cross-validation scored by held-out
concordance — univariate models with penalizer 0.1 and small fixed Newton
steps, multivariate panels with penalizer 0.01 and robust SEs.  Uses the
in-repo lifelines-compatible Cox engine (utils/survival.py), whose CV
split replicates lifelines' seeded fold deal; the reference transcript's
headlines are 0.836 for the one-number model index (best univariate) and
0.887 for the full cognitive+biomarker panel.
"""

import pathlib
import sys

import numpy as np
import pandas as pd

HERE = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(HERE.parent))

from multimodal_trajectory_modeling_tpu.utils.survival import (  # noqa: E402
    CoxPHFitter,
    k_fold_cross_validation,
)

RESULTS = HERE / "results"
DURATION, EVENT = "days_to_ad_or_last_obs", "ad_outcome"
MODEL_INDEX = ("our_index_snapshot_init",)
COGNITIVE = ("adni_mem_init", "adni_ef_init", "moca_init", "adas13_init")
BIOMARKER = ("amyloid_init", "gm_init")
N_FOLDS = 10
CV_SEED = 0
ABBREV = 6

# univariate protocol: heavier ridge, small fixed steps, many of them
UNI = dict(penalizer=0.1, fit_options={"step_size": 0.001, "max_steps": 1000})
# multivariate protocol: light ridge, robust variance, bigger steps
MULTI = dict(
    penalizer=0.01,
    robust=True,
    fit_options={"step_size": 0.01, "max_steps": 10000},
)


def crossval_concordance(
    frame: pd.DataFrame,
    features: list[str],
    *,
    penalizer: float,
    fit_options: dict,
    robust: bool = False,
) -> list[float]:
    """Per-fold held-out concordance of a Cox fit on `features`."""
    cols = list(features) + [DURATION, EVENT]
    fitter_kwargs = {"fit_options": fit_options}
    if robust:
        fitter_kwargs["robust"] = True
    return k_fold_cross_validation(
        CoxPHFitter(penalizer=penalizer),
        frame[cols],
        DURATION,
        EVENT,
        k=N_FOLDS,
        scoring_method="concordance_index",
        fitter_kwargs=fitter_kwargs,
        seed=CV_SEED,
    )


def concordance_table(scores: dict, axis_label: str) -> pd.DataFrame:
    """Mean held-out concordance per model, best first."""
    table = pd.DataFrame.from_dict(
        {k: np.mean(v) for k, v in scores.items()},
        columns=["avg. conc."],
        orient="index",
    )
    table = table.rename_axis(axis_label, axis="columns")
    return table.sort_values("avg. conc.", ascending=False)


def write_fold_scores(scores: dict, path: pathlib.Path, key_label: str):
    """Long-form (model, fold, concordance) CSV for the paired-comparison
    scripts downstream."""
    rows = [
        (key, fold, conc)
        for key, folds in scores.items()
        for fold, conc in enumerate(folds)
    ]
    pd.DataFrame(rows, columns=[key_label, "batch", "concordance"]).set_index(
        key_label
    ).to_csv(path, index_label=key_label)


def main():
    pd.options.display.width = 79
    pd.options.display.max_columns = 1000
    pd.options.display.max_rows = 1000
    pd.options.display.max_colwidth = 100
    pd.options.display.float_format = "{:,.3f}".format

    frame = pd.read_csv(
        RESULTS / "survival_modelling_data.csv", index_col=0
    )
    assert not frame.isnull().any().any()
    # baseline-AD diagnoses have no follow-up interval to model
    frame = frame[frame[DURATION] != 0]

    # one Cox model per baseline feature (every column but the outcome pair)
    univariate = {
        feature: crossval_concordance(frame, [feature], **UNI)
        for feature in frame.columns[:-2]
    }
    print(concordance_table(univariate, "variable"))
    write_fold_scores(
        univariate,
        RESULTS / "paired_concordances_from_baseline_meas.csv",
        "variable",
    )

    # panels: the model index alone, each biomarker/cognitive feature alone,
    # then the cognitive, biomarker and combined panels
    panels = [
        list(MODEL_INDEX),
        *([b] for b in BIOMARKER),
        *([c] for c in COGNITIVE),
        list(COGNITIVE),
        list(BIOMARKER),
        list(COGNITIVE + BIOMARKER),
    ]
    multivariate = {
        tuple(f[:ABBREV] for f in features): crossval_concordance(
            frame, features, **MULTI
        )
        for features in panels
    }
    print("-" * 79)
    print("Models by concordance:")
    print(concordance_table(multivariate, "variables"))
    write_fold_scores(
        multivariate,
        RESULTS / "paired_concordances_from_baseline_meas_multiv.csv",
        "variables",
    )


if __name__ == "__main__":
    main()
