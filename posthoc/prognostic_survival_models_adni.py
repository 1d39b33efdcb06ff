#!/usr/bin/env python3
"""Cox-PH survival modelling on baseline features (reference
posthoc/prognostic_survival_models_adni.py:24-146; expected outputs in its
trailing docstring — headline: model-derived index is the best univariate
predictor at concordance ≈ 0.836).

Uses the in-repo Cox implementation (utils/survival.py) in place of
lifelines, with the same fitter options and 10-fold seeded CV protocol.
"""

import pathlib
import sys

import numpy as np
import pandas as pd

whereami = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(whereami.parent))

from multimodal_trajectory_modeling_tpu.utils.survival import (  # noqa: E402
    CoxPHFitter,
    k_fold_cross_validation,
)

pd.options.display.width = 79
pd.options.display.max_columns = 1000
pd.options.display.max_rows = 1000
pd.options.display.max_colwidth = 100
pd.options.display.float_format = "{:,.3f}".format


def main():
    data = pd.read_csv(
        whereami.joinpath("results", "survival_modelling_data.csv"),
        index_col=0,
    )
    assert not data.isnull().any().any()
    data = data[data["days_to_ad_or_last_obs"] != 0]

    # univariate Cox-PH models
    xval_conc_uni = {
        c: k_fold_cross_validation(
            CoxPHFitter(penalizer=0.1, l1_ratio=0.0),
            data[[c, "days_to_ad_or_last_obs", "ad_outcome"]],
            duration_col="days_to_ad_or_last_obs",
            event_col="ad_outcome",
            k=10,
            scoring_method="concordance_index",
            fitter_kwargs={
                "fit_options": {"step_size": 0.001, "max_steps": 1000},
            },
            seed=0,
        )
        for c in data.columns[:-2]
    }
    print(
        pd.DataFrame.from_dict(
            data={k: np.mean(v) for k, v in xval_conc_uni.items()},
            columns=["avg. conc."],
            orient="index",
        )
        .rename_axis("variable", axis="columns")
        .sort_values("avg. conc.", ascending=False)
    )
    pd.DataFrame.from_records(
        data=[
            (k, i, c)
            for k, v in xval_conc_uni.items()
            for i, c in enumerate(v)
        ],
        columns=["variable", "batch", "concordance"],
        index="variable",
    ).to_csv(
        whereami.joinpath(
            "results", "paired_concordances_from_baseline_meas.csv"
        ),
        index_label="variable",
    )

    # multivariate Cox models
    cog_init = ["adni_mem_init", "adni_ef_init", "moca_init", "adas13_init"]
    bio_init = ["amyloid_init", "gm_init"]
    xval_conc_multi = {
        tuple(v[:6] for v in c_list): k_fold_cross_validation(
            CoxPHFitter(penalizer=0.01),
            data[list(c_list) + ["days_to_ad_or_last_obs", "ad_outcome"]],
            duration_col="days_to_ad_or_last_obs",
            event_col="ad_outcome",
            k=10,
            scoring_method="concordance_index",
            fitter_kwargs={
                "robust": True,
                "fit_options": {"step_size": 0.01, "max_steps": 10000},
            },
            seed=0,
        )
        for c_list in [
            ["our_index_snapshot_init"],
            *[[b] for b in bio_init],
            *[[c] for c in cog_init],
            cog_init,
            bio_init,
            cog_init + bio_init,
        ]
    }
    print("-" * 79)
    print("Models by concordance:")
    print(
        pd.DataFrame.from_dict(
            data={k: np.mean(v) for k, v in xval_conc_multi.items()},
            columns=["avg. conc."],
            orient="index",
        )
        .rename_axis("variables", axis="columns")
        .sort_values("avg. conc.", ascending=False)
    )
    pd.DataFrame.from_records(
        data=[
            (k, i, c)
            for k, v in xval_conc_multi.items()
            for i, c in enumerate(v)
        ],
        columns=["variables", "batch", "concordance"],
        index="variables",
    ).to_csv(
        whereami.joinpath(
            "results", "paired_concordances_from_baseline_meas_multiv.csv"
        ),
        index_label="variables",
    )


if __name__ == "__main__":
    main()
