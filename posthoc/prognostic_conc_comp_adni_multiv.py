#!/usr/bin/env python3
"""Paired comparisons of multivariate Cox concordance batches vs the model
index (Python equivalent of posthoc/prognostic_conc_comp_adni_multiv.R)."""

import pathlib
import sys

import pandas as pd

whereami = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(whereami))

from prognostic_auc_comp_adni import paired_vs_reference  # noqa: E402


def main():
    df = pd.read_csv(
        whereami.joinpath(
            "results", "paired_concordances_from_baseline_meas_multiv.csv"
        )
    )
    paired_vs_reference(df, "concordance", "variables", "('our_in',)")


if __name__ == "__main__":
    main()
