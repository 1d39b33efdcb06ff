#!/usr/bin/env python3
"""Paired comparisons of prognostic MSE batches vs the model index (Python
equivalent of posthoc/prognostic_lm_comp_adni.R)."""

import pathlib
import sys

import pandas as pd

whereami = pathlib.Path(__file__).absolute().parent
sys.path.insert(0, str(whereami))

from prognostic_auc_comp_adni import paired_vs_reference  # noqa: E402


def main():
    df = pd.read_csv(
        whereami.joinpath(
            "results", "paired_prognostic_mse_from_baseline.csv"
        )
    )
    paired_vs_reference(df, "MSE", "variables", "('our_in',)")


if __name__ == "__main__":
    main()
