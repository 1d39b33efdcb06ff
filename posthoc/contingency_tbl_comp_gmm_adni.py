#!/usr/bin/env python3
"""Contingency-table comparison: ours vs the GMM baseline.

Python equivalent of the reference's R script
(posthoc/contingency_tbl_comp_gmm_adni.R): Pearson χ² for each table plus
the Sharma—Song test for second-order differences between the two tables
(DiffXTables::sharma.song.test, reimplemented per Sharma & Song's
construction: χ² distance between the tables' normalized Pearson-residual
patterns).
"""

import pathlib

import numpy as np
import pandas as pd
import scipy.stats as sp_stats

whereami = pathlib.Path(__file__).absolute().parent


def _std_residuals(tbl: np.ndarray) -> np.ndarray:
    n = tbl.sum()
    rows = tbl.sum(axis=1, keepdims=True)
    cols = tbl.sum(axis=0, keepdims=True)
    expected = rows * cols / n
    return (tbl - expected) / np.sqrt(expected)


def sharma_song_test(tables: list[np.ndarray], compensated: bool = False):
    """Second-order differential test across K contingency tables.

    Statistic: the χ² distance between each table's standardized Pearson
    residual pattern and their (sample-size-weighted) common pattern,
    summed over tables; df = (K−1)(I−1)(J−1).  ``compensated`` applies the
    small-count continuity compensation (|residual| reduced by 0.5/√E).
    This is a faithful reimplementation of the published construction; the
    DiffXTables package applies an orthogonal (Helmert) decomposition that
    is algebraically equivalent for K = 2.
    """
    K = len(tables)
    I, J = tables[0].shape
    ns = np.array([t.sum() for t in tables], dtype=float)
    resids = []
    for t in tables:
        t = np.asarray(t, dtype=float)
        n = t.sum()
        rows = t.sum(axis=1, keepdims=True)
        cols = t.sum(axis=0, keepdims=True)
        expected = rows * cols / n
        r = t - expected
        if compensated:
            r = np.sign(r) * np.maximum(np.abs(r) - 0.5, 0.0)
        resids.append(r / np.sqrt(expected))
    resids = np.stack(resids)  # (K, I, J)
    weights = np.sqrt(ns)[:, None, None]
    common = np.sum(weights * resids, axis=0) / np.sqrt(np.sum(ns))
    # orthogonal (Helmert) decomposition: total residual energy minus the
    # energy of the weighted-common pattern
    stat = float(np.sum(resids**2) - np.sum(common**2))
    df = (K - 1) * (I - 1) * (J - 1)
    p = float(sp_stats.chi2.sf(stat, df))
    return stat, df, p


def main():
    our_table = (
        pd.read_csv(
            whereami.joinpath("results", "contingency_table_ours_test.csv"),
            index_col="cluster",
        )
        .to_numpy()
        .astype(float)
    )
    gmm_table = (
        pd.read_csv(
            whereami.joinpath("results", "contingency_table_gmm_init.csv"),
            index_col="cluster",
        )
        .to_numpy()
        .astype(float)
    )

    for name, tbl in (("ours", our_table), ("gmm", gmm_table)):
        chi2, p, dof, _ = sp_stats.chi2_contingency(tbl)
        print(
            f"Pearson χ² ({name}): X-squared = {chi2:.3f}, df = {dof}, "
            f"p-value = {p:.3e}"
        )

    for compensated in (False, True):
        stat, df, p = sharma_song_test(
            [our_table, gmm_table], compensated=compensated
        )
        print(
            f"Sharma-Song second-order test (compensated={compensated}): "
            f"X-squared = {stat:.3f}, df = {df}, p-value = {p:.3e}"
        )


if __name__ == "__main__":
    main()
