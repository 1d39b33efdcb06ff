"""Dataset-adapter tests: ADNI (shipped data) and MACC (synthetic stand-in
for the unshipped npz, exercising every code path)."""


import numpy as np
import pandas as pd
import pytest

from multimodal_trajectory_modeling_tpu.utils import adni, macc


def test_adni_trajectories_shapes():
    z, x, d, ids, time = adni.get_trajectories()
    assert z.shape == (4, 571, 2)
    assert x.shape == (4, 571, 4)
    assert d.shape == ids.shape == time.shape == (4, 571, 1)
    z2, x2, d2, ids2, t2, mmse, age = adni.get_trajectories(
        return_mmse=True, return_approx_age=True
    )
    assert mmse.shape == age.shape == (4, 571, 1)


def test_adni_final_diagnoses_and_lengths():
    z, x, d, ids, time = adni.get_trajectories()
    finals = adni.get_final_diagnoses(d)
    assert set(finals) <= set(adni.diagnosis_list)
    length = np.argmin(
        np.all(np.isfinite(np.concatenate([x, z], axis=-1)), axis=-1), axis=0
    )
    length[length == 0] = x.shape[0]
    counts = dict(zip(*np.unique(length, return_counts=True)))
    assert counts == {2: 337, 3: 194, 4: 40}  # reference util_adni.py:491


def test_adni_profiling_join():
    z, x, d, ids, time = adni.get_trajectories()
    df = adni.return_profiling_dataframe(ids[0])
    assert len(df) == 571
    assert {"is_female", "edu_yrs", "apoe4_pos", "ad_outcome"} <= set(
        df.columns
    )


def test_adni_correspondence_sorts_by_ad_rate():
    from multimodal_trajectory_modeling_tpu.models import (
        MMLinGaussSS_marginalizable,
    )
    from multimodal_trajectory_modeling_tpu.utils import state_space as util

    z, x, d, ids, time = adni.get_trajectories()
    zs = util.standardize(z)
    np.random.seed(0)
    mdl = MMLinGaussSS_marginalizable(
        n_clusters=3, states=zs, observations=x, init="k-means", alpha=1.0
    ).train(n_steps=30)
    adni.set_model_correspondence(mdl, d)
    finals = adni.get_final_diagnoses(d)
    rates = [
        np.mean(finals[mdl.cluster_assignment == mdl.inverse_correspondence[s]] == "AD")
        for s in ["A", "B", "C"]
    ]
    assert rates == sorted(rates)


@pytest.fixture()
def synthetic_macc(tmp_path, monkeypatch):
    """Generate a MACC-shaped npz + profiling CSV and point the adapter at
    it (the real data are not shipped — reference README.md:138-140)."""
    rng = np.random.default_rng(0)
    T, n = 3, 40
    z = rng.normal(size=(T, n, 2))
    x = rng.normal(size=(T, n, 4))
    ell = rng.choice([2, 3], size=n)
    for L in np.unique(ell):
        z[L:, ell == L] = np.nan
        x[L:, ell == L] = np.nan
    d = np.empty((T, n, 1), dtype=object)
    for i in range(n):
        path = rng.choice(macc.diagnosis_list, size=ell[i]).tolist()
        d[: ell[i], i, 0] = path
        d[ell[i] :, i, 0] = None
    scores = rng.normal(size=(T, n, 3)) + 25
    ids = np.arange(n).reshape(1, n)
    ages = 70 + np.cumsum(np.ones((T, n)) * 2, axis=0)
    np.savez(
        tmp_path / "macc-trajectories.npz",
        z=z,
        x=x,
        d=d,
        mmse_cdrsum_cdrglobal=scores,
        ell=ell,
        ids=ids,
        ages=ages,
    )
    pd.DataFrame(
        {
            "Harmy_ID": np.arange(n),
            "is_female": rng.integers(0, 2, n),
            "edu_yrs": rng.integers(4, 16, n),
            "apoe4_pos": rng.integers(0, 2, n),
        }
    ).to_csv(tmp_path / "macc-profiling.csv", index=False)
    monkeypatch.setattr(macc, "_DATA_DIR", str(tmp_path))
    return dict(T=T, n=n, ell=ell)


def test_macc_adapter_paths(synthetic_macc):
    assert macc.data_available()
    z, x, d, scores, ell, ids, ages = macc.get_data()
    assert z.shape[-1] == 2 and x.shape[-1] == 4
    finals = macc.get_final_diagnoses(d)
    assert finals.shape == (synthetic_macc["n"],)
    assert set(finals) <= set(macc.diagnosis_list)
    changes = macc.get_annualized_mmse_changes()
    assert changes.shape == (synthetic_macc["n"],)
    assert np.isfinite(changes).all()
    demog = macc.get_demographics(ids)
    assert len(demog) == synthetic_macc["n"]


def test_macc_gates_cleanly_when_absent(tmp_path, monkeypatch):
    monkeypatch.setattr(macc, "_DATA_DIR", str(tmp_path / "nope"))
    assert not macc.data_available()


def test_bitlevel_hash_parity_with_reference():
    """Standardized ADNI bytes hash to the reference's published cache key
    (the hex hardcoded in its MACC transfer driver,
    inference-train-adni-test-macc.py:29)."""
    import hashlib

    from multimodal_trajectory_modeling_tpu.utils import state_space as util

    z, x, d, ids, time = adni.get_trajectories()
    zs = util.standardize(z)
    h = hashlib.md5(
        np.array(np.atleast_3d(zs), dtype=float).tobytes()
        + np.array(np.atleast_3d(x), dtype=float).tobytes()
        + b"3"
        + np.format_float_positional(1.0, unique=True).encode()
    ).hexdigest()
    assert h == "49cb9120d3a1713763a0bdbdb97779bb"
