"""Extended-framework tests, mirroring the reference self-tests
(framework_extended/*.py __main__ blocks)."""

import glob
import os

import numpy as np
import pytest

from multimodal_trajectory_modeling_tpu.models import statespace_api as ssapi
from multimodal_trajectory_modeling_tpu.models.linear_gaussian import (
    StateSpaceLinearGaussian,
)
from multimodal_trajectory_modeling_tpu.models.knn_model import StateSpaceKNN
from multimodal_trajectory_modeling_tpu.models.hybrid import StateSpaceHybrid
from multimodal_trajectory_modeling_tpu.models.ssm_mixture import (
    StateSpaceMixtureModel,
)
from multimodal_trajectory_modeling_tpu.models.classifier import (
    StateSpaceModelClassifier,
)
from multimodal_trajectory_modeling_tpu.ops.knn import (
    KNNRegressor,
    grid_search_knn,
)


@pytest.fixture(scope="module")
def lgdata():
    rng = np.random.default_rng(42)
    n, T, d, l = 800, 10, 5, 3
    A = rng.normal(scale=0.5, size=(d, d))
    G = np.eye(d) / 2.0
    H = rng.normal(size=(d, l))
    L = np.eye(l) / 3.0
    m = rng.normal(size=d)
    S = np.eye(d) / 5.0
    ztr, xtr = ssapi.sample_trajectory(
        n, T, m, S, A, G, H, L, rng=np.random.default_rng(0)
    )
    zte, xte = ssapi.sample_trajectory(
        n, T, m, S, A, G, H, L, rng=np.random.default_rng(1)
    )
    return dict(
        ztr=ztr, xtr=xtr, zte=zte, xte=xte, m=m, S=S, A=A, G=G, H=H, L=L, T=T
    )


def test_knn_regressor_matches_sklearn(lgdata):
    import sklearn.neighbors as skl_neighbors

    rng = np.random.default_rng(0)
    X = rng.normal(size=(300, 4))
    Y = np.sin(X[:, :2]) + 0.05 * rng.normal(size=(300, 2))
    Q = rng.normal(size=(50, 4))
    ours = KNNRegressor(n_neighbors=7).fit(X, Y).predict(Q)
    skl = (
        skl_neighbors.KNeighborsRegressor(n_neighbors=7).fit(X, Y).predict(Q)
    )
    np.testing.assert_allclose(ours, skl, rtol=1e-10, atol=1e-10)


def test_grid_search_matches_sklearn(lgdata):
    import sklearn.model_selection as skl_ms
    import sklearn.neighbors as skl_neighbors

    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 3))
    Y = np.cos(X) @ np.ones((3, 2)) + 0.1 * rng.normal(size=(200, 2))
    grid = [3, 5, 10, 20]
    ours = grid_search_knn(X, Y, grid, n_folds=3)
    skl = skl_ms.GridSearchCV(
        skl_neighbors.KNeighborsRegressor(),
        param_grid={"n_neighbors": grid},
        cv=3,
        scoring="neg_mean_squared_error",
    ).fit(X, Y)
    assert ours == skl.best_params_["n_neighbors"]


def test_lg_component_score_consistency(lgdata):
    d = lgdata
    mdl = StateSpaceLinearGaussian().fit((d["ztr"], d["xtr"]))
    lp = mdl.score((d["zte"], d["xte"]))
    lp_alt = mdl.score_alt((d["zte"], d["xte"]))
    np.testing.assert_allclose(lp, lp_alt, rtol=1e-8, atol=1e-8)
    lp_true = ssapi.full_log_prob(
        d["zte"], d["xte"], d["T"], d["m"], d["S"], d["A"], d["G"], d["H"], d["L"]
    )
    np.testing.assert_allclose(lp, lp_true, rtol=0.02, atol=2.0)


def test_lg_component_nan_training_and_pickle(lgdata):
    d = lgdata
    ztr = d["ztr"].copy()
    xtr = d["xtr"].copy()
    ztr[np.random.default_rng(0).random(size=ztr.shape) < 0.05] = np.nan
    xtr[np.random.default_rng(0).random(size=xtr.shape) < 0.05] = np.nan
    mdl = StateSpaceLinearGaussian().fit((ztr, xtr))
    lp = mdl.score((d["zte"], d["xte"]))
    assert np.isfinite(lp).all()
    back = StateSpaceLinearGaussian().from_pickle(mdl.to_pickle())
    np.testing.assert_allclose(lp, back.score((d["zte"], d["xte"])))


def test_knn_and_hybrid_components(lgdata):
    d = lgdata
    ztr = d["ztr"][:, :300].copy()
    xtr = d["xtr"][:, :300].copy()
    ztr[np.random.default_rng(0).random(size=ztr.shape) < 0.05] = np.nan
    xtr[np.random.default_rng(0).random(size=xtr.shape) < 0.05] = np.nan
    zte, xte = d["zte"][:, :200], d["xte"][:, :200]

    knn = StateSpaceKNN(n_neighbors=[3, 5, 10]).fit((ztr, xtr))
    lp_knn = knn.score((zte, xte))
    assert np.isfinite(lp_knn).all()
    back = StateSpaceKNN(n_neighbors=[3, 5, 10]).from_pickle(knn.to_pickle())
    np.testing.assert_allclose(lp_knn, back.score((zte, xte)))

    hyb = StateSpaceHybrid(n_neighbors=[3, 5, 10]).fit((ztr, xtr))
    lp_hyb = hyb.score((zte, xte))
    assert np.isfinite(lp_hyb).all()
    back = StateSpaceHybrid().from_pickle(hyb.to_pickle())
    np.testing.assert_allclose(lp_hyb, back.score((zte, xte)))


def _two_cluster_data(seed=42, n_data=120, n_timesteps=15):
    rng = np.random.default_rng(seed)
    d_hidden, d_observed, n_clusters = 2, 3, 2
    A = np.stack(
        [rng.normal(scale=0.5, size=(d_hidden, d_hidden)) for _ in range(2)]
    )
    G = np.stack([np.eye(d_hidden) / (c + 2.0) for c in range(2)])
    H = np.stack([rng.normal(size=(d_hidden, d_observed)) for _ in range(2)])
    L = np.stack([(c + 1.0) * np.eye(d_observed) for c in range(2)])
    z = np.empty((n_timesteps, n_data, d_hidden))
    x = np.empty((n_timesteps, n_data, d_observed))
    labels = np.empty(n_data, dtype=int)
    for i in range(n_data):
        c = int(rng.choice(2, p=[0.4, 0.6]))
        labels[i] = c
        zi, xi = ssapi.sample_trajectory(
            1,
            n_timesteps,
            np.zeros(d_hidden),
            G[c],
            A[c],
            G[c],
            H[c],
            L[c],
            rng=rng,
        )
        z[:, i], x[:, i] = zi[:, 0], xi[:, 0]
    return z, x, labels


@pytest.mark.slow
def test_generic_mixture_recovers_clusters(tmp_path, monkeypatch):
    import multimodal_trajectory_modeling_tpu.models.ssm_mixture as ssmm_mod

    monkeypatch.setattr(ssmm_mod, "home_dir", str(tmp_path))
    z, x, labels = _two_cluster_data()
    mdl = StateSpaceMixtureModel(
        n_clusters=2,
        data=(z, x),
        component_model=StateSpaceLinearGaussian,
        component_model_hyperparams={"alpha": 1.0},
    ).fit(n_restarts=5, use_cache=True, verbose=False)
    acc = max(
        np.mean(mdl.cluster_assignment == labels),
        np.mean(mdl.cluster_assignment != labels),
    )
    assert acc > 0.9
    # Highlander: exactly one cache file per hash
    mdl.to_pickle(there_can_only_be_one=False)
    mdl.to_pickle(there_can_only_be_one=True)
    files = glob.glob(os.path.join(str(tmp_path), "tmp", f"mmm-{mdl.hex_hash}*"))
    assert len(files) == 1
    # pickle roundtrip through the cache
    again = StateSpaceMixtureModel(
        n_clusters=2,
        data=(z, x),
        component_model=StateSpaceLinearGaussian,
        component_model_hyperparams={"alpha": 1.0},
    ).fit(use_cache=True)
    np.testing.assert_array_equal(
        again.cluster_assignment, mdl.cluster_assignment
    )


def test_generic_mixture_knn_component(tmp_path, monkeypatch):
    import multimodal_trajectory_modeling_tpu.models.ssm_mixture as ssmm_mod

    monkeypatch.setattr(ssmm_mod, "home_dir", str(tmp_path))
    z, x, labels = _two_cluster_data(seed=3, n_data=100)
    mdl = StateSpaceMixtureModel(
        n_clusters=2,
        data=(z, x),
        component_model=StateSpaceKNN,
        component_model_hyperparams={"n_neighbors": 10},
    ).fit(n_restarts=3, use_cache=False)
    acc = max(
        np.mean(mdl.cluster_assignment == labels),
        np.mean(mdl.cluster_assignment != labels),
    )
    assert acc > 0.8


def test_classifier(lgdata):
    z, x, labels = _two_cluster_data(seed=0, n_data=100)
    clr = StateSpaceModelClassifier(
        component_model=StateSpaceLinearGaussian
    ).fit(data=(z, x), labels=labels)
    assert np.isfinite(clr.score())
    acc = np.mean(clr.predict() == labels)
    assert acc > 0.9
    # half-NaN'ed variant must still train and predict
    z2, x2 = z.copy(), x.copy()
    z2[z.shape[0] // 2 :, 50:] = np.nan
    x2[x.shape[0] // 2 :, 50:] = np.nan
    clr2 = StateSpaceModelClassifier(
        component_model=StateSpaceLinearGaussian
    ).fit(data=(z2, x2), labels=labels)
    acc2 = np.mean(clr2.predict() == labels)
    assert acc2 > 0.8
    probs = clr2.predict_proba()
    assert np.allclose(probs.sum(axis=1), 1.0)


@pytest.mark.slow
def test_parallel_restarts_match_sequential(tmp_path, monkeypatch):
    """n_jobs>1 must reproduce the sequential restart protocol exactly
    (same per-seed models, same strictly-greater winner)."""
    import multimodal_trajectory_modeling_tpu.models.ssm_mixture as ssmm_mod

    monkeypatch.setattr(ssmm_mod, "home_dir", str(tmp_path))
    z, x, labels = _two_cluster_data(seed=9, n_data=80, n_timesteps=10)
    seq = StateSpaceMixtureModel(
        n_clusters=2,
        data=(z, x),
        component_model=StateSpaceLinearGaussian,
        component_model_hyperparams={"alpha": 1.0},
    ).fit(n_restarts=6, use_cache=False, n_jobs=1)
    import warnings as _warnings

    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        par = StateSpaceMixtureModel(
            n_clusters=2,
            data=(z, x),
            component_model=StateSpaceLinearGaussian,
            component_model_hyperparams={"alpha": 1.0},
        ).fit(n_restarts=6, use_cache=False, n_jobs=3)
    # the workers themselves must have completed — sequential replay is a
    # degradation guard, not the expected path
    worker_deaths = [
        w for w in caught if "restart worker exited" in str(w.message)
    ]
    assert not worker_deaths, [str(w.message) for w in worker_deaths]
    np.testing.assert_array_equal(
        seq.cluster_assignment, par.cluster_assignment
    )
    np.testing.assert_allclose(seq.score(), par.score(), rtol=1e-12)
