"""Streaming-kNN parity battery.

The streaming kernel (``ops/knn.py:knn_predict_streaming``) is the at-scale
E-step path for the kNN measurement component (reference
framework_extended/state_space_model_knn.py:61-97 materializes the full
(B, m) distance matrix via sklearn); these tests lock in bit-parity with
the dense kernel — including tie behavior, which rests on observed
``lax.top_k`` ordering rather than a formal contract.
"""

import numpy as np
import pytest

from multimodal_trajectory_modeling_tpu.ops import knn as knn_mod
from multimodal_trajectory_modeling_tpu.ops.knn import (
    KNNRegressor,
    grid_search_knn,
    knn_predict,
    knn_predict_streaming,
)


def _rand_problem(rng, m, n, dim, ydim):
    X = rng.normal(size=(m, dim))
    Y = rng.normal(size=(m, ydim))
    Q = rng.normal(size=(n, dim))
    return X, Y, Q


@pytest.mark.parametrize(
    "m,n,dim,k,qc,tc",
    [
        (100, 37, 4, 5, 16, 32),     # non-multiple chunks both axes
        (257, 50, 3, 7, 64, 100),    # ragged train blocks
        (64, 8, 2, 1, 8, 16),        # k = 1
        (20, 10, 3, 20, 4, 8),       # k = m
        (20, 10, 3, 50, 4, 8),       # k > m (clamped)
        (96, 33, 5, 12, 16, 8),      # train_chunk < k
        (8, 5, 2, 5, 4, 2),          # tiny blocks, train_chunk < k
    ],
)
def test_streaming_matches_dense_random(m, n, dim, k, qc, tc):
    rng = np.random.default_rng(m * 1000 + n)
    X, Y, Q = _rand_problem(rng, m, n, dim, 2)
    dense = np.asarray(knn_predict(X, Y, Q, k=min(k, m)))
    stream = np.asarray(
        knn_predict_streaming(X, Y, Q, k=k, query_chunk=qc, train_chunk=tc)
    )
    np.testing.assert_array_equal(stream, dense)


def test_streaming_ties_duplicated_rows():
    # duplicated train rows => exactly-equal distances; streaming must pick
    # the same (lower-index) winners as the dense kernel so the predicted
    # means are bit-equal even when Y differs across duplicates
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 3))
    X = np.concatenate([base, base, base])  # 3x duplicates
    Y = rng.normal(size=(60, 2))  # distinct targets per duplicate
    Q = base + 0.0  # queries land exactly on train points
    for k in (1, 3, 7):
        dense = np.asarray(knn_predict(X, Y, Q, k=k))
        stream = np.asarray(
            knn_predict_streaming(X, Y, Q, k=k, query_chunk=8, train_chunk=16)
        )
        np.testing.assert_array_equal(stream, dense)
        # and both agree with the host oracle's *mean over any k nearest*
        # when targets are tie-symmetric
    # sanity: with tie-symmetric targets all three paths agree in value
    Ysym = np.tile(rng.normal(size=(20, 2)), (3, 1))
    dense = np.asarray(knn_predict(X, Ysym, Q, k=4))
    stream = np.asarray(
        knn_predict_streaming(X, Ysym, Q, k=4, query_chunk=8, train_chunk=16)
    )
    host = knn_mod._knn_predict_np(X, Ysym, Q, 4)
    np.testing.assert_allclose(stream, dense, rtol=0, atol=0)
    np.testing.assert_allclose(dense, host, rtol=1e-10, atol=1e-10)


def test_streaming_matches_sklearn():
    import sklearn.neighbors as skl_neighbors

    rng = np.random.default_rng(3)
    X, Y, Q = _rand_problem(rng, 500, 40, 4, 2)
    ours = np.asarray(
        knn_predict_streaming(X, Y, Q, k=9, query_chunk=16, train_chunk=64)
    )
    skl = skl_neighbors.KNeighborsRegressor(n_neighbors=9).fit(X, Y).predict(Q)
    np.testing.assert_allclose(ours, skl, rtol=1e-9, atol=1e-9)


def test_regressor_routes_streaming_past_threshold(monkeypatch):
    # force both thresholds tiny so the class path exercises the streaming
    # kernel, and check it still equals the host oracle
    monkeypatch.setattr(knn_mod, "_DEVICE_WORK_THRESHOLD", 1)
    monkeypatch.setattr(knn_mod, "_STREAM_TRAIN_THRESHOLD", 50)
    rng = np.random.default_rng(11)
    X, Y, Q = _rand_problem(rng, 120, 30, 3, 2)
    out = KNNRegressor(n_neighbors=6).fit(X, Y).predict(Q)
    np.testing.assert_allclose(
        out, knn_mod._knn_predict_np(X, Y, Q, 6), rtol=1e-9, atol=1e-9
    )


def test_grid_search_routes_streaming_past_threshold(monkeypatch):
    monkeypatch.setattr(knn_mod, "_DEVICE_WORK_THRESHOLD", 1)
    monkeypatch.setattr(knn_mod, "_STREAM_TRAIN_THRESHOLD", 50)
    rng = np.random.default_rng(13)
    X, Y, _ = _rand_problem(rng, 150, 1, 3, 2)
    grid = [3, 5, 9]
    routed = grid_search_knn(X, Y, grid, n_folds=3)
    monkeypatch.setattr(knn_mod, "_DEVICE_WORK_THRESHOLD", 10**18)
    host = grid_search_knn(X, Y, grid, n_folds=3)
    assert routed == host
