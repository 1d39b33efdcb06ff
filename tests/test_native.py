"""Native C data-path vs NumPy oracles (and the fallback path)."""

import numpy as np

from multimodal_trajectory_modeling_tpu import native


def _data(seed=0, T=5, n=400, d=3, l=2):
    rng = np.random.default_rng(seed)
    z = rng.normal(size=(T, n, d))
    x = rng.normal(size=(T, n, l))
    lens = rng.integers(1, T + 1, size=n)
    for L in np.unique(lens):
        z[L:, lens == L] = np.nan
        x[L:, lens == L] = np.nan
    z[rng.random(size=z.shape) < 0.02] = np.nan
    return z, x, lens


def test_native_builds():
    assert native.available(), "C toolchain present but native build failed"


def test_pack_joint_matches_numpy():
    z, x, _ = _data()
    T, n, d = z.shape
    l = x.shape[-1]
    want = np.concatenate(
        [
            z.transpose(1, 0, 2).reshape(n, T * d),
            x.transpose(1, 0, 2).reshape(n, T * l),
        ],
        axis=1,
    )
    got = native.pack_joint(z, x)
    np.testing.assert_array_equal(got, want)


def test_pattern_groups_matches_numpy():
    z, x, _ = _data(seed=1)
    v = native.pack_joint(z, x)
    patterns, pid = native.pattern_groups(v)
    finite = np.isfinite(v)
    # reconstruction: every row's mask equals its assigned pattern
    np.testing.assert_array_equal(patterns[pid], finite)
    # same number of distinct patterns as np.unique
    want_p = np.unique(finite, axis=0)
    assert patterns.shape[0] == want_p.shape[0]


def test_pattern_groups_cap_fallback():
    rng = np.random.default_rng(2)
    v = rng.normal(size=(300, 8))
    v[rng.random(size=v.shape) < 0.5] = np.nan  # ~many distinct patterns
    patterns, pid = native.pattern_groups(v, max_patterns=4)
    np.testing.assert_array_equal(patterns[pid], np.isfinite(v))


def test_finite_lengths_matches_reference_semantics():
    z, _, _ = _data(seed=3)
    fin = np.isfinite(z).all(axis=-1)
    want = np.where(fin.all(axis=0), fin.shape[0], np.argmin(fin, axis=0))
    got = native.finite_lengths(z)
    np.testing.assert_array_equal(got, want)


def test_native_pattern_groups_scales():
    rng = np.random.default_rng(4)
    v = rng.normal(size=(200_000, 40))
    lens = rng.choice([10, 20, 40], size=200_000)
    for L in np.unique(lens):
        v[lens == L, L:] = np.nan
    import time

    t0 = time.perf_counter()
    patterns, pid = native.pattern_groups(v)
    dt_native = time.perf_counter() - t0
    assert patterns.shape[0] == 3
    t0 = time.perf_counter()
    np.unique(np.isfinite(v), axis=0, return_inverse=True)
    dt_numpy = time.perf_counter() - t0
    # informative, not strict: native should not be slower than numpy
    print(f"native {dt_native*1e3:.1f}ms vs numpy {dt_numpy*1e3:.1f}ms")
    assert dt_native < dt_numpy * 2
