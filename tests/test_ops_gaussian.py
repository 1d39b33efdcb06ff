"""Parity tests for the masked Gaussian log-pdf kernels vs scipy.

Mirrors the reference's marginalization self-tests
(marginalizable_state_space_model.py:1026-1135)."""

import numpy as np
import scipy.stats as sp_stats
import jax
import jax.numpy as jnp

from multimodal_trajectory_modeling_tpu import ops


def _scipy_masked_logpdf(x, mean, cov):
    """Per-row masked-submatrix oracle (reference
    marginalizable_gaussian_log_prob, statespace:908-943)."""
    x = np.atleast_2d(x)
    out = np.zeros(x.shape[0])
    for i, row in enumerate(x):
        idx = np.isfinite(row)
        if idx.sum() == 0:
            out[i] = 0.0
            continue
        out[i] = sp_stats.multivariate_normal(
            mean=mean[idx], cov=cov[np.ix_(idx, idx)], allow_singular=True
        ).logpdf(row[idx])
    return out


def _case(rng, n=200, D=7):
    X = rng.normal(size=(D, D))
    cov = X @ X.T / D + np.eye(D)
    mean = rng.normal(size=(D,))
    x = rng.multivariate_normal(mean, cov, size=n)
    return x, mean, cov


def test_dense_matches_scipy():
    rng = np.random.default_rng(0)
    x, mean, cov = _case(rng)
    want = sp_stats.multivariate_normal(mean=mean, cov=cov).logpdf(x)
    for method in ("lu", "cholesky"):
        got = np.asarray(
            ops.masked_mvn_logpdf(
                jnp.asarray(x), jnp.asarray(mean), jnp.asarray(cov), method=method
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)
    got_fast = np.asarray(
        ops.mvn_logpdf(jnp.asarray(x), jnp.asarray(mean), jnp.asarray(cov))
    )
    np.testing.assert_allclose(got_fast, want, rtol=1e-10, atol=1e-10)


def test_masked_matches_scipy_submatrix():
    rng = np.random.default_rng(1)
    x, mean, cov = _case(rng)
    x[rng.random(size=x.shape) < 0.25] = np.nan
    x[0] = np.nan  # fully-missing row → logpdf 0 (0-dim Gaussian)
    want = _scipy_masked_logpdf(x, mean, cov)
    for method in ("lu", "cholesky"):
        got = np.asarray(
            ops.masked_mvn_logpdf(
                jnp.asarray(x), jnp.asarray(mean), jnp.asarray(cov), method=method
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)
    assert got[0] == 0.0


def test_grouped_matches_general():
    rng = np.random.default_rng(2)
    x, mean, cov = _case(rng, n=500)
    # structured missingness: a few repeated patterns, like NaN padding
    for i in range(0, 500, 3):
        x[i, 4:] = np.nan
    for i in range(0, 500, 7):
        x[i, :2] = np.nan
    patterns, pid = ops.pattern_groups(x)
    want = _scipy_masked_logpdf(x, mean, cov)
    for method in ("solve", "inverse"):
        got = np.asarray(
            ops.masked_mvn_logpdf_grouped(
                jnp.asarray(x),
                jnp.asarray(mean),
                jnp.asarray(cov),
                jnp.asarray(patterns),
                jnp.asarray(pid),
                method=method,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_nan_column_invariance():
    """Appending all-NaN columns must not change log-densities
    (reference statespace:1111-1135)."""
    rng = np.random.default_rng(3)
    w2 = rng.normal(size=(10, 2))
    w4 = np.column_stack([w2, np.full((10, 2), np.nan)])
    lp2 = np.asarray(
        ops.masked_mvn_logpdf(jnp.asarray(w2), jnp.zeros(2), jnp.eye(2))
    )
    lp4 = np.asarray(
        ops.masked_mvn_logpdf(jnp.asarray(w4), jnp.zeros(4), jnp.eye(4))
    )
    np.testing.assert_allclose(lp2, lp4, rtol=1e-12)


def test_full_logprob_equals_composite_factorization():
    """Analytic joint log-prob (mm/CC + dense logpdf) equals the generative
    factorization (reference statespace:993-1003)."""
    import jax

    rng = np.random.default_rng(4)
    d, l, T, n = 3, 2, 5, 50
    A = rng.normal(scale=0.5, size=(d, d))
    G = np.eye(d) / 2.0
    H = rng.normal(size=(d, l))
    L = np.eye(l) / 3.0
    m = rng.normal(size=(d,))
    S = np.eye(d) / 5.0
    z, x = ops.sample_trajectories(
        jax.random.PRNGKey(1), n, T, *map(jnp.asarray, (m, S, A, G, H, L))
    )
    z, x = np.asarray(z), np.asarray(x)
    v = np.concatenate(
        [z.transpose(1, 0, 2).reshape(n, -1), x.transpose(1, 0, 2).reshape(n, -1)],
        axis=1,
    )
    mean = np.asarray(ops.joint_mean(T, *map(jnp.asarray, (m, A, H))))
    cov = np.asarray(ops.joint_cov(T, *map(jnp.asarray, (S, A, G, H, L))))
    analytic = np.asarray(ops.mvn_logpdf(jnp.asarray(v), jnp.asarray(mean), jnp.asarray(cov)))

    composite = sp_stats.multivariate_normal(mean=m, cov=S).logpdf(z[0])
    for t in range(T - 1):
        composite += sp_stats.multivariate_normal(cov=G).logpdf(z[t + 1] - z[t] @ A)
    for t in range(T):
        composite += sp_stats.multivariate_normal(cov=L).logpdf(x[t] - z[t] @ H)
    np.testing.assert_allclose(analytic, composite, rtol=1e-8, atol=1e-8)


def test_bucketed_matches_general_unstructured_missingness():
    """Unstructured missingness (P ≈ 200 distinct patterns): the bucketed
    path and the auto dispatch must agree with the per-row oracle."""
    rng = np.random.default_rng(5)
    x, mean, cov = _case(rng, n=2000, D=32)
    D = x.shape[1]
    # ~200 random masks, each dropping a random subset of coordinates
    masks = rng.uniform(size=(200, D)) < rng.uniform(0.1, 0.6, size=(200, 1))
    which = rng.integers(0, len(masks), size=len(x))
    x[masks[which]] = np.nan
    patterns, pid = ops.pattern_groups(x)
    assert len(patterns) > 150  # genuinely unstructured
    want = _scipy_masked_logpdf(x, mean, cov)
    for method in ("bucketed", "auto"):
        got = np.asarray(
            ops.masked_mvn_logpdf_grouped(
                jnp.asarray(x),
                jnp.asarray(mean),
                jnp.asarray(cov),
                jnp.asarray(patterns),
                jnp.asarray(pid),
                method=method,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_bucketed_work_does_not_scale_with_patterns():
    """The bucketed path's per-row flop count must be independent of P:
    count HLO flops via XLA's cost analysis at P=8 vs P=256 and require the
    P=256 cost to stay far below the n·P·D² of the solve path."""
    rng = np.random.default_rng(6)
    n = 4096
    x, mean, cov = _case(rng, n=n, D=32)
    D = x.shape[1]

    def compiled_flops(P, method):
        masks = np.zeros((P, D), dtype=bool)
        masks[:, : D // 2] = rng.uniform(size=(P, D // 2)) < 0.5
        masks[0] = False
        patterns = np.unique(masks, axis=0)
        pid = rng.integers(0, len(patterns), size=n).astype(np.int32)
        fn = jax.jit(
            lambda xv: ops.masked_mvn_logpdf_grouped(
                xv,
                jnp.asarray(mean),
                jnp.asarray(cov),
                jnp.asarray(patterns),
                jnp.asarray(pid),
                method=method,
            )
        )
        comp = fn.lower(jnp.asarray(x)).compile()
        stats = comp.cost_analysis()
        if isinstance(stats, list):
            stats = stats[0]
        return float(stats.get("flops", 0.0)), len(patterns)

    f_small, p_small = compiled_flops(8, "bucketed")
    f_big, p_big = compiled_flops(256, "bucketed")
    f_solve, _ = compiled_flops(256, "solve")
    assert p_big > 8 * p_small
    # bucketed: per-row work flat in P (only the P·D³ factor stage grows)
    assert f_big < 3.0 * f_small + 2.0 * p_big * D**3
    # and far below the solve path's n·P·D² blow-up
    assert f_big < 0.25 * f_solve
