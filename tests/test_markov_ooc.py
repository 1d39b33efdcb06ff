"""Out-of-core (host-resident Φ) Markov EM trainer.

`em.train_em_markov_outofcore` streams per-chunk feature blocks through
the same from-features kernel as the in-core trainer and accumulates the
M sufficient statistics across chunks — assignments, iteration counts
and status codes must match the in-core `em.train_em_markov` exactly;
trained parameters match to cross-chunk reassociation noise (f64).
Reference protocol: marginalizable_mixture_model.py:1310-1366.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_trajectory_modeling_tpu.models import em

from test_ops_markov import _mixture


def _setup(seed, C, T, n, d, l):
    z, x, lens, params_t = _mixture(seed, C=C, T=T, n=n, d=d, l=l)
    m, S, A, G, H, L = params_t
    params0 = em.MixtureParams(
        pi=jnp.ones(C) / C, m=m, S=S, A=A, G=G, H=H, L=L
    )
    rng = np.random.default_rng(seed + 1)
    assign0 = jnp.asarray(rng.integers(0, C, size=n), jnp.int32)
    return z, x, lens, params0, assign0


def _assert_matches(incore, ooc, rtol=1e-9):
    p0, a0, it0, st0 = incore
    p1, a1, it1, st1 = ooc
    assert (int(it0), int(st0)) == (int(it1), int(st1))
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(a1))
    for leaf0, leaf1 in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(
            np.asarray(leaf1), np.asarray(leaf0), rtol=rtol, atol=1e-12
        )


def test_ooc_matches_incore_multiple_chunkings():
    """Ragged 3-chunk and single-chunk streaming both reproduce the
    in-core trainer's trajectory (f64: exact assignments/iters/status,
    params to summation-order noise)."""
    C, T, n, d, l = 3, 6, 400, 2, 3
    z, x, lens, params0, assign0 = _setup(77, C, T, n, d, l)
    incore = em.train_em_markov(params0, assign0, z, x, lens, n_steps=20)
    assert int(incore[2]) > 1  # the comparison must exercise real EM steps
    for chunk in (n, 150):  # single chunk; 3 ragged chunks (150/150/100)
        ooc = em.train_em_markov_outofcore(
            params0,
            assign0,
            np.asarray(z),
            np.asarray(x),
            np.asarray(lens),
            n_steps=20,
            chunk_cols=chunk,
        )
        _assert_matches(incore, ooc)


def test_ooc_init_abort():
    """A near-empty initial assignment aborts before training, exactly
    like the in-core trainer (reference :1328-1336)."""
    C, T, n, d, l = 3, 6, 120, 2, 3
    z, x, lens, params0, assign0 = _setup(78, C, T, n, d, l)
    bad0 = np.zeros(n, np.int32)
    bad0[:2] = 1
    bad0[2:4] = 2
    incore = em.train_em_markov(
        params0, jnp.asarray(bad0), z, x, lens, n_steps=20
    )
    ooc = em.train_em_markov_outofcore(
        params0,
        bad0,
        np.asarray(z),
        np.asarray(x),
        np.asarray(lens),
        n_steps=20,
        chunk_cols=50,
    )
    assert int(incore[3]) == em.STATUS_INIT_ABORT
    _assert_matches(incore, ooc)


def test_ooc_long_T_canonical_layout():
    """Past the packed gate the streamed chunks carry the canonical
    grid-materialized layout; the trajectory still matches in-core."""
    C, T, n, d, l = 2, 70, 90, 3, 4  # T(d+l) = 490 > packed gate
    assert not em.markov_packed_ok(T, d, l)
    z, x, lens, params0, assign0 = _setup(79, C, T, n, d, l)
    incore = em.train_em_markov(params0, assign0, z, x, lens, n_steps=12)
    ooc = em.train_em_markov_outofcore(
        params0,
        assign0,
        np.asarray(z),
        np.asarray(x),
        np.asarray(lens),
        n_steps=12,
        chunk_cols=40,
    )
    _assert_matches(incore, ooc)


def test_mixture_train_fast_ooc_route(monkeypatch):
    """MTM_MARKOV_OOC=1 routes train(fast=True) through the streamed
    trainer — same fit as the in-core fast path (f64), with the
    last_trained stamp applied; interior missingness falls through to
    the normal fast routes untouched."""
    from multimodal_trajectory_modeling_tpu.models import (
        MMLinGaussSS_marginalizable,
    )

    rng = np.random.default_rng(5)
    T, n, d, l = 6, 300, 2, 3
    z = rng.normal(size=(T, n, d))
    x = rng.normal(size=(T, n, l))
    lens = rng.integers(2, T + 1, size=n)
    tmask = np.arange(T)[:, None] < lens[None, :]
    z[~tmask] = np.nan
    x[~tmask] = np.nan

    a = MMLinGaussSS_marginalizable(
        n_clusters=2, states=z, observations=x, random_seed=5, init="random"
    ).train(n_steps=30, fast=True)
    monkeypatch.setenv("MTM_MARKOV_OOC", "1")
    monkeypatch.setenv("MTM_MARKOV_OOC_CHUNK", "100")
    b = MMLinGaussSS_marginalizable(
        n_clusters=2, states=z, observations=x, random_seed=5, init="random"
    ).train(n_steps=30, fast=True)
    np.testing.assert_array_equal(a.cluster_assignment, b.cluster_assignment)
    np.testing.assert_allclose(
        np.asarray(a.transition_matrices),
        np.asarray(b.transition_matrices),
        rtol=1e-9,
        atol=1e-12,
    )
    assert b.last_trained is not None

    # interior missingness: the OOC gate returns None and train() falls
    # through to the in-core fast routes
    z2 = z.copy()
    z2[1, :10, 0] = np.nan  # partially-observed step → not pure suffix
    c_env = MMLinGaussSS_marginalizable(
        n_clusters=2, states=z2, observations=x, random_seed=5, init="random"
    ).train(n_steps=30, fast=True)
    monkeypatch.delenv("MTM_MARKOV_OOC")
    c_ref = MMLinGaussSS_marginalizable(
        n_clusters=2, states=z2, observations=x, random_seed=5, init="random"
    ).train(n_steps=30, fast=True)
    np.testing.assert_array_equal(
        c_env.cluster_assignment, c_ref.cluster_assignment
    )


def test_ooc_step_cap():
    """n_steps caps the loop with STATUS_RUNNING, like in-core."""
    C, T, n, d, l = 3, 6, 400, 2, 3
    z, x, lens, params0, assign0 = _setup(77, C, T, n, d, l)
    incore = em.train_em_markov(params0, assign0, z, x, lens, n_steps=2)
    ooc = em.train_em_markov_outofcore(
        params0,
        assign0,
        np.asarray(z),
        np.asarray(x),
        np.asarray(lens),
        n_steps=2,
        chunk_cols=150,
    )
    assert int(incore[3]) == em.STATUS_RUNNING and int(incore[2]) == 2
    _assert_matches(incore, ooc)
