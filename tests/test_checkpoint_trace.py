"""Tests for mid-training checkpoint/resume and the EM trace recorder."""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_trajectory_modeling_tpu import ops
from multimodal_trajectory_modeling_tpu.models import em
from multimodal_trajectory_modeling_tpu.utils.checkpoint import (
    EMCheckpointer,
    train_em_checkpointed,
)


def _problem(seed=0, n=300, T=6, d=2, l=3, C=2):
    rng = np.random.default_rng(seed)
    z = np.zeros((T, n, d))
    x = np.zeros((T, n, l))
    labels = rng.integers(0, C, size=n)
    for c in range(C):
        idx = labels == c
        zc, xc = ops.sample_trajectories(
            jax.random.PRNGKey(c),
            int(idx.sum()),
            T,
            jnp.asarray(rng.normal(size=d) * 2),
            jnp.eye(d) / 4,
            jnp.asarray(rng.normal(scale=0.4, size=(d, d))),
            jnp.eye(d) / 2,
            jnp.asarray(rng.normal(size=(d, l))),
            jnp.eye(l) / 3,
        )
        z[:, idx], x[:, idx] = np.asarray(zc), np.asarray(xc)
    v = np.asarray(em.pack_joint(jnp.asarray(z), jnp.asarray(x)))
    patterns, pid = ops.pattern_groups(v)
    params0 = em.MixtureParams(
        pi=jnp.ones(C) / C,
        m=jnp.asarray(rng.normal(size=(C, d))),
        S=jnp.asarray(np.stack([np.eye(d)] * C)),
        A=jnp.asarray(rng.normal(size=(C, d, d))),
        G=jnp.asarray(np.stack([np.eye(d)] * C)),
        H=jnp.asarray(rng.normal(size=(C, d, l))),
        L=jnp.asarray(np.stack([np.eye(l)] * C)),
    )
    assign0 = jnp.asarray(rng.integers(0, C, size=n))
    return (
        params0,
        assign0,
        jnp.asarray(z),
        jnp.asarray(x),
        jnp.asarray(v),
        jnp.asarray(patterns),
        jnp.asarray(pid),
    )


def test_checkpointed_training_matches_uninterrupted(tmp_path):
    args = _problem()
    ref_params, ref_assign, ref_iters, ref_status = em.train_em(
        *args, n_steps=100
    )

    ckpt = EMCheckpointer(str(tmp_path / "ckpt"))
    params, assign, done, status = train_em_checkpointed(
        *args, checkpointer=ckpt, n_steps=100, every=2
    )
    assert status == int(ref_status)
    np.testing.assert_array_equal(np.asarray(assign), np.asarray(ref_assign))
    np.testing.assert_allclose(
        np.asarray(params.A), np.asarray(ref_params.A), rtol=1e-12
    )
    assert ckpt.latest_step() is not None

    # resume from the stored checkpoint: already converged → no extra work
    params2, assign2, done2, status2 = train_em_checkpointed(
        *args, checkpointer=ckpt, n_steps=100, every=2, resume=True
    )
    np.testing.assert_array_equal(np.asarray(assign2), np.asarray(assign))


def test_verbose_train_records_trace(capsys):
    from multimodal_trajectory_modeling_tpu.models import (
        MMLinGaussSS_marginalizable,
    )

    _, _, z, x, *_ = _problem(seed=3)
    np.random.seed(0)
    mdl = MMLinGaussSS_marginalizable(
        n_clusters=2,
        states=np.asarray(z),
        observations=np.asarray(x),
        init="kmeans",
    ).train(verbose=True, n_steps=50)
    out = capsys.readouterr().out
    assert "Optimisation completed" in out or "near-empty" in out
    assert len(mdl.last_trace) >= 1
    df = mdl.last_trace.to_dataframe()
    assert {"iteration", "objective", "n_switches", "seconds"} <= set(
        df.columns
    )
    # EM objective is monotone over the recorded trace
    qs = df.objective.to_numpy()
    assert np.all(np.diff(qs) >= -1e-6)
