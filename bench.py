"""Headline benchmark: hard-EM iteration throughput on 1M synthetic
trajectories (T=10, d=5, l=3, n_clusters=16) — the BASELINE.json north-star
configuration — on whatever accelerator is attached (one TPU chip under the
driver).

Baseline: a faithful NumPy re-creation of the reference's per-instance hot
loop (numba guvectorize ``multivariate_normal_log_likelihood`` +
per-cluster M-step regressions, marginalizable_state_space_model.py:728-773
and marginalizable_mixture_model.py:1235-1308) timed on a subsample and
scaled linearly to the full batch — the reference computes every (cluster,
instance) masked det/solve independently, so its cost is linear in n.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_trajectory_modeling_tpu import config as mtm_config

mtm_config.enable_persistent_compilation_cache()

import os as _os

N_FULL = int(_os.environ.get("MTM_BENCH_N", 1_000_000))
T, D_H, D_O, C = 10, 5, 3, 16
N_BASE = 500  # subsample for the NumPy baseline timing
BENCH_ITERS = 200


_LENGTHS = (T // 2, T - 2, T)


def _make_data(n, layout="tp"):
    """Generate, NaN-pad and pack the batch entirely on-device — no
    million-row host↔device round trips.  The missingness patterns are the
    3 trajectory lengths, so ``patterns``/``pattern_id`` are constructed
    analytically instead of via a host-side unique().

    ``layout="tp"`` (the single-chip headline) returns the iteration
    -invariant transposed ``(T·dim, n)`` batch the fused kernel reads —
    the intermediate ``(T, n, dim)`` tensors are freed inside the build
    jit, which is what lets the n=1e7 capacity run fit one 16 GB chip.
    ``layout="tnd"`` returns the ``(T, n, dim)`` tensors for the
    shard_map multichip path.  Either way the joint-packed ``v`` rows
    and the ``(T, ·, dim)`` slices for the NumPy baseline cover only the
    ``N_BASE``-row subsample (a full v is 32 GB of dead HBM at n=1e7)."""
    from multimodal_trajectory_modeling_tpu import ops
    from multimodal_trajectory_modeling_tpu.models import em

    rng = np.random.default_rng(0)
    A = rng.normal(scale=0.4, size=(D_H, D_H))
    H = rng.normal(size=(D_H, D_O))
    m = rng.normal(size=D_H)

    lens = rng.choice(_LENGTHS, size=n, p=[0.3, 0.3, 0.4])
    pid = np.searchsorted(np.asarray(_LENGTHS), lens).astype(np.int32)
    patterns = np.stack(
        [
            np.concatenate(
                [
                    np.repeat(np.arange(T) < Ln, D_H),
                    np.repeat(np.arange(T) < Ln, D_O),
                ]
            )
            for Ln in _LENGTHS
        ]
    )

    @functools.partial(jax.jit, static_argnames=("n", "layout"))
    def build(key, lens_dev, n, layout):
        z, x = ops.sample_trajectories(
            key,
            n,
            T,
            jnp.asarray(m, jnp.float32),
            jnp.eye(D_H, dtype=jnp.float32) / 5,
            jnp.asarray(A, jnp.float32),
            jnp.eye(D_H, dtype=jnp.float32) / 2,
            jnp.asarray(H, jnp.float32),
            jnp.eye(D_O, dtype=jnp.float32) / 3,
        )
        tmask = (
            jnp.arange(T)[:, None] < lens_dev[None, :]
        )  # (T, n) valid steps
        z = jnp.where(tmask[:, :, None], z, jnp.nan)
        x = jnp.where(tmask[:, :, None], x, jnp.nan)
        z_base, x_base = z[:, :N_BASE], x[:, :N_BASE]
        v_base = em.pack_joint(z_base, x_base)
        if layout == "tnd":
            return z, x, z_base, x_base, v_base
        ztp = jnp.transpose(z, (0, 2, 1)).reshape(T * D_H, n)
        xtp = jnp.transpose(x, (0, 2, 1)).reshape(T * D_O, n)
        return ztp, xtp, z_base, x_base, v_base

    b0, b1, z_base, x_base, v_base = build(
        jax.random.PRNGKey(0), jnp.asarray(lens), n, layout
    )
    return (
        b0,
        b1,
        np.asarray(z_base),
        np.asarray(x_base),
        np.asarray(v_base),
        jnp.asarray(patterns),
        jnp.asarray(pid),
    )


def _params(rng, dtype=jnp.float32):
    from multimodal_trajectory_modeling_tpu.models import em

    return em.MixtureParams(
        pi=jnp.ones(C, dtype) / C,
        m=jnp.asarray(rng.normal(size=(C, D_H)), dtype),
        S=jnp.asarray(np.stack([np.eye(D_H)] * C), dtype),
        A=jnp.asarray(rng.normal(scale=0.4, size=(C, D_H, D_H)), dtype),
        G=jnp.asarray(np.stack([np.eye(D_H)] * C), dtype),
        H=jnp.asarray(rng.normal(size=(C, D_H, D_O)), dtype),
        L=jnp.asarray(np.stack([np.eye(D_O)] * C), dtype),
    )


def bench_tpu(ztp, xtp, patterns, pid):
    """Time BENCH_ITERS fused EM iterations (E + M, no convergence exit)
    under one jit, steady-state.  Takes the transposed ``(T·dim, n)``
    batch from ``_make_data(layout="tp")``."""
    from multimodal_trajectory_modeling_tpu.models import em

    rng = np.random.default_rng(1)
    params0 = _params(rng)

    # NOTES: (a) the batch must be passed as arguments — closing over large
    # device arrays embeds them as HLO constants and blows up the compile
    # payload (observed: HTTP 413 from the remote compile service at n=1e6);
    # (b) the whole BENCH_ITERS loop runs as ONE dispatched fori_loop —
    # exactly like the production `train_em_markov` while_loop — which
    # compiles in ~2 s with the packed kernel and removes the per-step
    # host-dispatch jitter (measured +3-4% over host-chained steps; an
    # earlier ">15 min remote compile" pathology predated the packed
    # kernel and no longer reproduces).
    # The benchmark batch has suffix-only missingness (three trajectory
    # lengths), so the production path is the fused O(T) Markov EM kernel:
    # ONE kernel pass per iteration builds the per-row chain-rule features
    # and computes the E assignment AND the per-cluster M sufficient
    # statistics from a single read of the batch (ops/pallas_markov.py;
    # f64-identical to the dense-joint reference semantics, tested).
    # Iteration-invariant transposed copies are hoisted out of the loop.
    plens = np.asarray(patterns[:, : T * D_H]).reshape(-1, T, D_H)
    plens = plens.all(-1).sum(-1)
    lens = jnp.asarray(plens[np.asarray(pid)].astype(np.int32))
    # packed batch for the shift-product kernel — iteration-invariant,
    # built once (re-packing per step would re-read the whole batch)
    u = jax.jit(functools.partial(em.pack_markov_batch, T=T, d=D_H, l=D_O))(
        ztp, xtp
    )
    # materialized per-instance feature matrix Φ — ALSO iteration
    # -invariant (the shift-product feature build is parameter
    # -independent), so the production loop builds it once (~1.75 ms
    # device-side, ≈1.3 iterations' worth) and every EM iteration is a
    # Φ-reading GEMM kernel (markov_em_from_features, HBM-bound) instead
    # of a VPU-bound shift-product rebuild — same routing as
    # train_em_markov's default precompute=True
    phi = jax.jit(
        functools.partial(em.pack_markov_features, T=T, d=D_H, l=D_O)
    )(u, lens)
    # production default for f32 batches: Φ stored int16-quantized with
    # per-feature scales (PhiQuant — halves the per-iteration HBM
    # stream; scales folded exactly into the GEMM weights), matching
    # train_em_markov's MTM_MARKOV_PHI routing
    store = em._resolve_phi_store(jnp.float32)
    if isinstance(store, str) and store == "i16":
        from multimodal_trajectory_modeling_tpu.ops import pallas_markov

        phi = pallas_markov.quantize_phi(phi)
    elif store is not None:
        phi = jax.jit(lambda p: p.astype(store))(phi)
    # u is dead once Φ exists (the Φ-route iteration reads only Φ), but
    # unlike train_em_markov's single-jit liveness a Python ref here
    # keeps its 3.2 GB/1e6-rows buffer resident — drop it so the
    # n=1e7 capacity run fits in one chip's 16 GB
    jax.block_until_ready(phi)
    del u

    @jax.jit
    def run_iters(params, assign, ztp, xtp, lens, phi):
        def body(_i, st):
            p, a = st
            # reg_mode="chol": eps-ridged normal equations via Cholesky
            # (the reference's own util.regress semantics,
            # util_state_space.py:33-61) — measured ~10% faster per
            # iteration than the eigh-pinv "lstsq" M-solve (the
            # mixture-core np.linalg.lstsq semantics); the E step and
            # sufficient statistics are identical either way
            p2, a2, _c, _w = em.emstep_markov(
                p, ztp, xtp, lens, a, T=T, phi=phi, reg_mode="chol",
                interpret=False
            )
            return (p2, a2)

        return jax.lax.fori_loop(
            0, BENCH_ITERS, body, (params, assign)
        )

    assign = jnp.zeros((ztp.shape[1],), jnp.int32)
    params, assign = run_iters(params0, assign, ztp, xtp, lens, phi)
    float(params.A[0, 0, 0])  # compile + warm; host pull = hard sync
    # (block_until_ready returns early on this remote backend — a device→
    # host scalar copy is the only reliable completion barrier)
    t0 = time.perf_counter()
    params, assign = run_iters(params, assign, ztp, xtp, lens, phi)
    a00 = float(params.A[0, 0, 0])
    dt = time.perf_counter() - t0
    assert np.isfinite(a00), "EM produced non-finite params"
    return BENCH_ITERS / dt


def bench_tpu_multichip(z, x, patterns, pid):
    """Data-parallel headline over every attached chip: the full while
    -loop Markov EM over ``shard_map`` on a 1-D data mesh (one (F, C)
    psum + one scalar psum per iteration).  Enabled with
    ``MTM_BENCH_MULTICHIP=1`` when >1 device is present — the driver's
    single-chip environment keeps the host-chained path as the headline."""
    import os as _os

    from multimodal_trajectory_modeling_tpu.models import em
    from multimodal_trajectory_modeling_tpu.parallel import sharded_em

    devs = jax.devices()
    mesh = jax.sharding.Mesh(np.array(devs), ("data",))
    rng = np.random.default_rng(1)
    params0 = _params(rng)
    plens = np.asarray(patterns[:, : T * D_H]).reshape(-1, T, D_H)
    plens = plens.all(-1).sum(-1)
    lens = jnp.asarray(plens[np.asarray(pid)].astype(np.int32))
    # random init so no cluster starts nearly-empty (the all-zeros init
    # the chained path uses would trip the init-abort guard here)
    assign0 = jnp.asarray(
        rng.integers(0, C, size=z.shape[1]).astype(np.int32)
    )
    n_steps = int(_os.environ.get("MTM_BENCH_MC_STEPS", "50"))
    t0 = time.perf_counter()
    params, _a, iters, _status = sharded_em.train_em_markov_shardmap(
        params0, assign0, z, x, lens, mesh=mesh, n_steps=n_steps
    )
    float(params.A[0, 0, 0])
    dt = time.perf_counter() - t0
    return int(iters) / dt, len(devs)


def bench_numpy_reference(z, x, v):
    """Reference-semantics EM iteration on a subsample: per-(cluster,
    instance) masked det/solve E-step + per-cluster lstsq M-step."""
    rng = np.random.default_rng(1)
    means = [rng.normal(size=v.shape[1]) for _ in range(C)]
    Xc = rng.normal(size=(v.shape[1], v.shape[1]))
    cov = Xc @ Xc.T / v.shape[1] + np.eye(v.shape[1])

    n = v.shape[0]
    t0 = time.perf_counter()
    ll = np.zeros((C, n))
    for c in range(C):
        for i in range(n):
            row = v[i]
            idx = np.flatnonzero(np.isfinite(row))
            sub = cov[np.ix_(idx, idx)]
            m = row[idx] - means[c][idx]
            ll[c, i] = -0.5 * (
                np.log((2 * np.pi) ** idx.size * np.linalg.det(sub))
                + m @ np.linalg.solve(sub, m)
            )
    assign = np.argmax(ll, axis=0)
    for c in range(C):
        sel = assign == c
        if sel.sum() < 4:
            continue
        Zp = np.vstack(list(z[:-1, sel]))
        Zn = np.vstack(list(z[1:, sel]))
        keep = np.isfinite(np.column_stack([Zp, Zn])).all(axis=1)
        if keep.sum() > D_H:
            A_hat = np.linalg.lstsq(Zp[keep], Zn[keep], rcond=-1)[0]
            np.cov(Zn[keep] - Zp[keep] @ A_hat, rowvar=False)
        Za = np.vstack(list(z[:, sel]))
        Xa = np.vstack(list(x[:, sel]))
        keep = np.isfinite(np.column_stack([Za, Xa])).all(axis=1)
        if keep.sum() > D_H:
            H_hat = np.linalg.lstsq(Za[keep], Xa[keep], rcond=-1)[0]
            np.cov(Xa[keep] - Za[keep] @ H_hat, rowvar=False)
    dt = time.perf_counter() - t0
    return 1.0 / dt  # iterations/sec at this subsample size


_V5E_PEAK_F32_TFLOPS = 49.0  # one v5e chip, fp32 (bf16 peak is ~197)


def _analytic_flops_per_iter(n):
    """FLOPs one materialized-feature EM iteration executes per the
    kernel's structure (ops/pallas_markov.py:markov_em_from_features):
    the score GEMM and the per-cluster statistics GEMM over the compact
    feature rows.  The kernel is HBM-bound on the Φ read (hbm_gbps is
    the binding metric); the one-time feature build (~1.3 iterations'
    worth) is excluded like the rest of the per-fit setup."""
    from multimodal_trajectory_modeling_tpu.ops import pallas_markov

    fc_pad, _uniq, _pos = pallas_markov.markov_compact_spec(T, D_H, D_O)
    per_row = 2 * 2 * C * fc_pad  # scores GEMM + per-cluster stats GEMM
    return per_row * n


def _phi_bytes_per_iter(n):
    """Per-iteration HBM stream: the materialized feature matrix Φ,
    read once per EM iteration (2 bytes/entry under the int16-quantized
    default, 4 under wide f32)."""
    from multimodal_trajectory_modeling_tpu.models import em
    from multimodal_trajectory_modeling_tpu.ops import pallas_markov

    store = em._resolve_phi_store(jnp.float32)
    itemsize = 4 if store is None else 2
    fc_pad, _uniq, _pos = pallas_markov.markov_compact_spec(T, D_H, D_O)
    return fc_pad * n * itemsize


def main():
    import os as _os

    multichip = (
        _os.environ.get("MTM_BENCH_MULTICHIP") == "1"
        and len(jax.devices()) > 1
    )
    layout = "tnd" if multichip else "tp"
    b0, b1, zb, xb, vb, patterns, pid = _make_data(N_FULL, layout=layout)

    if multichip:
        rate, n_chips = bench_tpu_multichip(b0, b1, patterns, pid)
        print(
            json.dumps(
                {
                    "metric": "em_iterations_per_sec_1M_traj_multichip",
                    "value": round(rate, 4),
                    "unit": (
                        f"EM iterations/sec (n={N_FULL:.0e}, data-parallel "
                        f"over {n_chips} chips, shard_map)"
                    ),
                    "vs_baseline": None,
                }
            )
        )
        return

    tpu_iters_per_sec = bench_tpu(b0, b1, patterns, pid)
    flops = _analytic_flops_per_iter(N_FULL)
    tflops = flops * tpu_iters_per_sec / 1e12
    # the kernel streams the materialized Φ (Fc_pad, n) f32 features from
    # HBM once per iteration — end-to-end achieved bandwidth (includes
    # dispatch floor); this, not FLOPs, is the binding resource
    hbm_gbps = _phi_bytes_per_iter(N_FULL) * tpu_iters_per_sec / 1e9

    zb = np.asarray(zb, dtype=float)
    xb = np.asarray(xb, dtype=float)
    vb = np.asarray(vb, dtype=float)
    # best-of-5: take the baseline's FASTEST run (single timings swung
    # ~3× run-to-run with host contention, making vs_baseline noisy;
    # the fastest run is also the most conservative comparison)
    base_small = max(bench_numpy_reference(zb, xb, vb) for _ in range(5))
    baseline_full = base_small * (N_BASE / N_FULL)  # linear in n

    print(
        json.dumps(
            {
                "metric": "em_iterations_per_sec_1M_traj",
                "value": round(tpu_iters_per_sec, 4),
                "unit": (
                    "EM iterations/sec (n=1e6, T=10, d=5, l=3, C=16)"
                    if N_FULL == 1_000_000
                    else (
                        f"EM iterations/sec (n={N_FULL:.0e}, T=10, "
                        "d=5, l=3, C=16)"
                    )
                ),
                # extrapolated: the NumPy reference path is timed on a
                # 500-row subsample and scaled linearly to n=1e6 (per-row
                # independent det/solve — cost is linear in n)
                "vs_baseline": round(tpu_iters_per_sec / baseline_full, 1),
                "tflops": round(tflops, 2),
                "mfu_f32": round(tflops / _V5E_PEAK_F32_TFLOPS, 4),
                "hbm_gbps": round(hbm_gbps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
