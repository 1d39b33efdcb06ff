#!/usr/bin/env python3
"""Masked-filter multistart: pooled vs sequential throughput probe.

Round-3 measured the masked slot pool AT PARITY with sequential
candidate fits (the scalarized filter is compute-bound and linear in
parameter rows — no shared read/build to amortize), so the mixture
default stayed sequential (`MTM_MASKED_POOL=0`).  This driver re-runs
that comparison against the current kernel (round-5: sequential
z-conditioning step + minimum-padding time chunks) to decide whether
the default should flip.

Usage:
    python drivers/bench-masked-pool.py [--n 20000] [--T 8] [--C 8]
        [--R 8] [--cands 8] [--steps 12] [--miss 0.3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--T", type=int, default=8)
    ap.add_argument("--C", type=int, default=8)
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--l", type=int, default=3)
    ap.add_argument("--R", type=int, default=8)
    ap.add_argument("--cands", type=int, default=8)
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--miss", type=float, default=0.3)
    args = ap.parse_args()

    from multimodal_trajectory_modeling_tpu import config

    config.enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from multimodal_trajectory_modeling_tpu.models import em

    dev = jax.devices()[0]
    print(f"# device: {dev.platform}")

    n, T, C, d, l = args.n, args.T, args.C, args.d, args.l
    rng = np.random.default_rng(0)
    z = rng.normal(size=(T, n, d)).astype(np.float32)
    x = rng.normal(size=(T, n, l)).astype(np.float32)
    z[rng.random(size=z.shape) < args.miss] = np.nan
    x[rng.random(size=x.shape) < args.miss] = np.nan
    zj, xj = jnp.asarray(z), jnp.asarray(x)

    def one_params(r):
        rr = np.random.default_rng(100 + r)
        return em.MixtureParams(
            pi=jnp.ones(C, jnp.float32) / C,
            m=jnp.asarray(rr.normal(size=(C, d)), jnp.float32),
            S=jnp.asarray(np.stack([np.eye(d)] * C), jnp.float32),
            A=jnp.asarray(
                rr.normal(scale=0.3, size=(C, d, d)), jnp.float32
            ),
            G=jnp.asarray(np.stack([np.eye(d)] * C), jnp.float32),
            H=jnp.asarray(rr.normal(size=(C, d, l)), jnp.float32),
            L=jnp.asarray(np.stack([np.eye(l)] * C), jnp.float32),
        )

    params_list = [one_params(r) for r in range(args.cands)]
    assign_list = [
        np.random.default_rng(200 + r).integers(0, C, size=n).astype(
            np.int32
        )
        for r in range(args.cands)
    ]

    # the sequential trainer jits on STATIC n_steps and the pool window
    # compile keys on R/sync_every — no cheap warm-up covers the timed
    # configuration, so each section runs TWICE and the second (fully
    # warm) pass is the reported number
    def run_seq():
        t0 = time.perf_counter()
        iters = 0
        for p0, a0 in zip(params_list, assign_list):
            out = em.train_em_masked_kalman(
                p0, jnp.asarray(a0), zj, xj, n_steps=args.steps
            )
            iters += int(out[2])
            float(np.asarray(out[1][0]))  # completion barrier
        return iters, time.perf_counter() - t0

    def run_pool():
        t0 = time.perf_counter()
        pooled = em.train_em_masked_kalman_pool(
            params_list,
            assign_list,
            zj,
            xj,
            R=args.R,
            n_steps=args.steps,
            sync_every=4,
        )
        return sum(int(r[2]) for r in pooled), time.perf_counter() - t0

    _, t_cold = run_seq()
    seq_iters, t_seq = run_seq()
    print(f"# sequential cold pass (incl. compile): {t_cold:.2f}s")
    _, t_cold = run_pool()
    pool_iters, t_pool = run_pool()
    print(f"# pooled cold pass (incl. compile): {t_cold:.2f}s")

    seq_rate = seq_iters / t_seq
    pool_rate = pool_iters / t_pool
    print(
        f"sequential: {seq_iters} iters in {t_seq:.2f}s = "
        f"{seq_rate:.1f} agg it/s"
    )
    print(
        f"pooled R={args.R}: {pool_iters} iters in {t_pool:.2f}s = "
        f"{pool_rate:.1f} agg it/s   ({pool_rate / seq_rate:.2f}x)"
    )
    print(json.dumps({
        "n": n, "T": T, "C": C, "R": args.R, "cands": args.cands,
        "seq_aggits": seq_rate, "pool_aggits": pool_rate,
        "ratio": pool_rate / seq_rate,
    }))


if __name__ == "__main__":
    main()
