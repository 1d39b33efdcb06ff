#!/usr/bin/env python3
"""Masked-Kalman Pallas kernel probe: steady-state runtime + Mosaic
compile time across block sizes / t-chunks.

Times the packed grid kernel (ops/pallas_kalman.py) the only reliable
way on the remote backend (see CLAUDE.md): iterations CHAINED inside one
jitted fori_loop (a data dependency threads each iteration's output into
the next call's parameters, so neither XLA LICM nor dispatch pipelining
can hide or hoist the kernel), completion barrier = device→host scalar
pull.  Compile time is the wall time of the first dispatch per
configuration (report alongside; with the persistent compilation cache
warm this is the cached-load time — use --fresh-suffix to bump n and
force a fresh Mosaic compile).

Usage:
    python drivers/bench-masked-kalman.py [--n 100000] [--T 10]
        [--C 16] [--d 5] [--l 3] [--miss 0.3] [--iters 20]
        [--bn 128,256,384] [--tc 8] [--xla]
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--T", type=int, default=10)
    ap.add_argument("--C", type=int, default=16)
    ap.add_argument("--d", type=int, default=5)
    ap.add_argument("--l", type=int, default=3)
    ap.add_argument("--miss", type=float, default=0.3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bn", type=str, default="128,256,384")
    ap.add_argument("--tc", type=str, default="8")
    ap.add_argument("--xla", action="store_true",
                    help="also time the scalarized XLA filter")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from multimodal_trajectory_modeling_tpu import config

    if args.cpu:
        config.use_cpu_x64()
    config.enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp

    from multimodal_trajectory_modeling_tpu.ops import kalman
    from multimodal_trajectory_modeling_tpu.ops import pallas_kalman as pk

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    n, T, C, d, l = args.n, args.T, args.C, args.d, args.l
    rng = np.random.default_rng(0)
    z = rng.normal(size=(T, n, d)).astype(np.float32)
    x = rng.normal(size=(T, n, l)).astype(np.float32)
    z[rng.random(size=z.shape) < args.miss] = np.nan
    x[rng.random(size=x.shape) < args.miss] = np.nan
    m = rng.normal(size=(C, d)).astype(np.float32)
    A = (rng.normal(scale=0.3, size=(C, d, d))).astype(np.float32)
    H = rng.normal(size=(C, d, l)).astype(np.float32)

    def spd(k, scale):
        M = rng.normal(size=(C, k, k))
        return (M @ M.transpose(0, 2, 1) / k
                + scale * np.eye(k)).astype(np.float32)

    S, G, L = spd(d, 0.8), spd(d, 0.5), spd(l, 0.4)
    params = tuple(map(jnp.asarray, (m, S, A, G, H, L)))
    zj, xj = jnp.asarray(z), jnp.asarray(x)

    def timed_chain(run_one, data, label):
        """run_one(eps_scalar, *data) -> (C, n?) lls; iterations chained
        via eps feedback.  ``data`` passed as jit ARGUMENTS (big
        closed-over device arrays become HLO constants on the remote
        backend)."""
        K = args.iters

        @jax.jit
        def chain(eps, *dat):
            def body(i, acc):
                ll = run_one(acc * 0.0, *dat)
                return ll[0, 0] * 0.0 + acc
            return jax.lax.fori_loop(0, K, body, eps)

        t0 = time.perf_counter()
        out = chain(jnp.asarray(0.0, jnp.float32), *data)
        float(out)  # barrier: device->host pull
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(jnp.asarray(0.0, jnp.float32), *data))
        t_steady = time.perf_counter() - t0
        per_it = t_steady / K * 1e3
        print(
            f"{label:32s} first(+compile) {t_first:8.2f} s   "
            f"steady {per_it:8.3f} ms/eval   ({K} chained)"
        )
        return {"label": label, "compile_s": t_first, "ms": per_it}

    results = []
    for tc in [int(v) for v in args.tc.split(",")]:
        for bn in [int(v) for v in args.bn.split(",")]:
            z4, x4, tcv, bnv = pk.pack_masked_kalman(
                zj, xj, C, t_chunk=tc, block_cols=bn
            )
            z4, x4 = jax.device_put(z4), jax.device_put(x4)

            def run_one(eps, _z4, _x4, _tc=tcv, _bn=bnv):
                p = (params[0] + eps,) + params[1:]
                return pk.kalman_masked_logliks_packed(
                    _z4, _x4, *p, t_chunk=_tc, block_cols=_bn,
                    interpret=dev.platform != "tpu",
                )

            r = timed_chain(run_one, (z4, x4), f"pallas bn={bnv} tc={tcv}")
            r.update(bn=bnv, tc=tcv)
            results.append(r)

    if args.xla:

        def run_xla(eps, _z, _x):
            p = (params[0] + eps,) + params[1:]
            return kalman.kalman_masked_logliks(_z, _x, *p, unroll=False)

        r = timed_chain(run_xla, (zj, xj), "xla scan")
        results.append(r)

    print(json.dumps({
        "n": n, "T": T, "C": C, "d": d, "l": l, "miss": args.miss,
        "results": results,
    }))


if __name__ == "__main__":
    main()
