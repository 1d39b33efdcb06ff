#!/usr/bin/env python3
"""HBM streaming-floor probe for the materialized feature matrix Φ:
what is the raw read rate of an (F, n) stream at each storage width,
and how close does the Φ-reading EM kernel run to it?

Round-3 measured the f32 floor at 611-615 GB/s (layout-invariant,
blocks 8k-64k) with the from-features kernel AT the floor; round 4
halved the stream with int16 storage but only reached 368 GB/s — this
probe answers whether the int16 stream has a LOWER floor (widening
cost / narrow-load throughput) or whether the kernel leaves time on
the table.

Methodology (CLAUDE.md round-3 timing hygiene):
- the reduce kernel's accumulator is CHAINED through the fori_loop
  carry INTO the kernel input, so XLA can neither LICM-hoist the
  (loop-invariant-Φ) call nor overlap iterations into overcounting;
- completion barrier = device→host scalar pull;
- dispatch cost amortized over K chained iterations in ONE jit.

Usage:
    python drivers/bench-phi-floor.py [--n 1000000] [--iters 30]
        [--bn 8192,16384] [--dtypes f32,i16,bf16]
"""

from __future__ import annotations

import argparse
import functools
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--rows", type=int, default=112,
                    help="feature rows (compact-layout Fc_pad at the "
                    "headline shape)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bn", type=str, default="8192,16384")
    ap.add_argument("--dtypes", type=str, default="f32,i16,bf16")
    args = ap.parse_args()

    from multimodal_trajectory_modeling_tpu import config

    config.enable_persistent_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    interpret = dev.platform != "tpu"

    F, n = args.rows, args.n
    rng = np.random.default_rng(0)
    base = rng.normal(size=(F, n)).astype(np.float32)

    def stream_kernel(dtype_name):
        acc_dtype = jnp.float32 if dtype_name != "i16" else jnp.int32

        def kernel(seed_ref, phi_ref, out_ref):
            blk = phi_ref[...]
            if dtype_name == "i16":
                s = jnp.sum(blk.astype(jnp.int32))
            else:
                s = jnp.sum(blk.astype(jnp.float32))
            s = s.astype(acc_dtype).reshape(1, 1)  # no scalar VMEM stores

            @pl.when(pl.program_id(0) == 0)
            def _():
                out_ref[:, :] = seed_ref[:, :] * 0 + s

            @pl.when(pl.program_id(0) != 0)
            def _():
                out_ref[:, :] = out_ref[:, :] + s

        return kernel, acc_dtype

    results = []
    for dt in args.dtypes.split(","):
        if dt == "f32":
            phi = jnp.asarray(base)
        elif dt == "bf16":
            phi = jnp.asarray(base, jnp.bfloat16)
        elif dt == "i16":
            phi = jnp.asarray(
                np.clip(base * 1000, -32000, 32000).astype(np.int16)
            )
        else:
            raise SystemExit(f"unknown dtype {dt}")
        nbytes = phi.size * phi.dtype.itemsize
        kern, acc_dtype = stream_kernel(dt)

        for bn in [int(v) for v in args.bn.split(",")]:
            n_pad = -(-n // bn) * bn
            phi_p = jnp.pad(phi, ((0, 0), (0, n_pad - n)))

            @functools.partial(jax.jit, static_argnames=("K",))
            def chain(seed, phi_p, K):
                def body(i, acc):
                    out = pl.pallas_call(
                        kern,
                        grid=(n_pad // bn,),
                        in_specs=[
                            pl.BlockSpec((1, 1), lambda j: (0, 0)),
                            pl.BlockSpec((F, bn), lambda j: (0, j)),
                        ],
                        out_specs=pl.BlockSpec((1, 1), lambda j: (0, 0)),
                        out_shape=jax.ShapeDtypeStruct((1, 1), acc_dtype),
                        interpret=interpret,
                    )(acc.reshape(1, 1), phi_p)
                    return out[0, 0]

                return jax.lax.fori_loop(
                    0, K, body, seed.astype(acc_dtype)
                )

            K = args.iters
            seed = jnp.asarray(0, acc_dtype)
            t0 = time.perf_counter()
            out = chain(seed, phi_p, K)
            float(np.asarray(out))  # barrier
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(chain(seed, phi_p, K)))
            t = (time.perf_counter() - t0) / K
            gbps = nbytes / t / 1e9
            print(
                f"{dt:5s} bn={bn:6d}  {t*1e3:7.3f} ms/pass  "
                f"{gbps:7.1f} GB/s  ({nbytes/2**20:.0f} MiB payload, "
                f"first {t_first:.1f}s)"
            )
            results.append(
                {"dtype": dt, "bn": bn, "ms": t * 1e3, "gbps": gbps}
            )

    print(json.dumps({"rows": F, "n": n, "results": results}))


if __name__ == "__main__":
    main()
