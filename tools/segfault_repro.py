"""Reproducer / probe for the XLA:CPU compile-state segfault.

ROOT CAUSE (pinned 2026-08-19, this host, jax/jaxlib 0.9.0): **mmap
virtual-memory-area exhaustion** — every live compiled XLA:CPU
executable keeps its JIT code pages mapped, and a pytest process that
holds every executable (``MTM_TEST_KEEP_CACHES=1``) grows its
``/proc/self/maps`` count roughly linearly with compiles until it hits
the kernel's ``vm.max_map_count`` (default 65 530).  The next mmap —
typically inside persistent-cache executable DESERIALIZATION
(``jax/_src/compilation_cache.py:238 get_executable_and_time``) —
fails, and jaxlib dereferences the failure into SIGSEGV.  Measured:
the full suite crashed at 64 971 maps (99.1 % of the limit) with the
sampler in /tmp/seg_maps.csv; raising the limit
(``sysctl -w vm.max_map_count=262144``) lets the same run complete.
The conftest ``jax.clear_caches()``-between-modules workaround works
because dropping executables unmaps their code regions.

This script reproduces the *mechanism* outside pytest with nothing but
distinct-jaxpr compiles (it prints the live map count as it goes); a
plain ``--n 400`` small-program mix stays thousands of maps below the
limit, which is why small synthetic runs never crashed.

Usage (each knob isolates one axis):

    python tools/segfault_repro.py --n 400                  # default mix
    python tools/segfault_repro.py --n 400 --no-x64
    python tools/segfault_repro.py --n 400 --devices 1
    python tools/segfault_repro.py --n 400 --no-shardmap
    python tools/segfault_repro.py --n 400 --keep-refs      # defeat GC

Progress prints every 10 compiles; on segfault the last printed index
bounds the trigger.  Exit 0 = no crash at this setting.
"""

import argparse
import gc
import os
import sys

p = argparse.ArgumentParser()
p.add_argument("--n", type=int, default=400)
p.add_argument("--devices", type=int, default=8)
p.add_argument("--no-x64", action="store_true")
p.add_argument("--no-shardmap", action="store_true")
p.add_argument("--keep-refs", action="store_true",
               help="hold python refs to every jitted fn (pytest-like)")
p.add_argument("--clear-every", type=int, default=0,
               help="jax.clear_caches() every K compiles (0 = never)")
args = p.parse_args()

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.devices}"
    ).strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", not args.no_x64)

from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402

devs = jax.devices()
mesh = Mesh(np.array(devs), ("data",)) if len(devs) > 1 else None
refs = []


def make_fn(i):
    """A distinct jaxpr per i: shape and op mix vary, so every compile
    is a fresh executable (mirrors the suite's hundreds of distinct
    small x64 compiles)."""
    k = 8 + (i % 37)  # distinct static shape

    if mesh is not None and not args.no_shardmap and i % 3 == 0:
        def body(a, b):
            s = jnp.einsum("ij,jk->ik", a, b)
            return jax.lax.psum(s, "data") + float(i)

        fn = jax.jit(
            shard_map(
                body, mesh=mesh,
                in_specs=(P("data", None), P(None, None)),
                out_specs=P(None, None),
            )
        )
        a = jnp.ones((len(devs) * 8, k))
        b = jnp.ones((k, k))
        return fn, (a, b)

    def body(a, b):
        def step(c, _):
            c = jnp.tanh(c @ b) + float(i % 7)
            return c, c.sum()

        c, sums = jax.lax.scan(step, a, None, length=3 + i % 5)
        m = jnp.linalg.cholesky(
            b @ b.T + jnp.eye(k, dtype=b.dtype) * (2.0 + i % 11)
        )
        return c.sum() + sums.sum() + m.diagonal().sum()

    fn = jax.jit(body)
    a = jnp.ones((16, k))
    b = jnp.ones((k, k))
    return fn, (a, b)


print(
    f"devices={len(devs)} x64={jax.config.jax_enable_x64} "
    f"shardmap={'off' if args.no_shardmap else 'on'} n={args.n}",
    flush=True,
)
for i in range(args.n):
    fn, xs = make_fn(i)
    out = fn(*xs)
    jax.tree_util.tree_map(
        lambda v: np.asarray(v), out
    )  # force completion
    if args.keep_refs:
        refs.append(fn)
    else:
        del fn
        gc.collect() if i % 50 == 0 else None
    if i % 10 == 9:
        try:
            with open("/proc/self/maps") as fh:
                n_maps = sum(1 for _ in fh)
        except OSError:
            n_maps = -1
        print(f"compiled {i + 1}  maps={n_maps}", flush=True)
    if args.clear_every and i % args.clear_every == args.clear_every - 1:
        jax.clear_caches()

print("no crash", flush=True)
sys.exit(0)
