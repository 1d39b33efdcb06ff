"""Pallas grid kernel for the exact masked Kalman filter — the O(T)
general-missingness E pass on TPU.

The XLA path (:func:`.kalman.kalman_masked_logliks`) scalarizes the
per-row filter into nested lists of (n,) lane vectors; every one of the
~10³ small ops per step then round-trips HBM, so at bench scale the pass
is HBM-bound ~10× off the VPU ceiling.  This kernel runs the SAME step
algebra (:func:`.kalman.masked_filter_step_split` — shared, not
re-derived) on (8, Bn) VMEM tiles with the whole T×C recursion's state
held in a VMEM scratch, so intermediate values never touch HBM and the
pass is VPU-compute-bound.

Layout/TPU shape:

- rows are laid out as full (8, Bn) tiles — the padded row axis is split
  ``n_pad = 8 · cols`` with sublane ``s = i // cols`` — so every VPU op
  uses all 8 sublanes (a (1, n)-row layout would waste 7/8 of each
  vreg on this elementwise-dominated kernel);
- grid = (row blocks, T chunks) with T on the FAST axis: per-cluster
  filter state (μ d planes, P d² planes, ll) persists across T chunks in
  a ``(C, d²+d+1, 8, Bn)`` VMEM scratch, initialized at t == 0 from the
  SMEM-resident model parameters;
- clusters and the chunk's time steps advance through NESTED
  ``fori_loop``s, so the Mosaic program contains ONE step-body instance
  — compile time is independent of T and C (static unrolls beyond ~16
  steps explode Mosaic compile time; see ops/pallas_markov.py);
- observation masks are computed IN-KERNEL from NaN payloads
  (``v == v``), halving the HBM stream vs shipping separate mask
  arrays;
- model parameters (m, S, A, G, H, L) live in SMEM and are read as
  scalars by the shared step helper, exactly like the XLA path reads
  them from closed-over arrays.

Reference semantics: the dense drop-rows/cols marginalization of
``marginalizable_state_space_model.py:741-773`` under arbitrary
per-coordinate NaN masks; equality is tested in f64 interpret mode
(tests/test_ops_kalman.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kalman import _tri_pack, _tri_unpack, masked_filter_step_split

__all__ = [
    "pack_masked_kalman",
    "kalman_masked_logliks_packed",
    "kalman_masked_logliks_pallas",
]


def _n_state_planes(d: int) -> int:
    """State planes per cluster: μ (d) + lower-triangle P (d(d+1)/2,
    symmetric — the full d² was never needed) + ll (1)."""
    return d + d * (d + 1) // 2 + 1


def _param_row_len(d: int, l: int) -> int:
    """Flat per-cluster parameter row: m | S | A | G | H | L."""
    return d + 3 * d * d + d * l + l * l


def _masked_kalman_kernel(Tc: int, d: int, l: int, C: int):
    ntri = d * (d + 1) // 2
    npl_ = _n_state_planes(d)
    o_ll = d + ntri
    # flat offsets into the single (C, P) SMEM parameter row — SMEM
    # windows pad EVERY minor dim (a (C, 5, 5) f32 window allocates
    # C·32·32·4 bytes), so six small per-matrix operands blew the 1 MB
    # scoped-SMEM budget at pool scale (R·C = 64 rows → 1.16 MB); one
    # flattened row pads only the last dim (C·128·4 bytes total)
    o_m = 0
    o_S = d
    o_A = o_S + d * d
    o_G = o_A + d * d
    o_H = o_G + d * d
    o_L = o_H + d * l

    def kernel(z_ref, x_ref, p_ref, out_ref, st_ref):
        t = pl.program_id(1)
        dtype = z_ref.dtype
        tile = z_ref.shape[-2:]  # (8, Bn)
        ones = jnp.ones(tile, dtype)
        zeros = jnp.zeros(tile, dtype)

        @pl.when(t == 0)
        def _():
            def init_c(c, carry):
                k = 0
                for i in range(d):
                    st_ref[c, i] = p_ref[c, o_m + i] * ones
                    for j in range(i + 1):
                        st_ref[c, d + k] = p_ref[c, o_S + i * d + j] * ones
                        k += 1
                st_ref[c, o_ll] = zeros
                return carry

            jax.lax.fori_loop(0, C, init_c, 0)

        def cluster_body(c, carry):
            Hs = [[p_ref[c, o_H + i * l + b] for b in range(l)]
                  for i in range(d)]
            As = [[p_ref[c, o_A + i * d + j] for j in range(d)]
                  for i in range(d)]
            Gs = [[p_ref[c, o_G + i * d + j] for j in range(d)]
                  for i in range(d)]
            Ls = [[p_ref[c, o_L + a * l + b] for b in range(l)]
                  for a in range(l)]
            mu0 = tuple(st_ref[c, i] for i in range(d))
            P0 = tuple(st_ref[c, d + k] for k in range(ntri))
            ll0 = st_ref[c, o_ll]

            def step_body(tt, state):
                mu, Ptri, ll = state
                zv = [z_ref[tt, a] for a in range(d)]
                xv = [x_ref[tt, b] for b in range(l)]
                oz = [(v == v).astype(dtype) for v in zv]
                ox = [(v == v).astype(dtype) for v in xv]
                zc = [jnp.where(v == v, v, zeros) for v in zv]
                xc = [jnp.where(v == v, v, zeros) for v in xv]
                mu2, P2, dll = masked_filter_step_split(
                    list(mu), _tri_unpack(list(Ptri), d), zc, xc, oz, ox,
                    Hs, As, Gs, Ls, d, l,
                )
                return (tuple(mu2), tuple(_tri_pack(P2, d)), ll + dll)

            mu, Ptri, ll = jax.lax.fori_loop(
                0, Tc, step_body, (mu0, P0, ll0)
            )
            for i in range(d):
                st_ref[c, i] = mu[i]
            for k in range(ntri):
                st_ref[c, d + k] = Ptri[k]
            st_ref[c, o_ll] = ll
            out_ref[c] = ll
            return carry

        jax.lax.fori_loop(0, C, cluster_body, 0)

    return kernel, npl_


def _pick_block_cols(d: int, l: int, C: int, itemsize: int, Tc: int) -> int:
    """Largest 128-multiple Bn keeping the VMEM working set ≲ 8 MB
    (state scratch dominates: C·(d²+d+1) planes of (8, Bn)).  The
    scratch is linear in the parameter-row count C, so past ~200 rows
    (e.g. a large opt-in masked pool, R·C rows) even the minimum
    128-lane block exceeds the budget — raise a sizing error instead of
    letting Mosaic fail opaquely at compile time."""
    budget = 8 * 1024 * 1024
    planes = C * _n_state_planes(d) + 2 * Tc * (d + l) + C
    bn = (budget // (planes * 8 * itemsize)) // 128 * 128
    if bn < 128:
        need_mb = planes * 8 * 128 * itemsize / 2**20
        raise ValueError(
            f"masked-filter kernel state for {C} parameter rows "
            f"(d={d}, l={l}, t_chunk={Tc}) needs ~{need_mb:.0f} MB of "
            "VMEM scratch at the minimum 128-lane block — beyond the "
            "~8 MB budget. Reduce the cluster/restart-row count (e.g. "
            "a smaller MTM_MULTISTART_FUSE pool) or use the XLA filter "
            "path (MTM_KALMAN_PALLAS=0)."
        )
    return min(1024, bn)


def _pick_t_chunk(T: int, cap: int = 16) -> int:
    """Smallest-waste time chunk: a padded time step costs the FULL
    step algebra on all-NaN data (masked no-op, ~800 lane-ops), so
    ``Tc = 8`` at the headline ``T = 10`` silently burned 6/16 of the
    kernel (measured 1.55× on v5e).  Pick the ``Tc ≤ cap`` minimizing
    ``ceil(T/Tc)·Tc − T``, tie-breaking toward larger chunks (fewer
    grid steps).  Compile time is Tc-independent (the step body is one
    ``fori_loop`` instance)."""
    T = max(int(T), 1)
    best, best_waste = 1, T  # Tc = 1 always has zero waste; seed worse
    for tc in range(1, min(cap, T) + 1):
        waste = (-T) % tc
        if waste < best_waste or (waste == best_waste and tc > best):
            best, best_waste = tc, waste
    return best


def pack_masked_kalman(
    z: jax.Array,  # (T, n, d) with arbitrary per-coordinate NaNs
    x: jax.Array,  # (T, n, l)
    n_clusters: int,
    *,
    t_chunk: int | None = None,
    block_cols: int | None = None,
) -> tuple[jax.Array, jax.Array, int, int]:
    """Lay the batch out for the grid kernel ONCE: ``(z4, x4, Tc, bn)``
    with ``z4 (T_pad, d, 8, cols)`` NaN-padded on rows and time.  EM
    trainers call this before their ``while_loop`` so the per-iteration
    kernel dispatch is pad-free (a per-call pad copies the whole batch
    every iteration — the lesson of :func:`.pallas_markov.pack_markov_u`).
    ``t_chunk=None`` auto-picks the minimum-padding chunk
    (:func:`_pick_t_chunk`).  Shape-only logic: safe to call under
    ``jit`` (``Tc``/``bn`` are Python ints)."""
    T, n, d = z.shape
    l = x.shape[-1]
    dtype = z.dtype
    Tc = _pick_t_chunk(T) if t_chunk is None else min(t_chunk, max(T, 1))
    bn = block_cols or _pick_block_cols(d, l, n_clusters, dtype.itemsize, Tc)
    n_block = 8 * bn
    n_pad = -(-n // n_block) * n_block
    T_pad = -(-T // Tc) * Tc

    zt = jnp.transpose(z, (0, 2, 1))  # (T, d, n)
    xt = jnp.transpose(x, (0, 2, 1))
    nan = jnp.asarray(jnp.nan, dtype)
    zt = jnp.pad(zt, ((0, T_pad - T), (0, 0), (0, n_pad - n)),
                 constant_values=nan)
    xt = jnp.pad(xt, ((0, T_pad - T), (0, 0), (0, n_pad - n)),
                 constant_values=nan)
    cols = n_pad // 8
    z4 = zt.reshape(T_pad, d, 8, cols)
    x4 = xt.reshape(T_pad, l, 8, cols)
    return z4, x4, Tc, bn


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "block_cols", "interpret")
)
def kalman_masked_logliks_packed(
    z4: jax.Array,  # (T_pad, d, 8, cols) from pack_masked_kalman
    x4: jax.Array,  # (T_pad, l, 8, cols)
    m: jax.Array,  # (C, d)
    S: jax.Array,  # (C, d, d)
    A: jax.Array,  # (C, d, d)
    G: jax.Array,  # (C, d, d)
    H: jax.Array,  # (C, d, l)
    L: jax.Array,  # (C, l, l)
    *,
    t_chunk: int,
    block_cols: int,
    interpret: bool = False,
) -> jax.Array:
    """``(C, n_pad)`` log-densities on a pre-packed batch (padded rows
    are all-NaN → exactly 0.0; callers slice ``[:, :n]``)."""
    T_pad, d = z4.shape[:2]
    l = x4.shape[1]
    C = m.shape[0]
    dtype = z4.dtype
    Tc, bn = t_chunk, block_cols
    cols = z4.shape[-1]
    n_pad = 8 * cols
    n_block = 8 * bn

    kernel, _ = _masked_kalman_kernel(Tc, d, l, C)
    # one flat (C, P) parameter row in SMEM — see _masked_kalman_kernel
    # for why six per-matrix SMEM operands don't scale to pool row counts
    p = jnp.concatenate(
        [a.astype(dtype).reshape(C, -1) for a in (m, S, A, G, H, L)],
        axis=1,
    )
    ll = pl.pallas_call(
        kernel,
        grid=(n_pad // n_block, T_pad // Tc),
        in_specs=[
            pl.BlockSpec((Tc, d, 8, bn), lambda jb, tb: (tb, 0, 0, jb)),
            pl.BlockSpec((Tc, l, 8, bn), lambda jb, tb: (tb, 0, 0, jb)),
            pl.BlockSpec(
                (C, _param_row_len(d, l)),
                lambda jb, tb: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ],
        out_specs=pl.BlockSpec((C, 8, bn), lambda jb, tb: (0, 0, jb)),
        out_shape=jax.ShapeDtypeStruct((C, 8, cols), dtype),
        scratch_shapes=[
            pltpu.VMEM((C, _n_state_planes(d), 8, bn), dtype),
        ],
        interpret=interpret,
    )(z4, x4, p)
    return ll.reshape(C, n_pad)


@functools.partial(
    jax.jit, static_argnames=("t_chunk", "block_cols", "interpret")
)
def kalman_masked_logliks_pallas(
    z: jax.Array,  # (T, n, d) with arbitrary per-coordinate NaNs
    x: jax.Array,  # (T, n, l)
    m: jax.Array,  # (C, d)
    S: jax.Array,  # (C, d, d)
    A: jax.Array,  # (C, d, d)
    G: jax.Array,  # (C, d, d)
    H: jax.Array,  # (C, d, l)
    L: jax.Array,  # (C, l, l)
    *,
    t_chunk: int | None = None,
    block_cols: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """``(C, n)`` exact observed-data log-densities under arbitrary
    per-coordinate missingness — Pallas twin of
    :func:`.kalman.kalman_masked_logliks` (same shared step algebra;
    bit-comparable in f64 interpret mode, tested)."""
    n = z.shape[1]
    z4, x4, Tc, bn = pack_masked_kalman(
        z, x, m.shape[0], t_chunk=t_chunk, block_cols=block_cols
    )
    ll = kalman_masked_logliks_packed(
        z4, x4, m, S, A, G, H, L,
        t_chunk=Tc, block_cols=bn, interpret=interpret,
    )
    return ll[:, :n]
