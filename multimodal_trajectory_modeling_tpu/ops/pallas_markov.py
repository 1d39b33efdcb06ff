"""Pallas TPU kernel: fused Markov-factorized E-step (suffix missingness).

Evaluates the O(T) factorized joint density of :mod:`.markov` and the
hard E-step outputs (argmax assignment, membership counts, switch count)
in one pass over an n-tile held in VMEM.  Per time step it builds the
Kronecker feature rows on the lane axis and issues two skinny-K GEMMs

    scores += vm_t · W1 (C, d²+l²+dl) @ feat1 (·, Bn)
            + vm_{t+1} · W2 (C, 2d²) @ feat2 (·, Bn)

(M = C on sublanes, N = Bn on lanes — the same full-utilization layout as
the transposed dense E kernel), then one end GEMM for the init/len/const
terms.  Per-row FLOPs ≈ 2·T·C·(d²·3+l²+dl) vs the dense kernel's
2·C·D·(D+C) with D = T(d+l): ~6× fewer at the benchmark config, and the
gap grows linearly with T.

The time loop is a static unroll — intended for small T (the ADNI T=4 /
benchmark T=10 regime; Mosaic compile time explodes beyond T ≈ 16); the
XLA scan paths (:func:`..ops.markov.markov_suffix_logliks`,
:func:`..models.em.emstep_markov_xla`) cover long T.

Reference semantics: the same per-row densities as the numba hot loop
(marginalizable_state_space_model.py:728-773) evaluated through the chain
rule instead of the dense joint covariance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# TPU correctness: the default f32 matmul precision is bf16 multiplies;
# the sufficient-statistics contractions subtract nearly-equal large
# moments (normal-equations cancellation), where bf16's 2^-9 rounding
# produced INDEFINITE covariance estimates on wide-range data (measured:
# detL < 0 at |x|~50, collapsing EM; see PARITY.md).  Every load-bearing
# contraction pins full f32 precision — a no-op on CPU, multi-pass on
# the MXU (the hot kernels are HBM-bound, so the cost is hidden).
_HI = jax.lax.Precision.HIGHEST
# Stats GEMMs need the feature operand's full f32 mantissa to survive
# into the summed moments; the 0/1 onehot side is bf16-exact.  Mosaic
# rejects per-operand precision pairs and its single-value HIGHEST
# splits BOTH operands (measured 2.2× on the headline bench), so the
# one-sided 3-pass split is done MANUALLY: feat = t1 + t2 + r with t1,
# t2 bf16-exact slices, three default-precision dots against the
# bf16-exact onehot — every product exact, the residual's final bf16
# rounding ~2⁻²⁵ relative, below the f32 accumulation's own roundoff.
# Score GEMMs stay default-precision (bf16 rounding only perturbs
# argmax near ties — the same class as documented f32 reassignment
# noise).  f64 (interpret/parity) keeps the plain dot so kernel ≡ XLA
# trajectories stay bit-exact.


def _split3_bf16(feat, dtype):
    """3-term bf16 decomposition ``feat ≈ t1 + t2 + t3`` (each term
    bf16-STORED — native single-pass GEMM operands; t1/t2 exact by
    construction, t3's rounding ~2⁻²⁵ relative)."""
    t1 = feat.astype(jnp.bfloat16)
    r1 = feat - t1.astype(dtype)
    t2 = r1.astype(jnp.bfloat16)
    t3 = (r1 - t2.astype(dtype)).astype(jnp.bfloat16)
    return t1, t2, t3


def _exact_stat_dot(feat, onehot_t, dtype):
    """Σ-over-lanes stats GEMM with exact-f32 feature products (see
    module comment).  ``onehot_t`` entries must be exactly
    bf16-representable (0/1 memberships are)."""
    if jnp.dtype(dtype) != jnp.float32:
        return jnp.dot(feat, onehot_t, preferred_element_type=dtype)
    oh = onehot_t.astype(jnp.bfloat16)
    return sum(
        jnp.dot(t, oh, preferred_element_type=dtype)
        for t in _split3_bf16(feat, dtype)
    )


def _exact_stat_dot_r(sel, feat, dtype):
    """Mirror of :func:`_exact_stat_dot` for 0/1-selection-LHS ×
    feature-RHS dots (the long-T materializer)."""
    if jnp.dtype(dtype) != jnp.float32:
        return jnp.dot(sel, feat, preferred_element_type=dtype)
    sl = sel.astype(jnp.bfloat16)
    return sum(
        jnp.dot(sl, t, preferred_element_type=dtype)
        for t in _split3_bf16(feat, dtype)
    )
from jax.experimental import pallas as pl

__all__ = [
    "PhiQuant",
    "dequantize_phi",
    "markov_assign_suffix",
    "markov_compact_spec",
    "markov_em_from_features",
    "markov_em_from_features_multi",
    "markov_em_fused",
    "markov_em_fused_longT",
    "markov_em_fused_packed",
    "markov_em_fused_packed_multi",
    "markov_materialize_features",
    "markov_packed_spec",
    "pack_markov_u",
    "phi_scale_from_absmax",
    "quantize_phi",
]


class PhiQuant(NamedTuple):
    """Symmetrically int16-quantized feature matrix Φ.

    ``phi ≈ scale[:, None] · q`` with one scale per feature ROW, chosen
    so the row's max-magnitude entry lands on ±32766.  Quantization
    error is uniform-ABSOLUTE per row (≤ scale/2 ≈ 1.5e-5 · row max) —
    ~30× tighter than bfloat16's relative 2⁻⁹ on the T-reduced
    shift-product features, whose per-row spread is small next to their
    magnitude — at the same 2 bytes/entry, so the per-iteration HBM
    stream still halves vs f32.

    Consumers never dequantize the (F, n) payload: the EM kernels'
    score GEMM runs on raw ``q`` with ``scale`` FOLDED into the weight
    rows (``wc·diag(scale)``), and the M sufficient statistics are
    un-folded after the stats GEMM (``g = scale[:, None] · g̃``) — exact
    linear algebra at (F, C) size, so the only approximation anywhere
    is the one storage rounding.  A NamedTuple (= pytree): passes
    through ``jit``/``while_loop`` boundaries wherever a plain Φ array
    does.
    """

    q: jax.Array  # (Fc_pad, n_pad) int16
    scale: jax.Array  # (Fc_pad,) compute dtype


def phi_scale_from_absmax(amax: jax.Array, dtype) -> jax.Array:
    """Per-row quantization scale from per-row max |Φ|.  Split out so
    data-parallel shards can ``lax.pmax`` their local absmax first and
    quantize with the GLOBAL scale — making sharded i16 storage
    bit-identical to the single-device :func:`quantize_phi`."""
    scale = jnp.where(amax > 0.0, amax, 1.0) * (1.0 / 32766.0)
    return scale.astype(dtype)


@jax.jit
def quantize_phi(phi: jax.Array, scale: jax.Array | None = None) -> PhiQuant:
    """Quantize a materialized Φ (rows = features, lanes = instances)
    to :class:`PhiQuant`.  One elementwise pass (once per fit — the EM
    loop then streams half the bytes every iteration).  All-zero rows
    (layout padding) get scale 1 so the reconstruction stays exact.
    Pass ``scale`` to override the per-row scales (shard_map callers use
    :func:`phi_scale_from_absmax` on a pmax-ed absmax)."""
    if scale is None:
        scale = phi_scale_from_absmax(jnp.max(jnp.abs(phi), axis=1), phi.dtype)
    q = jnp.round(phi * (1.0 / scale)[:, None]).astype(jnp.int16)
    return PhiQuant(q, scale.astype(phi.dtype))


def dequantize_phi(pq: PhiQuant) -> jax.Array:
    """Reconstruct the (rounded) wide Φ — test/diagnostic helper; the
    production consumers fold ``scale`` into the GEMM weights instead."""
    return pq.scale[:, None] * pq.q.astype(pq.scale.dtype)


def _markov_assign_kernel(T: int, d: int, l: int, C: int):
    def kernel(
        zt_ref,  # (T·d, Bn)  row t·d+a = z[t, ·, a]
        xt_ref,  # (T·l, Bn)
        lens_ref,  # (1, Bn) int32
        prev_ref,  # (1, Bn) int32; padded lanes carry -1
        wcat_ref,  # (C, K_tot) per-step-tiled weights (see wrapper)
        assign_out,  # (1, Bn) int32
        counts_out,  # (1, C) int32
        switch_out,  # (1, 1) int32
    ):
        Bn = zt_ref.shape[1]
        dtype = zt_ref.dtype
        zt = jnp.where(jnp.isfinite(zt_ref[:, :]), zt_ref[:, :], 0.0)
        xt = jnp.where(jnp.isfinite(xt_ref[:, :]), xt_ref[:, :], 0.0)
        lens = lens_ref[0, :]

        def z_at(t):
            return zt[t * d : (t + 1) * d, :]  # (d, Bn)

        def x_at(t):
            return xt[t * l : (t + 1) * l, :]  # (l, Bn)

        def kron(a, b):
            # (p, Bn), (q, Bn) -> (p·q, Bn), row i·q+j = a_i ⊙ b_j
            return jnp.concatenate(
                [a[i : i + 1, :] * b for i in range(a.shape[0])], axis=0
            )

        # ONE tall feature matrix + ONE fat GEMM per block: the per-step
        # masks are free because NaN→0 sanitization already zeroes every
        # feature touching an invalid step — only the W2 zz-group (valid
        # z_t entering a transition whose z_{t+1} is missing) needs an
        # explicit vm_{t+1} multiply.  K ≈ T·(3d²+l²+dl) amortizes the
        # MXU far better than 2T skinny GEMMs (measured 6.0 → see
        # module docstring).
        pieces = []
        for t in range(T):
            z_c, x_c = z_at(t), x_at(t)
            pieces += [kron(z_c, z_c), kron(x_c, x_c), kron(z_c, x_c)]
        for t in range(T - 1):
            z_c, z_n = z_at(t), z_at(t + 1)
            vm_n = (lens > t + 1).astype(dtype)[None, :]
            pieces += [vm_n * kron(z_c, z_c), kron(z_c, z_n)]
        z0 = z_at(0)
        pieces += [
            kron(z0, z0),
            z0,
            lens.astype(dtype)[None, :],
            jnp.ones((1, Bn), dtype),
        ]
        feat = jnp.concatenate(pieces, axis=0)  # (K_tot, Bn)
        scores = jnp.dot(
            wcat_ref[:, :], feat, preferred_element_type=dtype)

        na = jnp.argmax(scores, axis=0).astype(jnp.int32)  # first-max
        prev = prev_ref[0, :]
        validrow = prev >= 0
        subl = jax.lax.broadcasted_iota(jnp.int32, (C, Bn), 0)
        onehot = ((na[None, :] == subl) & validrow[None, :]).astype(
            jnp.int32
        )
        counts_p = jnp.sum(onehot, axis=1).reshape(1, C)
        sw_p = jnp.sum(((na != prev) & validrow).astype(jnp.int32)).reshape(
            1, 1
        )

        assign_out[0, :] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p

    return kernel


def markov_assign_suffix(
    z_t: jax.Array,  # (T·d, n) transposed latent batch (constant per fit)
    x_t: jax.Array,  # (T·l, n) transposed observations
    lens: jax.Array,  # (n,) int32 observed prefix lengths
    prev_assign: jax.Array,  # (n,) int32
    W1: jax.Array,  # (C, d²+l²+dl)
    W2: jax.Array,  # (C, 2d²)
    W3: jax.Array,  # (C, d²+d+2)
    *,
    T: int,
    d: int,
    l: int,
    block_n: int = 1024,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused Markov E-step: ``(assign (n,), counts (C,), switches ())``.

    Same assignments as ``argmax_c`` of
    :func:`..ops.markov.markov_suffix_logliks` ``+ log π`` (fold log π
    into W3's constant column) up to f32 reassociation; exact in f64
    interpret mode.  ``z_t``/``x_t`` are the one-time transposed copies —
    hoist them out of the EM loop (they are iteration-invariant).
    """
    Td, n = z_t.shape
    assert Td == T * d and x_t.shape == (T * l, n)
    C = W1.shape[0]
    # feature order in the kernel: T × [zz, xx, zx], (T-1) × [zz·vm, z⊗zn],
    # then [zz0, z0, len, 1]
    wcat = jnp.concatenate(
        [jnp.tile(W1, (1, T)), jnp.tile(W2, (1, T - 1)), W3], axis=1
    )
    pad = (-n) % block_n
    if pad:
        z_t = jnp.concatenate(
            [z_t, jnp.zeros((T * d, pad), z_t.dtype)], axis=1
        )
        x_t = jnp.concatenate(
            [x_t, jnp.zeros((T * l, pad), x_t.dtype)], axis=1
        )
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
        prev_assign = jnp.concatenate(
            [prev_assign, jnp.full((pad,), -1, jnp.int32)]
        )
    n_pad = z_t.shape[1]
    a_out, c_out, w_out = pl.pallas_call(
        _markov_assign_kernel(T, d, l, C),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((T * d, block_n), lambda i: (0, i)),
            pl.BlockSpec((T * l, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec(wcat.shape, lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        z_t,
        x_t,
        lens.astype(jnp.int32).reshape(1, n_pad),
        prev_assign.astype(jnp.int32).reshape(1, n_pad),
        wcat,
    )
    return a_out[0, :n], c_out[0], w_out[0, 0]


def _markov_em_kernel(T: int, d: int, l: int, C: int, assign_mode: str):
    """Fused EM iteration kernel: per-row feature vector g (F, Bn) built
    once serves BOTH the E-score GEMM and (after argmax) the per-cluster
    M-statistic reduction ``g @ onehotᵀ``.  ``assign_mode="prev"`` skips
    the E step and reduces statistics under the incoming assignment (the
    initial M step of the training loop)."""
    dd = d * d

    def kernel(
        zt_ref,  # (T·d, Bn)
        xt_ref,  # (T·l, Bn)
        lens_ref,  # (1, Bn) int32
        prev_ref,  # (1, Bn) int32; padded lanes carry -1
        wg_ref,  # (C, F) E-score weights (zeros on M-only slots)
        assign_out,  # (1, Bn) int32
        counts_out,  # (1, C) int32
        switch_out,  # (1, 1) int32
        g_out,  # (F, C) float — per-cluster summed features
        obj_out,  # (1, 1) float — Σ_i max_c scores (the complete-data
        #           objective of the INCOMING params under a fresh E)
    ):
        Bn = zt_ref.shape[1]
        dtype = zt_ref.dtype
        zt = jnp.where(jnp.isfinite(zt_ref[:, :]), zt_ref[:, :], 0.0)
        xt = jnp.where(jnp.isfinite(xt_ref[:, :]), xt_ref[:, :], 0.0)
        lens = lens_ref[0, :]

        def z_at(t):
            return zt[t * d : (t + 1) * d, :]

        def x_at(t):
            return xt[t * l : (t + 1) * l, :]

        def kron(a, b):
            return jnp.concatenate(
                [a[i : i + 1, :] * b for i in range(a.shape[0])], axis=0
            )

        g1 = jnp.zeros((dd, Bn), dtype)
        g2 = jnp.zeros((dd, Bn), dtype)
        g3 = jnp.zeros((dd, Bn), dtype)
        g4 = jnp.zeros((l * l, Bn), dtype)
        g5 = jnp.zeros((d * l, Bn), dtype)
        g7 = jnp.zeros((d, Bn), dtype)
        g8 = jnp.zeros((d, Bn), dtype)
        g9 = jnp.zeros((l, Bn), dtype)
        for t in range(T):
            z_c, x_c = z_at(t), x_at(t)
            zz = kron(z_c, z_c)
            g1 = g1 + zz
            g4 = g4 + kron(x_c, x_c)
            g5 = g5 + kron(z_c, x_c)
            g8 = g8 + z_c
            g9 = g9 + x_c
            if t < T - 1:
                vm_n = (lens > t + 1).astype(dtype)[None, :]
                g2 = g2 + vm_n * zz
                g3 = g3 + kron(z_c, z_at(t + 1))
                g7 = g7 + vm_n * z_c
        z0 = z_at(0)
        g = jnp.concatenate(
            [
                g1,
                g2,
                g3,
                g4,
                g5,
                kron(z0, z0),
                g7,
                g8,
                g9,
                z0,
                lens.astype(dtype)[None, :],
                jnp.ones((1, Bn), dtype),
            ],
            axis=0,
        )  # (F, Bn)

        prev = prev_ref[0, :]
        validrow = prev >= 0
        if assign_mode == "prev":
            na = prev
            sw_p = jnp.zeros((1, 1), jnp.int32)
            obj_p = jnp.zeros((1, 1), dtype)
        else:
            scores = jnp.dot(
                wg_ref[:, :], g, preferred_element_type=dtype)  # (C, Bn)
            na = jnp.argmax(scores, axis=0).astype(jnp.int32)
            sw_p = jnp.sum(
                ((na != prev) & validrow).astype(jnp.int32)
            ).reshape(1, 1)
            best = jnp.max(scores, axis=0)  # (Bn,)
            obj_p = jnp.sum(
                jnp.where(validrow, best, 0.0)
            ).reshape(1, 1)

        subl = jax.lax.broadcasted_iota(jnp.int32, (C, Bn), 0)
        onehot = (na[None, :] == subl) & validrow[None, :]
        counts_p = jnp.sum(onehot.astype(jnp.int32), axis=1).reshape(1, C)
        mstats = _exact_stat_dot(g, onehot.astype(dtype).T, dtype)  # (F, C)

        assign_out[0, :] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)
            g_out[:, :] = jnp.zeros_like(g_out)
            obj_out[:, :] = jnp.zeros_like(obj_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p
        g_out[:, :] += mstats
        obj_out[:, :] += obj_p

    return kernel


def markov_em_fused(
    z_t: jax.Array,  # (T·d, n)
    x_t: jax.Array,  # (T·l, n)
    lens: jax.Array,  # (n,) int32
    prev_assign: jax.Array,  # (n,) int32
    Wg: jax.Array,  # (C, F) from markov.markov_em_weights (+ log π folded)
    *,
    T: int,
    d: int,
    l: int,
    assign_mode: str = "argmax",
    block_n: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One fused EM iteration pass: ``(assign, counts, switches,
    g_stats (F, C), objective ())`` — E assignment, per-cluster M
    sufficient statistics AND the complete-data objective of the
    incoming params (``Σ_i max_c scores`` = the reference's
    ``e_complete_data_log_lik`` under a fresh E) from a single read of
    the batch.  ``assign_mode="prev"`` reduces statistics under
    ``prev_assign`` without an E step (initial M step; objective is 0).
    Exact vs the unfused path in f64 interpret mode."""
    Td, n = z_t.shape
    assert Td == T * d and x_t.shape == (T * l, n)
    C, F = Wg.shape
    pad = (-n) % block_n
    if pad:
        z_t = jnp.concatenate(
            [z_t, jnp.zeros((T * d, pad), z_t.dtype)], axis=1
        )
        x_t = jnp.concatenate(
            [x_t, jnp.zeros((T * l, pad), x_t.dtype)], axis=1
        )
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
        prev_assign = jnp.concatenate(
            [prev_assign, jnp.full((pad,), -1, jnp.int32)]
        )
    n_pad = z_t.shape[1]
    a_out, c_out, w_out, g_out, o_out = pl.pallas_call(
        _markov_em_kernel(T, d, l, C, assign_mode),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((T * d, block_n), lambda i: (0, i)),
            pl.BlockSpec((T * l, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec(Wg.shape, lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((F, C), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((F, C), z_t.dtype),
            jax.ShapeDtypeStruct((1, 1), z_t.dtype),
        ),
        interpret=interpret,
    )(
        z_t,
        x_t,
        lens.astype(jnp.int32).reshape(1, n_pad),
        prev_assign.astype(jnp.int32).reshape(1, n_pad),
        Wg,
    )
    return a_out[0, :n], c_out[0], w_out[0, 0], g_out, o_out[0, 0]


def markov_packed_spec(T: int, d: int, l: int):
    """Accumulator layout for the packed fused EM kernel.

    The packed kernel never materializes the canonical per-row feature
    matrix ``g`` (F, Bn).  Instead each per-t block of the batch is laid
    out on ``s = 8·ceil((d+l)/8)`` sublanes (``[z_t; x_t; 0-pad]``), so a
    sublane shift by ``k`` pairs every row with its ``+k`` neighbour —
    intra-step products for ``k < d+l`` and (t, t+1) transition products
    for ``k ≥ s-d+1`` — and the sum over t of each product array is a
    whole-tile reduction.  Every canonical feature is then one row of the
    stacked accumulator ``ACC`` (Facc, Bn):

    - ``A_k``  (per shift k in ``ks``):  Σ_t u[st+r]·u[st+r+k]
    - ``B_k``  (k < d):  same with the vm_{t+1} mask (g2)
    - ``F0_k`` (k < d):  t=0-only products (g6)
    - ``AID`` Σ_t u_t (g8/g9), ``AVM`` Σ_t vm_{t+1}·u_t (g7),
      ``U0`` = u_0 (g10), ``EXTRA`` = [len, 1, 0…]

    Returns ``(s, ks, Facc, rows)`` with ``rows[f]`` the ACC row holding
    canonical feature ``f`` (the g-layout of
    :func:`..markov.markov_em_weights`).  Fold weights with
    ``Wacc = zeros(C, Facc).at[:, rows].add(Wg)`` (duplicate canonical
    rows — e.g. the symmetric (i,j)/(j,i) pairs — sum into one ACC slot)
    and recover statistics with ``g = macc[rows]``.
    """
    import numpy as np

    s = 8 * ((d + l + 7) // 8)
    ks = sorted(set(range(d + l)) | set(range(s - d + 1, s + d)))
    kpos = {k: i for i, k in enumerate(ks)}

    def A(k, r):
        return kpos[k] * s + r

    base_B = len(ks) * s
    base_F0 = base_B + d * s
    base_AID = base_F0 + d * s
    base_AVM = base_AID + s
    base_U0 = base_AVM + s
    base_EX = base_U0 + s
    Facc = base_EX + s

    rows = []
    pairs_d = [(i, j) for i in range(d) for j in range(d)]
    rows += [A(abs(i - j), min(i, j)) for i, j in pairs_d]  # g1
    rows += [base_B + abs(i - j) * s + min(i, j) for i, j in pairs_d]  # g2
    rows += [A(s + j - i, i) for i, j in pairs_d]  # g3
    rows += [
        A(abs(a - b), d + min(a, b))
        for a in range(l)
        for b in range(l)
    ]  # g4
    rows += [A(d + a - i, i) for i in range(d) for a in range(l)]  # g5
    rows += [base_F0 + abs(i - j) * s + min(i, j) for i, j in pairs_d]  # g6
    rows += [base_AVM + i for i in range(d)]  # g7
    rows += [base_AID + i for i in range(d)]  # g8
    rows += [base_AID + d + a for a in range(l)]  # g9
    rows += [base_U0 + i for i in range(d)]  # g10
    rows += [base_EX + 0, base_EX + 1]  # len, const
    return s, tuple(ks), Facc, np.asarray(rows, np.int64)


def pack_markov_u(
    z_t: jax.Array,  # (T·d, n) transposed latent batch (NaN-padded)
    x_t: jax.Array,  # (T·l, n)
    *,
    T: int,
    d: int,
    l: int,
    pad_to: int = 8192,
) -> jax.Array:
    """Interleave the batch per time step as ``[z_t; x_t; 0-pad]`` on
    ``s`` sublanes, NaN→0 sanitized, with the lane (instance) axis padded
    to a multiple of ``pad_to`` — the iteration-invariant input of the
    packed kernel.  Build ONCE per fit and hoist out of the EM loop:
    padding here (instead of per kernel call) avoids re-copying the whole
    batch every EM iteration.  The 8192 default is a multiple of every
    kernel block size, letting the features kernel run its largest lane
    blocks (measured ~2% over 2048-blocks at n=1e6)."""
    s = 8 * ((d + l + 7) // 8)
    n = z_t.shape[1]
    z3 = z_t.reshape(T, d, n)
    x3 = x_t.reshape(T, l, n)
    z3 = jnp.where(jnp.isfinite(z3), z3, 0.0)
    x3 = jnp.where(jnp.isfinite(x3), x3, 0.0)
    parts = [z3, x3]
    if s > d + l:
        parts.append(jnp.zeros((T, s - d - l, n), z_t.dtype))
    u = jnp.concatenate(parts, axis=1).reshape(T * s, n)
    pad = (-n) % pad_to
    if pad:
        u = jnp.concatenate([u, jnp.zeros((T * s, pad), u.dtype)], axis=1)
    return u


def _packed_acc_build(u, lens, *, T: int, d: int, s: int, ks: tuple):
    """Shared shift-product ACC build of the packed kernels: the
    (Facc, Bn) per-lane feature accumulator of :func:`markov_packed_spec`
    from the packed batch block ``u`` (T·s, Bn) and per-lane lengths.
    Parameter-independent — in the multi-restart kernel one build feeds
    every restart's score/stat GEMMs."""
    dtype = u.dtype
    Bn = u.shape[1]

    def shifted(k):
        if k == 0:
            return u
        return jnp.concatenate(
            [u[k:, :], jnp.zeros((k, Bn), dtype)], axis=0
        )

    def treduce(p):  # Σ over t of the per-t (s, Bn) blocks
        return jnp.sum(p.reshape(T, s, Bn), axis=0)

    def sblock_shift(a, k):  # (s, Bn) block shifted up by k, 0-fill
        if k == 0:
            return a
        return jnp.concatenate(
            [a[k:, :], jnp.zeros((k, Bn), dtype)], axis=0
        )

    # row s·t+r belongs to step t; the vm_{t+1}-masked statistics are
    # recovered algebraically from the unmasked sums minus the LAST
    # valid step's contribution (the only step where vm_{t+1} = 0 but
    # the data is nonzero) — 5 full masked product passes collapse
    # into one masked reduce + small (s, Bn) ops
    rowt = jax.lax.broadcasted_iota(jnp.int32, (T * s, Bn), 0) // s
    last_mask = (rowt + 1 == lens[None, :]).astype(dtype)
    ulast = treduce(u * last_mask)  # (s, Bn) last-step block

    a_groups = {k: treduce(u * shifted(k)) for k in ks}
    groups = [a_groups[k] for k in ks]  # A_k
    groups += [
        a_groups[k] - ulast * sblock_shift(ulast, k) for k in range(d)
    ]  # B_k = A_k − last-step products (intra rows)
    u0 = u[:s, :]
    groups += [u0 * u[k : k + s, :] for k in range(d)]  # F0_k
    aid = treduce(u)
    groups.append(aid)  # AID
    groups.append(aid - ulast)  # AVM = Σ vm_{t+1} u_t
    groups.append(u0)  # U0
    r_ex = jax.lax.broadcasted_iota(jnp.int32, (s, Bn), 0)
    extra = jnp.where(
        r_ex == 0,
        lens.astype(dtype)[None, :],
        jnp.where(r_ex == 1, jnp.ones((), dtype), jnp.zeros((), dtype)),
    )
    groups.append(extra)  # EXTRA: [len, 1, 0…]
    return jnp.concatenate(groups, axis=0)  # (Facc, Bn)


def _markov_em_packed_kernel(
    T: int, d: int, l: int, C: int, s: int, ks: tuple, assign_mode: str
):
    """Packed fused EM kernel: shift-products + whole-tile t-reductions
    feed one score GEMM and one statistics GEMM; no sub-8-sublane piece is
    ever built (the old kernel's ~T·(d+l)² kron/concat VPU bottleneck).
    Compile time is T-independent (no per-t unroll)."""

    def kernel(
        u_ref,  # (T·s, Bn) packed sanitized batch
        lens_ref,  # (1, Bn) int32
        prev_ref,  # (1, Bn) int32; padded lanes carry -1
        wacc_ref,  # (C, Facc) folded E-score weights
        assign_out,  # (1, Bn) int32
        counts_out,  # (1, C) int32
        switch_out,  # (1, 1) int32
        macc_out,  # (Facc, C) per-cluster summed ACC rows
        obj_out,  # (1, 1) float
    ):
        Bn = u_ref.shape[1]
        # compute dtype follows the weights; the batch may be stored in
        # bf16 (half the HBM stream) and is upcast right after the load
        dtype = wacc_ref.dtype
        u = u_ref[:, :].astype(dtype)
        lens = lens_ref[0, :]
        acc = _packed_acc_build(u, lens, T=T, d=d, s=s, ks=ks)

        prev = prev_ref[0, :]
        validrow = prev >= 0
        if assign_mode == "prev":
            na = prev
            sw_p = jnp.zeros((1, 1), jnp.int32)
            obj_p = jnp.zeros((1, 1), dtype)
        else:
            scores = jnp.dot(
                wacc_ref[:, :], acc, preferred_element_type=dtype)  # (C, Bn)
            na = jnp.argmax(scores, axis=0).astype(jnp.int32)
            sw_p = jnp.sum(
                ((na != prev) & validrow).astype(jnp.int32)
            ).reshape(1, 1)
            best = jnp.max(scores, axis=0)
            obj_p = jnp.sum(jnp.where(validrow, best, 0.0)).reshape(1, 1)

        subl = jax.lax.broadcasted_iota(jnp.int32, (C, Bn), 0)
        onehot = (na[None, :] == subl) & validrow[None, :]
        counts_p = jnp.sum(onehot.astype(jnp.int32), axis=1).reshape(1, C)
        mstats = _exact_stat_dot(acc, onehot.astype(dtype).T, dtype)  # (Facc, C)

        assign_out[0, :] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)
            macc_out[:, :] = jnp.zeros_like(macc_out)
            obj_out[:, :] = jnp.zeros_like(obj_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p
        macc_out[:, :] += mstats
        obj_out[:, :] += obj_p

    return kernel


def markov_em_fused_packed(
    u: jax.Array,  # (T·s, n) from pack_markov_u — hoist out of the EM loop
    lens: jax.Array,  # (n,) int32
    prev_assign: jax.Array,  # (n,) int32
    Wg: jax.Array,  # (C, F) canonical weights (+ log π folded)
    *,
    T: int,
    d: int,
    l: int,
    assign_mode: str = "argmax",
    block_n: int = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Packed fused EM iteration — same contract as
    :func:`markov_em_fused` (assign, counts, switches, g (F, C),
    objective) with the feature build done as tile-aligned shift products
    (see :func:`markov_packed_spec`).  Exact vs the unfused path in f64
    interpret mode (the symmetric-weight fold changes only the summation
    association).  ``block_n`` defaults by VMEM budget: the kernel keeps
    the (T·s, Bn) batch block plus a few shifted-product temporaries
    resident."""
    s, ks, Facc, rows = markov_packed_spec(T, d, l)
    if block_n is None:
        ts = T * s
        block_n = 2048 if ts <= 128 else (1024 if ts <= 256 else 512)
    Ts, n_pad = u.shape
    assert Ts == T * s, (Ts, T, s)
    n = lens.shape[0]  # true batch size; u may carry pre-padded lanes
    C = Wg.shape[0]
    rows_j = jnp.asarray(rows)
    wacc = jnp.zeros((C, Facc), Wg.dtype).at[:, rows_j].add(Wg)
    pad_u = (-n_pad) % block_n
    if pad_u:
        # slow path: caller did not pre-pad (pack_markov_u pads to 8192,
        # a multiple of every auto-selected block) — copies the batch!
        u = jnp.concatenate([u, jnp.zeros((Ts, pad_u), u.dtype)], axis=1)
        n_pad += pad_u
    if n_pad > n:
        lens = jnp.concatenate(
            [lens, jnp.zeros((n_pad - n,), lens.dtype)]
        )
        prev_assign = jnp.concatenate(
            [prev_assign, jnp.full((n_pad - n,), -1, jnp.int32)]
        )
    a_out, c_out, w_out, macc, o_out = pl.pallas_call(
        _markov_em_packed_kernel(T, d, l, C, s, ks, assign_mode),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((Ts, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((C, Facc), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((Facc, C), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((Facc, C), Wg.dtype),
            jax.ShapeDtypeStruct((1, 1), Wg.dtype),
        ),
        interpret=interpret,
    )(
        u,
        lens.astype(jnp.int32).reshape(1, n_pad),
        prev_assign.astype(jnp.int32).reshape(1, n_pad),
        wacc,
    )
    g = macc[rows_j, :]
    return a_out[0, :n], c_out[0], w_out[0, 0], g, o_out[0, 0]


def _markov_em_packed_multi_kernel(
    T: int, d: int, l: int, C: int, R: int, s: int, ks: tuple,
    assign_mode: str,
):
    """R-restart fused EM kernel: ONE batch read + ONE shift-product ACC
    build (parameter-independent) feed the score/stat GEMMs of R
    independent restarts.  Score rows are laid out c-major (row c·R + r)
    so the per-restart argmax over clusters is a static C-loop over
    8-aligned (R, Bn) slices, and both GEMMs run with M (resp. N) =
    C·R — at R=8, C=16 that fills the 128-row MXU tile the single-restart
    kernel uses at 1/8 utilization."""

    def kernel(
        u_ref,  # (T·s, Bn) packed sanitized batch (shared)
        lens_ref,  # (1, Bn) int32 (shared)
        prev_ref,  # (R, Bn) int32; padded lanes carry -1
        force_ref,  # (R, 1) int32; 1 ⇒ this slot takes prev (initial M)
        wacc_ref,  # (C·R, Facc) folded weights, row c·R + r
        assign_out,  # (R, Bn) int32
        counts_out,  # (1, C·R) int32, col c·R + r
        switch_out,  # (1, R) int32
        macc_out,  # (Facc, C·R) per-(cluster, restart) summed ACC rows
        obj_out,  # (1, R) float
    ):
        Bn = u_ref.shape[1]
        dtype = wacc_ref.dtype
        u = u_ref[:, :].astype(dtype)
        lens = lens_ref[0, :]
        acc = _packed_acc_build(u, lens, T=T, d=d, s=s, ks=ks)

        prev = prev_ref[:, :]  # (R, Bn)
        validrow = prev >= 0
        if assign_mode == "prev":
            na = prev
            sw_p = jnp.zeros((1, R), jnp.int32)
            obj_p = jnp.zeros((1, R), dtype)
        else:
            scores = jnp.dot(
                wacc_ref[:, :], acc, preferred_element_type=dtype)  # (C·R, Bn)
            # per-restart argmax over the C c-major slices (each an
            # R-sublane block — 8-aligned at the default R=8)
            best = scores[:R, :]
            na = jnp.zeros((R, Bn), jnp.int32)
            for c in range(1, C):
                cand = scores[c * R : (c + 1) * R, :]
                upd = cand > best
                na = jnp.where(upd, c, na)
                best = jnp.where(upd, cand, best)
            # per-slot prev-mode: a slot whose force flag is set takes
            # its incoming assignment verbatim (the pool scheduler's
            # freshly inserted candidate runs its initial M step in the
            # same dispatch as the others' argmax step; its scores —
            # from the raw constructor params — are discarded).  The
            # flag rides an (R, 1) block and broadcasts along lanes —
            # Mosaic cannot reshape 1-D mask vectors.
            fp = force_ref[:, :] > 0  # (R, 1)
            na = jnp.where(fp, prev, na)
            sw_p = jnp.sum(
                ((na != prev) & validrow).astype(jnp.int32),
                axis=1,
            ).reshape(1, R)
            obj_p = jnp.sum(
                jnp.where(validrow & jnp.logical_not(fp), best, 0.0),
                axis=1,
            ).reshape(1, R)

        onehot = jnp.concatenate(
            [
                ((na == c) & validrow).astype(dtype)
                for c in range(C)
            ],
            axis=0,
        )  # (C·R, Bn), row c·R + r
        counts_p = jnp.sum(onehot, axis=1).astype(jnp.int32).reshape(1, C * R)
        mstats = _exact_stat_dot(acc, onehot.T, dtype)  # (Facc, C·R)

        assign_out[:, :] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)
            macc_out[:, :] = jnp.zeros_like(macc_out)
            obj_out[:, :] = jnp.zeros_like(obj_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p
        macc_out[:, :] += mstats
        obj_out[:, :] += obj_p

    return kernel


def markov_em_fused_packed_multi(
    u: jax.Array,  # (T·s, n) from pack_markov_u — shared across restarts
    lens: jax.Array,  # (n,) int32
    prev_assign: jax.Array,  # (R, n) int32, one row per restart
    Wg: jax.Array,  # (R, C, F) canonical weights (+ log π folded)
    *,
    T: int,
    d: int,
    l: int,
    assign_mode: str = "argmax",
    force_prev: jax.Array = None,  # (R,) int32/bool; 1 ⇒ slot takes prev
    block_n: int = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """R-restart twin of :func:`markov_em_fused_packed`: runs R
    independent EM iterations over the SAME batch in one kernel pass —
    one HBM read and one feature build amortized over all restarts, and
    full-tile GEMMs (M = C·R score rows).  Returns
    ``(assign (R, n), counts (R, C), switches (R,), g (R, F, C),
    objectives (R,))``; each restart's outputs are bit-identical to an
    R=1 :func:`markov_em_fused_packed` call with the same weights (each
    score row / stat column is an independent dot product with the same
    reduction order).

    Built for the reference's 1000-restart multi-start protocol
    (marginalizable_mixture_model.py:1368-1471), where training cost is
    R× the single fit but the batch is identical across restarts.

    ``force_prev`` marks slots that take their incoming assignment
    verbatim this pass (per-slot prev mode — the pool scheduler's
    initial M step for a freshly inserted candidate); their switch
    count is 0 by construction and their objective output is 0."""
    s, ks, Facc, rows = markov_packed_spec(T, d, l)
    R, C, F = Wg.shape
    assert prev_assign.shape[0] == R, (prev_assign.shape, R)
    if block_n is None:
        ts = T * s
        block_n = 2048 if ts <= 128 else (1024 if ts <= 256 else 512)
    Ts, n_pad = u.shape
    assert Ts == T * s, (Ts, T, s)
    n = lens.shape[0]
    rows_j = jnp.asarray(rows)
    # row c·R + r  ←  Wg[r, c]
    w_cr = jnp.transpose(Wg, (1, 0, 2)).reshape(C * R, F)
    wacc = jnp.zeros((C * R, Facc), Wg.dtype).at[:, rows_j].add(w_cr)
    pad_u = (-n_pad) % block_n
    if pad_u:
        u = jnp.concatenate([u, jnp.zeros((Ts, pad_u), u.dtype)], axis=1)
        n_pad += pad_u
    if n_pad > n:
        lens = jnp.concatenate([lens, jnp.zeros((n_pad - n,), lens.dtype)])
        prev_assign = jnp.concatenate(
            [prev_assign, jnp.full((R, n_pad - n), -1, jnp.int32)], axis=1
        )
    if force_prev is None:
        force_prev = jnp.zeros((R,), jnp.int32)
    a_out, c_out, w_out, macc, o_out = pl.pallas_call(
        _markov_em_packed_multi_kernel(T, d, l, C, R, s, ks, assign_mode),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((Ts, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((R, block_n), lambda i: (0, i)),
            pl.BlockSpec((R, 1), lambda i: (0, 0)),
            pl.BlockSpec((C * R, Facc), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((R, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, C * R), lambda i: (0, 0)),
            pl.BlockSpec((1, R), lambda i: (0, 0)),
            pl.BlockSpec((Facc, C * R), lambda i: (0, 0)),
            pl.BlockSpec((1, R), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, C * R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((Facc, C * R), Wg.dtype),
            jax.ShapeDtypeStruct((1, R), Wg.dtype),
        ),
        interpret=interpret,
    )(
        u,
        lens.astype(jnp.int32).reshape(1, n_pad),
        prev_assign.astype(jnp.int32),
        force_prev.astype(jnp.int32).reshape(R, 1),
        wacc,
    )
    # column c·R + r  →  (R, F, C) / (R, C)
    g = macc[rows_j, :].reshape(F, C, R).transpose(2, 0, 1)
    counts = c_out[0].reshape(C, R).T
    return a_out[:, :n], counts, w_out[0], g, o_out[0]


def _markov_scores_grid_kernel(T: int, d: int, l: int, C: int):
    """Grid-over-T scores kernel: grid = (n/Bn, T) with T on the FAST
    axis so each (C, Bn) output block accumulates over consecutive grid
    steps.  Per step: the per-t features (~(3d²+l²+dl) rows) and two
    weight-slice GEMMs; the t==0 step adds the init/len/const terms.
    Compile time is T-independent (no static unroll)."""

    def kernel(
        z_ref,  # (1, d, Bn) time-slice t of the (T, d, n) batch
        zn_ref,  # (1, d, Bn) slice min(t+1, T-1) — z_{t+1} (clamped)
        x_ref,  # (1, l, Bn)
        lens_ref,  # (1, Bn) int32
        w1_ref,  # (C, d²+l²+dl)
        w2_ref,  # (C, 2d²)
        w3_ref,  # (C, d²+d+2)
        scores_out,  # (C, Bn), accumulated over the T axis
    ):
        t = pl.program_id(1)
        Bn = z_ref.shape[2]
        dtype = z_ref.dtype
        z_c = jnp.where(jnp.isfinite(z_ref[0]), z_ref[0], 0.0)
        z_n = jnp.where(jnp.isfinite(zn_ref[0]), zn_ref[0], 0.0)
        x_c = jnp.where(jnp.isfinite(x_ref[0]), x_ref[0], 0.0)
        lens = lens_ref[0, :]

        def kron(a, b):
            return jnp.concatenate(
                [a[i : i + 1, :] * b for i in range(a.shape[0])], axis=0
            )

        zz = kron(z_c, z_c)
        feat1 = jnp.concatenate(
            [zz, kron(x_c, x_c), kron(z_c, x_c)], axis=0
        )
        acc = jnp.dot(w1_ref[:, :], feat1, preferred_element_type=dtype)
        # transition pair (t, t+1): vm_{t+1} mask; the clamped zn at
        # t == T-1 is neutralized by vm_n == 0 there
        vm_n = ((lens > t + 1) & (t < T - 1)).astype(dtype)[None, :]
        feat2 = jnp.concatenate([zz, kron(z_c, z_n)], axis=0)
        acc = acc + vm_n * jnp.dot(
            w2_ref[:, :], feat2, preferred_element_type=dtype)

        @pl.when(t == 0)
        def _():
            scores_out[:, :] = jnp.zeros_like(scores_out)

        scores_out[:, :] += acc

        @pl.when(t == 0)
        def _():
            feat3 = jnp.concatenate(
                [
                    zz,
                    z_c,
                    lens.astype(dtype)[None, :],
                    jnp.ones((1, Bn), dtype),
                ],
                axis=0,
            )
            scores_out[:, :] += jnp.dot(
                w3_ref[:, :], feat3, preferred_element_type=dtype)

    return kernel


def _markov_stats_grid_kernel(T: int, d: int, l: int, C: int):
    """Grid-over-T statistics kernel (same layout as the scores kernel):
    given the final assignment, accumulate the per-cluster g-statistics
    (F, C) — each step contributes its per-t feature rows at the right
    offsets via one (F_t, Bn) @ (Bn, C) GEMM per mask group."""
    dd = d * d
    F = 4 * dd + l * l + d * l + 2 * d + l + d + 2
    # g-layout row offsets
    o_g1, o_g2, o_g3 = 0, dd, 2 * dd
    o_g4 = 3 * dd
    o_g5 = o_g4 + l * l
    o_g6 = o_g5 + d * l
    o_g7 = o_g6 + dd
    o_g8 = o_g7 + d
    o_g9 = o_g8 + d
    o_g10 = o_g9 + l
    o_len = o_g10 + d
    o_one = o_len + 1

    def kernel(
        z_ref,  # (1, d, Bn)
        zn_ref,  # (1, d, Bn)
        x_ref,  # (1, l, Bn)
        lens_ref,
        assign_ref,  # (1, Bn) int32; padded lanes carry C (excluded)
        g_out,  # (F, C) accumulated over the whole grid
    ):
        t = pl.program_id(1)
        Bn = z_ref.shape[2]
        dtype = z_ref.dtype
        z_c = jnp.where(jnp.isfinite(z_ref[0]), z_ref[0], 0.0)
        z_n = jnp.where(jnp.isfinite(zn_ref[0]), zn_ref[0], 0.0)
        x_c = jnp.where(jnp.isfinite(x_ref[0]), x_ref[0], 0.0)
        lens = lens_ref[0, :]
        a = assign_ref[0, :]
        subl = jax.lax.broadcasted_iota(jnp.int32, (C, Bn), 0)
        onehot_t = (a[None, :] == subl).astype(dtype).T  # (Bn, C)

        def kron(a_, b_):
            return jnp.concatenate(
                [a_[i : i + 1, :] * b_ for i in range(a_.shape[0])],
                axis=0,
            )

        zz = kron(z_c, z_c)
        vm_n = ((lens > t + 1) & (t < T - 1)).astype(dtype)[None, :]
        # vm_t-masked rows are implicit (NaN→0); vm_{t+1} rows explicit
        rows_a = jnp.concatenate(
            [zz, kron(x_c, x_c), kron(z_c, x_c), z_c, x_c], axis=0
        )  # -> g1, g4, g5, g8, g9
        rows_b = jnp.concatenate(
            [vm_n * zz, kron(z_c, z_n * vm_n), vm_n * z_c], axis=0
        )  # -> g2, g3, g7
        ga = _exact_stat_dot(rows_a, onehot_t, dtype)
        gb = _exact_stat_dot(rows_b, onehot_t, dtype)

        @pl.when((t == 0) & (pl.program_id(0) == 0))
        def _():
            g_out[:, :] = jnp.zeros_like(g_out)

        g_out[o_g1 : o_g1 + dd, :] += ga[:dd]
        g_out[o_g4 : o_g4 + l * l, :] += ga[dd : dd + l * l]
        g_out[o_g5 : o_g5 + d * l, :] += ga[dd + l * l : dd + l * l + d * l]
        g_out[o_g8 : o_g8 + d, :] += ga[
            dd + l * l + d * l : dd + l * l + d * l + d
        ]
        g_out[o_g9 : o_g9 + l, :] += ga[dd + l * l + d * l + d :]
        g_out[o_g2 : o_g2 + dd, :] += gb[:dd]
        g_out[o_g3 : o_g3 + dd, :] += gb[dd : 2 * dd]
        g_out[o_g7 : o_g7 + d, :] += gb[2 * dd :]

        @pl.when(t == 0)
        def _():
            rows_c = jnp.concatenate(
                [
                    zz,
                    z_c,
                    lens.astype(dtype)[None, :],
                    jnp.ones((1, Bn), dtype),
                ],
                axis=0,
            )
            gc = _exact_stat_dot(rows_c, onehot_t, dtype)
            g_out[o_g6 : o_g6 + dd, :] += gc[:dd]
            g_out[o_g10 : o_g10 + d, :] += gc[dd : dd + d]
            g_out[o_len : o_len + 1, :] += gc[dd + d : dd + d + 1]
            g_out[o_one : o_one + 1, :] += gc[dd + d + 1 :]

    return kernel


def markov_em_fused_longT(
    z_t: jax.Array,  # (T·d, n)
    x_t: jax.Array,  # (T·l, n)
    lens: jax.Array,  # (n,) int32
    prev_assign: jax.Array,  # (n,) int32
    W1: jax.Array,  # (C, d²+l²+dl)   — per-step vm_t weights
    W2: jax.Array,  # (C, 2d²)        — vm_{t+1} weights
    W3: jax.Array,  # (C, d²+d+2)     — init/len/const (+ log π folded)
    *,
    T: int,
    d: int,
    l: int,
    assign_mode: str = "argmax",
    block_n: int = 2048,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Grid-over-T fused EM iteration for arbitrary T — same outputs as
    :func:`markov_em_fused` (assign, counts, switches, g (F, C),
    objective) with compile time independent of T (the small-T kernel
    statically unrolls and stops compiling past T ≈ 16).  Three device
    passes: scores grid kernel → XLA argmax/counts/switches → stats
    grid kernel."""
    Td, n = z_t.shape
    assert Td == T * d and x_t.shape == (T * l, n)
    C = W1.shape[0]
    F = 4 * d * d + l * l + d * l + 2 * d + l + d + 2
    pad = (-n) % block_n
    if pad:
        z_t = jnp.concatenate(
            [z_t, jnp.zeros((T * d, pad), z_t.dtype)], axis=1
        )
        x_t = jnp.concatenate(
            [x_t, jnp.zeros((T * l, pad), x_t.dtype)], axis=1
        )
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
        prev_assign = jnp.concatenate(
            [prev_assign, jnp.full((pad,), -1, jnp.int32)]
        )
    n_pad = z_t.shape[1]
    nb = n_pad // block_n
    lens_r = lens.astype(jnp.int32).reshape(1, n_pad)
    # (T, d, n) views: compiled Pallas needs the sublane block dim to be
    # 8-divisible or equal to the full array dim — with a 3-D layout the
    # (1, d, block) block meets the rule for any d
    z3 = z_t.reshape(T, d, n_pad)
    x3 = x_t.reshape(T, l, n_pad)

    common_in_specs = [
        pl.BlockSpec((1, d, block_n), lambda j, t: (t, 0, j)),
        pl.BlockSpec(
            (1, d, block_n),
            lambda j, t: (jnp.minimum(t + 1, T - 1), 0, j),
        ),
        pl.BlockSpec((1, l, block_n), lambda j, t: (t, 0, j)),
        pl.BlockSpec((1, block_n), lambda j, t: (0, j)),
    ]
    valid = prev_assign >= 0
    if assign_mode == "prev":
        assign = jnp.where(valid, prev_assign, C)
        switches = jnp.zeros((), jnp.int32)
        obj = jnp.zeros((), z_t.dtype)
    else:
        scores = pl.pallas_call(
            _markov_scores_grid_kernel(T, d, l, C),
            grid=(nb, T),
            in_specs=common_in_specs
            + [
                pl.BlockSpec(W1.shape, lambda j, t: (0, 0)),
                pl.BlockSpec(W2.shape, lambda j, t: (0, 0)),
                pl.BlockSpec(W3.shape, lambda j, t: (0, 0)),
            ],
            out_specs=pl.BlockSpec((C, block_n), lambda j, t: (0, j)),
            out_shape=jax.ShapeDtypeStruct((C, n_pad), z_t.dtype),
            interpret=interpret,
        )(z3, z3, x3, lens_r, W1, W2, W3)
        na = jnp.argmax(scores, axis=0).astype(jnp.int32)
        assign = jnp.where(valid, na, C)
        switches = jnp.sum((na != prev_assign) & valid)
        obj = jnp.sum(jnp.where(valid, jnp.max(scores, axis=0), 0.0))
    lanes = jnp.arange(C, dtype=jnp.int32)
    counts = jnp.sum(
        ((assign[:, None] == lanes[None, :]) & valid[:, None]).astype(
            jnp.int32
        ),
        axis=0,
    )

    g = pl.pallas_call(
        _markov_stats_grid_kernel(T, d, l, C),
        grid=(nb, T),
        in_specs=common_in_specs
        + [pl.BlockSpec((1, block_n), lambda j, t: (0, j))],
        out_specs=pl.BlockSpec((F, C), lambda j, t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((F, C), z_t.dtype),
        interpret=interpret,
    )(z3, z3, x3, lens_r, assign.reshape(1, n_pad))

    assign_out = jnp.where(valid, assign, C)[:n]
    return assign_out, counts, jnp.asarray(switches, jnp.int32), g, obj


def markov_compact_spec(T: int, d: int, l: int):
    """Compact layout for MATERIALIZED per-instance features.

    The per-lane feature accumulator ``ACC`` of :func:`markov_packed_spec`
    is the Σ-over-t reduction of the packed batch's shift products — it is
    parameter-INDEPENDENT and (crucially) its row count ``Facc`` does not
    grow with ``T``.  Only the rows that some canonical feature references
    ever carry weight; the rest exist purely as shift-layout padding.
    This spec names that referenced subset, in ascending ACC order:

    - ``uniq``: the referenced ACC rows (``Fc`` of them),
    - ``pos``:  canonical feature ``f`` → its row in the compact layout,
    - ``Fc_pad``: ``Fc`` rounded up to the 8-sublane boundary.

    Materializing ``Φ = ACC[uniq]`` once per fit (one selection GEMM per
    batch tile, :func:`markov_materialize_features`) turns every later EM
    iteration into :func:`markov_em_from_features` — a read of Φ feeding
    one score GEMM and one statistics GEMM, with no shift-product build.
    Dropping the never-referenced rows changes no arithmetic: their fold
    weights are exact zeros, and removing ``0.0`` terms from a dot leaves
    every partial sum bit-identical.
    """
    import numpy as np

    _s, _ks, _Facc, rows = markov_packed_spec(T, d, l)
    uniq = np.unique(rows)  # ascending — preserves ACC summation order
    Fc = int(uniq.shape[0])
    Fc_pad = 8 * ((Fc + 7) // 8)
    pos = np.searchsorted(uniq, rows).astype(np.int64)
    return Fc_pad, uniq, pos


def _feature_layout(T: int, d: int, l: int, layout: str):
    """(padded row count, canonical-feature→row map) for a Φ layout."""
    import numpy as np

    if layout == "compact":
        Fc_pad, _uniq, pos = markov_compact_spec(T, d, l)
        return Fc_pad, pos
    assert layout == "canonical", layout
    F = 4 * d * d + l * l + d * l + 2 * d + l + d + 2
    return 8 * ((F + 7) // 8), np.arange(F, dtype=np.int64)


def _markov_feat_kernel(T: int, d: int, s: int, ks: tuple):
    """Feature-materialization kernel: one shift-product ACC build per
    batch tile, compacted to the referenced rows by a 0/1 selection GEMM
    (static sublane gathers of ~100 single rows would rebuild the exact
    sub-8-sublane concat bottleneck the packed layout removed)."""

    def kernel(
        u_ref,  # (T·s, Bn) packed sanitized batch
        lens_ref,  # (1, Bn) int32
        sel_ref,  # (Fc_pad, Facc) 0/1 row-selection matrix
        phi_out,  # (Fc_pad, Bn); may be a narrower storage dtype
    ):
        dtype = sel_ref.dtype
        u = u_ref[:, :].astype(dtype)
        lens = lens_ref[0, :]
        acc = _packed_acc_build(u, lens, T=T, d=d, s=s, ks=ks)
        phi_out[:, :] = _exact_stat_dot_r(sel_ref[:, :], acc, dtype).astype(phi_out.dtype)

    return kernel


def markov_materialize_features(
    u: jax.Array,  # (T·s, n) from pack_markov_u
    lens: jax.Array,  # (n,) int32
    *,
    T: int,
    d: int,
    l: int,
    block_n: int = None,
    dtype=None,
    store_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Materialize the per-instance Markov EM features Φ (Fc_pad, n_pad).

    One O(T) pass over the packed batch; Φ's row count is T-independent
    (the time axis is reduced inside the build), so EM iterations driven
    from Φ (:func:`markov_em_from_features`) cost the same at any T.
    Build once per fit, outside the EM loop — the payoff is that the
    per-iteration shift-product VPU work (the packed kernel's dominant
    cost) is paid exactly once.

    ``store_dtype`` (default: compute ``dtype``) stores Φ narrower —
    ``bfloat16`` halves the per-iteration HBM stream (measured 0.91 →
    0.63 ms/iter at n=1e6) at a documented accuracy cost: scores AND M
    sufficient statistics then carry ~3-digit feature precision, so EM
    trajectories deviate from the f32/f64 reference path (opt-in only)."""
    s, ks, Facc, _rows = markov_packed_spec(T, d, l)
    Fc_pad, uniq, _pos = markov_compact_spec(T, d, l)
    if dtype is None:
        dtype = jnp.float32 if u.dtype == jnp.bfloat16 else u.dtype
    if store_dtype is None:
        store_dtype = dtype
    if block_n is None:
        ts = T * s
        block_n = 2048 if ts <= 128 else (1024 if ts <= 256 else 512)
    Ts, n_pad = u.shape
    assert Ts == T * s, (Ts, T, s)
    n = lens.shape[0]
    pad_u = (-n_pad) % block_n
    if pad_u:
        u = jnp.concatenate([u, jnp.zeros((Ts, pad_u), u.dtype)], axis=1)
        n_pad += pad_u
    if n_pad > n:
        lens = jnp.concatenate([lens, jnp.zeros((n_pad - n,), lens.dtype)])
    sel = (
        jnp.zeros((Fc_pad, Facc), dtype)
        .at[jnp.arange(uniq.shape[0]), jnp.asarray(uniq)]
        .set(1.0)
    )
    return pl.pallas_call(
        _markov_feat_kernel(T, d, s, ks),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((Ts, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((Fc_pad, Facc), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Fc_pad, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((Fc_pad, n_pad), store_dtype),
        interpret=interpret,
    )(u, lens.astype(jnp.int32).reshape(1, n_pad), sel)


def _markov_em_feat_kernel(C: int, assign_mode: str):
    """EM-iteration kernel over materialized features: stream one Φ tile
    from HBM into a score GEMM + argmax + statistics GEMM.  No feature
    build — the kernel is HBM-bound on the Φ read (the packed kernel is
    VPU-bound on its per-iteration shift-product build)."""

    def kernel(
        phi_ref,  # (Fc_pad, Bn) materialized features
        prev_ref,  # (1, Bn) int32; padded lanes carry -1
        wc_ref,  # (C, Fc_pad) compact-folded E-score weights
        assign_out,  # (1, Bn) int32
        counts_out,  # (1, C) int32
        switch_out,  # (1, 1) int32
        macc_out,  # (Fc_pad, C) per-cluster summed feature rows
        obj_out,  # (1, 1) float
    ):
        Bn = phi_ref.shape[1]
        dtype = wc_ref.dtype
        # int16-quantized Φ streams as TWO int8-range planes
        # (q = 256·(q≫8) + (q & 0xFF)) — every plane value is exactly
        # bf16-representable, so plain default-precision GEMMs give
        # EXACT feature products for both scores and stats at native
        # single-pass speed (no f32 split chain; see _exact_stat_dot
        # for the wide-Φ story)
        q_i16 = jnp.dtype(phi_ref.dtype) == jnp.int16
        if q_i16:
            # int16 payloads carry <= 15 mantissa bits, so a 2-term bf16
            # float split is EXACT: t1 = bf16(q) is an integer multiple
            # of a power of two with |q - t1| <= 64, making the residual
            # a bf16-exact small integer.  Both planes are then native
            # single-pass GEMM operands with exact products.
            qf = phi_ref[:, :].astype(dtype)
            hi = qf.astype(jnp.bfloat16)
            lo = (qf - hi.astype(dtype)).astype(jnp.bfloat16)
        else:
            phi = phi_ref[:, :].astype(dtype)
        prev = prev_ref[0, :]
        validrow = prev >= 0
        if assign_mode == "prev":
            na = prev
            sw_p = jnp.zeros((1, 1), jnp.int32)
            obj_p = jnp.zeros((1, 1), dtype)
        else:
            if q_i16:
                scores = jnp.dot(
                    wc_ref[:, :], hi, preferred_element_type=dtype
                ) + jnp.dot(
                    wc_ref[:, :], lo, preferred_element_type=dtype
                )  # (C, Bn)
            else:
                scores = jnp.dot(
                    wc_ref[:, :], phi, preferred_element_type=dtype)  # (C, Bn)
            na = jnp.argmax(scores, axis=0).astype(jnp.int32)
            sw_p = jnp.sum(
                ((na != prev) & validrow).astype(jnp.int32)
            ).reshape(1, 1)
            best = jnp.max(scores, axis=0)
            obj_p = jnp.sum(jnp.where(validrow, best, 0.0)).reshape(1, 1)

        subl = jax.lax.broadcasted_iota(jnp.int32, (C, Bn), 0)
        onehot = (na[None, :] == subl) & validrow[None, :]
        counts_p = jnp.sum(onehot.astype(jnp.int32), axis=1).reshape(1, C)
        oh_t = onehot.astype(dtype).T
        if q_i16:
            mstats = jnp.dot(
                hi, oh_t, preferred_element_type=dtype
            ) + jnp.dot(lo, oh_t, preferred_element_type=dtype)
        else:
            mstats = _exact_stat_dot(phi, oh_t, dtype)  # (Fc_pad, C)

        assign_out[0, :] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)
            macc_out[:, :] = jnp.zeros_like(macc_out)
            obj_out[:, :] = jnp.zeros_like(obj_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p
        macc_out[:, :] += mstats
        obj_out[:, :] += obj_p

    return kernel


def markov_em_from_features(
    phi: jax.Array,  # (Fc_pad, n_pad) from markov_materialize_features
    lens: jax.Array,  # (n,) int32 — true batch size carrier
    prev_assign: jax.Array,  # (n,) int32
    Wg: jax.Array,  # (C, F) canonical weights (+ log π folded)
    *,
    T: int,
    d: int,
    l: int,
    assign_mode: str = "argmax",
    block_n: int = None,
    layout: str = "compact",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """EM iteration over MATERIALIZED features — same contract as
    :func:`markov_em_fused_packed` (assign, counts, switches, g (F, C),
    objective), reading the per-fit Φ instead of rebuilding shift
    products from the batch.  Iteration cost is T-independent.  Exact vs
    the packed path in f64 (dropped slots carry weight 0.0; the kept
    slots keep their relative summation order); f32 at reassociation
    noise.

    ``layout`` names Φ's row order: ``"compact"`` (the referenced ACC
    rows of :func:`markov_materialize_features`) or ``"canonical"`` (the
    g-layout rows of :func:`markov_materialize_features_longT`).

    ``phi`` may be a :class:`PhiQuant`: the kernel then streams the
    int16 payload (half the HBM bytes) with the per-row scales folded
    into the score weights and un-folded from the stats GEMM output —
    see :class:`PhiQuant` for the exactness argument."""
    phi_scale = None
    if isinstance(phi, PhiQuant):
        phi, phi_scale = phi.q, phi.scale
    Fc_pad, pos = _feature_layout(T, d, l, layout)
    Fp, n_pad = phi.shape
    assert Fp == Fc_pad, (Fp, Fc_pad)
    n = lens.shape[0]
    C = Wg.shape[0]
    if block_n is None:
        # Φ tiles are short (Fc_pad sublanes) — bigger lane blocks keep
        # the DMA pipeline deeper at negligible VMEM cost (measured:
        # 8192 ≈ 2% over 2048 at n=1e6); the fallback chain must end in
        # a divisor of n_pad (callers may pack with pad_to as small as
        # 512), so the last resort is n_pad itself.  The HIGHEST-
        # precision GEMMs (see _HI) decompose the Φ operand into
        # multi-pass splits — measured scoped-VMEM need ≈ 6× the f32 Φ
        # block — so the block is also capped against the 16 MB scoped
        # budget (8192 lanes OOMed at Fc_pad=112 under HIGHEST).
        # live set ≈ Φ f32 (4B) + r1 f32 (4B) + 3 bf16 split terms (6B)
        # ≈ 14 B/element of the Φ block (the manual exact-stats split)
        budget = 14 * 2**20
        block_n = next(
            (
                b
                for b in (8192, 4096, 2048, 1024, 512, 256, 128)
                if n_pad % b == 0 and 14 * Fc_pad * b <= budget
            ),
            n_pad,
        )
    assert n_pad % block_n == 0, (n_pad, block_n)
    pos_j = jnp.asarray(pos)
    wc = jnp.zeros((C, Fc_pad), Wg.dtype).at[:, pos_j].add(Wg)
    if phi_scale is not None:
        wc = wc * phi_scale[None, :].astype(wc.dtype)
    if n_pad > n:
        prev_assign = jnp.concatenate(
            [prev_assign, jnp.full((n_pad - n,), -1, jnp.int32)]
        )
    a_out, c_out, w_out, macc, o_out = pl.pallas_call(
        _markov_em_feat_kernel(C, assign_mode),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((Fc_pad, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((C, Fc_pad), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((Fc_pad, C), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, C), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct((Fc_pad, C), Wg.dtype),
            jax.ShapeDtypeStruct((1, 1), Wg.dtype),
        ),
        interpret=interpret,
    )(
        phi,
        prev_assign.astype(jnp.int32).reshape(1, n_pad),
        wc,
    )
    g = macc[pos_j, :]
    if phi_scale is not None:
        g = g * jnp.take(phi_scale, pos_j)[:, None].astype(g.dtype)
    return a_out[0, :n], c_out[0], w_out[0, 0], g, o_out[0, 0]


def _markov_em_feat_multi_kernel(C: int, R: int, assign_mode: str):
    """R-restart twin of :func:`_markov_em_feat_kernel`: one Φ tile read
    feeds the score/stat GEMMs of R independent restarts (rows c·R + r,
    the :func:`_markov_em_packed_multi_kernel` layout)."""

    def kernel(
        phi_ref,  # (Fc_pad, Bn) materialized features (shared)
        prev_ref,  # (R, Bn) int32; padded lanes carry -1
        force_ref,  # (R, 1) int32; 1 ⇒ this slot takes prev (initial M)
        wc_ref,  # (C·R, Fc_pad) compact-folded weights, row c·R + r
        assign_out,  # (R, Bn) int32
        counts_out,  # (1, C·R) int32, col c·R + r
        switch_out,  # (1, R) int32
        macc_out,  # (Fc_pad, C·R)
        obj_out,  # (1, R) float
    ):
        Bn = phi_ref.shape[1]
        dtype = wc_ref.dtype
        # int16 Φ: hi/lo int8-range planes, exact GEMM products at
        # default precision (see the single-restart kernel)
        q_i16 = jnp.dtype(phi_ref.dtype) == jnp.int16
        if q_i16:
            # 2-term exact bf16 float split (see single-restart kernel)
            qf = phi_ref[:, :].astype(dtype)
            hi = qf.astype(jnp.bfloat16)
            lo = (qf - hi.astype(dtype)).astype(jnp.bfloat16)
        else:
            phi = phi_ref[:, :].astype(dtype)
        prev = prev_ref[:, :]  # (R, Bn)
        validrow = prev >= 0
        if assign_mode == "prev":
            na = prev
            sw_p = jnp.zeros((1, R), jnp.int32)
            obj_p = jnp.zeros((1, R), dtype)
        else:
            if q_i16:
                scores = jnp.dot(
                    wc_ref[:, :], hi, preferred_element_type=dtype
                ) + jnp.dot(
                    wc_ref[:, :], lo, preferred_element_type=dtype
                )  # (C·R, Bn)
            else:
                scores = jnp.dot(
                    wc_ref[:, :], phi, preferred_element_type=dtype)  # (C·R, Bn)
            best = scores[:R, :]
            na = jnp.zeros((R, Bn), jnp.int32)
            for c in range(1, C):
                cand = scores[c * R : (c + 1) * R, :]
                upd = cand > best
                na = jnp.where(upd, c, na)
                best = jnp.where(upd, cand, best)
            fp = force_ref[:, :] > 0  # (R, 1)
            na = jnp.where(fp, prev, na)
            sw_p = jnp.sum(
                ((na != prev) & validrow).astype(jnp.int32), axis=1
            ).reshape(1, R)
            obj_p = jnp.sum(
                jnp.where(validrow & jnp.logical_not(fp), best, 0.0),
                axis=1,
            ).reshape(1, R)

        onehot = jnp.concatenate(
            [((na == c) & validrow).astype(dtype) for c in range(C)],
            axis=0,
        )  # (C·R, Bn), row c·R + r
        counts_p = jnp.sum(onehot, axis=1).astype(jnp.int32).reshape(
            1, C * R
        )
        if q_i16:
            mstats = jnp.dot(
                hi, onehot.T, preferred_element_type=dtype
            ) + jnp.dot(lo, onehot.T, preferred_element_type=dtype)
        else:
            mstats = _exact_stat_dot(phi, onehot.T, dtype)  # (Fc_pad, C·R)

        assign_out[:, :] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)
            macc_out[:, :] = jnp.zeros_like(macc_out)
            obj_out[:, :] = jnp.zeros_like(obj_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p
        macc_out[:, :] += mstats
        obj_out[:, :] += obj_p

    return kernel


def markov_em_from_features_multi(
    phi: jax.Array,  # (Fc_pad, n_pad) from markov_materialize_features
    lens: jax.Array,  # (n,) int32 — true batch size carrier
    prev_assign: jax.Array,  # (R, n) int32
    Wg: jax.Array,  # (R, C, F) canonical weights (+ log π folded)
    *,
    T: int,
    d: int,
    l: int,
    assign_mode: str = "argmax",
    force_prev: jax.Array = None,  # (R,) int32/bool
    block_n: int = None,
    layout: str = "compact",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """R-restart EM iteration over MATERIALIZED features — the
    :func:`markov_em_fused_packed_multi` contract driven from Φ: the
    per-iteration shift-product build disappears entirely and both GEMMs
    contract over the compact rows (about half of Facc), so a pool
    multi-iteration costs roughly the Φ read plus the C·R-row GEMMs.
    ``phi`` may be a :class:`PhiQuant` (int16 payload; scales folded
    into the weights / un-folded from the stats — see the single-restart
    wrapper)."""
    phi_scale = None
    if isinstance(phi, PhiQuant):
        phi, phi_scale = phi.q, phi.scale
    Fc_pad, pos = _feature_layout(T, d, l, layout)
    Fp, n_pad = phi.shape
    assert Fp == Fc_pad, (Fp, Fc_pad)
    R, C, F = Wg.shape
    assert prev_assign.shape[0] == R, (prev_assign.shape, R)
    n = lens.shape[0]
    if block_n is None:
        # the (C·R, Bn) scores and onehot tiles dominate VMEM at large R
        # — cap the lane block so they fit the ~16 MB scoped budget
        # (the 6·Fc_pad term is the HIGHEST-precision GEMM's multi-pass
        # Φ-split scratch, see the single-restart chain above)
        budget = 10 * 2**20
        block_n = next(
            (
                b
                for b in (8192, 4096, 2048, 1024, 512)
                if n_pad % b == 0
                and (2 * C * R + 6 * Fc_pad + R) * b * 4 <= budget
            ),
            # over-budget or odd n_pad: the largest small block that
            # still divides n_pad (never a non-divisor constant)
            next(
                (b for b in (512, 256, 128) if n_pad % b == 0), n_pad
            ),
        )
    assert n_pad % block_n == 0, (n_pad, block_n)
    pos_j = jnp.asarray(pos)
    # row c·R + r  ←  Wg[r, c]
    w_cr = jnp.transpose(Wg, (1, 0, 2)).reshape(C * R, F)
    wc = jnp.zeros((C * R, Fc_pad), Wg.dtype).at[:, pos_j].add(w_cr)
    if phi_scale is not None:
        wc = wc * phi_scale[None, :].astype(wc.dtype)
    if n_pad > n:
        prev_assign = jnp.concatenate(
            [prev_assign, jnp.full((R, n_pad - n), -1, jnp.int32)], axis=1
        )
    if force_prev is None:
        force_prev = jnp.zeros((R,), jnp.int32)
    a_out, c_out, w_out, macc, o_out = pl.pallas_call(
        _markov_em_feat_multi_kernel(C, R, assign_mode),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((Fc_pad, block_n), lambda i: (0, i)),
            pl.BlockSpec((R, block_n), lambda i: (0, i)),
            pl.BlockSpec((R, 1), lambda i: (0, 0)),
            pl.BlockSpec((C * R, Fc_pad), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((R, block_n), lambda i: (0, i)),
            pl.BlockSpec((1, C * R), lambda i: (0, 0)),
            pl.BlockSpec((1, R), lambda i: (0, 0)),
            pl.BlockSpec((Fc_pad, C * R), lambda i: (0, 0)),
            pl.BlockSpec((1, R), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, n_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, C * R), jnp.int32),
            jax.ShapeDtypeStruct((1, R), jnp.int32),
            jax.ShapeDtypeStruct((Fc_pad, C * R), Wg.dtype),
            jax.ShapeDtypeStruct((1, R), Wg.dtype),
        ),
        interpret=interpret,
    )(
        phi,
        prev_assign.astype(jnp.int32),
        force_prev.astype(jnp.int32).reshape(R, 1),
        wc,
    )
    # column c·R + r  →  (R, F, C) / (R, C)
    g_rows = macc[pos_j, :]
    if phi_scale is not None:
        g_rows = g_rows * jnp.take(phi_scale, pos_j)[:, None].astype(
            g_rows.dtype
        )
    g = g_rows.reshape(F, C, R).transpose(2, 0, 1)
    counts = c_out[0].reshape(C, R).T
    return a_out[:, :n], counts, w_out[0], g, o_out[0]


def _markov_feat_grid_kernel(T: int, d: int, l: int, narrow: bool = False):
    """Grid-over-T feature-materialization kernel: per (n-block, t) step
    accumulate the canonical g-layout feature rows of
    :func:`..markov.markov_em_features` into the Φ output block.  The
    kron pieces are sub-8-sublane concats (the legacy kernel's VPU
    bottleneck) — acceptable here because materialization runs ONCE per
    fit; every EM iteration then reads Φ at T-independent cost.

    ``narrow`` accumulates in a full-precision VMEM scratch and casts to
    the (narrower) output dtype once, at the block's final time step —
    the narrow-store Φ is then bit-identical to casting the wide Φ."""
    dd = d * d
    F = 4 * dd + l * l + d * l + 2 * d + l + d + 2
    o_g1, o_g2, o_g3 = 0, dd, 2 * dd
    o_g4 = 3 * dd
    o_g5 = o_g4 + l * l
    o_g6 = o_g5 + d * l
    o_g7 = o_g6 + dd
    o_g8 = o_g7 + d
    o_g9 = o_g8 + d
    o_g10 = o_g9 + l
    o_len = o_g10 + d
    o_one = o_len + 1

    def kernel(
        z_ref,  # (1, d, Bn) time-slice t
        zn_ref,  # (1, d, Bn) slice min(t+1, T-1)
        x_ref,  # (1, l, Bn)
        lens_ref,  # (1, Bn) int32
        phi_out,  # (F_pad, Bn), accumulated over the T axis
        *scratch,  # narrow: (F_pad, Bn) compute-dtype accumulator
    ):
        acc = scratch[0] if narrow else phi_out
        t = pl.program_id(1)
        Bn = z_ref.shape[2]
        dtype = z_ref.dtype
        z_c = jnp.where(jnp.isfinite(z_ref[0]), z_ref[0], 0.0)
        z_n = jnp.where(jnp.isfinite(zn_ref[0]), zn_ref[0], 0.0)
        x_c = jnp.where(jnp.isfinite(x_ref[0]), x_ref[0], 0.0)
        lens = lens_ref[0, :]

        def kron(a_, b_):
            return jnp.concatenate(
                [a_[i : i + 1, :] * b_ for i in range(a_.shape[0])],
                axis=0,
            )

        zz = kron(z_c, z_c)
        vm_n = ((lens > t + 1) & (t < T - 1)).astype(dtype)[None, :]

        @pl.when(t == 0)
        def _():
            acc[:, :] = jnp.zeros_like(acc)

        acc[o_g1 : o_g1 + dd, :] += zz
        acc[o_g2 : o_g2 + dd, :] += vm_n * zz
        acc[o_g3 : o_g3 + dd, :] += kron(z_c, z_n * vm_n)
        acc[o_g4 : o_g4 + l * l, :] += kron(x_c, x_c)
        acc[o_g5 : o_g5 + d * l, :] += kron(z_c, x_c)
        acc[o_g7 : o_g7 + d, :] += vm_n * z_c
        acc[o_g8 : o_g8 + d, :] += z_c
        acc[o_g9 : o_g9 + l, :] += x_c

        @pl.when(t == 0)
        def _():
            acc[o_g6 : o_g6 + dd, :] += zz
            acc[o_g10 : o_g10 + d, :] += z_c
            acc[o_len : o_len + 1, :] += lens.astype(dtype)[None, :]
            acc[o_one : o_one + 1, :] += jnp.ones((1, Bn), dtype)

        if narrow:

            @pl.when(t == T - 1)
            def _():
                phi_out[:, :] = acc[:, :].astype(phi_out.dtype)

    return kernel


def markov_materialize_features_longT(
    z_t: jax.Array,  # (T·d, n) transposed latent batch (NaN-padded)
    x_t: jax.Array,  # (T·l, n)
    lens: jax.Array,  # (n,) int32
    *,
    T: int,
    d: int,
    l: int,
    block_n: int = 2048,
    store_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    """Materialize canonical-layout features Φ (F_pad, n_pad) for
    ARBITRARY T — the grid-over-T twin of
    :func:`markov_materialize_features` (whose packed ACC build caps at
    T·s ≤ 512 of VMEM).  One O(T) grid pass per fit; with
    ``layout="canonical"`` :func:`markov_em_from_features` then runs EM
    iterations whose cost does not grow with T at all (Φ's row count is
    the T-independent canonical feature count).

    ``store_dtype`` narrower than the compute dtype (the bf16 Φ opt-in,
    same trade-off as :func:`markov_materialize_features`) accumulates
    across grid steps in a full-precision VMEM scratch and casts once at
    each block's final step — bit-identical to casting the wide Φ."""
    F_pad, _pos = _feature_layout(T, d, l, "canonical")
    Td, n = z_t.shape
    assert Td == T * d and x_t.shape == (T * l, n)
    dtype = z_t.dtype
    if store_dtype is None:
        store_dtype = dtype
    narrow = store_dtype != dtype
    pad = (-n) % block_n
    if pad:
        z_t = jnp.concatenate(
            [z_t, jnp.zeros((T * d, pad), dtype)], axis=1
        )
        x_t = jnp.concatenate(
            [x_t, jnp.zeros((T * l, pad), x_t.dtype)], axis=1
        )
        lens = jnp.concatenate([lens, jnp.zeros((pad,), lens.dtype)])
    n_pad = z_t.shape[1]
    nb = n_pad // block_n
    z3 = z_t.reshape(T, d, n_pad)
    x3 = x_t.reshape(T, l, n_pad)
    if narrow:
        from jax.experimental.pallas import tpu as pltpu

        scratch = [pltpu.VMEM((F_pad, block_n), dtype)]
    else:
        scratch = []
    return pl.pallas_call(
        _markov_feat_grid_kernel(T, d, l, narrow=narrow),
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, d, block_n), lambda j, t: (t, 0, j)),
            pl.BlockSpec(
                (1, d, block_n),
                lambda j, t: (jnp.minimum(t + 1, T - 1), 0, j),
            ),
            pl.BlockSpec((1, l, block_n), lambda j, t: (t, 0, j)),
            pl.BlockSpec((1, block_n), lambda j, t: (0, j)),
        ],
        out_specs=pl.BlockSpec((F_pad, block_n), lambda j, t: (0, j)),
        out_shape=jax.ShapeDtypeStruct((F_pad, n_pad), store_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(z3, z3, x3, lens.astype(jnp.int32).reshape(1, n_pad))
