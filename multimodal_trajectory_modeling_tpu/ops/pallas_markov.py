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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["markov_assign_suffix"]


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
            wcat_ref[:, :], feat, preferred_element_type=dtype
        )

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
                wg_ref[:, :], g, preferred_element_type=dtype
            )  # (C, Bn)
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
        mstats = jnp.dot(
            g, onehot.astype(dtype).T, preferred_element_type=dtype
        )  # (F, C)

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
