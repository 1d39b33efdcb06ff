"""Pallas TPU kernel: fused M-step sufficient statistics.

The M step reduces masked, cluster-weighted outer-product statistics over
the whole batch (transition pairs, measurement pairs, initial moments).
The XLA einsum path reads the batch several times and materializes masked
copies; this kernel streams each tile of the *packed* batch through VMEM
once.

Input layout: the packed joint matrix ``v (n, D)`` with
``D = T·d + T·l`` and per-instance rows ``[z_1..z_T, x_1..x_T]`` — the same
array the E step consumes, so the kernel adds no HBM footprint.  (A
``(T, n, d)`` layout would lane-pad the tiny trailing dims 25-40× and blow
VMEM; packing puts the full D on the lane axis.)

Formulation: for each time step build the augmented row matrix
``U_t = [in_t, out_t, 1]`` and the masked Khatri–Rao weight block
``B_t[i, c·u+j] = w_ic · U_t[i, j]`` (w_c = one-hot membership ×
validity); then ``S += U_tᵀ B_t`` is ONE MXU GEMM per time step whose
(u × C·u) output contains every statistic at once — X^TX, X^TY, Y^TY,
ΣX, ΣY and the pair count per cluster.

``B_t`` is built *wide*: ``B = W_exp ⊙ (U @ F)`` where
``W_exp[i, k] = (assign_i == k//u)`` is a VPU compare against a lane iota
and ``F[j, k] = (k%u == j)`` is a constant 0/1 tiling matrix, so ``U @ F``
replicates ``U`` C times in one MXU GEMM.  An earlier revision instead
concatenated C per-cluster ``(block, u)`` slices — each lane-padded
u→128 — which blew scoped VMEM (needed a 100 MB override at block 512)
and ran 166 ms at n=1e6; this formulation never materializes anything
narrower than C·u lanes and unrolls T, not T×C.  Measured on one v5e
chip at n=1e6, T=10, d=5, l=3, C=16: 24 ms (vs 88 ms for the XLA
einsum path); exact in f64 interpret mode, f32 at reassociation noise.
The production path is now :func:`mstep_stats_gram_sorted` (whole-row
Gram, ~8.8 ms kernel time at the same config with 4096-row blocks);
this per-t kernel remains the unsorted-batch fallback.

Host-side :func:`unpack_mstep_stats` splits the three accumulated matrices
(transitions, measurements, initial moments) into
:class:`~..ops.regression.RegressionStats` / ``MomentStats``.
"""

from __future__ import annotations

import functools

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_trajectory_modeling_tpu.ops import regression as rops

__all__ = [
    "mstep_stats_pallas",
    "unpack_mstep_stats",
    "mstep_stats_gram_sorted",
]


def _mstep_kernel(T: int, d: int, l: int, C: int):
    u_t = 2 * d + 1  # [z_t, z_{t+1}, 1]
    u_m = d + l + 1  # [z_t, x_t, 1]
    u_i = d + 1  # [z_0, 1]

    def kernel(v_ref, assign_ref, t_out, m_out, i_out):
        Bn = assign_ref.shape[0]
        dtype = v_ref.dtype
        ones = jnp.ones((Bn, 1), dtype)
        a = assign_ref[:, :]  # (Bn, 1) int32; padded rows carry C

        def z_at(t):
            return v_ref[:, t * d : (t + 1) * d]

        def x_at(t):
            off = T * d
            return v_ref[:, off + t * l : off + (t + 1) * l]

        def khatri_gemm(U, w_valid):
            # B[i, c*u+j] = (a_i == c) * valid_i * U[i, j];  S = Uᵀ B.
            # Wide construction: one lane-iota compare + one tiling GEMM —
            # nothing narrower than C·u lanes is ever materialized.
            u = U.shape[1]
            K = C * u
            kc = jax.lax.broadcasted_iota(jnp.int32, (Bn, K), 1) // u
            W_exp = (a == kc).astype(dtype) * w_valid  # (Bn, K)
            km = jax.lax.broadcasted_iota(jnp.int32, (u, K), 1) % u
            jr = jax.lax.broadcasted_iota(jnp.int32, (u, K), 0)
            F = (km == jr).astype(dtype)  # (u, K): tile(I_u, C)
            B = W_exp * jnp.dot(U, F, preferred_element_type=dtype, precision=_HI)
            return jnp.dot(U.T, B, preferred_element_type=dtype, precision=_HI)

        def masked_pair(a_raw, b_raw):
            ok = (
                jnp.isfinite(a_raw).all(axis=1)
                & jnp.isfinite(b_raw).all(axis=1)
            ).astype(dtype)[:, None]
            a = jnp.where(jnp.isfinite(a_raw), a_raw, 0.0)
            b = jnp.where(jnp.isfinite(b_raw), b_raw, 0.0)
            return jnp.concatenate([a, b, ones], axis=1), ok

        acc_t = jnp.zeros((u_t, C * u_t), dtype)
        for t in range(T - 1):
            U, ok = masked_pair(z_at(t), z_at(t + 1))
            acc_t = acc_t + khatri_gemm(U, ok)

        acc_m = jnp.zeros((u_m, C * u_m), dtype)
        for t in range(T):
            U, ok = masked_pair(z_at(t), x_at(t))
            acc_m = acc_m + khatri_gemm(U, ok)

        z0_raw = z_at(0)
        ok0 = jnp.isfinite(z0_raw).all(axis=1).astype(dtype)[:, None]
        z0 = jnp.where(jnp.isfinite(z0_raw), z0_raw, 0.0)
        U0 = jnp.concatenate([z0, ones], axis=1)
        acc_i = khatri_gemm(U0, ok0)

        @pl.when(pl.program_id(0) == 0)
        def _():
            t_out[:, :] = jnp.zeros_like(t_out)
            m_out[:, :] = jnp.zeros_like(m_out)
            i_out[:, :] = jnp.zeros_like(i_out)

        t_out[:, :] += acc_t
        m_out[:, :] += acc_m
        i_out[:, :] += acc_i

    return kernel, (u_t, u_m, u_i)


@functools.partial(
    jax.jit,
    static_argnames=("T", "d", "l", "n_clusters", "block_n", "interpret"),
)
def mstep_stats_pallas(
    v: jax.Array,  # (n, T*(d+l)) packed joint layout
    assign: jax.Array,  # (n,) int32
    *,
    T: int,
    d: int,
    l: int,
    n_clusters: int,
    block_n: int = 1024,
    interpret: bool = False,
):
    """Fused sufficient statistics from the packed batch: returns
    (S_trans (u_t, C·u_t), S_meas (u_m, C·u_m), S_init (u_i, C·u_i))."""
    n, D = v.shape
    assert D == T * (d + l)
    C = n_clusters
    pad = (-n) % block_n
    if pad:
        # padded rows: NaN data (masked from every stat) + cluster id C
        # (outside every one-hot column)
        v = jnp.concatenate(
            [v, jnp.full((pad, D), jnp.nan, v.dtype)], axis=0
        )
        assign = jnp.concatenate(
            [assign, jnp.full((pad,), C, assign.dtype)]
        )
    n_pad = v.shape[0]
    kernel, (u_t, u_m, u_i) = _mstep_kernel(T, d, l, C)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, D), lambda i: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((u_t, C * u_t), lambda i: (0, 0)),
            pl.BlockSpec((u_m, C * u_m), lambda i: (0, 0)),
            pl.BlockSpec((u_i, C * u_i), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_t, C * u_t), v.dtype),
            jax.ShapeDtypeStruct((u_m, C * u_m), v.dtype),
            jax.ShapeDtypeStruct((u_i, C * u_i), v.dtype),
        ),
        interpret=interpret,
        # wide-B temporaries are (block, C·u) — a few MB at block 1024,
        # but T-step double buffering still wants headroom over the 16M
        # default scoped-vmem cap
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        ),
    )(v, assign.astype(jnp.int32).reshape(n_pad, 1))


def _mstep_gram_kernel(C: int):
    """Whole-row Gram kernel: ONE ``(u, Bn) @ (Bn, C·u)`` GEMM per block
    with ``u = D+1`` covers every time step of every statistic at once —
    the per-t skinny GEMMs of :func:`_mstep_kernel` (M-dim 11/128 on the
    MXU) become a single fat one (M-dim (D+1)/128).  Per-time-step
    validity is NOT applied here; it is segment-constant for a
    pattern-sorted batch, so the host selects valid (t, t') Gram blocks
    after the reduction (:func:`mstep_stats_gram_sorted`)."""

    def kernel(v_ref, a_ref, s_out):
        v = v_ref[:, :]  # (Bn, D)
        Bn = v.shape[0]
        dtype = v.dtype
        vm = jnp.where(jnp.isfinite(v), v, 0.0)
        U = jnp.concatenate([vm, jnp.ones((Bn, 1), dtype)], axis=1)
        u = U.shape[1]
        a = a_ref[:, :]  # (Bn, 1) int32; padded rows carry C
        kc = jax.lax.broadcasted_iota(jnp.int32, (Bn, C * u), 1) // u
        W = (a == kc).astype(dtype)  # (Bn, C*u)
        # replicate U C times with an exact 0/1 tiling GEMM (single
        # nonzero per F column → bit-exact): measured 1.8 ms faster per
        # 1M-row pass than pltpu.repeat, which costs a VPU relayout
        km = jax.lax.broadcasted_iota(jnp.int32, (u, C * u), 1) % u
        jr = jax.lax.broadcasted_iota(jnp.int32, (u, C * u), 0)
        F = (km == jr).astype(dtype)  # (u, C·u): tile(I_u, C)
        B = W * jnp.dot(U, F, preferred_element_type=dtype, precision=_HI)

        @pl.when(pl.program_id(0) == 0)
        def _():
            s_out[:, :] = jnp.zeros_like(s_out)

        s_out[:, :] += jnp.dot(U.T, B, preferred_element_type=dtype, precision=_HI)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "sizes",
        "T",
        "d",
        "l",
        "n_clusters",
        "block_n",
        "interpret",
    ),
)
def mstep_stats_gram_sorted(
    v: jax.Array,  # (n, T*(d+l)) packed rows grouped by pattern id
    assign: jax.Array,  # (n,) int32
    patterns: jax.Array,  # (P, T*(d+l)) bool
    *,
    sizes: tuple,
    T: int,
    d: int,
    l: int,
    n_clusters: int,
    block_n: int = 1024,
    interpret: bool = False,
):
    """M-step sufficient statistics for a PATTERN-SORTED batch via one
    whole-row Gram per segment.

    Returns ``(tstats, mstats, istats, pi_counts)`` — the same
    RegressionStats/MomentStats as the per-t kernel plus the per-cluster
    membership count (so callers skip a separate bincount; counts are
    exact while n ≤ 2²⁴ in f32).  Equal to
    :func:`..ops.regression.weighted_regression_stats_timebatched` sums up
    to floating-point reassociation (all T time steps accumulate in one
    GEMM instead of per-t).

    Reference semantics: M_step pair stacking with any-NaN row drops,
    marginalizable_mixture_model.py:1254-1308 — within a pattern segment
    the per-t validity is row-constant, so dropping invalid pairs is a
    post-hoc selection of (t, t′) Gram blocks.
    """
    n, D = v.shape
    assert D == T * (d + l)
    C = n_clusters
    u = D + 1
    P = len(sizes)
    # the kernel's wide-B intermediates are ~2 (block, C·u) f32 buffers —
    # shrink the batch block as C·u grows so long-T dense batches fit
    # scoped VMEM (at T=64, C=16: C·u = 8208 → block 4096 would need
    # ~134 MB)
    while block_n > 128 and 2 * block_n * C * u * 4 > 48 * 1024 * 1024:
        block_n //= 2

    grams = []
    off = 0
    for p in range(P):
        s = sizes[p]
        if s == 0:
            grams.append(jnp.zeros((C, u, u), v.dtype))
            continue
        vp = v[off : off + s]
        ap = assign[off : off + s].astype(jnp.int32)
        off += s
        pad = (-s) % block_n
        if pad:
            vp = jnp.concatenate(
                [vp, jnp.full((pad, D), jnp.nan, v.dtype)], axis=0
            )
            ap = jnp.concatenate([ap, jnp.full((pad,), C, jnp.int32)])
        s_pad = vp.shape[0]
        S = pl.pallas_call(
            _mstep_gram_kernel(C),
            grid=(s_pad // block_n,),
            in_specs=[
                pl.BlockSpec((block_n, D), lambda i: (i, 0)),
                pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((u, C * u), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((u, C * u), v.dtype),
            interpret=interpret,
            compiler_params=(
                None
                if interpret
                else pltpu.CompilerParams(
                    vmem_limit_bytes=96 * 1024 * 1024
                )
            ),
        )(vp, ap.reshape(s_pad, 1))
        grams.append(S.reshape(u, C, u).transpose(1, 0, 2))  # (C, u, u)
    G = jnp.stack(grams)  # (P, C, u, u)

    # segment-constant validity masks from the patterns
    zv = patterns[:, : T * d].reshape(P, T, d).all(axis=-1)  # (P, T)
    xv = patterns[:, T * d :].reshape(P, T, l).all(axis=-1)  # (P, T)
    pv = (zv[:, :-1] & zv[:, 1:]).astype(v.dtype)  # (P, T-1) pair valid
    mv = (zv & xv).astype(v.dtype)  # (P, T) meas valid
    iv = zv[:, 0].astype(v.dtype)  # (P,) init valid

    zsl = [slice(t * d, (t + 1) * d) for t in range(T)]
    xsl = [slice(T * d + t * l, T * d + (t + 1) * l) for t in range(T)]
    one = u - 1  # index of the augmented ones column

    def gather(w_pt, row_slices, col_slices):
        # Σ_p Σ_t w[p, t] · G[p, :, rows_t, cols_t]
        return sum(
            jnp.einsum(
                "p,pcij->cij", w_pt[:, t], G[:, :, row_slices[t], col_slices[t]], precision=_HI)
            for t in range(w_pt.shape[1])
        )

    def gather_vec(w_pt, col_slices):
        return sum(
            jnp.einsum(
                "p,pcj->cj", w_pt[:, t], G[:, :, one, col_slices[t]], precision=_HI)
            for t in range(w_pt.shape[1])
        )

    nseg = G[:, :, one, one]  # (P, C) rows per (pattern, cluster)

    tstats = rops.RegressionStats(
        xtx=gather(pv, zsl[:-1], zsl[:-1]),
        xty=gather(pv, zsl[:-1], zsl[1:]),
        yty=gather(pv, zsl[1:], zsl[1:]),
        sx=gather_vec(pv, zsl[:-1]),
        sy=gather_vec(pv, zsl[1:]),
        count=jnp.einsum("pt,pc->c", pv, nseg, precision=_HI),
    )
    mstats = rops.RegressionStats(
        xtx=gather(mv, zsl, zsl),
        xty=gather(mv, zsl, xsl),
        yty=gather(mv, xsl, xsl),
        sx=gather_vec(mv, zsl),
        sy=gather_vec(mv, xsl),
        count=jnp.einsum("pt,pc->c", mv, nseg, precision=_HI),
    )
    istats = rops.MomentStats(
        count=jnp.einsum("p,pc->c", iv, nseg, precision=_HI),
        s=jnp.einsum("p,pcj->cj", iv, G[:, :, one, zsl[0]], precision=_HI),
        ss=jnp.einsum("p,pcij->cij", iv, G[:, :, zsl[0], zsl[0]], precision=_HI),
    )
    pi_counts = jnp.sum(nseg, axis=0)  # (C,) total membership
    return tstats, mstats, istats, pi_counts


def unpack_mstep_stats(stats, d: int, l: int, n_clusters: int):
    """Split the fused Gram matrices into (trans RegressionStats,
    meas RegressionStats, init MomentStats)."""
    S_t, S_m, S_i = stats
    C = n_clusters
    u_t, u_m, u_i = 2 * d + 1, d + l + 1, d + 1

    def blocks(S, u):
        # (u, C*u) → (C, u, u)
        return jnp.stack([S[:, c * u : (c + 1) * u] for c in range(C)])

    Bt = blocks(S_t, u_t)
    tstats = rops.RegressionStats(
        xtx=Bt[:, :d, :d],
        xty=Bt[:, :d, d : 2 * d],
        yty=Bt[:, d : 2 * d, d : 2 * d],
        sx=Bt[:, 2 * d, :d],
        sy=Bt[:, 2 * d, d : 2 * d],
        count=Bt[:, 2 * d, 2 * d],
    )
    Bm = blocks(S_m, u_m)
    mstats = rops.RegressionStats(
        xtx=Bm[:, :d, :d],
        xty=Bm[:, :d, d : d + l],
        yty=Bm[:, d : d + l, d : d + l],
        sx=Bm[:, d + l, :d],
        sy=Bm[:, d + l, d : d + l],
        count=Bm[:, d + l, d + l],
    )
    Bi = blocks(S_i, u_i)
    istats = rops.MomentStats(
        count=Bi[:, d, d], s=Bi[:, d, :d], ss=Bi[:, :d, :d]
    )
    return tstats, mstats, istats
