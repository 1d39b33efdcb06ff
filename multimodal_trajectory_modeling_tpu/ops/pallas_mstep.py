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

Host-side :func:`unpack_mstep_stats` splits the three accumulated matrices
(transitions, measurements, initial moments) into
:class:`~..ops.regression.RegressionStats` / ``MomentStats``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_trajectory_modeling_tpu.ops import regression as rops

__all__ = ["mstep_stats_pallas", "unpack_mstep_stats"]


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
            B = W_exp * jnp.dot(U, F, preferred_element_type=dtype)
            return jnp.dot(U.T, B, preferred_element_type=dtype)

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
