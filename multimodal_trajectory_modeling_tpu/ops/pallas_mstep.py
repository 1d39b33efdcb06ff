"""Pallas TPU kernel: fused M-step sufficient statistics.

The M step reduces masked, cluster-weighted outer-product statistics over
the whole batch (transition pairs, measurement pairs, initial moments).
The XLA einsum path reads the batch several times and materializes masked
copies; this kernel streams each (z, x, assign) tile through VMEM once.

Formulation: for each time step build the augmented row matrix
``U_t = [in_t, out_t, 1]`` and the masked Khatri–Rao weight block
``B_t = [w_1⊙U_t | … | w_C⊙U_t]`` (w_c = one-hot membership × validity);
then ``S += U_tᵀ B_t`` is ONE MXU GEMM per time step whose (C·u × u) output
contains every statistic at once — X^TX, X^TY, Y^TY, ΣX, ΣY and the pair
count per cluster.  Bandwidth-bound by a single read of the batch.

Host-side :func:`unpack_mstep_stats` splits the three accumulated matrices
(transitions, measurements, initial moments) into
:class:`~..ops.regression.RegressionStats` / ``MomentStats``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from multimodal_trajectory_modeling_tpu.ops import regression as rops

__all__ = ["mstep_stats_pallas", "unpack_mstep_stats"]


def _mstep_kernel(T: int, d: int, l: int, C: int):
    u_t = 2 * d + 1  # [z_t, z_{t+1}, 1]
    u_m = d + l + 1  # [z_t, x_t, 1]
    u_i = d + 1  # [z_0, 1]

    def kernel(z_ref, x_ref, assign_ref, t_out, m_out, i_out):
        Bn = assign_ref.shape[0]
        dtype = z_ref.dtype
        ones = jnp.ones((Bn, 1), dtype)
        cl = jax.lax.broadcasted_iota(jnp.int32, (Bn, C), 1)
        W = (assign_ref[:, :] == cl).astype(dtype)  # (Bn, C)

        def khatri_gemm(U, w_valid):
            # B = [ (W_c ⊙ valid) * U ]_c  → (Bn, C*u);  S = Uᵀ B
            Wv = W * w_valid  # (Bn, C)
            blocks = [Wv[:, c : c + 1] * U for c in range(C)]
            B = jnp.concatenate(blocks, axis=1)
            return jnp.dot(U.T, B, preferred_element_type=dtype)

        acc_t = jnp.zeros((u_t, C * u_t), dtype)
        for t in range(T - 1):
            zp_raw = z_ref[t, :, :]
            zn_raw = z_ref[t + 1, :, :]
            ok = (
                jnp.isfinite(zp_raw).all(axis=1)
                & jnp.isfinite(zn_raw).all(axis=1)
            ).astype(dtype)[:, None]
            zp = jnp.where(jnp.isfinite(zp_raw), zp_raw, 0.0)
            zn = jnp.where(jnp.isfinite(zn_raw), zn_raw, 0.0)
            U = jnp.concatenate([zp, zn, ones], axis=1)
            acc_t = acc_t + khatri_gemm(U, ok)

        acc_m = jnp.zeros((u_m, C * u_m), dtype)
        for t in range(T):
            z_raw = z_ref[t, :, :]
            x_raw = x_ref[t, :, :]
            ok = (
                jnp.isfinite(z_raw).all(axis=1)
                & jnp.isfinite(x_raw).all(axis=1)
            ).astype(dtype)[:, None]
            zz = jnp.where(jnp.isfinite(z_raw), z_raw, 0.0)
            xx = jnp.where(jnp.isfinite(x_raw), x_raw, 0.0)
            U = jnp.concatenate([zz, xx, ones], axis=1)
            acc_m = acc_m + khatri_gemm(U, ok)

        z0_raw = z_ref[0, :, :]
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
    jax.jit, static_argnames=("n_clusters", "block_n", "interpret")
)
def mstep_stats_pallas(
    z: jax.Array,  # (T, n, d)
    x: jax.Array,  # (T, n, l)
    assign: jax.Array,  # (n,) int32
    *,
    n_clusters: int,
    block_n: int = 2048,
    interpret: bool = False,
):
    """Fused sufficient statistics: returns (S_trans (u_t, C·u_t),
    S_meas (u_m, C·u_m), S_init (u_i, C·u_i))."""
    T, n, d = z.shape
    l = x.shape[-1]
    C = n_clusters
    pad = (-n) % block_n
    if pad:
        # padded rows: NaN data (masked from every stat) + cluster id C
        # (outside every one-hot column)
        z = jnp.concatenate(
            [z, jnp.full((T, pad, d), jnp.nan, z.dtype)], axis=1
        )
        x = jnp.concatenate(
            [x, jnp.full((T, pad, l), jnp.nan, x.dtype)], axis=1
        )
        assign = jnp.concatenate(
            [assign, jnp.full((pad,), C, assign.dtype)]
        )
    n_pad = z.shape[1]
    kernel, (u_t, u_m, u_i) = _mstep_kernel(T, d, l, C)
    return pl.pallas_call(
        kernel,
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((T, block_n, d), lambda i: (0, i, 0)),
            pl.BlockSpec((T, block_n, l), lambda i: (0, i, 0)),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((u_t, C * u_t), lambda i: (0, 0)),
            pl.BlockSpec((u_m, C * u_m), lambda i: (0, 0)),
            pl.BlockSpec((u_i, C * u_i), lambda i: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((u_t, C * u_t), z.dtype),
            jax.ShapeDtypeStruct((u_m, C * u_m), z.dtype),
            jax.ShapeDtypeStruct((u_i, C * u_i), z.dtype),
        ),
        interpret=interpret,
    )(z, x, assign.astype(jnp.int32).reshape(n_pad, 1))


def unpack_mstep_stats(stats, d: int, l: int, n_clusters: int):
    """Split the fused Gram matrices into (trans RegressionStats,
    meas RegressionStats, init MomentStats, membership pair-counts)."""
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
