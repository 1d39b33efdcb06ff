"""Pallas TPU kernel: fused all-cluster masked-Gaussian E-step.

The E-step evaluates, for every instance i and cluster c, the log-density of
the cluster's joint Gaussian restricted to the instance's finite coordinates
(pattern p = pid[i]).  With per-(cluster, pattern) inverses precomputed, the
per-row work is a quadratic form — one (tile × D) @ (D × D) MXU GEMM per
(c, p) — and the only HBM traffic is one read of the packed batch and one
write of the (n, C) log-likelihoods.  The XLA path materializes per-cluster
residuals and per-pattern quadratic forms in HBM; this kernel keeps the
instance tile resident in VMEM across all C·P GEMMs.

Numerical identity with ops.gaussian.masked_mvn_logpdf_grouped(method=
"inverse"): the inverses are of the identity-padded Σ' (missing rows/cols
zeroed, diagonal 1), and residuals are zeroed at non-finite coordinates, so
the quadratic form equals the masked-submatrix form exactly.

Reference semantics: the numba guvectorize hot loop,
framework/marginalizable_state_space_model.py:728-773.
"""

from __future__ import annotations

import functools
import math

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

from multimodal_trajectory_modeling_tpu.ops import gaussian as gops

__all__ = [
    "estep_logliks_pallas",
    "estep_logliks_pattern_sorted",
    "estep_assign_pattern_sorted",
    "estep_assign_pattern_sorted_t",
    "precompute_cluster_pattern_inverses",
]

_LOG_2PI = math.log(2.0 * math.pi)


def precompute_cluster_pattern_inverses(
    means: jax.Array,  # (C, D)
    covs: jax.Array,  # (C, D, D)
    patterns: jax.Array,  # (P, D) bool
) -> tuple[jax.Array, jax.Array]:
    """Per-(cluster, pattern) identity-padded inverse and the additive
    constant ``-0.5·(k·log 2π + logdet Σ')``.

    Returns ``(Minv (C, P, D, D), const (C, P))``.  O(C·P·D³) — negligible
    next to the per-instance work.
    """
    f = patterns.astype(covs.dtype)  # (P, D)

    def per_cluster(cov):
        covm = jax.vmap(lambda fp: gops.masked_identity_pad(cov, fp))(f)
        Lc = jnp.linalg.cholesky(covm)
        logdet = 2.0 * jnp.sum(
            jnp.log(jnp.diagonal(Lc, axis1=-2, axis2=-1)), axis=-1
        )
        eye = jnp.eye(cov.shape[-1], dtype=cov.dtype)
        inv = jax.vmap(
            lambda Lp: jax.scipy.linalg.cho_solve((Lp, True), eye)
        )(Lc)
        return inv, logdet

    inv, logdet = jax.vmap(per_cluster)(covs)  # (C, P, D, D), (C, P)
    k = jnp.sum(f, axis=-1)  # (P,)
    const = -0.5 * (k[None, :] * _LOG_2PI + logdet)
    return inv, const


def _estep_kernel(C: int, P: int):
    def kernel(v_ref, pid_ref, means_ref, minv_ref, const_ref, out_ref):
        v = v_ref[:, :]  # (Bn, D) — may contain NaN at missing coords
        pid = pid_ref[:, :]  # (Bn, 1) int32
        finite = jnp.isfinite(v)
        for c in range(C):
            resid = jnp.where(finite, v - means_ref[c, :], 0.0)  # (Bn, D)
            acc = jnp.zeros((v.shape[0],), dtype=v.dtype)
            for p in range(P):
                y = jnp.dot(
                    resid,
                    minv_ref[c, p, :, :],
                    preferred_element_type=v.dtype)
                q = jnp.sum(y * resid, axis=1)  # (Bn,)
                lp = const_ref[c, p] - 0.5 * q
                acc = jnp.where(pid[:, 0] == p, lp, acc)
            out_ref[:, c] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def estep_logliks_pallas(
    v: jax.Array,  # (n, D)
    pattern_id: jax.Array,  # (n,) int32
    means: jax.Array,  # (C, D)
    minv: jax.Array,  # (C, P, D, D)
    const: jax.Array,  # (C, P)
    *,
    block_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(C, n) per-cluster masked log-likelihoods via the fused kernel."""
    n, D = v.shape
    C, P = const.shape
    pad = (-n) % block_n
    if pad:
        v = jnp.concatenate(
            [v, jnp.zeros((pad, D), v.dtype)], axis=0
        )
        pattern_id = jnp.concatenate(
            [pattern_id, jnp.zeros((pad,), pattern_id.dtype)]
        )
    n_pad = v.shape[0]
    pid2 = pattern_id.astype(jnp.int32).reshape(n_pad, 1)

    out = pl.pallas_call(
        _estep_kernel(C, P),
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, D), lambda i: (i, 0)),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
            pl.BlockSpec((C, D), lambda i: (0, 0)),
            pl.BlockSpec((C, P, D, D), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec((C, P), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block_n, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), v.dtype),
        interpret=interpret,
    )(v, pid2, means, minv, const)
    return out[:n].T  # (C, n)


def _estep_kernel_single_pattern(C: int):
    """Kernel specialization for a batch slice that shares ONE missingness
    pattern: C quadratic-form GEMMs, no per-row pattern select."""

    def kernel(v_ref, means_ref, minv_ref, const_ref, out_ref):
        v = v_ref[:, :]  # (Bn, D)
        finite = jnp.isfinite(v)
        for c in range(C):
            resid = jnp.where(finite, v - means_ref[c, :], 0.0)
            y = jnp.dot(
                resid, minv_ref[c, :, :], preferred_element_type=v.dtype)
            q = jnp.sum(y * resid, axis=1)
            out_ref[:, c] = const_ref[0, c] - 0.5 * q

    return kernel


@functools.partial(
    jax.jit, static_argnames=("sizes", "block_n", "interpret")
)
def estep_logliks_pattern_sorted(
    v: jax.Array,  # (n, D), rows grouped by pattern id (ascending)
    means: jax.Array,  # (C, D)
    minv: jax.Array,  # (C, P, D, D)
    const: jax.Array,  # (C, P)
    *,
    sizes: tuple,  # static per-pattern segment lengths, sum == n
    block_n: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(C, n) log-likelihoods for a batch PRE-SORTED by pattern id.

    Missingness patterns are constant across EM iterations, so sorting the
    batch once (outside the EM loop) lets every block evaluate only its own
    pattern's C quadratic forms instead of all C·P — a P-fold cut in MXU
    work (33 ms → ~13 ms at n=1e6, P=3 on one v5e chip).  Row order of the
    output matches the sorted batch; M-step sufficient statistics are
    permutation-invariant, so callers that sort (z, x, v) consistently never
    need to unsort (bench.py does exactly this).
    """
    n, D = v.shape
    C, P = const.shape
    assert len(sizes) == P and sum(sizes) == n
    outs = []
    off = 0
    for p in range(P):
        s = sizes[p]
        if s == 0:
            continue
        vp = v[off : off + s]
        off += s
        pad = (-s) % block_n
        if pad:
            vp = jnp.concatenate([vp, jnp.zeros((pad, D), v.dtype)], axis=0)
        s_pad = vp.shape[0]
        out = pl.pallas_call(
            _estep_kernel_single_pattern(C),
            grid=(s_pad // block_n,),
            in_specs=[
                pl.BlockSpec((block_n, D), lambda i: (i, 0)),
                pl.BlockSpec((C, D), lambda i: (0, 0)),
                pl.BlockSpec((C, D, D), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((block_n, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((s_pad, C), v.dtype),
            interpret=interpret,
        )(vp, means, minv[:, p], const[:, p].reshape(1, C))
        outs.append(out[:s])
    return jnp.concatenate(outs, axis=0).T  # (C, n)


def _estep_assign_kernel(C: int, D: int, bf16: bool = False):
    """Fused single-pattern E-step: ONE fat quadratic-form GEMM for all C
    clusters + in-kernel argmax, membership counts and switch count.

    Uses the expanded form ``(v-m)ᵀM(v-m) = vᵀMv − 2·vᵀ(Mm) + mᵀMm`` so the
    per-cluster inverses concatenate along lanes into a single
    ``(D, C·D)`` operand — the GEMM runs at full lane width instead of C
    N=D-wide GEMMs — and the pattern-constant linear/scalar terms fold
    into per-cluster precomputed vectors.  The log-likelihood matrix is
    never written to HBM: assignments, counts and switches leave the
    kernel directly (reference E-step consumers,
    marginalizable_mixture_model.py:1235-1252).

    ``bf16=True`` requests bfloat16 GEMM operands with float32
    accumulation.  Measured on the current Mosaic toolchain the casts are
    promoted back to f32 (bit-identical results, no timing change) — the
    flag is kept as a forward-compat hook; the f32 kernel already runs at
    ~73% f32 MFU, so the headroom is small anyway.
    """

    def kernel(
        v_ref,  # (Bn, D)
        prev_ref,  # (Bn, 1) int32; padded rows carry -1
        mcat_ref,  # (D, C*D)  concat_c minv[c]
        lin_ref,  # (D, C)    minv[c] @ (mean_c ⊙ pattern)
        c2_ref,  # (1, C)    log π_c + const_c − ½ mᵀMm
        assign_out,  # (Bn, 1) int32
        counts_out,  # (1, C) int32 (accumulated over grid)
        switch_out,  # (1, 1) int32 (accumulated over grid)
    ):
        v = v_ref[:, :]
        Bn = v.shape[0]
        dtype = v.dtype
        vm = jnp.where(jnp.isfinite(v), v, 0.0)
        if bf16:
            vg = vm.astype(jnp.bfloat16)
            mc = mcat_ref[:, :].astype(jnp.bfloat16)
            ln = lin_ref[:, :].astype(jnp.bfloat16)
        else:
            vg, mc, ln = vm, mcat_ref[:, :], lin_ref[:, :]
        Y = jnp.dot(vg, mc, preferred_element_type=dtype)
        # segment reduction (C·D → C): q_c = Σ_d Y_cd·v_d as a 0/1 GEMM.
        # Only C=16 output lanes (~12% MXU utilization) but measured faster
        # than VPU lane-slice sums, which force costly relayouts; the
        # transposed kernel (_estep_assign_kernel_t) fixes the utilization
        # properly by putting Bn on the lane axis.
        rep = pltpu.repeat(vm, C, axis=1)  # (Bn, C*D)
        kc = jax.lax.broadcasted_iota(jnp.int32, (C * D, C), 0) // D
        cc = jax.lax.broadcasted_iota(jnp.int32, (C * D, C), 1)
        prod = Y * rep
        if bf16:
            prod = prod.astype(jnp.bfloat16)
        Ssum = (kc == cc).astype(prod.dtype)
        q = jnp.dot(prod, Ssum, preferred_element_type=dtype)  # (Bn, C)
        qlin = jnp.dot(vg, ln, preferred_element_type=dtype)
        scores = c2_ref[0, :] - 0.5 * q + qlin  # (Bn, C)

        na = jnp.argmax(scores, axis=1).astype(jnp.int32)  # first-max
        prev = prev_ref[:, 0]
        validrow = prev >= 0
        lanes = jax.lax.broadcasted_iota(jnp.int32, (Bn, C), 1)
        onehot = ((na[:, None] == lanes) & validrow[:, None]).astype(
            jnp.int32
        )
        counts_p = jnp.sum(onehot, axis=0).reshape(1, C)
        sw_p = jnp.sum(
            ((na != prev) & validrow).astype(jnp.int32)
        ).reshape(1, 1)

        assign_out[:, 0] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p

    return kernel


def estep_assign_pattern_sorted(
    v: jax.Array,  # (n, D) rows grouped by pattern id (ascending)
    prev_assign: jax.Array,  # (n,) int32
    means: jax.Array,  # (C, D)
    minv: jax.Array,  # (C, P, D, D)
    const: jax.Array,  # (C, P)
    logpi: jax.Array,  # (C,)
    patterns: jax.Array,  # (P, D) bool
    *,
    sizes: tuple,
    block_n: int = 1024,
    interpret: bool = False,
    bf16: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused E-step over a pattern-sorted batch: returns
    ``(assign (n,) int32, counts (C,) int32, switches () int32)`` without
    materializing the (C, n) log-likelihood matrix.

    ``assign`` equals ``argmax_c (log π_c + ll_c)`` (first-max ties, like
    :func:`..models.em.assignments_from_logliks`) up to floating-point
    reassociation of the expanded quadratic form; ``counts`` equals
    ``bincount(assign, length=C)`` and ``switches`` equals
    ``sum(assign != prev_assign)`` exactly.  ``bf16=True`` requests
    bfloat16 GEMM operands (f32 accumulation) — a no-op on the current
    Mosaic toolchain, which promotes the casts back to f32 (observed:
    bit-identical output, unchanged timing); kept as a forward-compat
    hook.
    """
    n, D = v.shape
    C, P = const.shape
    assert len(sizes) == P and sum(sizes) == n
    fmask = patterns.astype(v.dtype)  # (P, D)

    # per-(pattern, cluster) operands for the expanded quadratic form
    mp = means[None, :, :] * fmask[:, None, :]  # (P, C, D) masked means
    lin = jnp.einsum("cpij,pcj->pic", minv, mp, precision=_HI)  # (P, D, C)
    mMm = jnp.einsum("pci,cpij,pcj->pc", mp, minv, mp, precision=_HI)  # (P, C)
    c2 = (logpi[None, :] + const.T - 0.5 * mMm)[:, None, :]  # (P, 1, C)
    mcat = jnp.transpose(minv, (1, 2, 0, 3)).reshape(P, D, C * D)

    assigns = []
    counts = jnp.zeros((C,), jnp.int32)
    switches = jnp.zeros((), jnp.int32)
    off = 0
    for p in range(P):
        s = sizes[p]
        if s == 0:
            continue
        vp = v[off : off + s]
        ap = prev_assign[off : off + s].astype(jnp.int32)
        off += s
        pad = (-s) % block_n
        if pad:
            vp = jnp.concatenate([vp, jnp.zeros((pad, D), v.dtype)], axis=0)
            ap = jnp.concatenate(
                [ap, jnp.full((pad,), -1, jnp.int32)], axis=0
            )
        s_pad = vp.shape[0]
        a_out, c_out, w_out = pl.pallas_call(
            _estep_assign_kernel(C, D, bf16=bf16),
            grid=(s_pad // block_n,),
            in_specs=[
                pl.BlockSpec((block_n, D), lambda i: (i, 0)),
                pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
                pl.BlockSpec((D, C * D), lambda i: (0, 0)),
                pl.BlockSpec((D, C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((block_n, 1), lambda i: (i, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((1, 1), lambda i: (0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((s_pad, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, C), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            interpret=interpret,
        )(
            vp,
            ap.reshape(s_pad, 1),
            mcat[p],
            lin[p],
            c2[p],
        )
        assigns.append(a_out[:s, 0])
        counts = counts + c_out[0]
        switches = switches + w_out[0, 0]
    return jnp.concatenate(assigns, axis=0), counts, switches


def _estep_assign_kernel_t(C: int, D: int, bf16: bool = False):
    """Transposed fused single-pattern E-step: operates on a (D, Bn) batch
    block so BOTH quadratic-form GEMMs run at full MXU utilization.

    In row-major layout the segment reduction (C·D → C) is a GEMM with
    N = C = 16 output lanes — ~12% utilization, and it dominates the
    kernel.  Transposed, that GEMM becomes (C, C·D) @ (C·D, Bn): M = C
    sits on the 8-wide sublane tiles (2 tiles) and N = Bn fills the lanes
    — full rate.  Measured: 12.3 ms → 6.9 ms f32 at n=1e6, C=16, D=80
    (v5e); exact match with the row-major kernel in f64 interpret mode,
    f32 differences only on argmax ties at reassociation noise.
    """

    def kernel(
        vt_ref,  # (D, Bn)
        prev_ref,  # (1, Bn) int32; padded lanes carry -1
        mcat_ref,  # (C*D, D)  stack_c minv[c]
        lin_ref,  # (C, D)    rows minv[c] @ (mean_c ⊙ pattern)
        c2_ref,  # (C, 1)    log π_c + const_c − ½ mᵀMm
        assign_out,  # (1, Bn) int32
        counts_out,  # (1, C) int32 (accumulated over grid)
        switch_out,  # (1, 1) int32 (accumulated over grid)
    ):
        vt = vt_ref[:, :]
        Bn = vt.shape[1]
        dtype = vt.dtype
        vm = jnp.where(jnp.isfinite(vt), vt, 0.0)
        if bf16:
            vg = vm.astype(jnp.bfloat16)
            mc = mcat_ref[:, :].astype(jnp.bfloat16)
            ln = lin_ref[:, :].astype(jnp.bfloat16)
        else:
            vg, mc, ln = vm, mcat_ref[:, :], lin_ref[:, :]
        Yt = jnp.dot(mc, vg, preferred_element_type=dtype)  # (C*D, Bn)
        rep = pltpu.repeat(vm, C, axis=0)  # (C*D, Bn)
        prod = Yt * rep
        kc = jax.lax.broadcasted_iota(jnp.int32, (C, C * D), 1) // D
        cc = jax.lax.broadcasted_iota(jnp.int32, (C, C * D), 0)
        if bf16:
            prod = prod.astype(jnp.bfloat16)
        Ssum = (kc == cc).astype(prod.dtype)  # (C, C*D)
        q = jnp.dot(Ssum, prod, preferred_element_type=dtype)  # (C, Bn)
        qlin = jnp.dot(ln, vg, preferred_element_type=dtype)  # (C, Bn)
        scores = c2_ref[:, :] - 0.5 * q + qlin  # (C, Bn)

        na = jnp.argmax(scores, axis=0).astype(jnp.int32)  # (Bn,) first-max
        prev = prev_ref[0, :]
        validrow = prev >= 0
        subl = jax.lax.broadcasted_iota(jnp.int32, (C, Bn), 0)
        onehot = ((na[None, :] == subl) & validrow[None, :]).astype(
            jnp.int32
        )
        counts_p = jnp.sum(onehot, axis=1).reshape(1, C)
        sw_p = jnp.sum(
            ((na != prev) & validrow).astype(jnp.int32)
        ).reshape(1, 1)

        assign_out[0, :] = jnp.where(validrow, na, C)

        @pl.when(pl.program_id(0) == 0)
        def _():
            counts_out[:, :] = jnp.zeros_like(counts_out)
            switch_out[:, :] = jnp.zeros_like(switch_out)

        counts_out[:, :] += counts_p
        switch_out[:, :] += sw_p

    return kernel


def estep_assign_pattern_sorted_t(
    v_t: jax.Array,  # (D, n) — TRANSPOSED batch, rows grouped by pattern
    prev_assign: jax.Array,  # (n,) int32
    means: jax.Array,  # (C, D)
    minv: jax.Array,  # (C, P, D, D)
    const: jax.Array,  # (C, P)
    logpi: jax.Array,  # (C,)
    patterns: jax.Array,  # (P, D) bool
    *,
    sizes: tuple,
    block_n: int = 1024,
    interpret: bool = False,
    bf16: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """:func:`estep_assign_pattern_sorted` on a pre-transposed (D, n)
    batch — the fastest path; callers transpose once outside the EM loop
    (the M-step consumes the row-major copy, so both layouts are kept)."""
    D, n = v_t.shape
    C, P = const.shape
    assert len(sizes) == P and sum(sizes) == n
    # the kernel holds ~4 (C·D, block) f32 intermediates in VMEM — shrink
    # the batch block as D grows so large-T dense batches still fit
    # (observed: block 1024 at C·D=4096 → 30 MB scoped-vmem OOM)
    while block_n > 128 and 4 * C * D * block_n * 4 > 48 * 1024 * 1024:
        block_n //= 2
    fmask = patterns.astype(v_t.dtype)  # (P, D)

    mp = means[None, :, :] * fmask[:, None, :]  # (P, C, D)
    lin = jnp.einsum("cpij,pcj->pci", minv, mp, precision=_HI)  # (P, C, D)
    mMm = jnp.einsum("pci,cpij,pcj->pc", mp, minv, mp, precision=_HI)  # (P, C)
    c2 = (logpi[None, :] + const.T - 0.5 * mMm)[:, :, None]  # (P, C, 1)
    mcat = jnp.transpose(minv, (1, 0, 2, 3)).reshape(P, C * D, D)

    assigns = []
    counts = jnp.zeros((C,), jnp.int32)
    switches = jnp.zeros((), jnp.int32)
    off = 0
    for p in range(P):
        s = sizes[p]
        if s == 0:
            continue
        vp = v_t[:, off : off + s]
        ap = prev_assign[off : off + s].astype(jnp.int32)
        off += s
        pad = (-s) % block_n
        if pad:
            vp = jnp.concatenate(
                [vp, jnp.zeros((D, pad), v_t.dtype)], axis=1
            )
            ap = jnp.concatenate(
                [ap, jnp.full((pad,), -1, jnp.int32)], axis=0
            )
        s_pad = vp.shape[1]
        a_out, c_out, w_out = pl.pallas_call(
            _estep_assign_kernel_t(C, D, bf16=bf16),
            grid=(s_pad // block_n,),
            in_specs=[
                pl.BlockSpec((D, block_n), lambda i: (0, i)),
                pl.BlockSpec((1, block_n), lambda i: (0, i)),
                pl.BlockSpec((C * D, D), lambda i: (0, 0)),
                pl.BlockSpec((C, D), lambda i: (0, 0)),
                pl.BlockSpec((C, 1), lambda i: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_n), lambda i: (0, i)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((1, 1), lambda i: (0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, s_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, C), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            interpret=interpret,
            compiler_params=(
                None
                if interpret
                else pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024
                )
            ),
        )(
            vp,
            ap.reshape(1, s_pad),
            mcat[p],
            lin[p],
            c2[p],
        )
        assigns.append(a_out[0, :s])
        counts = counts + c_out[0]
        switches = switches + w_out[0, 0]
    return jnp.concatenate(assigns, axis=0), counts, switches


def estep_logliks_fused(
    params_means: jax.Array,
    params_covs: jax.Array,
    v: jax.Array,
    patterns: jax.Array,
    pattern_id: jax.Array,
    *,
    block_n: int = 1024,
    interpret: bool = None,
) -> jax.Array:
    """Convenience wrapper: precompute inverses, run the kernel.

    ``interpret`` defaults to True off-TPU so tests exercise the kernel
    logic on the CPU mesh."""
    if interpret is None:
        interpret = jax.devices()[0].platform not in ("tpu",)
    minv, const = precompute_cluster_pattern_inverses(
        params_means, params_covs, patterns
    )
    return estep_logliks_pallas(
        v,
        pattern_id,
        params_means,
        minv,
        const,
        block_n=block_n,
        interpret=interpret,
    )
