"""O(T) Kalman-filter marginal log-likelihood of the OBSERVATIONS —
the long-T path for x-only inference.

The x-marginal of the LG-SSM is a hidden-Markov Gaussian: unlike the
joint (z, x) density (which factorizes directly, :mod:`.markov`), it
requires integrating the latent chain — the classic Kalman prediction
-error decomposition

    log p(x_{1:len}) = Σ_t log N(x_t; μ_t H, H' P_t H + L)

with the predictive moments (μ_t, P_t) updated by the filter recursions.
The reference evaluates this by materializing the (T·l)² observed
covariance and a masked dense quadratic form (observed moments ``mmX`` /
``CXX``: marginalizable_state_space_model.py:186-257, consumed by
``observed_condl_log_lik_first_T0_steps``,
marginalizable_mixture_model.py:997-1048, through the numba hot loop
:728-773) — O(T²) memory; the filter is O(T) and exact.

TPU shape: the covariance-side recursion (P_t, innovation inverses,
gains) is DATA-INDEPENDENT — one ``lax.scan`` over T of (d, d) algebra
per cluster.  The per-row work is then only the mean/innovation chain:
a second scan over T whose carry is the (n, d) predictive-mean batch and
whose per-step ops are small GEMMs — O(T·n·(d² + dl)) total, no T×T
matrices, suffix-masked per row via the length vector.

Row-vector convention (matching :mod:`.samplers`):
``z_{t+1} = z_t A + w (w ~ N(0, G))``, ``x_t = z_t H + v (v ~ N(0, L))``,
``z_1 ~ N(m, S)``; equivalently column-form transition ``F = Aᵀ``,
observation ``Hᵀ``.  Update: ``μ⁺ = μ + e Kᵀ`` with gain
``K = P H S⁻¹``; ``P⁺ = P − K Hᵀ P``; predict ``P' = Aᵀ P⁺ A + G``
(symmetrized each step against f32 drift).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)

__all__ = ["kalman_observed_logliks", "kalman_filter_covs"]


def kalman_filter_covs(
    S: jax.Array,  # (d, d) initial state cov
    A: jax.Array,  # (d, d) row-form transition
    G: jax.Array,  # (d, d) transition cov
    H: jax.Array,  # (d, l) row-form observation map
    L: jax.Array,  # (l, l) observation cov
    T: int,
):
    """Data-independent filter quantities, stacked over time:
    ``(K (T, d, l), Sinv (T, l, l), logdet (T,))`` — gains, innovation
    inverses and log-determinants for t = 1..T."""

    def step(P, _):
        Sin = H.T @ P @ H + L  # (l, l) innovation cov
        Lc = jnp.linalg.cholesky(Sin)
        Sinv = jax.scipy.linalg.cho_solve((Lc, True), jnp.eye(L.shape[0], dtype=P.dtype))
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(Lc)))
        K = P @ H @ Sinv  # (d, l)
        P_post = P - K @ H.T @ P
        P_next = A.T @ P_post @ A + G
        P_next = 0.5 * (P_next + P_next.T)
        return P_next, (K, Sinv, logdet)

    _, (K, Sinv, logdet) = jax.lax.scan(step, S, None, length=T)
    return K, Sinv, logdet


@functools.partial(jax.jit, static_argnames=("unroll",))
def kalman_observed_logliks(
    x: jax.Array,  # (T, n, l) NaN beyond each row's length
    lens: jax.Array,  # (n,) int32 observed prefix lengths
    m: jax.Array,  # (C, d)
    S: jax.Array,  # (C, d, d)
    A: jax.Array,  # (C, d, d)
    G: jax.Array,  # (C, d, d)
    H: jax.Array,  # (C, d, l)
    L: jax.Array,  # (C, l, l)
    *,
    unroll: bool = None,
) -> jax.Array:
    """``(C, n)`` marginal log-densities ``log p(x_{1:len_i})`` per
    cluster — exactly the dense observed-moments masked-Gaussian values
    for suffix missingness, in O(T) time and memory.

    ``unroll`` selects a static Python time loop for the per-row mean
    /innovation pass instead of ``lax.scan``: the remote TPU compiler
    takes minutes on large-carry scans (observed >9 min at n=1e5), while
    the unrolled loop compiles in seconds; default unrolls for T ≤ 128
    (the tiny data-independent covariance scan always stays a scan)."""
    T, n, l = x.shape
    dtype = x.dtype
    if unroll is None:
        unroll = T <= 128
    xm = jnp.where(jnp.isfinite(x), x, 0.0)
    tgrid = jnp.arange(T, dtype=lens.dtype)
    vm = (tgrid[:, None] < lens[None, :]).astype(dtype)  # (T, n)

    def one_cluster(mc, Sc, Ac, Gc, Hc, Lc):
        K, Sinv, logdet = kalman_filter_covs(Sc, Ac, Gc, Hc, Lc, T)

        def step(carry, inp):
            mu, ll = carry  # (n, d), (n,)
            x_t, vm_t, K_t, Sinv_t, logdet_t = inp
            e = x_t - mu @ Hc  # (n, l) innovation
            quad = jnp.einsum("nl,lk,nk->n", e, Sinv_t, e)
            ll = ll + vm_t * (-0.5) * (
                l * _LOG_2PI + logdet_t + quad
            )
            mu_post = mu + e @ K_t.T
            mu_next = mu_post @ Ac
            return (mu_next, ll), None

        mu0 = jnp.broadcast_to(mc[None, :], (n, mc.shape[0]))
        carry = (mu0, jnp.zeros((n,), dtype))
        if unroll:
            for t in range(T):
                carry, _ = step(
                    carry, (xm[t], vm[t], K[t], Sinv[t], logdet[t])
                )
            ll = carry[1]
        else:
            (_, ll), _ = jax.lax.scan(
                step, carry, (xm, vm, K, Sinv, logdet)
            )
        return ll

    return jax.vmap(one_cluster)(m, S, A, G, H, L)
