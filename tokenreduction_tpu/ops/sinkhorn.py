"""Log-space Sinkhorn optimal transport (reference models/sinkhorn.py:25-56).

A fixed-iteration `lax.fori_loop` -- compiles to one XLA while loop instead
of the reference's Python loop (iteration count is static config anyway).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_sinkhorn_iterations(Z, log_mu, log_nu, iters: int):
    """Sinkhorn normalization in log space. Z: [B, M, N]."""

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(Z + u[:, :, None], axis=1)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    return Z + u[:, :, None] + v[:, None, :]


def log_optimal_transport(scores, eps: float, iters: int):
    """Differentiable OT with uniform marginals 1/(M+N), returned in
    probability space scaled by (M+N) (reference sinkhorn.py:41-56)."""
    b, m, n = scores.shape
    norm = -jnp.log(jnp.asarray(m + n, dtype=scores.dtype))
    log_mu = jnp.full((b, m), norm, dtype=scores.dtype)
    log_nu = jnp.full((b, n), norm, dtype=scores.dtype)
    Z = log_sinkhorn_iterations(scores / eps, log_mu, log_nu, iters)
    return jnp.exp(Z - norm)
