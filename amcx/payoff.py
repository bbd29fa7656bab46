"""Payoffs and barrier monitoring (pure functions).

Equivalents of the reference's payoff/product layer:

- `intrinsic_value` (`/root/reference/american_monte_carlo.py:85-86`)
- `precompute_barrier_hit_matrix` (`american_monte_carlo.py:171-176`)

Product identity stays a parameter tuple (SURVEY layer 3), carried by
`amcx.types.ProductSpec`. Barrier semantics are down-and-**in** only
(SURVEY Q4): a path's cashflow exists only once it has touched the barrier,
and early exercise is only permitted on already-knocked paths.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .types import ProductSpec

__all__ = ["intrinsic_value", "barrier_knocked", "max_call_payoff"]


def intrinsic_value(S: jnp.ndarray, K, option_type: str = "call") -> jnp.ndarray:
    """``max(K-S, 0)`` for puts, ``max(S-K, 0)`` for calls.

    Parity: `american_monte_carlo.py:85-86` (which spells them "Put"/"Call").
    """
    if option_type.strip().lower() == "put":
        return jnp.maximum(K - S, 0.0)
    return jnp.maximum(S - K, 0.0)


def barrier_knocked(paths_tm: jnp.ndarray, barrier) -> jnp.ndarray:
    """Down-and-in knock state per (time, path): has the path touched
    ``S <= barrier`` at or before t?

    Parity: `precompute_barrier_hit_matrix` (`american_monte_carlo.py:
    171-176`) — a running maximum of the hit indicator along time. ``barrier
    is None`` yields the all-True matrix (vanilla product). Time-major input
    ``(n_steps+1, n_paths, ...)``.
    """
    if barrier is None:
        return jnp.ones(paths_tm.shape, dtype=bool)
    hit = paths_tm <= barrier
    return lax.associative_scan(jnp.logical_or, hit, axis=0)


def max_call_payoff(S: jnp.ndarray, K) -> jnp.ndarray:
    """``max(max_i S_i - K, 0)`` over the trailing asset axis (Bermudan
    max-call, BASELINE config 5)."""
    return jnp.maximum(jnp.max(S, axis=-1) - K, 0.0)


def payoff_fn_for(product: ProductSpec):
    """Closure ``S_t -> intrinsic`` for the engine."""
    opt = product.option_type

    def payoff(S):
        return intrinsic_value(S, product.K, opt)

    return payoff
