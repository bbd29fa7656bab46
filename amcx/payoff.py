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

__all__ = [
    "exercise_allow_row",
    "intrinsic_value",
    "barrier_knocked",
    "barrier_gate",
    "payoff_fn_for",
    "max_call_payoff",
]


def intrinsic_value(S: jnp.ndarray, K, option_type: str = "call") -> jnp.ndarray:
    """``max(K-S, 0)`` for puts, ``max(S-K, 0)`` for calls.

    Parity: `american_monte_carlo.py:85-86` (which spells them "Put"/"Call").
    """
    if option_type.strip().lower() == "put":
        return jnp.maximum(K - S, 0.0)
    return jnp.maximum(S - K, 0.0)


def barrier_knocked(paths_tm: jnp.ndarray, barrier, down: bool = True) -> jnp.ndarray:
    """Knock state per (time, path): has the path touched the barrier
    (``S <= barrier`` for down, ``S >= barrier`` for up) at or before t?

    Parity: `precompute_barrier_hit_matrix` (`american_monte_carlo.py:
    171-176`) — a running maximum of the hit indicator along time (the
    reference is down-only). ``barrier is None`` yields the all-True matrix
    (vanilla product). Time-major input ``(n_steps+1, n_paths, ...)``.
    """
    if barrier is None:
        return jnp.ones(paths_tm.shape, dtype=bool)
    hit = paths_tm <= barrier if down else paths_tm >= barrier
    return lax.associative_scan(jnp.logical_or, hit, axis=0)


def barrier_gate(paths_tm: jnp.ndarray, barrier, barrier_type: str = "down-in"):
    """Per-(time, path) exercisability gate for any knock variant: for
    knock-IN products a cashflow exists only once knocked; for knock-OUT
    products only while never knocked (value dies at the touch, rebate 0).
    """
    if barrier is None:
        return jnp.ones(paths_tm.shape, dtype=bool)
    bt = barrier_type.strip().lower()
    knocked = barrier_knocked(paths_tm, barrier, down=bt.startswith("down"))
    return knocked if bt.endswith("in") else ~knocked


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

def exercise_allow_row(exercise_steps, n_steps: int, dtype=None):
    """Validate a Bermudan schedule and build the per-step allow row.

    ``exercise_steps``: iterable of step indices in 0..n_steps-1 where early
    exercise is permitted. Returns a length-``n_steps + 1`` array (the
    maturity slot is unused by every consumer but keeps the row aligned with
    the per-step stats tables); bool when ``dtype`` is None.
    Shared by the XLA engine, the fused engine, and the mega/fused-path
    kernels so the validation/row semantics cannot drift.
    """
    sched = set(int(i) for i in exercise_steps)
    if not all(0 <= i <= n_steps - 1 for i in sched):
        raise ValueError(
            f"exercise_steps must lie in 0..{n_steps - 1}, got {sorted(sched)}"
        )
    row = [i in sched for i in range(n_steps + 1)]
    if dtype is None:
        return jnp.asarray(row, bool)
    return jnp.asarray([1.0 if a else 0.0 for a in row], dtype)
