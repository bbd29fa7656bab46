"""Batched pricing: a whole strike/maturity book in one compiled program.

Production-serving extension (no reference equivalent): price many options
on one shared simulated path set with a single ``jit`` — ``vmap`` over the
strike axis of the full backward induction. Path simulation (the expensive
HBM-writing part) is amortized across the book; each strike runs its own
exercise recursion, so American early-exercise boundaries are per-strike
exact. Greeks for the whole book come from :func:`amcx.greeks.fast_greeks`
applied per row.

All options in the grid share the path grid's maturity; mixed-maturity
books would need per-option step masking (not implemented — price each
maturity bucket on its own grid).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .engine import backward_induction
from .payoff import intrinsic_value
from .types import RegressionSpec

__all__ = ["BookResult", "price_strike_grid"]


class BookResult(NamedTuple):
    prices: jnp.ndarray   # (n_strikes,)
    stderrs: jnp.ndarray  # (n_strikes,)
    cashflows: jnp.ndarray       # (n_strikes, n_paths)
    exercise_times: jnp.ndarray  # (n_strikes, n_paths)


@partial(jax.jit, static_argnames=("option_type", "american", "spec"))
def price_strike_grid(
    paths_tm: jnp.ndarray,
    strikes: jnp.ndarray,
    r,
    T,
    option_type: str = "put",
    american: bool = True,
    spec: RegressionSpec = RegressionSpec(),
) -> BookResult:
    """Price a strike grid of vanilla puts/calls on shared paths.

    One compiled program: the backward induction is vmapped over strikes
    (shared (n_steps+1, n_paths) path tensor; per-strike regressions and
    exercise boundaries).
    """
    n_steps = paths_tm.shape[0] - 1
    dt = T / n_steps
    knocked = jnp.ones(paths_tm.shape, dtype=bool)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, paths_tm.dtype))

    def one(K):
        payoff = lambda S: intrinsic_value(S, K, option_type)
        res = backward_induction(
            paths_tm, knocked, r, dt, payoff, spec,
            american=american, return_surface=False,
        )
        return res.price, res.stderr, res.cashflows, res.exercise_times

    prices, stderrs, cfs, taus = jax.vmap(one)(strikes)
    return BookResult(prices, stderrs, cfs, taus)
