"""Discrete cash dividends: GBM between ex-dates with deterministic drops.

Capability beyond the reference (continuous yield ``q`` only,
`american_monte_carlo.py:57,71-95`): the production dividend model for
single stocks — the spot follows GBM between ex-dividend dates and drops
by the cash amount ``D_j`` at each date, ``S(t_j) = S(t_j⁻) − D_j``
(floored just above zero). The spot stays the full Markov state, so the
whole univariate engine matrix applies unchanged: XLA scan, the ONE-kernel
mega engine (empirical standardization), and the barrier gates all ride
along through `amcx.dynamics._price_univariate_markov`.

Model facts the tests pin (tests/test_dividends.py):

- pathwise put-call parity with the dividend-adjusted forward:
  ``C − P = S0 − Σ D_j e^{−r t_j} − K e^{−rT}`` EXACTLY on shared paths;
- the Crank-Nicolson oracle (`amcx.pde.pde_price(dividends=...)`)
  implements the backward jump condition ``V(S, t⁻) = V(S − D, t)`` plus
  the dividend-adjusted far-field asymptotics — MC and PDE agree to MC
  noise for Europeans and Americans;
- an American CALL on a dividend payer is worth MORE than its European
  twin (exercise cum-dividend just before the drop) — the classic fact a
  continuous-yield model cannot produce at q=0;
- zero amounts collapse both legs to the vanilla engines exactly.

Ex-dates snap to the NEAREST simulation grid boundary (documented; use
``n_steps`` that resolves the calendar). The recorded path value ``S_t``
is EX-dividend — exercise decisions at the drop step see the dropped
spot, and "exercise cum-dividend" is exercising at the step before, the
standard discrete-monitoring convention.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .engine import LSMCResult
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = [
    "DividendSchedule",
    "dividend_step_amounts",
    "simulate_gbm_divs",
    "price_option_divs",
]

_FLOOR = 1e-6  # absolute spot floor after a drop (absorbing-ish, ~0)


@dataclasses.dataclass(frozen=True)
class DividendSchedule:
    """Dividends dropping at ex-dates ``times[j]``: cash ``amounts[j]``
    and/or proportional ``fractions[j]`` (the production convention —
    cash for near dates, proportional for far estimates). At a date the
    proportional drop applies first: ``S → S(1−f) − D``."""

    times: tuple
    amounts: tuple
    fractions: tuple

    def __init__(self, times: Sequence[float], amounts: Sequence[float],
                 fractions: Sequence[float] = None):
        object.__setattr__(self, "times", tuple(float(t) for t in times))
        object.__setattr__(self, "amounts",
                           tuple(float(a) for a in amounts))
        if fractions is None:
            fractions = [0.0] * len(self.times)
        object.__setattr__(self, "fractions",
                           tuple(float(f) for f in fractions))
        if not (len(self.times) == len(self.amounts)
                == len(self.fractions)):
            raise ValueError("times, amounts, fractions must have equal "
                             "length")
        if any(t <= 0 for t in self.times):
            raise ValueError("ex-dates must be strictly positive")
        if any(a < 0 for a in self.amounts):
            raise ValueError("dividend amounts must be nonnegative")
        if any(not 0.0 <= f < 1.0 for f in self.fractions):
            raise ValueError("fractions must lie in [0, 1)")

    def pv(self, r: float, T: float) -> float:
        """PV at t=0 of the CASH legs with ex-date ≤ T (flat rate),
        each shed by the proportional drops occurring AFTER it —
        exactly the cash part of the forward identity
        ``E[e^{−rT} S_T] = S0·Π(1−f_j) − Σ_j D_j e^{−r t_j}·
        Π_{t_k > t_j}(1−f_k)``."""
        total = 0.0
        for t, a in zip(self.times, self.amounts):
            if t > T + 1e-12:
                continue
            shed = np.prod([1.0 - f for tk, f in
                            zip(self.times, self.fractions)
                            if t < tk <= T + 1e-12])
            total += a * np.exp(-r * t) * shed
        return float(total)

    def forward_factor(self, T: float) -> float:
        """``Π_{t_j ≤ T}(1 − f_j)`` — the proportional shed of the
        forward."""
        return float(np.prod([1.0 - f for t, f in
                              zip(self.times, self.fractions)
                              if t <= T + 1e-12]))


def _as_schedule(dividends) -> DividendSchedule:
    if isinstance(dividends, DividendSchedule):
        return dividends
    times, amounts = dividends
    return DividendSchedule(times, amounts)


def dividend_step_amounts(dividends, T: float, n_steps: int) -> np.ndarray:
    """Snap the schedule onto the step grid: row ``out[i] = (cash, frac)``
    is the total cash and combined proportional drop at grid boundary
    ``t_{i+1}`` (ex-dates round to the nearest boundary; dates beyond
    ``T`` are ignored; a date that rounds to t=0 snaps to the first
    boundary; same-boundary fractions compound). Host-side numpy — shared
    by the MC pathgen and the PDE jump condition so both legs see the
    SAME snapped calendar."""
    sched = _as_schedule(dividends)
    dt = T / n_steps
    out = np.zeros((n_steps, 2), np.float64)
    for t, a, f in zip(sched.times, sched.amounts, sched.fractions):
        if t > T + 1e-9 * T:
            continue
        k = int(round(t / dt))
        k = min(max(k, 1), n_steps)
        # S → S(1−f) − D at the boundary; same-boundary events compose as
        # S(1−f1)(1−f2) − (D1(1−f2) + D2) when f2/D2 come calendar-later,
        # but within one snapped boundary the order is immaterial to
        # first order — compound fractions, shed earlier cash
        out[k - 1, 0] = out[k - 1, 0] * (1.0 - f) + a
        out[k - 1, 1] = 1.0 - (1.0 - out[k - 1, 1]) * (1.0 - f)
    return out


@partial(jax.jit, static_argnames=("sim",))
def _simulate_gbm_divs(key, S0, r, q, sigma, div_row, T, sim):
    dtype = sim.jnp_dtype
    n_steps, n = sim.n_steps, sim.n_paths
    dt = jnp.asarray(T, dtype) / n_steps
    sdt = jnp.sqrt(dt)
    drift = (r - q - 0.5 * sigma * sigma) * dt
    if sim.antithetic:
        h = jax.random.normal(key, (n_steps, n // 2), dtype)
        Z = jnp.concatenate([h, -h], axis=1)
    else:
        Z = jax.random.normal(key, (n_steps, n), dtype)

    def step(S, xs):
        z, d = xs
        S2 = S * jnp.exp(drift + sigma * sdt * z)
        S2 = jnp.maximum(S2 * (1.0 - d[1]) - d[0], _FLOOR)
        return S2, S2

    S0v = jnp.full((n,), S0, dtype)
    _, path = jax.lax.scan(step, S0v, (Z, div_row.astype(dtype)))
    return jnp.concatenate([S0v[None, :], path])


def simulate_gbm_divs(key, market: MarketParams, dividends, T,
                      sim: SimConfig):
    """Time-major ``(n_steps+1, n_paths)`` GBM paths with discrete cash
    dividend drops (exact lognormal increments between dates; the recorded
    ``S_t`` at a drop step is EX-dividend)."""
    dtype = sim.jnp_dtype
    div_row = jnp.asarray(
        dividend_step_amounts(dividends, T, sim.n_steps), dtype)
    return _simulate_gbm_divs(
        key,
        jnp.asarray(market.S0, dtype), jnp.asarray(market.r, dtype),
        jnp.asarray(market.q, dtype), jnp.asarray(market.sigma, dtype),
        div_row, T, sim,
    )


def price_option_divs(
    key,
    market: MarketParams,
    dividends,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    return_surface: bool = False,
    engine: str = "xla",
) -> LSMCResult:
    """American/European vanilla (or barrier) on a discrete-dividend
    payer. Spot remains the full Markov state, so the standard univariate
    engine tail applies unchanged — ``engine="mega"`` runs the ONE-kernel
    engine on the simulated paths; barriers gate on the ex-dividend path.
    Oracle: ``amcx.pde.pde_price(dividends=...)``."""
    from .dynamics import _price_univariate_markov

    S = simulate_gbm_divs(key, market, dividends, product.T, sim)
    return _price_univariate_markov(S, market, product, spec, sim,
                                    return_surface, engine,
                                    "discrete-dividend")
