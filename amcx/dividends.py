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
    """Cash dividends ``amounts[j]`` dropping at ex-dates ``times[j]``."""

    times: tuple
    amounts: tuple

    def __init__(self, times: Sequence[float], amounts: Sequence[float]):
        object.__setattr__(self, "times", tuple(float(t) for t in times))
        object.__setattr__(self, "amounts",
                           tuple(float(a) for a in amounts))
        if len(self.times) != len(self.amounts):
            raise ValueError("times and amounts must have equal length")
        if any(t <= 0 for t in self.times):
            raise ValueError("ex-dates must be strictly positive")
        if any(a < 0 for a in self.amounts):
            raise ValueError("dividend amounts must be nonnegative")

    def pv(self, r: float, T: float) -> float:
        """PV at t=0 of the dividends with ex-date ≤ T (flat rate)."""
        return float(sum(a * np.exp(-r * t)
                         for t, a in zip(self.times, self.amounts)
                         if t <= T + 1e-12))


def _as_schedule(dividends) -> DividendSchedule:
    if isinstance(dividends, DividendSchedule):
        return dividends
    times, amounts = dividends
    return DividendSchedule(times, amounts)


def dividend_step_amounts(dividends, T: float, n_steps: int) -> np.ndarray:
    """Snap the schedule onto the step grid: ``out[i]`` is the total cash
    dropping at grid boundary ``t_{i+1}`` (ex-dates round to the nearest
    boundary; dates beyond ``T`` are ignored; a date that rounds to t=0
    snaps to the first boundary). Host-side numpy — shared by the MC
    pathgen and the PDE jump condition so both legs see the SAME snapped
    calendar."""
    sched = _as_schedule(dividends)
    dt = T / n_steps
    out = np.zeros((n_steps,), np.float64)
    for t, a in zip(sched.times, sched.amounts):
        if t > T + 1e-9 * T:
            continue
        k = int(round(t / dt))
        k = min(max(k, 1), n_steps)
        out[k - 1] += a
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
        S2 = jnp.maximum(S2 - d, _FLOOR)
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
