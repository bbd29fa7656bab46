"""Scenario revaluation: spot × vol stress grids in one compiled program.

The reference prices one configuration per `main()` run
(`/root/reference/american_monte_carlo.py:443-503`); a desk risk system
revalues the same trade under a grid of market shifts every cycle. This
module runs the whole grid in ONE jit:

- **Common random numbers**: every scenario re-simulates from the SAME
  threefry key, so the standardized increments are shared and differences
  across scenarios are smooth in the shift (ladder Greeks don't inherit MC
  noise between cells).
- **`lax.scan` over scenarios, never `vmap`**: batching the engine's
  regression would lower its fused reductions to batched MXU dots whose
  conditioning-amplified f32 noise costs real policy value on TPU (the
  round-3 deep-ITM study, docs/PARITY.md) — the scan keeps each scenario on
  the well-behaved single-config path while still compiling once.
- Two modes:
  * ``mode="refit"`` — full LSMC per scenario (policy re-estimated under
    the shifted dynamics; the textbook revaluation),
  * ``mode="replay"`` — fit the exercise policy ONCE at base, replay the
    frozen coefficients on every scenario's paths
    (`amcx.policy.reprice_with_coeffs`, regression pass skipped). For
    small shifts the frozen policy is the standard desk approximation
    (the price is first-order insensitive to policy perturbations — the
    envelope theorem — so ladder Greeks agree with refit to O(shift²));
    it is also a strict lower bound per scenario.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .engine import lsmc_option_pricing, price_option
from .paths import gbm_standardization, simulate_gbm
from .policy import reprice_with_coeffs
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = ["ScenarioGrid", "scenario_ladder"]


@dataclasses.dataclass(frozen=True)
class ScenarioGrid:
    """Revaluation grid: ``prices[i, j]`` is the price at
    ``spot_shifts[i]`` (relative) × ``vol_shifts[j]`` (absolute)."""

    spot_shifts: np.ndarray     # (ns,) relative spot bumps (0.0 = base)
    vol_shifts: np.ndarray      # (nv,) absolute vol bumps (0.0 = base)
    prices: jnp.ndarray         # (ns, nv)
    stderrs: jnp.ndarray        # (ns, nv)
    mode: str

    def ladder_delta_gamma(self, S0: float, j: Optional[int] = None):
        """Central-difference delta and gamma along the spot axis at vol
        column ``j`` (default: the column closest to zero vol shift).
        Requires a uniform spot grid with ≥ 3 points."""
        ds = np.diff(self.spot_shifts)
        if self.spot_shifts.size < 3 or not np.allclose(ds, ds[0]):
            raise ValueError("need a uniform spot grid with >= 3 points")
        if j is None:
            j = int(np.argmin(np.abs(self.vol_shifts)))
        p = np.asarray(self.prices[:, j], np.float64)
        h = float(ds[0]) * float(S0)
        delta = (p[2:] - p[:-2]) / (2.0 * h)
        gamma = (p[2:] - 2.0 * p[1:-1] + p[:-2]) / (h * h)
        return delta, gamma


@partial(jax.jit, static_argnames=("product", "spec", "sim", "mode"))
def _ladder_impl(key, S0_grid, sig_grid, r, q, product, spec, sim, mode,
                 coeffs, mean_t, inv_std_t):
    def one(_, s0_sig):
        s0, sig = s0_sig
        m = MarketParams(s0, r, sig, q)
        paths = simulate_gbm(key, m, product.T, sim)
        if mode == "replay-mega":
            # frozen policy replayed IN-KERNEL per scenario: the regression
            # pass is skipped entirely (flagship revaluation speed)
            from .ops.lsmc_megakernel import lsmc_price_megakernel

            price, stderr = lsmc_price_megakernel(
                paths, product.K, r, product.T / sim.n_steps,
                1.0 if product.option_type == "call" else -1.0,
                basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
                american=product.is_american, mean_t=mean_t,
                inv_std_t=inv_std_t, return_stats=True,
                antithetic=sim.antithetic, replay_coeffs=coeffs)
            return None, (price, stderr)
        if mode == "replay":
            res = reprice_with_coeffs(paths, coeffs, product, r, mean_t,
                                      inv_std_t, spec,
                                      antithetic=sim.antithetic)
        else:
            res = lsmc_option_pricing(paths, product, r, spec,
                                      return_surface=False,
                                      antithetic=sim.antithetic)
        return None, (res.price, res.stderr)

    _, (prices, stderrs) = lax.scan(one, None, (S0_grid, sig_grid))
    return prices, stderrs


def scenario_ladder(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    spot_shifts=(-0.10, -0.05, 0.0, 0.05, 0.10),
    vol_shifts=(-0.05, 0.0, 0.05),
    mode: str = "refit",
) -> ScenarioGrid:
    """Price ``product`` under every (spot shift × vol shift) scenario.

    ``spot_shifts`` are relative (−0.05 = spot down 5%), ``vol_shifts``
    absolute vol points. Returns a :class:`ScenarioGrid`; the zero-shift
    cell equals the corresponding single pricing on the same key exactly
    (same paths, same engine). ``mode="replay-mega"`` replays the frozen
    base policy IN-KERNEL per scenario (`lsmc_price_megakernel
    (replay_coeffs=...)` — no regression pass anywhere in the grid; the
    measured single-option replay rate is ~39 G path-steps/s, so big
    grids revalue at better-than-flagship speed per cell).
    """
    from .engine import resolve_regression_spec

    # one concrete estimator for the whole grid: refit cells and the
    # frozen-policy replays must run the SAME resolved spec or the
    # envelope-theorem comparison (replay ~ refit at small shifts) breaks
    # by the estimator difference, not the shift
    spec = resolve_regression_spec(spec, product, q=market.q)
    if mode not in ("refit", "replay", "replay-mega"):
        raise ValueError(f"mode must be 'refit', 'replay', or "
                         f"'replay-mega', got {mode!r}")
    if mode == "replay-mega" and product.has_barrier:
        raise ValueError("replay-mega scenarios do not thread the barrier "
                         "state; use mode='refit' or 'replay' for barrier "
                         "products")
    spot_shifts = np.atleast_1d(np.asarray(spot_shifts, np.float64))
    vol_shifts = np.atleast_1d(np.asarray(vol_shifts, np.float64))
    ns, nv = spot_shifts.size, vol_shifts.size
    S0g, SIGg = np.meshgrid(float(market.S0) * (1.0 + spot_shifts),
                            float(market.sigma) + vol_shifts, indexing="ij")
    if np.any(SIGg <= 0):
        raise ValueError("a vol shift drives sigma non-positive")
    dtype = sim.jnp_dtype
    if mode in ("replay", "replay-mega"):
        # fit via the mega engine: its coefficient frame is the CLOSED-FORM
        # GBM standardization, recomputable here (the XLA engine's
        # per-step empirical frame is not exported — same routing as
        # `amcx.policy.price_out_of_sample`). The exported policy is the
        # ALL-PATHS fit: scenario replay evaluates the coefficients at
        # shifted spots/vols, and an ITM-localized fit's t=0 row is
        # degenerate exactly at the money (zero weight mass -> zero
        # coefficients -> cont = 0 -> spurious immediate exercise at any
        # ITM shifted spot; docs/PARITY.md deviation 6).
        spec_fit = dataclasses.replace(spec, regress_on="all")
        base = price_option(key, market, product, spec_fit, sim,
                            engine="mega", return_coeffs=True)
        coeffs = jnp.asarray(base.coeffs)
        mean_t, inv_std_t = gbm_standardization(market, product.T,
                                                sim.n_steps)
    else:
        # pytree-consistent placeholders (scan closure needs fixed shapes)
        k = spec.degree + 1
        coeffs = jnp.zeros((sim.n_steps, k), dtype)
        mean_t, inv_std_t = gbm_standardization(market, product.T,
                                                sim.n_steps)
    prices, stderrs = _ladder_impl(
        key, jnp.asarray(S0g.reshape(-1), dtype),
        jnp.asarray(SIGg.reshape(-1), dtype),
        jnp.asarray(market.r, dtype), jnp.asarray(market.q, dtype),
        product, spec, sim, mode, coeffs, mean_t, inv_std_t)
    return ScenarioGrid(spot_shifts, vol_shifts,
                        prices.reshape(ns, nv), stderrs.reshape(ns, nv),
                        mode)
