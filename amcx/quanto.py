"""Quanto and composite (compo) cross-currency options.

Capability beyond the reference (single-currency GBM only,
`american_monte_carlo.py:57,71-95`): the two production FX-linked payoff
conventions, mapped onto the EXISTING engine matrix by measure-change
drift adjustments — no new engine code, so every engine tier
(xla/fused/mega/fusedpath), barrier gates, Bermudan schedules, and Greeks
machinery ride along unchanged.

- **Quanto**: payoff on a foreign asset ``S`` (foreign-currency
  underlying), paid in DOMESTIC currency at a FIXED conversion rate
  ``fx_rate``. Under the domestic risk-neutral measure the non-tradable
  ``S`` drifts at ``r_f − q − ρ σ_S σ_X`` (the quanto adjustment: the
  covariance price of holding foreign-denominated risk), discounted at
  ``r_d``. Equivalently a standard ``(r_d, q_eff)`` GBM with

      q_eff = r_d − r_f + q + ρ σ_S σ_X

  so :func:`price_quanto_option` is ``fx_rate ×`` the flagship engine on
  :func:`quanto_effective_market`.
- **Compo** (composite): payoff on the domestic value ``Y = S·X``
  (converted at the prevailing FX rate). ``Y`` is a domestic TRADABLE
  with dividend yield ``q`` and lognormal vol
  ``σ_Y = sqrt(σ_S² + 2ρ σ_S σ_X + σ_X²)`` — a plain ``(r_d, q)`` GBM on
  spot ``S0·X0``.

The sharp validation gate (tests/test_quanto.py) derives the price
WITHOUT assuming either formula: simulate ``(X, Y)`` JOINTLY under the
domestic measure, where both drifts are pinned by tradability alone
(``X``: ``r_d − r_f``, a foreign bond position; ``Y``: ``r_d − q``, a
converted stock position), recover ``S = Y/X``, and the two-factor MC
quanto/compo prices must land on the closed forms that embed the
adjustments (:func:`quanto_two_factor_european`).
"""

from __future__ import annotations

import dataclasses
from math import sqrt

import jax
import jax.numpy as jnp
import numpy as np

from .engine import LSMCResult, price_option
from .oracle import bs_price, crr_price
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = [
    "QuantoParams",
    "quanto_effective_market",
    "quanto_european_price",
    "quanto_crr_price",
    "price_quanto_option",
    "compo_market",
    "compo_european_price",
    "price_compo_option",
    "quanto_two_factor_european",
]


@dataclasses.dataclass(frozen=True)
class QuantoParams:
    """Cross-currency market for a foreign asset ``S``.

    ``sigma`` is the asset vol (foreign currency), ``fx_sigma`` the vol of
    the FX rate ``X`` (domestic per unit foreign), ``rho`` the instantaneous
    correlation ``corr(dW_S, dW_X)``, ``q`` the asset dividend yield, and
    ``fx_rate`` the FIXED quanto conversion rate (defaults to 1: payoff
    numbers carry over unscaled)."""

    S0: float
    r_d: float
    r_f: float
    sigma: float
    fx_sigma: float
    rho: float
    q: float = 0.0
    fx_rate: float = 1.0

    @property
    def drift_adjustment(self) -> float:
        """The quanto covariance term ``ρ σ_S σ_X``."""
        return self.rho * self.sigma * self.fx_sigma

    @property
    def q_eff(self) -> float:
        """Effective continuous yield that maps the quanto onto the
        standard domestic engine: ``r_d − (r_f − q − ρσ_Sσ_X)``."""
        return self.r_d - self.r_f + self.q + self.drift_adjustment


def quanto_effective_market(qp: QuantoParams) -> MarketParams:
    """The quanto as a standard domestic market: GBM ``(r_d, q_eff)``.

    Everything downstream (engines, oracles, Greeks via ``jax.grad`` on
    the returned leaves) treats this like any other market."""
    return MarketParams(qp.S0, qp.r_d, qp.sigma, q=qp.q_eff)


def quanto_european_price(qp: QuantoParams, K, T,
                          option_type: str = "put") -> float:
    """Closed-form European quanto: ``fx_rate × BS(S0, r_d, σ_S, q_eff)``."""
    return float(qp.fx_rate) * float(
        bs_price(qp.S0, K, T, qp.r_d, qp.sigma, q=qp.q_eff,
                 option_type=option_type))


def quanto_crr_price(qp: QuantoParams, K, T, option_type: str = "put",
                     american: bool = True, n_steps: int = 2000) -> float:
    """Binomial oracle for the AMERICAN quanto (carry ``r_d − q_eff``,
    discount ``r_d`` — the same effective-market mapping)."""
    return float(qp.fx_rate) * float(
        crr_price(qp.S0, K, T, qp.r_d, qp.sigma, n_steps, q=qp.q_eff,
                  option_type=option_type, american=american))


def _scale_result(res: LSMCResult, scale: float) -> LSMCResult:
    if scale == 1.0:
        return res
    return res._replace(
        price=res.price * scale,
        stderr=res.stderr * scale,
        cashflows=None if res.cashflows is None else res.cashflows * scale,
        continuation=(None if res.continuation is None
                      else res.continuation * scale),
    )


def price_quanto_option(
    key,
    qp: QuantoParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
    **kwargs,
) -> LSMCResult:
    """American/European/barrier/Bermudan quanto through the full engine
    matrix (``engine`` ∈ xla/fused/mega/fusedpath, exactly
    `amcx.engine.price_option`'s contract). ``K``/``barrier`` in
    ``product`` are in the FOREIGN asset units, as quoted; the returned
    price/stderr (and any cashflow/continuation planes) are scaled into
    domestic currency by ``fx_rate``."""
    res = price_option(key, quanto_effective_market(qp), product, spec, sim,
                       engine=engine, **kwargs)
    return _scale_result(res, float(qp.fx_rate))


def compo_market(qp: QuantoParams, X0: float) -> MarketParams:
    """The compo underlying ``Y = S·X`` as a standard domestic market:
    spot ``S0·X0``, rate ``r_d``, yield ``q``, vol
    ``sqrt(σ_S² + 2ρσ_Sσ_X + σ_X²)``."""
    sigma_c = sqrt(qp.sigma**2 + 2.0 * qp.rho * qp.sigma * qp.fx_sigma
                   + qp.fx_sigma**2)
    return MarketParams(qp.S0 * X0, qp.r_d, sigma_c, q=qp.q)


def compo_european_price(qp: QuantoParams, X0: float, K, T,
                         option_type: str = "put") -> float:
    """Closed-form European compo (strike ``K`` in DOMESTIC currency on
    the converted value ``S_T·X_T``)."""
    m = compo_market(qp, X0)
    return float(bs_price(m.S0, K, T, m.r, m.sigma, q=m.q,
                          option_type=option_type))


def price_compo_option(
    key,
    qp: QuantoParams,
    X0: float,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
    **kwargs,
) -> LSMCResult:
    """American/European/barrier compo option through the full engine
    matrix: the converted value ``Y = S·X`` is itself GBM, so the
    univariate engines price it directly (``product.K`` and any barrier
    are in DOMESTIC currency against ``Y``)."""
    return price_option(key, compo_market(qp, X0), product, spec, sim,
                        engine=engine, **kwargs)


def quanto_two_factor_european(key, qp: QuantoParams, K, T,
                               option_type: str = "put",
                               n_paths: int = 1 << 20):
    """Adjustment-free two-factor validation leg: exact terminal sampling
    of ``(ln X_T, ln Y_T)`` under the domestic measure using ONLY the
    tradable drifts (``X``: ``r_d − r_f``; ``Y = S·X``: ``r_d − q``) and
    the implied correlation ``corr = (σ_X + ρσ_S)/σ_Y``, then
    ``S_T = Y_T/X_T``. Returns ``(price, stderr)`` of the quanto European
    — the gate that certifies the ``q_eff`` measure change without
    assuming it (tests/test_quanto.py)."""
    sx, ss, rho = qp.fx_sigma, qp.sigma, qp.rho
    sy = sqrt(ss * ss + 2.0 * rho * ss * sx + sx * sx)
    corr = (sx + rho * ss) / sy if sy > 0 else 0.0
    X0 = 1.0  # X cancels in S = Y/X scale-freely; fix the quote at 1
    z = jax.random.normal(key, (2, n_paths))
    z1 = z[0]
    z2 = corr * z[0] + sqrt(max(1.0 - corr * corr, 0.0)) * z[1]
    lx = (np.log(X0) + (qp.r_d - qp.r_f - 0.5 * sx * sx) * T
          + sx * sqrt(T) * z1)
    ly = (np.log(qp.S0 * X0) + (qp.r_d - qp.q - 0.5 * sy * sy) * T
          + sy * sqrt(T) * z2)
    S_T = jnp.exp(ly - lx)
    phi = 1.0 if option_type == "call" else -1.0
    pay = jnp.maximum(phi * (S_T - K), 0.0)
    disc = np.exp(-qp.r_d * T) * float(qp.fx_rate)
    price = disc * jnp.mean(pay)
    stderr = disc * jnp.std(pay) / np.sqrt(n_paths)
    return price, stderr
