"""Variance reduction: antithetic sampling and control variates.

BASELINE config 3: "Antithetic variates + European closed-form control
variate, convergence study vs path count". Antithetic paths are built by the
simulators (`SimConfig.antithetic`); this module adds the control-variate
estimator on top of the engine.

Control variate: on the *same* simulated paths, the discounted European
payoff ``Y_eu`` has known expectation (the Black-Scholes closed form). The
adjusted American estimator

    P_cv = mean(Y_am) − β (mean(Y_eu) − P_eu^BS),   β = Cov(Y_am, Y_eu)/Var(Y_eu)

is unbiased for any fixed β and variance-minimizing at β̂ (estimating β̂ on
the same sample introduces O(1/n) bias — negligible at MC scale; pass
``beta=1.0`` for the classical fixed-β variant).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .engine import lsmc_option_pricing
from .oracle import bs_price
from .payoff import intrinsic_value
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = ["ControlVariateResult", "control_variate_price"]


class ControlVariateResult(NamedTuple):
    price: jnp.ndarray           # CV-adjusted price
    stderr: jnp.ndarray          # stderr of the adjusted estimator
    raw_price: jnp.ndarray       # plain LSMC price on the same paths
    raw_stderr: jnp.ndarray
    beta: jnp.ndarray            # regression coefficient used
    variance_ratio: jnp.ndarray  # Var(raw) / Var(cv)  (≥ 1 when CV helps)


def control_variate_price(
    paths_tm: jnp.ndarray,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    beta: Optional[float] = None,
) -> ControlVariateResult:
    """American/Bermudan LSMC price with a European closed-form control
    variate evaluated on the same paths.

    Only vanilla products (no barrier) — the control's closed form is the
    European Black-Scholes price of the same strike/maturity.
    """
    if product.has_barrier:
        raise ValueError("control variate uses the vanilla European closed form; "
                         "barrier products are not supported")
    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dt = product.T / n_steps
    r = market.r

    res = lsmc_option_pricing(paths_tm, product, r, spec, return_surface=False)
    y_am = res.cashflows * jnp.exp(-r * dt * res.exercise_times)

    # Control: discounted European payoff on the same terminal spots.
    y_eu = jnp.exp(-jnp.asarray(r, paths_tm.dtype) * product.T) * intrinsic_value(
        paths_tm[-1], product.K, product.option_type
    )
    p_eu = bs_price(
        market.S0, product.K, product.T, r, market.sigma, market.q, product.option_type
    ).astype(paths_tm.dtype)

    mean_am = jnp.mean(y_am)
    mean_eu = jnp.mean(y_eu)
    cov = jnp.mean((y_am - mean_am) * (y_eu - mean_eu))
    var_eu = jnp.maximum(jnp.mean(jnp.square(y_eu - mean_eu)), 1e-12)
    b = cov / var_eu if beta is None else jnp.asarray(beta, paths_tm.dtype)

    y_cv = y_am - b * (y_eu - p_eu)
    price = jnp.mean(y_cv)
    var_cv = jnp.mean(jnp.square(y_cv - price))
    var_raw = jnp.mean(jnp.square(y_am - mean_am))
    stderr = jnp.sqrt(var_cv / n_paths)
    return ControlVariateResult(
        price=price,
        stderr=stderr,
        raw_price=mean_am,
        raw_stderr=jnp.sqrt(var_raw / n_paths),
        beta=b,
        variance_ratio=var_raw / jnp.maximum(var_cv, 1e-12),
    )
