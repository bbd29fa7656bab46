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

import jax.numpy as jnp

from .engine import lsmc_option_pricing
from .oracle import bs_price
from .payoff import intrinsic_value
from .types import MarketParams, ProductSpec, RegressionSpec

__all__ = ["ControlVariateResult", "control_variate_price",
           "martingale_control_variate"]


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


def martingale_control_variate(
    cashflows: jnp.ndarray,
    exercise_times: jnp.ndarray,
    paths_tm: jnp.ndarray,
    market: MarketParams,
    product: ProductSpec,
    antithetic: bool = False,
    beta: Optional[float] = None,
    control: str = "european_at_tau",
) -> ControlVariateResult:
    """Rasmussen control variate for AMERICAN estimators: a martingale
    sampled AT THE EXERCISE TIME.

    The plain European control (`control_variate_price`) correlates
    imperfectly with the American payoff because they pay at different
    times. Rasmussen (2005)'s fix: ``e^{−rt}·BS(S_t, T−t)`` is an EXACT
    martingale under the exact-GBM grid transition (tower property of the
    discounted European payoff), so by optional stopping

        Z = e^{−rτ}·BS_eu(S_τ, T−τ) − BS_eu(S0, T),   E[Z] = 0

    for every grid stopping time τ — and Z shares the American payoff's
    stopping-time randomness, so the correlation is high where it matters
    (exercised paths sit at the boundary where the European value ≈ the
    intrinsic being paid). ``control="stock"`` uses the weaker
    ``e^{−(r−q)τ}S_τ − S0`` (near-useless for puts; kept for reference).

    Composes with the flagship kernels: ``price_option(engine="mega",
    return_cf_tau=True)`` hands back exactly the ``(cashflows,
    exercise_times)`` planes this needs — one `take_along_axis` gather on
    the path array plus a vectorized closed form is the only post-kernel
    work.

    ``antithetic=True`` folds mirror pairs (row j with j + n/2, every
    generator's layout) before the moment estimates — honest stderr, same
    discipline as the engines.
    """
    dtype = paths_tm.dtype
    cf = cashflows.reshape(-1)
    tau = exercise_times.reshape(-1).astype(dtype)
    n_paths = cf.shape[0]
    if paths_tm.ndim != 2 or paths_tm.shape[1] != n_paths:
        raise ValueError("paths_tm must be (n_steps+1, n_paths) matching "
                         "the cashflow plane")
    n_steps = paths_tm.shape[0] - 1
    dt = jnp.asarray(product.T / n_steps, dtype)
    r = jnp.asarray(market.r, dtype)
    q = jnp.asarray(market.q, dtype)
    y = cf * jnp.exp(-r * dt * tau)
    tau_i = jnp.clip(exercise_times.reshape(-1).astype(jnp.int32), 0, n_steps)
    s_tau = jnp.take_along_axis(paths_tm, tau_i[None, :], axis=0)[0]
    if control == "european_at_tau":
        rem = jnp.maximum(jnp.asarray(product.T, dtype) - dt * tau, 1e-7)
        v_tau = bs_price(s_tau, product.K, rem, r, market.sigma, q,
                         product.option_type).astype(dtype)
        z = jnp.exp(-r * dt * tau) * v_tau - bs_price(
            market.S0, product.K, product.T, r, market.sigma, q,
            product.option_type).astype(dtype)
    elif control == "stock":
        z = jnp.exp(-(r - q) * dt * tau) * s_tau - paths_tm[0]
    else:
        raise ValueError(f"unknown control {control!r}")

    if antithetic:
        half = n_paths // 2
        y = 0.5 * (y[:half] + y[half:])
        z = 0.5 * (z[:half] + z[half:])
    n_eff = y.shape[0]
    mean_y = jnp.mean(y)
    mean_z = jnp.mean(z)
    cov = jnp.mean((y - mean_y) * (z - mean_z))
    var_z = jnp.maximum(jnp.mean(jnp.square(z - mean_z)), 1e-12)
    b = cov / var_z if beta is None else jnp.asarray(beta, dtype)
    y_cv = y - b * z          # E[Z] = 0 exactly — no sampled oracle needed
    price = jnp.mean(y_cv)
    var_cv = jnp.mean(jnp.square(y_cv - price))
    var_raw = jnp.mean(jnp.square(y - mean_y))
    return ControlVariateResult(
        price=price,
        stderr=jnp.sqrt(var_cv / n_eff),
        raw_price=mean_y,
        raw_stderr=jnp.sqrt(var_raw / n_eff),
        beta=b,
        variance_ratio=var_raw / jnp.maximum(var_cv, 1e-12),
    )
