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

__all__ = ["ControlVariateResult", "control_variate_price",
           "martingale_control_variate", "importance_sampled_european"]


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


def importance_sampled_european(
    key,
    market: MarketParams,
    product: ProductSpec,
    sim: SimConfig,
    theta: Optional[float] = None,
):
    """Deep-OTM European (and knock-in barrier) pricing by exponential
    tilting: simulate under a drift-shifted Brownian ``W̃_t = W_t + θt``,
    reweight each path by the Girsanov likelihood ratio
    ``L = exp(−θ·W̃_T + ½θ²T)`` so the estimator stays unbiased under the
    pricing measure. θ defaults to the shift that moves the terminal
    median onto the strike (or the barrier for knock-ins) — the standard
    "hit the rare region with O(1) probability" choice; rare-event
    variance drops by orders of magnitude where plain MC sees a handful
    of nonzero payoffs.

    Scope: a SINGLE exponential tilt covers one-sided rare events — deep
    OTM vanillas and knock-ins whose barrier lies on the same side as the
    payoff's moneyness (down-in puts, up-in calls). Two-sided events
    (down-in CALLS: knock low, finish high) need a path-dependent change
    of drift and are out of scope — the estimator stays unbiased but the
    variance gain evaporates.

    Returns a :class:`ControlVariateResult` (``variance_ratio`` compares
    against plain MC on the SAME shifted sample size via the unweighted
    payoff second moment — the honest apples-to-apples ratio).
    """
    dtype = sim.jnp_dtype
    S0 = jnp.asarray(market.S0, dtype)
    r = jnp.asarray(market.r, dtype)
    q = jnp.asarray(market.q, dtype)
    sigma = jnp.asarray(market.sigma, dtype)
    T = jnp.asarray(product.T, dtype)
    n_steps, n = sim.n_steps, sim.n_paths
    dt = T / n_steps
    if theta is None:
        target = (product.barrier if product.has_barrier else product.K)
        theta = float(
            (jnp.log(jnp.asarray(target, dtype) / S0)
             - (r - q - 0.5 * sigma * sigma) * T) / (sigma * T))
    th = jnp.asarray(theta, dtype)
    if sim.antithetic:
        raise ValueError("importance sampling reweights a shifted sample; "
                         "antithetic mirroring breaks the pairing — drop "
                         "one of the two")
    if product.has_barrier and product.barrier_type.endswith("out"):
        raise ValueError("tilting toward a knock-OUT barrier drives paths "
                         "into the knockout region (variance blows up, "
                         "silently) — importance sampling here covers "
                         "knock-ins and vanillas only")
    Z = jax.random.normal(key, (n_steps, n), dtype) + th * jnp.sqrt(dt)
    log_inc = (r - q - 0.5 * sigma * sigma) * dt + sigma * jnp.sqrt(dt) * Z
    log_rel = jnp.cumsum(log_inc, axis=0)
    S = S0 * jnp.exp(jnp.concatenate(
        [jnp.zeros((1, n), dtype), log_rel], axis=0))
    w_T = jnp.sqrt(dt) * jnp.sum(Z, axis=0)    # simulated Brownian endpoint
    lr = jnp.exp(-th * w_T + 0.5 * th * th * T)
    pay = intrinsic_value(S[-1], product.K, product.option_type)
    if product.has_barrier:
        from .payoff import barrier_gate

        knocked = barrier_gate(S, product.barrier, product.barrier_type)
        pay = jnp.where(knocked[-1], pay, 0.0)
    y = jnp.exp(-r * T) * pay * lr
    price = jnp.mean(y)
    var_is = jnp.mean(jnp.square(y - price))
    # plain-MC comparison on the same estimand: Var_P[f] estimated from the
    # shifted sample via the L-weighted second moment E_shift[f² L] − price²
    second_p = jnp.mean(jnp.square(jnp.exp(-r * T) * pay) * lr)
    var_plain = jnp.maximum(second_p - price * price, 0.0)
    return ControlVariateResult(
        price=price,
        stderr=jnp.sqrt(var_is / n),
        raw_price=price,
        raw_stderr=jnp.sqrt(var_plain / n),
        beta=th,
        variance_ratio=var_plain / jnp.maximum(var_is, 1e-30),
    )
