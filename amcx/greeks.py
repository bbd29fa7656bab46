"""Pathwise Greeks via autodiff through the full simulate→regress→exercise
pipeline (BASELINE config 4).

The reference has no Greeks at all; this is new TPU-native capability. The
estimator is the standard *pathwise* LSMC Greek: differentiate the discounted
cashflows along each path while holding the exercise rule fixed. In this
engine that fixed-boundary property holds automatically — the continuation
fit only enters through the boolean exercise mask (`amcx/engine.py`), and
booleans carry no tangents, so ``jax.grad`` of the price *is* the
fixed-exercise pathwise estimator (first-order optimality of the exercise
boundary makes the neglected term second-order for American options).

Notes:

- Greeks require the XLA path backend (the Pallas kernel defines no VJP);
  the wrapper silently swaps backends.
- Barrier products: the knock indicator is a boolean, so pathwise barrier
  Greeks omit the knock-probability sensitivity (standard limitation; use
  bump-and-reprice for barrier delta near the barrier).
- Gamma: the pathwise second derivative of a kinked payoff is zero a.e.;
  :func:`gamma_fd` provides the usual central finite difference of the
  pathwise delta under common random numbers.

Validation: tests compare European pathwise Greeks against the closed-form
Black-Scholes delta/vega/rho (`amcx.oracle.bs_greeks`), per SURVEY §4.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from .engine import lsmc_option_pricing
from .paths import simulate_gbm
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = ["price_and_greeks", "gamma_fd", "fused_price_diff"]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def fused_price_diff(paths_tm, r, K, dt, barrier, n_steps, phi, spec,
                     american, barrier_type):
    """LSMC price from the fused Pallas engine, differentiable w.r.t.
    ``(paths_tm, r, K, dt)`` via a custom VJP.

    The Pallas kernels define no autodiff rules, but the fixed-boundary
    pathwise estimator (the same quantity ``jax.grad`` computes through the
    XLA engine, where the exercise rule enters only via boolean masks)
    needs no differentiation *through* the induction: with the boundary
    fixed, ``price = mean(cf·e^{−r·dt·τ})`` and the cotangent w.r.t. the
    path array is sparse — one nonzero per exercised path, at its exercise
    step, equal to ``disc(τ)·∂payoff/∂S = disc·φ``. So the backward pass is
    a cheap reconstruction from the engine's ``(cf, τ)`` outputs, and
    gradients flow onward through ANY differentiable path generator (GBM,
    Heston, local vol, …) — generalizing the closed-form GBM-only
    :func:`fast_greeks` to arbitrary dynamics at fused-engine speed.

    Barrier products carry the usual pathwise caveat (knock-probability
    sensitivity excluded — the knock indicator is boolean in the autodiff
    estimator too).
    """
    from .engine_pallas import backward_induction_fused

    res = backward_induction_fused(
        paths_tm, r, dt, K, phi, spec, barrier=barrier,
        barrier_type=barrier_type, american=american,
    )
    return res.price


def _fused_price_diff_fwd(paths_tm, r, K, dt, barrier, n_steps, phi, spec,
                          american, barrier_type):
    from .engine_pallas import backward_induction_fused

    res = backward_induction_fused(
        paths_tm, r, dt, K, phi, spec, barrier=barrier,
        barrier_type=barrier_type, american=american,
    )
    return res.price, (r, K, dt, barrier, res.cashflows, res.exercise_times)


def _fused_price_diff_bwd(n_steps, phi, spec, american, barrier_type,
                          resid, g):
    r, K, dt, barrier, cf, tau = resid
    n = cf.shape[0]
    disc = jnp.exp(-r * dt * tau)
    exercised = cf > 0.0
    # ∂price/∂S_{t,i} = (1/n)·disc_i·φ·1[τ_i = t ∧ exercised_i]
    t_idx = jnp.arange(n_steps + 1, dtype=tau.dtype)[:, None]
    sel = (tau[None, :] == t_idx) & exercised[None, :]
    cot_paths = (g / n) * jnp.where(sel, (disc * phi)[None, :], 0.0)
    # direct sensitivities of mean(cf·e^{−r·dt·τ}) to r, K, dt
    cot_r = g * jnp.mean(-dt * tau * cf * disc)
    cot_K = g * jnp.mean(jnp.where(exercised, -phi * disc, 0.0))
    cot_dt = g * jnp.mean(-r * tau * cf * disc)
    # no pathwise knock sensitivity (boolean indicator — documented caveat)
    cot_barrier = None if barrier is None else jnp.zeros_like(barrier)
    return cot_paths.astype(cf.dtype), cot_r, cot_K, cot_dt, cot_barrier


fused_price_diff.defvjp(_fused_price_diff_fwd, _fused_price_diff_bwd)


@partial(jax.jit, static_argnames=("spec", "sim", "option_type", "exercise",
                                   "barrier_type"))
def _fused_ad_price_greeks(key, S0, r, sigma, q, K, T, barrier, spec, sim,
                           option_type, exercise, barrier_type):
    n_steps = sim.n_steps
    phi = 1.0 if option_type == "call" else -1.0

    def price(S0, sigma, r, q, T):
        market = MarketParams(S0, r, sigma, q)
        paths = simulate_gbm(key, market, T, sim)  # differentiable XLA pathgen
        return fused_price_diff(
            paths, r, K, T / n_steps, barrier, n_steps, phi, spec,
            exercise == "american", barrier_type,
        )

    p, grads = jax.value_and_grad(price, argnums=(0, 1, 2, 3, 4))(S0, sigma, r, q, T)
    delta, vega, rho, dq, theta_T = grads
    return p, {"delta": delta, "vega": vega, "rho": rho, "dividend_rho": dq,
               "theta": -theta_T}


def _xla_sim(sim: SimConfig) -> SimConfig:
    return dataclasses.replace(sim, backend="xla") if sim.backend != "xla" else sim


@partial(jax.jit, static_argnames=("spec", "sim", "option_type", "exercise"))
def _price_grads(key, S0, r, sigma, q, K, T, barrier, spec, sim, option_type, exercise):
    def price(S0, sigma, r, q, T):
        market = MarketParams(S0, r, sigma, q)
        paths = simulate_gbm(key, market, T, sim)
        product = ProductSpec(
            K=K, T=T, barrier=barrier, option_type=option_type, exercise=exercise
        )
        return lsmc_option_pricing(paths, product, r, spec, return_surface=False).price

    p, grads = jax.value_and_grad(price, argnums=(0, 1, 2, 3, 4))(S0, sigma, r, q, T)
    delta, vega, rho, dq, theta_T = grads
    # theta = -dP/dT (time decay as calendar time passes)
    return p, {"delta": delta, "vega": vega, "rho": rho, "dividend_rho": dq, "theta": -theta_T}


@partial(jax.jit, static_argnames=("spec", "sim", "option_type", "exercise"))
def _fused_price_greeks(key, S0, r, sigma, q, K, T, spec, sim, option_type, exercise):
    from .engine_pallas import lsmc_option_pricing_fused
    from .paths import simulate_gbm as _sim

    market = MarketParams(S0, r, sigma, q)
    product = ProductSpec(K=K, T=T, option_type=option_type, exercise=exercise)
    paths = _sim(key, market, product.T, sim)
    res = lsmc_option_pricing_fused(paths, product, market.r, spec)
    return res.price, fast_greeks(res, market, product, sim.n_steps)


def price_and_greeks(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """LSMC price plus pathwise delta/vega/rho/dividend-rho/theta.

    ``engine="xla"`` differentiates the whole simulate→regress→exercise
    pipeline with ``jax.grad`` (works for any product, incl. barriers with
    the documented knock-sensitivity caveat). ``engine="fused"`` runs the
    fused Pallas engine (hardware-PRNG path generation on TPU) and derives
    the *same* fixed-boundary pathwise estimator from the (cashflow, τ)
    outputs in closed form (:func:`fast_greeks`) — no autodiff pass, so
    Greeks come at full fused-engine pricing speed. Vanilla GBM products
    only (the closed-form path derivatives assume GBM).
    ``engine="fused-ad"`` prices with the fused Pallas engine under a custom
    VJP (:func:`fused_price_diff`) and autodiffs only the XLA path
    generator — the general-dynamics route: same estimator as "xla", Pallas
    pricing speed, works for barriers and any differentiable simulator.
    ``engine="mega"`` prices with the single-kernel flagship engine
    (``return_cf_tau=True``) and applies the same closed-form estimator to
    its exported (cashflow, τ) planes — Greeks at mega-kernel speed
    (vanilla GBM products only, like "fused").
    """
    from .engine import resolve_regression_spec

    # one resolution for every engine: the fused-ad custom-VJP route and
    # the raw fused path consume the spec below price_option's resolver
    spec = resolve_regression_spec(spec, product, q=market.q)
    if engine == "mega":
        if product.has_barrier:
            raise ValueError(
                "engine='mega' Greeks cover vanilla products; barrier "
                "products need the autodiff estimator (engine='xla')"
            )
        from .engine import price_option

        res = price_option(key, market, product, spec, sim, engine="mega",
                           return_cf_tau=True)
        return res.price, fast_greeks(res, market, product, sim.n_steps)
    if engine == "fused-ad":
        dtype = sim.jnp_dtype
        barrier = (None if product.barrier is None
                   else jnp.asarray(product.barrier, dtype))
        return _fused_ad_price_greeks(
            key,
            jnp.asarray(market.S0, dtype),
            jnp.asarray(market.r, dtype),
            jnp.asarray(market.sigma, dtype),
            jnp.asarray(market.q, dtype),
            jnp.asarray(product.K, dtype),
            jnp.asarray(product.T, dtype),
            barrier,
            spec,
            _xla_sim(sim),
            product.option_type,
            product.exercise,
            product.barrier_type,
        )
    if engine == "fused":
        if product.has_barrier:
            raise ValueError(
                "engine='fused' Greeks cover vanilla products; barrier "
                "products need the autodiff estimator (engine='xla')"
            )
        dtype = sim.jnp_dtype
        return _fused_price_greeks(
            key,
            jnp.asarray(market.S0, dtype),
            jnp.asarray(market.r, dtype),
            jnp.asarray(market.sigma, dtype),
            jnp.asarray(market.q, dtype),
            jnp.asarray(product.K, dtype),
            jnp.asarray(product.T, dtype),
            spec,
            sim,
            product.option_type,
            product.exercise,
        )
    if engine != "xla":
        raise ValueError(
            f"engine must be 'xla', 'fused', 'fused-ad' or 'mega', got {engine!r}"
        )
    sim = _xla_sim(sim)
    dtype = sim.jnp_dtype
    barrier = None if product.barrier is None else jnp.asarray(product.barrier, dtype)
    return _price_grads(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        jnp.asarray(product.K, dtype),
        jnp.asarray(product.T, dtype),
        barrier,
        spec,
        sim,
        product.option_type,
        product.exercise,
    )


def fast_greeks(
    result,
    market: MarketParams,
    product: ProductSpec,
    n_steps: int,
) -> Dict[str, jnp.ndarray]:
    """Pathwise delta/vega/rho from a finished engine run — no autodiff.

    For GBM the path derivative has closed forms:
    ``dS_t/dS0 = S_t/S0``, ``dS_t/dσ = S_t (W_t − σt)``,
    ``dS_t/dr = S_t·t``; and the exercise-time spot is recoverable from the
    undiscounted cashflow (``S_τ = K − cf`` for puts, ``K + cf`` for calls,
    on exercised paths). So the fixed-boundary pathwise estimator — the same
    quantity ``jax.grad`` computes through the pipeline — is a cheap
    reduction over ``(cashflows, exercise_times)``, valid for ANY engine's
    output (including the fused one, ~10× cheaper than re-running under
    autodiff). Works for vanilla products; barrier knock sensitivity is
    excluded exactly as in the autodiff estimator.
    """
    if product.has_barrier:
        raise ValueError("fast_greeks covers vanilla products; use price_and_greeks")
    cf = result.cashflows
    tau = result.exercise_times
    dtype = cf.dtype
    dt = jnp.asarray(product.T, dtype) / n_steps
    r = jnp.asarray(market.r, dtype)
    q = jnp.asarray(market.q, dtype)
    sigma = jnp.asarray(market.sigma, dtype)
    S0 = jnp.asarray(market.S0, dtype)
    phi = 1.0 if product.option_type == "call" else -1.0

    tau_y = tau * dt
    disc = jnp.exp(-r * tau_y)
    exercised = cf > 0
    S_tau = jnp.where(exercised, jnp.asarray(product.K, dtype) + phi * cf, 0.0)
    dpay_dS = jnp.where(exercised, phi, 0.0)  # payoff slope at exercise

    n = cf.shape[0]
    delta = jnp.sum(disc * dpay_dS * S_tau / S0) / n
    # σW_τ = ln(S_τ/S0) − (r−q−σ²/2)τ  ⇒ dS/dσ = S(W − στ)
    log_rel = jnp.where(exercised, jnp.log(jnp.maximum(S_tau, 1e-30) / S0), 0.0)
    drift = r - q - 0.5 * sigma**2
    W = (log_rel - drift * tau_y) / sigma
    dS_dsigma = S_tau * (W - sigma * tau_y)
    vega = jnp.sum(disc * dpay_dS * dS_dsigma) / n
    # rho: payoff sensitivity through the drift + the discount factor
    rho = jnp.sum(disc * (dpay_dS * S_tau * tau_y - tau_y * cf)) / n
    # dividend rho: d ln S_τ / dq = −τ_y
    div_rho = jnp.sum(disc * dpay_dS * S_tau * (-tau_y)) / n
    # theta = −dP/dT with the exercise *step index* fixed (the same
    # convention as autodiff through the pipeline: T enters via dt = T/n and
    # the √dt Brownian scaling): with a = r−q−σ²/2 and L = ln(S_τ/S0),
    # dS_τ/dT = S_τ·(a·τ_y + L)/(2T) and d(disc)/dT = −r·(τ_y/T)·disc.
    T = jnp.asarray(product.T, dtype)
    dP_dT = jnp.sum(
        disc * (dpay_dS * S_tau * (drift * tau_y + log_rel) / (2.0 * T)
                - r * (tau_y / T) * cf)
    ) / n
    return {"delta": delta, "vega": vega, "rho": rho,
            "dividend_rho": div_rho, "theta": -dP_dT}


def gamma_fd(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    rel_bump: float = 1e-2,
) -> jnp.ndarray:
    """Gamma as a central finite difference of the pathwise delta under
    common random numbers (same key both sides)."""
    h = market.S0 * rel_bump
    up = dataclasses.replace(market, S0=market.S0 + h)
    dn = dataclasses.replace(market, S0=market.S0 - h)
    _, g_up = price_and_greeks(key, up, product, spec, sim)
    _, g_dn = price_and_greeks(key, dn, product, spec, sim)
    return (g_up["delta"] - g_dn["delta"]) / (2.0 * h)
