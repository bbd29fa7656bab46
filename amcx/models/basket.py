"""Basket options on correlated multi-asset GBM.

The reference prices single-asset products only
(`/root/reference/american_monte_carlo.py:72-81` — scalar GBM). Baskets are
the standard multi-asset desk product: the payoff reads a weighted average
of the assets, and American exercise regresses the continuation on the full
asset state (the basket level alone is NOT Markov — weights/vols move the
boundary), reusing the total-degree cross-term machinery already built for
the Bermudan max-call (`amcx.models.maxcall`).

Two averaging conventions:

- ``averaging="arith"``: B_t = Σ w_i S_i,t (no closed form; validated by
  the geometric twin, put-call parity, and degenerate limits),
- ``averaging="geo"``:  B_t = Π S_i,t^{w_i} — a product of lognormals is
  lognormal, so the EUROPEAN geometric basket has an exact Black-Scholes
  price (:func:`geometric_basket_price`): the standing oracle for the whole
  module, same role as `amcx.models.asian.geometric_asian_price`.

Engines: ``xla`` (scan engine + `max_call_fit` cross basis) and ``fused``
(the two fused multi-asset Pallas kernels per step with
``payoff_kind="basket"|"geobasket"``; the weight vector is baked static
into the in-register payoff). Both take arbitrary weights.

Degenerate-limit tests (tests/test_basket.py): corr→1 with identical assets
collapses every basket to the single-asset product priced by the scalar
engines; weights (1, 0, ..) collapse to asset 0; geometric European matches
the closed form; arithmetic ≥ geometric (AM-GM, same paths).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..engine import LSMCResult, backward_induction
from ..types import RegressionSpec, SimConfig

__all__ = ["price_basket_option", "geometric_basket_price", "basket_level",
           "basket_greeks", "price_exchange_option", "margrabe_price",
           "price_spread_option", "kirk_price"]


def basket_level(S, weights, averaging: str = "arith"):
    """Weighted basket level along the LAST axis of ``S``; ``geo`` averages
    in log space."""
    w = jnp.asarray(weights, S.dtype)
    if averaging == "arith":
        return jnp.sum(S * w, axis=-1)
    if averaging == "geo":
        return jnp.exp(jnp.sum(jnp.log(S) * w, axis=-1))
    raise ValueError(f"averaging must be 'arith' or 'geo', got {averaging!r}")


def geometric_basket_price(S0, weights, K, T, r, sigma, corr=None, q=0.0,
                           option_type: str = "call") -> float:
    """Exact European price of the GEOMETRIC basket option (host f64).

    ``G_T = Π S_i^{w_i}`` is lognormal: ``ln G_T ~ N(Σ w_i[ln S0_i +
    (r − q_i − σ_i²/2)T], w'Σw·T)`` with ``Σ_ij = σ_i σ_j ρ_ij`` — Black's
    formula on the forward ``F = E[G_T]``. The module's standing oracle
    (cf. the exact geometric-Asian oracle, `amcx.models.asian`).
    """
    S0 = np.atleast_1d(np.asarray(S0, np.float64))
    n = S0.shape[0]
    w = np.broadcast_to(np.asarray(weights, np.float64), (n,))
    sig = np.broadcast_to(np.asarray(sigma, np.float64), (n,))
    qv = np.broadcast_to(np.asarray(q, np.float64), (n,))
    C = np.eye(n) if corr is None else np.asarray(corr, np.float64)
    mu = float(np.sum(w * (np.log(S0) + (r - qv - 0.5 * sig**2) * T)))
    var = float(w @ (np.outer(sig, sig) * C) @ w) * T
    F = np.exp(mu + 0.5 * var)
    sq = max(np.sqrt(var), 1e-12)
    d1 = (np.log(F / K) + 0.5 * var) / sq
    d2 = d1 - sq
    phi = 1.0 if option_type == "call" else -1.0
    from scipy.stats import norm

    return float(np.exp(-r * T) * phi * (F * norm.cdf(phi * d1)
                                         - K * norm.cdf(phi * d2)))


def price_basket_option(
    key: jax.Array,
    S0,
    weights,
    K,
    T,
    r,
    sigma,
    q=0.0,
    corr: Optional[jnp.ndarray] = None,
    option_type: str = "put",
    exercise: str = "american",
    averaging: str = "arith",
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    sim: SimConfig = SimConfig(),
    basis_mode: str = "total",
    return_surface: bool = False,
    engine: str = "xla",
) -> LSMCResult:
    """American/European basket option on correlated GBM assets.

    The regression state is the FULL asset vector (total-degree cross-term
    basis via `amcx.models.maxcall.max_call_fit`); the payoff reads the
    weighted basket level. ``engine="fused"`` runs the two fused
    multi-asset Pallas kernels per step (weights are baked static into the
    in-register payoff; n_paths divisible by 4096).
    """
    from ..paths import simulate_gbm_multi
    from .maxcall import max_call_fit

    if averaging not in ("arith", "geo"):
        raise ValueError(f"averaging must be 'arith' or 'geo', got "
                         f"{averaging!r}")
    S0 = jnp.atleast_1d(jnp.asarray(S0, sim.jnp_dtype))
    n_assets = S0.shape[0]
    w = np.broadcast_to(np.asarray(weights, np.float64), (n_assets,))
    if abs(float(w.sum()) - 1.0) > 1e-6:
        raise ValueError("basket weights must sum to 1")
    phi = 1.0 if option_type == "call" else -1.0
    X = simulate_gbm_multi(key, S0, r, sigma, T, sim, q=q, corr=corr)
    dt = T / sim.n_steps
    if engine in ("fused", "mega"):
        if exercise != "american":
            raise ValueError(f"engine={engine!r} prices American baskets "
                             "only (Europeans need no induction)")
        if return_surface:
            raise ValueError(f"engine={engine!r} emits no continuation "
                             "surface")
        kind = "basket" if averaging == "arith" else "geobasket"
        if engine == "mega":
            from ..ops.lsmc_ma_mega import lsmc_price_ma_mega

            price, stderr = lsmc_price_ma_mega(
                X, K, r, dt, phi=phi, payoff_kind=kind, basis=spec.basis,
                degree=spec.degree,
                mode="total" if basis_mode == "sorted" else basis_mode,
                sorted_basis=basis_mode == "sorted", rcond=spec.rcond,
                itm_weights=spec.regress_on == "itm",
                weights=tuple(float(x) for x in w), exercise_from_step=0,
                antithetic=sim.antithetic)
            return LSMCResult(price, stderr, None, None, None)
        from .maxcall import backward_induction_fused_maxcall

        return backward_induction_fused_maxcall(
            X, K, r, dt, spec, basis_mode=basis_mode, exercise_from_step=0,
            payoff_kind=kind, phi=phi,
            weights=tuple(float(x) for x in w),
        )
    if engine != "xla":
        raise ValueError(
            f"engine must be 'xla', 'fused', or 'mega', got {engine!r}")
    knocked = jnp.ones(X.shape[:-1], dtype=bool)
    w_j = jnp.asarray(w, sim.jnp_dtype)

    def payoff(state):
        return jnp.maximum(
            phi * (basket_level(state, w_j, averaging) - K), 0.0)

    fit_fn = partial(max_call_fit, mode=basis_mode)
    return backward_induction(
        X, knocked, r, dt, payoff, spec,
        american=exercise == "american", return_surface=return_surface,
        fit_fn=fit_fn, fit_fn_returns_coeffs=True,
    )


def basket_greeks(
    key: jax.Array,
    S0,
    weights,
    K,
    T,
    r,
    sigma,
    q=0.0,
    corr: Optional[jnp.ndarray] = None,
    option_type: str = "put",
    exercise: str = "american",
    averaging: str = "arith",
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    sim: SimConfig = SimConfig(),
):
    """Pathwise basket Greeks by ``jax.grad`` through the full pipeline:
    per-asset deltas, per-asset vegas, and rho (fixed-boundary pathwise
    estimator — exercise decisions enter only through boolean masks, the
    same estimator as `amcx.models.maxcall.max_call_greeks`).

    Returns ``(price, {"delta": (n_assets,), "vega": (n_assets,),
    "rho": scalar})``.
    """
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    n_assets = S0.shape[0]
    sig = jnp.broadcast_to(jnp.asarray(sigma, jnp.float32), (n_assets,))

    def price(S0v, sigv, rr):
        res = price_basket_option(
            key, S0v, weights, K, T, rr, sigv, q=q, corr=corr,
            option_type=option_type, exercise=exercise, averaging=averaging,
            spec=spec, sim=sim, engine="xla")
        return res.price

    p, (delta, vega, rho) = jax.value_and_grad(price, argnums=(0, 1, 2))(
        S0, sig, jnp.float32(r))
    return p, {"delta": delta, "vega": vega, "rho": rho}


def margrabe_price(S1, S2, T, sigma1, sigma2, rho=0.0, q1=0.0,
                   q2=0.0) -> float:
    """Exact European exchange-option price (Margrabe 1978, host f64):
    ``E[e^{-rT} max(S1_T − S2_T, 0)]`` is rate-free — Black's formula with
    ``σ² = σ1² + σ2² − 2ρσ1σ2`` on the two dividend-adjusted forwards."""
    from scipy.stats import norm

    sig = np.sqrt(max(sigma1**2 + sigma2**2 - 2.0 * rho * sigma1 * sigma2,
                      1e-16))
    sq = sig * np.sqrt(T)
    f1 = S1 * np.exp(-q1 * T)
    f2 = S2 * np.exp(-q2 * T)
    d1 = (np.log(f1 / f2) + 0.5 * sig * sig * T) / sq
    d2 = d1 - sq
    return float(f1 * norm.cdf(d1) - f2 * norm.cdf(d2))


def price_exchange_option(
    key: jax.Array,
    S1,
    S2,
    T,
    r,
    sigma1,
    sigma2,
    rho: float = 0.0,
    q1: float = 0.0,
    q2: float = 0.0,
    exercise: str = "american",
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
) -> LSMCResult:
    """American/European exchange option ``max(S1 − S2, 0)`` on correlated
    GBM (the Margrabe payoff). The EXACT rate-free European closed form
    (:func:`margrabe_price`) is the standing oracle; with ``q1 = q2 = 0``
    early exercise is never optimal, so the American LSMC price must
    reproduce the closed form within MC tolerance — a sharp two-asset
    policy gate no single-asset test provides. As with no-dividend
    American calls (docs/PARITY.md item 5), low-degree all-paths fits
    exercise spuriously (−0.19 at degree 2 on the test config);
    ``RegressionSpec(degree=4, regress_on="itm")`` is the recommended
    spec (measured −0.009 ± 0.06 vs Margrabe). ``engine="fused"``/
    ``"mega"`` run the Pallas kernel paths with ``payoff_kind="spread"``.

    The K = 0 special case of :func:`price_spread_option`.
    """
    return price_spread_option(
        key, S1, S2, 0.0, T, r, sigma1, sigma2, rho=rho, q1=q1, q2=q2,
        exercise=exercise, spec=spec, sim=sim, engine=engine)


def kirk_price(S1, S2, K, T, r, sigma1, sigma2, rho=0.0, q1=0.0,
               q2=0.0) -> float:
    """Kirk (1995) European spread-call approximation (host f64):
    ``E[e^{-rT} max(S1_T − S2_T − K, 0)]`` ≈ Black's formula on the
    forward F1 against the shifted forward F2 + K e^{rT}·e^{-rT} = F2 + K,
    with the effective vol ``σ² = σ1² − 2ρσ1σ2·w + σ2²w²`` where
    ``w = F2/(F2 + K)``. Exact (= Margrabe) at K = 0; accurate to a few
    bp for K small relative to S2 — used as an approximate oracle with MC
    tolerances that absorb the approximation error."""
    from scipy.stats import norm

    f1 = S1 * np.exp((r - q1) * T)
    f2 = S2 * np.exp((r - q2) * T)
    w = f2 / (f2 + K)
    sig = np.sqrt(max(sigma1**2 - 2.0 * rho * sigma1 * sigma2 * w
                      + sigma2**2 * w * w, 1e-16))
    sq = sig * np.sqrt(T)
    d1 = (np.log(f1 / (f2 + K)) + 0.5 * sig * sig * T) / sq
    d2 = d1 - sq
    return float(np.exp(-r * T) * (f1 * norm.cdf(d1)
                                   - (f2 + K) * norm.cdf(d2)))


def price_spread_option(
    key: jax.Array,
    S1,
    S2,
    K,
    T,
    r,
    sigma1,
    sigma2,
    rho: float = 0.0,
    q1: float = 0.0,
    q2: float = 0.0,
    exercise: str = "american",
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
) -> LSMCResult:
    """American/European two-asset spread option ``max(S1 − S2 − K, 0)``
    on correlated GBM.

    Generalizes the exchange option (K = 0, exact Margrabe oracle) to a
    struck spread; the European oracle is Kirk's approximation
    (:func:`kirk_price`), exact at K = 0 and bp-accurate for moderate K.
    ``engine="fused"``/``"mega"`` run the 2-state Pallas kernels with
    ``payoff_kind="spread"`` (the kernel payoff is φ·(S1 − S2 − K));
    the regression is the total-degree cross-term basis on (S1, S2) in
    every engine. Product family beyond the reference (single-asset only,
    `/root/reference/american_monte_carlo.py:85-86`).
    """
    from ..paths import simulate_gbm_multi
    from .maxcall import max_call_fit

    exercise = exercise.strip().lower()
    if exercise not in ("european", "american"):
        raise ValueError(
            f"exercise must be european|american, got {exercise!r}")
    corr = jnp.asarray([[1.0, rho], [rho, 1.0]], sim.jnp_dtype)
    X = simulate_gbm_multi(
        key, jnp.asarray([S1, S2], sim.jnp_dtype), r,
        jnp.asarray([sigma1, sigma2], sim.jnp_dtype), T, sim,
        q=jnp.asarray([q1, q2], sim.jnp_dtype), corr=corr)
    dt = T / sim.n_steps
    # static payoff-kind select: K = 0 keeps the exchange/floating-Asian
    # kernels' bit-exact compiled payoff (see _payoff_for)
    kind = "spread" if float(K) == 0.0 else "spreadk"
    if engine in ("fused", "mega"):
        if exercise != "american":
            raise ValueError(f"engine={engine!r} prices American only")
        if engine == "mega":
            from ..ops.lsmc_ma_mega import lsmc_price_ma_mega

            price, stderr = lsmc_price_ma_mega(
                X, K, r, dt, phi=1.0, payoff_kind=kind,
                basis=spec.basis, degree=spec.degree, mode="total",
                rcond=spec.rcond, itm_weights=spec.regress_on == "itm",
                exercise_from_step=0, antithetic=sim.antithetic)
            return LSMCResult(price, stderr, None, None, None)
        from .maxcall import backward_induction_fused_maxcall

        return backward_induction_fused_maxcall(
            X, K, r, dt, spec, basis_mode="total", exercise_from_step=0,
            payoff_kind=kind, phi=1.0)
    if engine != "xla":
        raise ValueError(
            f"engine must be 'xla', 'fused', or 'mega', got {engine!r}")
    knocked = jnp.ones(X.shape[:-1], dtype=bool)
    payoff = lambda st: jnp.maximum(st[..., 0] - st[..., 1] - K, 0.0)
    fit_fn = partial(max_call_fit, mode="total")
    return backward_induction(
        X, knocked, r, dt, payoff, spec,
        american=exercise == "american",
        fit_fn=fit_fn, fit_fn_returns_coeffs=True)
