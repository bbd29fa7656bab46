"""Autocallable (Phoenix) notes and issuer-callable reverse convertibles.

Structured-note family beyond the reference (vanilla/barrier options only,
`/root/reference/american_monte_carlo.py:85-86,171-176`) — the flagship
production use-case for path-wise Monte Carlo on this machinery: discrete
observation dates, memory coupons, an autocall (or issuer-call) redemption
trigger, and a knock-in put at maturity.

Exact semantics (pinned here; the f64 NumPy twin and the multi-state CN-PDE
oracle below implement the SAME contract through different code paths):

- Observation dates ``t_i = i·T/n_obs`` for ``i = 1..n_obs`` must lie on the
  simulation grid (``sim.n_steps % n_obs == 0``).
- Coupon at date ``t_i`` (paid up to AND INCLUDING the redemption date): paid
  iff ``S(t_i) >= coupon_barrier`` (unconditional when ``None``). With
  ``memory=True`` a paying date also pays every previously missed coupon
  (the path state is the index of the last made-whole coupon).
- Autocall: the note redeems the notional at the FIRST ``t_i`` (including
  maturity) with ``S(t_i) >= autocall_barrier``; a maturity-date trigger
  dominates the knock-in redemption (par is paid even if knocked).
- Knock-in: monitored DISCRETELY on every simulation grid date (not just
  observations), touch counts (``S <= ki_barrier``), exactly like the LSMC
  engines' Q4 gate. If the note reaches maturity uncalled and the knock-in
  has triggered with ``S_T < put_strike``, redemption is the geared
  physical delivery ``notional · S_T / put_strike`` (the investor is short
  a down-and-in put struck at ``put_strike`` with gearing
  ``notional/put_strike``); otherwise the notional.
- Discounting at the flat ``market.r``; dividends enter the GBM drift.

Degenerate-limit gates (tests/test_autocall.py): with coupons off and the
autocall disarmed the note must equal ``df·notional − (notional/put_strike)·
DIP`` where DIP is the European discrete-monitoring down-in put from
`amcx.pde_barrier.pde_discrete_barrier_price` — an oracle-on-oracle
identity. With the autocall barrier at zero the note is
``df(t_1)·(notional + coupon)`` exactly.

The issuer-callable variant replaces the automatic trigger with an OPTIMAL
call: the issuer redeems at notional at the first observation where the
continuation value of its liability exceeds par. `price_callable_note`
solves this by LSMC — backward induction over observation dates with an
UNCLAMPED regression (the note value is not a nonnegative-cashflow
continuation; the Q2 zero floor does not apply) and, for knock-in products,
separate knocked/unknocked weighted fits (the knock flag is part of the
Markov state). The PDE oracle runs the same min-rule on the
(knocked × memory-state) lattice of coupled CN solves.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..basis import design_matrix
from ..paths import simulate_gbm
from ..pde_barrier import _cn_interval, _grid_and_operator
from ..regress import pinv_solve
from ..types import MarketParams, RegressionSpec, SimConfig

__all__ = [
    "AutocallSpec",
    "price_autocall",
    "price_autocall_worst_of",
    "price_autocall_heston",
    "autocall_mc_anchor",
    "worst_of_mc_anchor",
    "autocall_pde",
    "autocall_pde_greeks",
    "autocall_greeks",
    "autocall_ccr_profile",
    "callable_note_pde",
    "price_callable_note",
]


@dataclasses.dataclass(frozen=True)
class AutocallSpec:
    """Autocallable / callable note contract. All levels are ABSOLUTE spot
    levels (quote sheets give % of S0; multiply by S0). ``coupon`` is the
    per-period amount on a ``notional`` of 1."""

    T: float
    n_obs: int
    autocall_barrier: float
    coupon: float = 0.0
    coupon_barrier: Optional[float] = None
    memory: bool = False
    ki_barrier: Optional[float] = None
    put_strike: Optional[float] = None
    notional: float = 1.0
    final_autocall: bool = True

    def __post_init__(self):
        if self.n_obs < 1:
            raise ValueError(f"n_obs must be >= 1, got {self.n_obs}")
        if self.ki_barrier is not None and self.put_strike is None:
            raise ValueError("ki_barrier requires put_strike")


class NoteResult:
    """(price, stderr) pair with the per-path discounted payout kept for
    variance-reduction composition."""

    __slots__ = ("price", "stderr")

    def __init__(self, price, stderr):
        self.price = price
        self.stderr = stderr


def _coupon_flow(S_obs, spec: AutocallSpec, dtype):
    """Per-(obs, path) coupon AMOUNTS under the memory rule, before any
    alive/call gating. ``paid[i] = coupon·(m_i − m_{i−1})`` with
    ``m_i = max_{j<=i, cond_j}(j+1)`` (the made-whole high-watermark)."""
    if spec.coupon == 0.0:
        return jnp.zeros(S_obs.shape, dtype)
    cond = (jnp.ones(S_obs.shape, bool) if spec.coupon_barrier is None
            else S_obs >= spec.coupon_barrier)
    if not spec.memory:
        return jnp.where(cond, spec.coupon, 0.0).astype(dtype)
    idx = jnp.arange(1, spec.n_obs + 1, dtype=dtype)[:, None]
    watermark = lax.associative_scan(jnp.maximum,
                                     jnp.where(cond, idx, 0.0), axis=0)
    prev = jnp.concatenate(
        [jnp.zeros((1,) + S_obs.shape[1:], dtype), watermark[:-1]], 0)
    return spec.coupon * (watermark - prev)


def _note_payout(paths_tm, spec: AutocallSpec, r):
    """Discounted-to-0 payout per path ``(n_paths,)`` given time-major
    paths ``(n_steps+1, n_paths)``. Pure JAX, differentiable except through
    the trigger indicators."""
    n_steps = paths_tm.shape[0] - 1
    if n_steps % spec.n_obs:
        raise ValueError(
            f"n_steps ({n_steps}) must be a multiple of n_obs ({spec.n_obs})")
    stride = n_steps // spec.n_obs
    dtype = paths_tm.dtype
    S_obs = paths_tm[stride::stride]  # (n_obs, n_paths)
    t_obs = (jnp.arange(1, spec.n_obs + 1, dtype=dtype)
             * (spec.T / spec.n_obs))[:, None]
    df_obs = jnp.exp(-r * t_obs)

    trigger = S_obs >= spec.autocall_barrier
    if not spec.final_autocall:
        trigger = trigger.at[-1].set(False)
    called_by = lax.associative_scan(jnp.logical_or, trigger, axis=0)
    # alive at obs i ⇔ not called strictly before i (the calling date itself
    # still pays its coupon)
    alive = jnp.concatenate(
        [jnp.ones((1,) + S_obs.shape[1:], bool), ~called_by[:-1]], 0)

    coupons = jnp.sum(df_obs * _coupon_flow(S_obs, spec, dtype)
                      * alive.astype(dtype), axis=0)

    first_call = alive & trigger  # one-hot along obs axis (or all-False)
    pv_called = jnp.sum(df_obs * first_call.astype(dtype), axis=0) \
        * spec.notional
    ever_called = called_by[-1]

    S_T = paths_tm[-1]
    if spec.ki_barrier is None:
        red = jnp.full(S_T.shape, spec.notional, dtype)
    else:
        knocked = jnp.any(paths_tm <= spec.ki_barrier, axis=0)
        red = jnp.where(knocked,
                        spec.notional * jnp.minimum(1.0, S_T / spec.put_strike),
                        spec.notional)
    pv_mat = jnp.exp(-r * jnp.asarray(spec.T, dtype)) * red
    principal = jnp.where(ever_called, pv_called, pv_mat)
    return coupons + principal


@partial(jax.jit, static_argnames=("spec", "sim"))
def _price_autocall_impl(key, market_tuple, spec, sim):
    S0, r, sigma, q = market_tuple
    market = MarketParams(S0, r, sigma, q)
    paths = simulate_gbm(key, market, spec.T, sim)
    payout = _note_payout(paths, spec, r)
    if sim.antithetic:
        half = sim.n_paths // 2
        stat = 0.5 * (payout[:half] + payout[half:])
    else:
        stat = payout
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(float(stat.shape[0]))
    return price, stderr


def price_autocall(key, market: MarketParams, spec: AutocallSpec,
                   sim: SimConfig) -> NoteResult:
    """Price an autocallable note by simulation (any pathgen backend,
    antithetic pair-folded stderr). Decision-free contract — no regression;
    XLA fuses the whole observation logic into the pathgen epilogue."""
    price, stderr = _price_autocall_impl(key, market.astuple(), spec, sim)
    return NoteResult(price, stderr)


@partial(jax.jit, static_argnames=("spec", "sim"))
def _price_worst_of_impl(key, S0, r, sigma, q, corr, spec, sim):
    from ..paths import simulate_gbm_multi

    paths = simulate_gbm_multi(key, S0, r, sigma, spec.T, sim, q=q,
                               corr=corr)  # (n_steps+1, n_paths, A)
    W = jnp.min(paths / S0, axis=-1)  # worst S0-normalized performance
    payout = _note_payout(W, spec, r)
    if sim.antithetic:
        half = sim.n_paths // 2
        stat = 0.5 * (payout[:half] + payout[half:])
    else:
        stat = payout
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(float(stat.shape[0]))
    return price, stderr


def price_autocall_worst_of(key, S0, r, sigma, corr, spec: AutocallSpec,
                            sim: SimConfig, q=0.0) -> NoteResult:
    """Worst-of autocallable on a correlated basket — the dominant
    production variant: every trigger (autocall, coupon, knock-in) and the
    geared maturity delivery read the WORST S0-normalized performance
    ``W_t = min_i S_t^i / S0^i`` (W_0 = 1), so ``spec`` levels must be
    quoted as PERFORMANCE fractions (e.g. ``autocall_barrier=1.0,
    ki_barrier=0.6, put_strike=1.0``), unlike the absolute-spot
    single-asset route. With identical assets at perfect correlation this
    reduces exactly to `price_autocall` on the normalized spot — the
    degenerate PDE gate in tests/test_autocall.py."""
    dtype = sim.jnp_dtype
    S0 = jnp.atleast_1d(jnp.asarray(S0, dtype))
    corr_m = None if corr is None else jnp.asarray(corr, dtype)
    price, stderr = _price_worst_of_impl(key, S0, r, sigma, q, corr_m,
                                         spec, sim)
    return NoteResult(price, stderr)


@partial(jax.jit, static_argnames=("hp", "spec", "sim"))
def _price_autocall_heston_impl(key, hp, spec, sim):
    from ..dynamics import simulate_heston

    paths = simulate_heston(key, hp, spec.T, sim)
    payout = _note_payout(paths, spec, jnp.asarray(hp.r, paths.dtype))
    if sim.antithetic:
        half = sim.n_paths // 2
        stat = 0.5 * (payout[:half] + payout[half:])
    else:
        stat = payout
    return jnp.mean(stat), jnp.std(stat) / jnp.sqrt(float(stat.shape[0]))


def price_autocall_heston(key, hp, spec: AutocallSpec,
                          sim: SimConfig) -> NoteResult:
    """Autocallable under Heston stochastic volatility — the desk setup
    (the KI put leg is a down-side smile product; flat-vol GBM misprices
    it). The payout epilogue is the SAME `_note_payout` already anchored
    three ways on GBM; the Heston simulator is separately gated against
    its CF oracle (tests/test_dynamics.py). Degenerate gate: ξ=0 with
    v0=θ=σ² freezes the variance at σ² and must reproduce the GBM
    multi-state PDE price (tests/test_autocall.py)."""
    if sim.n_steps % spec.n_obs:
        raise ValueError("sim.n_steps must be a multiple of spec.n_obs")
    price, stderr = _price_autocall_heston_impl(key, hp, spec, sim)
    return NoteResult(price, stderr)


def autocall_greeks(key, market: MarketParams, spec: AutocallSpec,
                    sim: SimConfig, rel_bump: float = 0.02):
    """Common-random-number central-difference delta/gamma/vega of the
    autocallable. The payout is an indicator staircase in S0, so pathwise
    AD is biased (the trigger moves are invisible to the tangent) — CRN FD
    with a NON-infinitesimal bump is the standard estimator; the PDE
    delta/gamma (`autocall_pde_greeks`) is the exact anchor."""
    h = rel_bump * float(market.S0)
    hv = rel_bump * float(market.sigma)

    def p(s0, sig):
        m = MarketParams(s0, market.r, sig, market.q)
        return float(_price_autocall_impl(key, m.astuple(), spec, sim)[0])

    up, mid, dn = (p(float(market.S0) + h, market.sigma), p(float(market.S0),
                   market.sigma), p(float(market.S0) - h, market.sigma))
    delta = (up - dn) / (2 * h)
    gamma = (up - 2 * mid + dn) / (h * h)
    vega = (p(float(market.S0), float(market.sigma) + hv)
            - p(float(market.S0), float(market.sigma) - hv)) / (2 * hv)
    return {"price": mid, "delta": delta, "gamma": gamma, "vega": vega}


# --------------------------------------------------------------------------
# f64 NumPy twin — same contract, independent code path and RNG
# --------------------------------------------------------------------------

def _payout_np(S, spec: AutocallSpec, r):
    """f64 NumPy mirror of `_note_payout` on a time-major monitored series
    ``S`` ``(n_steps+1, n_paths)`` (spot for single-asset notes, worst-of
    performance for `worst_of_mc_anchor`)."""
    n_steps = S.shape[0] - 1
    n_paths = S.shape[1]
    stride = n_steps // spec.n_obs
    S_obs = S[stride::stride]
    t_obs = np.arange(1, spec.n_obs + 1) * (spec.T / spec.n_obs)
    df_obs = np.exp(-r * t_obs)[:, None]

    trig = S_obs >= spec.autocall_barrier
    if not spec.final_autocall:
        trig[-1] = False
    called_by = np.maximum.accumulate(trig, axis=0)
    alive = np.vstack([np.ones((1, n_paths), bool), ~called_by[:-1]])

    if spec.coupon == 0.0:
        coup = np.zeros(n_paths)
    else:
        cond = (np.ones_like(trig) if spec.coupon_barrier is None
                else S_obs >= spec.coupon_barrier)
        if spec.memory:
            idx = np.arange(1, spec.n_obs + 1)[:, None] * np.ones((1, n_paths))
            wm = np.maximum.accumulate(np.where(cond, idx, 0.0), axis=0)
            prev = np.vstack([np.zeros((1, n_paths)), wm[:-1]])
            amt = spec.coupon * (wm - prev)
        else:
            amt = np.where(cond, spec.coupon, 0.0)
        coup = np.sum(df_obs * amt * alive, axis=0)

    first = alive & trig
    pv_called = spec.notional * np.sum(df_obs * first, axis=0)
    if spec.ki_barrier is None:
        red = np.full(n_paths, spec.notional)
    else:
        knocked = np.any(S <= spec.ki_barrier, axis=0)
        red = np.where(knocked,
                       spec.notional * np.minimum(1.0, S[-1] / spec.put_strike),
                       spec.notional)
    principal = np.where(called_by[-1], pv_called,
                         np.exp(-r * spec.T) * red)
    return coup + principal


def autocall_mc_anchor(market: MarketParams, spec: AutocallSpec,
                       n_steps: int, n_paths: int = 1_000_000,
                       seed: int = 17):
    """Exact-discrete f64 anchor ``(price, stderr)`` for `price_autocall`."""
    S0, r, sigma, q = (float(v) for v in market.astuple())
    dt = spec.T / n_steps
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n_steps, n_paths))
    logS = np.log(S0) + np.cumsum(
        (r - q - 0.5 * sigma * sigma) * dt + sigma * np.sqrt(dt) * z, axis=0)
    S = np.exp(np.vstack([np.full((1, n_paths), np.log(S0)), logS]))
    payout = _payout_np(S, spec, r)
    return float(payout.mean()), float(payout.std() / np.sqrt(n_paths))


def worst_of_mc_anchor(S0, r, sigma, corr, spec: AutocallSpec, n_steps: int,
                       q=0.0, n_paths: int = 500_000, seed: int = 23):
    """f64 anchor for `price_autocall_worst_of`: correlated GBM, monitored
    series = worst S0-normalized performance. ``(price, stderr)``."""
    S0 = np.atleast_1d(np.asarray(S0, float))
    A = S0.shape[0]
    sigma = np.broadcast_to(np.asarray(sigma, float), (A,))
    q = np.broadcast_to(np.asarray(q, float), (A,))
    corr_m = np.eye(A) if corr is None else np.asarray(corr, float)
    chol = np.linalg.cholesky(corr_m)
    dt = spec.T / n_steps
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((n_steps, n_paths, A)) @ chol.T
    drift = (float(r) - q - 0.5 * sigma * sigma) * dt
    logret = drift + sigma * np.sqrt(dt) * z
    perf = np.exp(np.cumsum(logret, axis=0))  # S_t / S0 per asset
    W = np.concatenate([np.ones((1, n_paths)), perf.min(axis=-1)], 0)
    payout = _payout_np(W, spec, float(r))
    return float(payout.mean()), float(payout.std() / np.sqrt(n_paths))


# --------------------------------------------------------------------------
# Multi-state CN-PDE oracle (f64): exact by a different METHOD, no MC noise
# --------------------------------------------------------------------------

def _note_pde(market: MarketParams, spec: AutocallSpec, n_steps: int,
              callable_by_issuer: bool, n_x: int, n_sub: int, n_std: float,
              rannacher: int, return_greeks: bool = False,
              snapshot_step: Optional[int] = None):
    """Value lattice ``V[knocked ∈ {0,1}][p ∈ 0..n_obs]``: ``p`` is the
    made-whole coupon high-watermark (collapses to ``{0}`` without memory).
    Knock-in projection every grid date; coupon/trigger transitions at
    observation dates. ``callable_by_issuer`` swaps the automatic trigger
    for the optimal min-rule ``V := min(V, notional)``."""
    S0, r, sigma, q = (float(v) for v in market.astuple())
    if n_steps % spec.n_obs:
        raise ValueError("n_steps must be a multiple of n_obs")
    K_grid = spec.put_strike if spec.put_strike is not None else S0
    xg, S, i0, lo, dg, up = _grid_and_operator(
        S0, K_grid, spec.T, r, sigma, q, n_x, n_std, spec.ki_barrier)
    has_ki = spec.ki_barrier is not None
    hit = (S <= spec.ki_barrier + 1e-12 * spec.ki_barrier) if has_ki \
        else np.zeros_like(S, bool)
    n_p = (spec.n_obs + 1) if (spec.memory and spec.coupon) else 1
    stride = n_steps // spec.n_obs
    dt = spec.T / n_steps

    cond = (np.ones_like(S, bool) if spec.coupon_barrier is None
            else S >= spec.coupon_barrier)
    trig = S >= spec.autocall_barrier

    def coupon_at(i_obs, p):
        """Coupon amount paid at observation i_obs (1-based) on the
        paying set, given watermark p."""
        if not spec.coupon:
            return 0.0
        return spec.coupon * ((i_obs - p) if (spec.memory and n_p > 1) else 1.0)

    # maturity (= observation n_obs)
    red_k = spec.notional * np.minimum(1.0, S / K_grid) if has_ki \
        else np.full_like(S, spec.notional)
    red_u = np.full_like(S, spec.notional)
    if spec.final_autocall and not callable_by_issuer:
        red_k = np.where(trig, spec.notional, red_k)
    V = np.empty((2, n_p, S.shape[0]))
    for p in range(n_p):
        c = np.where(cond, coupon_at(spec.n_obs, p), 0.0)
        V[1, p] = red_k + c
        V[0, p] = np.where(hit, V[1, p], red_u + c)

    for step in range(n_steps - 1, -1, -1):
        flat = [V[k, p] for k in range(2) for p in range(n_p)]
        flat = _cn_interval(flat, lo, dg, up, dt, n_sub, rannacher)
        for k in range(2):
            for p in range(n_p):
                V[k, p] = flat[k * n_p + p]
        i_obs = step // stride if step % stride == 0 else None
        if i_obs is not None and i_obs >= 1:
            # observation date: coupon + trigger transitions (state p is
            # the watermark BEFORE this date, so a paying date jumps to
            # watermark i_obs)
            newV = np.empty_like(V)
            for k in range(2):
                for p in range(n_p):
                    pay_state = V[k, min(i_obs, n_p - 1)] if n_p > 1 else V[k, p]
                    cont = np.where(cond,
                                    pay_state + coupon_at(i_obs, p),
                                    V[k, p])
                    if callable_by_issuer:
                        # issuer calls AFTER the coupon decision at t_i
                        called = spec.notional + np.where(
                            cond, coupon_at(i_obs, p), 0.0)
                        newV[k, p] = np.minimum(cont, called)
                    else:
                        called = spec.notional + np.where(
                            cond, coupon_at(i_obs, p), 0.0)
                        newV[k, p] = np.where(trig, called, cont)
            V = newV
        # knock-in projection on EVERY grid date (incl. observation dates,
        # after their transition — matching the path-wise full-grid min)
        if has_ki:
            for p in range(n_p):
                V[0, p] = np.where(hit, V[1, p], V[0, p])
        if snapshot_step is not None and step == snapshot_step:
            # V now holds the LIVE-note value at t_step as a function of
            # (knocked, watermark, x) — the pointwise anchor for the
            # AMC-regression exposure surface (`autocall_ccr_profile`)
            return np.log(S), V.copy()
    k0 = 1 if (has_ki and S0 <= spec.ki_barrier) else 0
    if return_greeks:
        v = V[k0, 0]
        h = xg[i0 + 1] - xg[i0]
        vx = (v[i0 + 1] - v[i0 - 1]) / (2 * h)
        vxx = (v[i0 + 1] - 2 * v[i0] + v[i0 - 1]) / (h * h)
        return (float(v[i0]), float(vx / S0),
                float((vxx - vx) / (S0 * S0)))
    return float(V[k0, 0, i0])


def autocall_pde(market: MarketParams, spec: AutocallSpec, n_steps: int,
                 n_x: int = 2001, n_sub: int = 8, n_std: float = 7.5,
                 rannacher: int = 2) -> float:
    """f64 multi-state CN-PDE price of the autocallable note under the
    exact discrete contract above (knock-in monitored on all ``n_steps``
    grid dates)."""
    return _note_pde(market, spec, n_steps, False, n_x, n_sub, n_std,
                     rannacher)


def autocall_pde_greeks(market: MarketParams, spec: AutocallSpec,
                        n_steps: int, n_x: int = 2001, n_sub: int = 8,
                        n_std: float = 7.5, rannacher: int = 2):
    """Exact ``(price, delta, gamma)`` from the PDE grid (central
    differences in log-spot at the on-node S0) — the anchor for the CRN
    finite-difference `autocall_greeks`."""
    return _note_pde(market, spec, n_steps, False, n_x, n_sub, n_std,
                     rannacher, return_greeks=True)


def callable_note_pde(market: MarketParams, spec: AutocallSpec, n_steps: int,
                      n_x: int = 2001, n_sub: int = 8, n_std: float = 7.5,
                      rannacher: int = 2) -> float:
    """f64 PDE value of the ISSUER-callable note (optimal min-rule at each
    observation date) — the oracle for `price_callable_note`."""
    return _note_pde(market, spec, n_steps, True, n_x, n_sub, n_std,
                     rannacher)


# --------------------------------------------------------------------------
# AMC exposures: regression-based counterparty-value surface for the note
# --------------------------------------------------------------------------

def _fit_unclamped_nd(X, y, spec: RegressionSpec, weights):
    """Weighted UNCLAMPED least squares on a feature matrix ``X`` of shape
    ``(n, F)`` through the total-degree cross basis — per-feature
    standardization under the same weights. Returns fitted values."""
    from ..basis import multi_asset_design_matrix

    wsum = jnp.maximum(jnp.sum(weights), 1.0)
    mu = jnp.sum(weights[:, None] * X, 0) / wsum
    sd = jnp.sqrt(jnp.sum(weights[:, None] * jnp.square(X - mu), 0) / wsum)
    Xh = (X - mu) / jnp.maximum(sd, 1e-6)
    A = multi_asset_design_matrix(Xh, spec.basis, spec.degree, "total")
    w = weights[:, None]
    coef = pinv_solve((A * w).T @ A, (A * w).T @ y)
    return A @ coef


@partial(jax.jit, static_argnames=("spec", "sim", "reg"))
def _autocall_ccr_impl(key, market_tuple, spec, sim, reg):
    S0, r, sigma, q = market_tuple
    market = MarketParams(S0, r, sigma, q)
    paths = simulate_gbm(key, market, spec.T, sim)
    n_steps = sim.n_steps
    stride = n_steps // spec.n_obs
    dtype = paths.dtype
    dt = spec.T / n_steps
    S_obs = paths[stride::stride]
    t_obs = (jnp.arange(1, spec.n_obs + 1, dtype=dtype)
             * (spec.T / spec.n_obs))[:, None]
    df_obs = jnp.exp(-r * t_obs)

    trigger = S_obs >= spec.autocall_barrier
    if not spec.final_autocall:
        trigger = trigger.at[-1].set(False)
    called_by = lax.associative_scan(jnp.logical_or, trigger, axis=0)
    alive_obs = jnp.concatenate(
        [jnp.ones((1,) + S_obs.shape[1:], bool), ~called_by[:-1]], 0)
    first_call = alive_obs & trigger
    ever_called = called_by[-1]

    # time-0-discounted cashflow per observation date
    cf0 = df_obs * (_coupon_flow(S_obs, spec, dtype) * alive_obs
                    + spec.notional * first_call.astype(dtype))
    if spec.ki_barrier is None:
        red = jnp.full(paths.shape[1:], spec.notional, dtype)
    else:
        knocked_T = jnp.any(paths <= spec.ki_barrier, axis=0)
        red = jnp.where(knocked_T,
                        spec.notional * jnp.minimum(
                            1.0, paths[-1] / spec.put_strike),
                        spec.notional)
    cf0 = cf0.at[-1].add(jnp.where(ever_called, 0.0, df_obs[-1] * red))

    # future (strictly-after-t_k) cashflows per grid step, in t_k units
    suffix_after = jnp.cumsum(cf0[::-1], 0)[::-1]  # Σ_{j>=i}
    suffix_after = jnp.concatenate(
        [suffix_after, jnp.zeros((1,) + cf0.shape[1:], dtype)], 0)
    m = jnp.arange(n_steps + 1) // stride  # observations elapsed by step k
    future0 = suffix_after[m]
    t_grid = jnp.arange(n_steps + 1, dtype=dtype) * dt
    Y = jnp.exp(r * t_grid)[:, None] * future0

    # alive: the note has not redeemed at any observation <= t_k
    tau_obs = jnp.argmax(first_call, axis=0)  # 0 when never called
    tau_step = jnp.where(ever_called, stride * (tau_obs + 1), n_steps)
    alive = jnp.arange(n_steps + 1)[:, None] < tau_step[None, :]

    has_ki = spec.ki_barrier is not None
    knocked = (lax.associative_scan(jnp.logical_or,
                                    paths <= spec.ki_barrier, axis=0)
               if has_ki else jnp.zeros(paths.shape, bool))
    use_memory = bool(spec.memory and spec.coupon)
    if use_memory:
        cond = (jnp.ones(S_obs.shape, bool) if spec.coupon_barrier is None
                else S_obs >= spec.coupon_barrier)
        idx = jnp.arange(1, spec.n_obs + 1, dtype=dtype)[:, None]
        wm_obs = lax.associative_scan(jnp.maximum,
                                      jnp.where(cond, idx, 0.0), axis=0)
        wm_obs = jnp.concatenate(
            [jnp.zeros((1,) + S_obs.shape[1:], dtype), wm_obs], 0)
        unpaid = m.astype(dtype)[:, None] - wm_obs[m]  # coupons in arrears
    else:
        unpaid = jnp.zeros(Y.shape, dtype)

    def fit_step(_, xs):
        S_k, kn_k, al_k, Y_k, u_k = xs
        w_alive = al_k.astype(dtype)
        feats = (jnp.stack([S_k, u_k], -1) if use_memory
                 else S_k[:, None])
        if has_ki:
            w_k = w_alive * kn_k.astype(dtype)
            fit = jnp.where(kn_k,
                            _fit_unclamped_nd(feats, Y_k, reg, w_k),
                            _fit_unclamped_nd(feats, Y_k, reg,
                                              w_alive * (1.0 - kn_k)))
        else:
            fit = _fit_unclamped_nd(feats, Y_k, reg, w_alive)
        return None, jnp.where(al_k, fit, 0.0)

    _, surface = lax.scan(
        fit_step, None,
        (paths, knocked, alive, Y, unpaid))
    return surface


def autocall_ccr_profile(key, market: MarketParams, spec: AutocallSpec,
                         sim: SimConfig,
                         reg: RegressionSpec | None = None):
    """Counterparty exposure profile of a live autocallable by AMC
    regression — the 'American Monte Carlo' XVA workhorse: at every grid
    date the note's MtM per path is the UNCLAMPED conditional expectation
    of its strictly-future cashflows (discounted to that date), fitted on
    the Markov state — spot, knock flag (separate weighted fits), and the
    coupons-in-arrears count for memory notes (cross-basis feature).
    Redeemed paths carry zero exposure (trade settled). Returns
    ``(CCRExposures, surface_tm)``; the pointwise anchor is the PDE value
    lattice via ``_note_pde(snapshot_step=k)`` (tests/test_autocall.py)."""
    from ..exposures import compute_ccr_exposures

    if sim.n_steps % spec.n_obs:
        raise ValueError("sim.n_steps must be a multiple of spec.n_obs")
    reg = reg or RegressionSpec(degree=4)
    surface = _autocall_ccr_impl(key, market.astuple(), spec, sim, reg)
    return compute_ccr_exposures(surface), surface


# --------------------------------------------------------------------------
# Issuer-callable note by LSMC (min-rule, unclamped continuation fits)
# --------------------------------------------------------------------------

def _fit_unclamped(x, y, spec: RegressionSpec, weights):
    """Weighted polynomial fit WITHOUT the Q2 zero floor (note values are
    signed relative to par; flooring would disable every should-call
    decision — the estimator trap documented in CLAUDE.md round-3)."""
    mu = jnp.sum(weights * x) / jnp.maximum(jnp.sum(weights), 1.0)
    sd = jnp.sqrt(jnp.sum(weights * jnp.square(x - mu))
                  / jnp.maximum(jnp.sum(weights), 1.0))
    xh = (x - mu) / jnp.maximum(sd, 1e-6)
    A = design_matrix(xh, spec.basis, spec.degree)
    w = weights[:, None]
    G = (A * w).T @ A
    b = (A * w).T @ y
    coef = pinv_solve(G, b)
    return A @ coef


@partial(jax.jit, static_argnames=("spec", "sim", "reg"))
def _price_callable_impl(key, market_tuple, spec, sim, reg):
    S0, r, sigma, q = market_tuple
    market = MarketParams(S0, r, sigma, q)
    paths = simulate_gbm(key, market, spec.T, sim)
    n_steps = sim.n_steps
    stride = n_steps // spec.n_obs
    dtype = paths.dtype
    dt_obs = spec.T / spec.n_obs
    df = jnp.exp(jnp.asarray(-r * dt_obs, dtype))
    S_obs = paths[stride::stride]
    has_ki = spec.ki_barrier is not None
    if has_ki:
        # knocked state at each observation (full-grid discrete monitoring)
        hit_all = lax.associative_scan(
            jnp.logical_or, paths <= spec.ki_barrier, axis=0)
        knocked_obs = hit_all[stride::stride]
    else:
        knocked_obs = jnp.zeros(S_obs.shape, bool)

    cond = (jnp.ones(S_obs.shape, bool) if spec.coupon_barrier is None
            else S_obs >= spec.coupon_barrier)
    c_amt = jnp.where(cond, spec.coupon, 0.0).astype(dtype) \
        if spec.coupon else jnp.zeros(S_obs.shape, dtype)

    # maturity value (observation n_obs)
    S_T, kn_T = S_obs[-1], knocked_obs[-1]
    K_grid = spec.put_strike if spec.put_strike is not None else S0
    red = jnp.where(kn_T, spec.notional * jnp.minimum(1.0, S_T / K_grid),
                    spec.notional) if has_ki \
        else jnp.full(S_T.shape, spec.notional, dtype)
    V = red + c_amt[-1]

    def step(V, xs):
        S_t, kn_t, c_t = xs
        V = df * V
        if has_ki:
            w_k = kn_t.astype(dtype)
            cont = jnp.where(
                kn_t,
                _fit_unclamped(S_t, V, reg, w_k),
                _fit_unclamped(S_t, V, reg, 1.0 - w_k))
        else:
            cont = _fit_unclamped(S_t, V, reg, jnp.ones(S_t.shape, dtype))
        # issuer calls (pays par) when continuing is dearer; the decision
        # uses the FITTED continuation, the carried value stays path-wise
        # (standard LSMC low-bias construction, holder side mirrored)
        V = jnp.where(cont > spec.notional, spec.notional, V) + c_t
        return V, None

    V, _ = lax.scan(step, V,
                    (S_obs[:-1], knocked_obs[:-1], c_amt[:-1]),
                    reverse=True)
    V = df * V  # discount the first observation period back to t=0
    if sim.antithetic:
        half = sim.n_paths // 2
        stat = 0.5 * (V[:half] + V[half:])
    else:
        stat = V
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(float(stat.shape[0]))
    return price, stderr


def price_callable_note(key, market: MarketParams, spec: AutocallSpec,
                        sim: SimConfig,
                        reg: RegressionSpec | None = None) -> NoteResult:
    """LSMC price of the issuer-callable note (``autocall_barrier`` is
    ignored — the trigger is the issuer's optimal policy). Memory coupons
    are not supported on this route (the watermark would enter the
    regression state); the PDE oracle covers them."""
    if spec.memory and spec.coupon:
        raise ValueError("memory coupons are not supported for the "
                         "issuer-callable LSMC route (use callable_note_pde)")
    if sim.n_steps % spec.n_obs:
        raise ValueError("sim.n_steps must be a multiple of spec.n_obs")
    reg = reg or RegressionSpec(degree=4)
    price, stderr = _price_callable_impl(key, market.astuple(), spec, sim,
                                         reg)
    return NoteResult(price, stderr)
