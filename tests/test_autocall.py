"""Autocallable / issuer-callable note gates.

Three independent anchors for one pinned contract (module docstring of
`amcx/models/autocall.py`): a hand-computed tiny-path unit test, the f64
NumPy MC twin (different code path + RNG), and the multi-state CN-PDE
oracle (different method, no MC noise) — plus two exact degenerate-limit
identities (down-in-put decomposition, always-calls-first-date annuity).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amcx import MarketParams, RegressionSpec, SimConfig
from amcx.models.autocall import (AutocallSpec, autocall_mc_anchor,
                                  autocall_pde, callable_note_pde,
                                  price_autocall, price_callable_note)
from amcx.models.autocall import _note_payout
from amcx.pde_barrier import pde_discrete_barrier_price

M = MarketParams(100.0, 0.05, 0.2)

PHOENIX = AutocallSpec(T=2.0, n_obs=8, autocall_barrier=100.0, coupon=0.02,
                       coupon_barrier=70.0, memory=True, ki_barrier=60.0,
                       put_strike=100.0)


def test_payout_hand_computed():
    # 3 observations (steps 1,2,3), 4 hand-built paths; r=0 so no
    # discounting arithmetic obscures the contract logic.
    spec = AutocallSpec(T=3.0, n_obs=3, autocall_barrier=110.0, coupon=0.1,
                        coupon_barrier=90.0, memory=True, ki_barrier=70.0,
                        put_strike=100.0)
    #  p0: calls at obs2 (S=115): coupon obs1 (95>=90) + coupon obs2,
    #      principal 1 at obs2
    #  p1: never calls, coupon misses obs1 (80<90), pays obs2 with memory
    #      catch-up (2 coupons), misses obs3; KI touched at t3 (65<=70),
    #      S_T=65 < 100 -> geared redemption 0.65
    #  p2: never calls, never pays coupons, KI never touched -> par
    #  p3: calls at obs1 (S=120): 1 coupon + par at obs1
    paths = jnp.array([
        [100.0, 100.0, 100.0, 100.0],   # t0
        [95.0, 80.0, 75.0, 120.0],      # t1 = obs1
        [115.0, 95.0, 75.0, 130.0],     # t2 = obs2
        [105.0, 65.0, 75.0, 140.0],     # t3 = obs3 = T
    ])
    got = np.asarray(_note_payout(paths, spec, 0.0))
    want = np.array([
        0.1 + 0.1 + 1.0,        # p0
        0.2 + 0.65,             # p1: catch-up at obs2; KI at t3, S_T=65
        1.0,                    # p2
        0.1 + 1.0,              # p3
    ])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_autocall_down_in_put_decomposition():
    # coupons off + autocall disarmed == long zero-coupon par + short geared
    # discrete down-in put; the put leg from the independent CN-PDE oracle.
    spec = AutocallSpec(T=1.0, n_obs=4, autocall_barrier=1e9,
                        ki_barrier=80.0, put_strike=100.0,
                        final_autocall=False)
    sim = SimConfig(n_paths=400_000, n_steps=100, antithetic=True)
    res = price_autocall(jax.random.key(3), M, spec, sim)
    dip = pde_discrete_barrier_price(100.0, 100.0, 1.0, 0.05, 0.2, 100,
                                     option_type="put", exercise="european",
                                     barrier=80.0, barrier_type="down-in")
    want = np.exp(-0.05) * 1.0 - dip / 100.0
    assert abs(float(res.price) - want) < 4.0 * float(res.stderr) + 2e-4, (
        float(res.price), want, float(res.stderr))


def test_autocall_always_calls_first_obs():
    spec = AutocallSpec(T=1.0, n_obs=4, autocall_barrier=1e-6, coupon=0.02)
    sim = SimConfig(n_paths=8_192, n_steps=16)
    res = price_autocall(jax.random.key(0), M, spec, sim)
    want = np.exp(-0.05 * 0.25) * 1.02
    assert abs(float(res.price) - want) < 1e-5
    assert float(res.stderr) < 1e-7  # deterministic payout


def test_phoenix_vs_f64_twin():
    sim = SimConfig(n_paths=262_144, n_steps=96, antithetic=True)
    res = price_autocall(jax.random.key(7), M, PHOENIX, sim)
    ref, se = autocall_mc_anchor(M, PHOENIX, n_steps=96, n_paths=200_000,
                                 seed=5)
    tol = 4.0 * np.hypot(float(res.stderr), se) + 3e-4
    assert abs(float(res.price) - ref) < tol, (float(res.price), ref, tol)


def test_phoenix_vs_pde():
    sim = SimConfig(n_paths=262_144, n_steps=96, antithetic=True)
    res = price_autocall(jax.random.key(9), M, PHOENIX, sim)
    pde = autocall_pde(M, PHOENIX, n_steps=96)
    assert abs(float(res.price) - pde) < 4.0 * float(res.stderr) + 3e-4, (
        float(res.price), pde, float(res.stderr))


def test_pde_matches_dip_identity_and_annuity():
    # the PDE oracle itself passes both degenerate identities
    spec = AutocallSpec(T=1.0, n_obs=4, autocall_barrier=1e9,
                        ki_barrier=80.0, put_strike=100.0,
                        final_autocall=False)
    dip = pde_discrete_barrier_price(100.0, 100.0, 1.0, 0.05, 0.2, 100,
                                     option_type="put", exercise="european",
                                     barrier=80.0, barrier_type="down-in")
    want = np.exp(-0.05) - dip / 100.0
    got = autocall_pde(M, spec, n_steps=100)
    assert abs(got - want) < 3e-4, (got, want)

    spec2 = AutocallSpec(T=1.0, n_obs=4, autocall_barrier=1e-6, coupon=0.02)
    got2 = autocall_pde(M, spec2, n_steps=16)
    assert abs(got2 - np.exp(-0.05 * 0.25) * 1.02) < 1e-6


def test_callable_never_optimal_without_coupon():
    # no coupon, r>0: continuing always cheaper than paying par now, so the
    # optimal issuer call never happens and callable == autocall-disarmed
    spec = AutocallSpec(T=1.0, n_obs=4, autocall_barrier=1e9,
                        ki_barrier=80.0, put_strike=100.0,
                        final_autocall=False)
    v_call = callable_note_pde(M, spec, n_steps=100)
    v_auto = autocall_pde(M, spec, n_steps=100)
    np.testing.assert_allclose(v_call, v_auto, rtol=0, atol=1e-10)


def test_callable_lsmc_vs_pde():
    # fat coupon makes calling genuinely optimal in the bulk of the state
    # space; LSMC (unclamped fits, knocked/unknocked split) must land on the
    # min-rule PDE. The callable value must sit strictly below the
    # never-call value (the call right has positive value to the issuer).
    spec = AutocallSpec(T=1.0, n_obs=4, autocall_barrier=1e9, coupon=0.08,
                        ki_barrier=80.0, put_strike=100.0,
                        final_autocall=False)
    pde = callable_note_pde(M, spec, n_steps=100)
    nocall = autocall_pde(M, spec, n_steps=100)
    assert pde < nocall - 1e-3
    sim = SimConfig(n_paths=131_072, n_steps=100, antithetic=True)
    res = price_callable_note(jax.random.key(2), M, spec, sim,
                              RegressionSpec(degree=4))
    # suboptimal-policy bias is upward for a min rule; allow a small
    # one-sided slack on top of MC noise
    err = float(res.price) - pde
    assert -4.0 * float(res.stderr) - 1e-3 < err < 4.0 * float(res.stderr) + 5e-3, (
        float(res.price), pde, float(res.stderr))


def test_validation_errors():
    with pytest.raises(ValueError):
        AutocallSpec(T=1.0, n_obs=0, autocall_barrier=100.0)
    with pytest.raises(ValueError):
        AutocallSpec(T=1.0, n_obs=4, autocall_barrier=100.0, ki_barrier=80.0)
    spec = AutocallSpec(T=1.0, n_obs=4, autocall_barrier=100.0, coupon=0.02,
                        memory=True)
    with pytest.raises(ValueError):
        price_callable_note(jax.random.key(0), M, spec,
                            SimConfig(n_paths=64, n_steps=8))
    with pytest.raises(ValueError):
        price_autocall(jax.random.key(0), M,
                       AutocallSpec(T=1.0, n_obs=3, autocall_barrier=100.0),
                       SimConfig(n_paths=64, n_steps=8))


PHOENIX_FRAC = AutocallSpec(T=2.0, n_obs=8, autocall_barrier=1.0,
                            coupon=0.02, coupon_barrier=0.70, memory=True,
                            ki_barrier=0.60, put_strike=1.0)


def test_worst_of_corr1_reduces_to_single_asset_pde():
    # identical assets at perfect correlation: the worst performance IS the
    # (normalized) single asset -> the 1-D multi-state PDE is exact
    from amcx.models.autocall import price_autocall_worst_of
    corr = np.full((3, 3), 1.0 - 1e-7) + 1e-7 * np.eye(3)
    sim = SimConfig(n_paths=262_144, n_steps=96, antithetic=True)
    res = price_autocall_worst_of(jax.random.key(4), [100.0, 100.0, 100.0],
                                  0.05, 0.2, corr, PHOENIX_FRAC, sim)
    pde = autocall_pde(MarketParams(1.0, 0.05, 0.2), PHOENIX_FRAC, 96)
    assert abs(float(res.price) - pde) < 4.0 * float(res.stderr) + 3e-4, (
        float(res.price), pde, float(res.stderr))


def test_worst_of_vs_f64_twin():
    from amcx.models.autocall import price_autocall_worst_of, worst_of_mc_anchor
    corr = np.array([[1.0, 0.5, 0.5], [0.5, 1.0, 0.5], [0.5, 0.5, 1.0]])
    sig = [0.2, 0.25, 0.3]
    sim = SimConfig(n_paths=262_144, n_steps=96, antithetic=True)
    res = price_autocall_worst_of(jax.random.key(6), [90.0, 100.0, 110.0],
                                  0.05, sig, corr, PHOENIX_FRAC, sim, q=0.02)
    ref, se = worst_of_mc_anchor([90.0, 100.0, 110.0], 0.05, sig, corr,
                                 PHOENIX_FRAC, 96, q=0.02, n_paths=300_000)
    tol = 4.0 * np.hypot(float(res.stderr), se) + 3e-4
    assert abs(float(res.price) - ref) < tol, (float(res.price), ref, tol)


def test_worst_of_cheaper_than_single():
    # the worst-of note is dominated path-wise by its single-asset twin
    # (worse coupons, later autocall, likelier knock-in)
    from amcx.models.autocall import price_autocall_worst_of
    corr = np.array([[1.0, 0.3], [0.3, 1.0]])
    sim = SimConfig(n_paths=131_072, n_steps=96, antithetic=True)
    wo = price_autocall_worst_of(jax.random.key(8), [100.0, 100.0], 0.05,
                                 0.2, corr, PHOENIX_FRAC, sim)
    single = autocall_pde(MarketParams(1.0, 0.05, 0.2), PHOENIX_FRAC, 96)
    assert float(wo.price) < single - 4.0 * float(wo.stderr)


def test_greeks_vs_pde():
    from amcx.models.autocall import autocall_greeks, autocall_pde_greeks
    sim = SimConfig(n_paths=262_144, n_steps=96, antithetic=True)
    g = autocall_greeks(jax.random.key(10), M, PHOENIX, sim, rel_bump=0.02)
    p, d, gam = autocall_pde_greeks(M, PHOENIX, 96)
    assert abs(g["price"] - p) < 1e-3
    assert abs(g["delta"] - d) < 0.15 * abs(d) + 2e-4, (g["delta"], d)
    # KI-put short leg: positive delta, negative vega
    assert d > 0 and g["vega"] < 0


def test_ccr_profile_epe0_and_shape():
    from amcx.models.autocall import autocall_ccr_profile
    sim = SimConfig(n_paths=65_536, n_steps=96)
    exp_, surf = autocall_ccr_profile(jax.random.key(12), M, PHOENIX, sim)
    res = price_autocall(jax.random.key(12), M, PHOENIX, sim)
    # k=0: degenerate fit == mean of discounted future cashflows == price
    assert abs(float(exp_.epe[0]) - float(res.price)) < 1e-5
    assert surf.shape == (97, 65_536)
    # settled trades carry zero exposure at maturity
    assert float(jnp.max(jnp.abs(surf[-1]))) == 0.0
    # exposure ordering wherever the note is still alive in bulk
    epe = np.asarray(exp_.epe)
    pfe95 = np.asarray(exp_.pfe95)
    assert np.all(pfe95[:-1] >= epe[:-1] - 1e-6)


def test_ccr_surface_pointwise_vs_pde():
    # sharp functional gate: the per-path fitted MtM at a NON-observation
    # grid date must sit on the PDE value lattice V(t_k, x, knocked)
    # (no-memory deck so the (S, knocked) state is complete)
    from amcx.models.autocall import _note_pde, autocall_ccr_profile
    spec = AutocallSpec(T=2.0, n_obs=8, autocall_barrier=100.0, coupon=0.02,
                        coupon_barrier=70.0, memory=False, ki_barrier=60.0,
                        put_strike=100.0)
    sim = SimConfig(n_paths=131_072, n_steps=96)
    key = jax.random.key(14)
    _, surf = autocall_ccr_profile(key, M, spec, sim)
    from amcx.paths import simulate_gbm
    paths = simulate_gbm(key, M, spec.T, sim)
    k = 42  # between obs 3 (step 36) and obs 4 (step 48)
    xg, V = _note_pde(M, spec, 96, False, 2001, 8, 7.5, 2, snapshot_step=k)
    S_k = np.asarray(paths[k])
    kn_k = np.asarray(jnp.any(paths[:k + 1] <= spec.ki_barrier, axis=0))
    v_true = np.where(kn_k,
                      np.interp(np.log(S_k), xg, V[1, 0]),
                      np.interp(np.log(S_k), xg, V[0, 0]))
    fit = np.asarray(surf[k])
    alive = fit != 0.0
    err = (fit - v_true)[alive]
    rms = float(np.sqrt(np.mean(err ** 2)))
    # degree-4 polynomial per knock state vs the exact kinked value fn
    assert rms < 0.004, rms
    assert abs(float(np.mean(err))) < 0.002, float(np.mean(err))


def test_heston_autocall_degenerate_and_smile():
    from amcx.dynamics import HestonParams
    from amcx.models.autocall import price_autocall_heston

    sim = SimConfig(n_paths=262_144, n_steps=96, antithetic=True)
    # xi=0, v0=theta=sigma^2: variance frozen at sigma^2 -> exact GBM
    hp0 = HestonParams(S0=100.0, r=0.05, q=0.0, v0=0.04, kappa=1.5,
                       theta=0.04, xi=0.0, rho=0.0)
    r0 = price_autocall_heston(jax.random.key(3), hp0, PHOENIX, sim)
    pde = autocall_pde(M, PHOENIX, 96)
    assert abs(float(r0.price) - pde) < 4.0 * float(r0.stderr) + 3e-4, (
        float(r0.price), pde)
    # negative-rho smile: fatter down tail -> dearer KI put leg -> the note
    # must be WORTH LESS than under flat vol at the same total variance
    hp = HestonParams(S0=100.0, r=0.05, q=0.0, v0=0.04, kappa=1.5,
                      theta=0.04, xi=0.6, rho=-0.7)
    r1 = price_autocall_heston(jax.random.key(4), hp, PHOENIX, sim)
    assert float(r1.price) < pde - 4.0 * float(r1.stderr)
