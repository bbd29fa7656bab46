"""Bermudan swaptions under Hull-White 1F (`amcx.rates`).

Gates, in dependency order: exact-simulation martingale identities
(E[e^{-int r}] = P(0,t), discounted bonds are martingales), the
Jamshidian closed form against its own model identities and the f64 CN
PDE, the MC European against Jamshidian, the Bermudan LSMC against the
PDE anchor, and xla/mega engine agreement on shared paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amcx.rates import (HW1FParams, bond_price_hw, jamshidian_swaption_price,
                        pde_bermudan_swaption, price_bermudan_swaption,
                        simulate_hw_rates, swap_schedule, _swap_coeffs)
from amcx.types import RegressionSpec, SimConfig

HW = HW1FParams(r0=0.03, kappa=0.3, sigma_r=0.012)
PAY = swap_schedule(1.0, 4.0, 1)  # annual fixed leg: [2, 3, 4, 5]
SPEC = RegressionSpec(basis="chebyshev", degree=2)


def _swap_value0(hw, K):
    times, coeffs = _swap_coeffs(hw, K, 1.0, PAY, 1.0)
    return float(sum(c * bond_price_hw(hw, 0.0, t)
                     for t, c in zip(times, coeffs)))


def _par_rate(hw):
    ann = sum(bond_price_hw(hw, 0.0, t) for t in PAY)
    return float((bond_price_hw(hw, 0.0, 1.0) - bond_price_hw(hw, 0.0, 5.0))
                 / ann)


def test_discount_and_bond_martingales():
    """E[e^{-int_0^T r}] = P(0,T) and E[e^{-int} P(T, S; x_T)] = P(0,S) —
    the exact-scheme gates (any bias here is a scheme bug, not MC noise)."""
    sim = SimConfig(n_paths=131_072, n_steps=16, antithetic=True)
    x, df = simulate_hw_rates(jax.random.key(0), HW, 1.0, sim)
    D = np.asarray(jnp.prod(df, axis=0), np.float64)
    xT = np.asarray(x[-1], np.float64)
    half = sim.n_paths // 2
    for est, target in [
        (D, bond_price_hw(HW, 0.0, 1.0)),
        (D * bond_price_hw(HW, 1.0, 5.0, xT), bond_price_hw(HW, 0.0, 5.0)),
    ]:
        pairs = 0.5 * (est[:half] + est[half:])
        se = pairs.std() / np.sqrt(half)
        assert abs(pairs.mean() - target) < 4.0 * se + 5e-5, (
            pairs.mean(), target, se)


def test_ou_factor_moments():
    sim = SimConfig(n_paths=131_072, n_steps=8, antithetic=True)
    x, _ = simulate_hw_rates(jax.random.key(1), HW, 2.0, sim)
    k, s = HW.kappa, HW.sigma_r
    var_T = s * s * (1.0 - np.exp(-2 * k * 2.0)) / (2 * k)
    xT = np.asarray(x[-1], np.float64)
    assert abs(xT.mean()) < 4.0 * np.sqrt(var_T / sim.n_paths)
    assert abs(xT.var() / var_T - 1.0) < 0.02


def test_jamshidian_model_identities():
    K = _par_rate(HW)
    payer = jamshidian_swaption_price(HW, K, 1.0, PAY, payer=True)
    recv = jamshidian_swaption_price(HW, K, 1.0, PAY, payer=False)
    # payer - receiver == value of the forward payer swap (exact identity)
    assert abs((payer - recv) - _swap_value0(HW, K)) < 1e-12
    assert payer > 0.0 and recv > 0.0
    # monotone in strike; deep-ITM payer approaches the forward swap value
    K_lo, K_hi = 0.5 * K, 1.5 * K
    assert (jamshidian_swaption_price(HW, K_lo, 1.0, PAY)
            > payer > jamshidian_swaption_price(HW, K_hi, 1.0, PAY))
    deep = jamshidian_swaption_price(HW, 0.2 * K, 1.0, PAY)
    assert abs(deep - _swap_value0(HW, 0.2 * K)) < 1e-4


def test_pde_european_matches_jamshidian():
    """Single exercise date: the CN PDE must land on the closed form —
    the sharp (non-MC) gate on the PDE oracle itself."""
    K = _par_rate(HW)
    exact = jamshidian_swaption_price(HW, K, 1.0, PAY)
    pde = pde_bermudan_swaption(HW, K, PAY, exercise_times=[1.0],
                                n_x=801, n_t=1200)
    assert abs(pde - exact) < 5e-6, (pde, exact)
    exact_r = jamshidian_swaption_price(HW, K, 1.0, PAY, payer=False)
    pde_r = pde_bermudan_swaption(HW, K, PAY, exercise_times=[1.0],
                                  payer=False, n_x=801, n_t=1200)
    assert abs(pde_r - exact_r) < 5e-6


def test_european_mc_matches_jamshidian():
    K = _par_rate(HW)
    exact = jamshidian_swaption_price(HW, K, 1.0, PAY)
    sim = SimConfig(n_paths=131_072, n_steps=16, antithetic=True)
    res = price_bermudan_swaption(jax.random.key(2), HW, K, PAY,
                                  exercise_times=[1.0], spec=SPEC, sim=sim)
    assert abs(float(res.price) - exact) < 4.0 * float(res.stderr) + 1e-5, (
        float(res.price), exact, float(res.stderr))


def test_bermudan_vs_pde_anchor():
    """Full Bermudan (all four reset dates) vs the f64 PDE: LSMC is a
    policy lower bound — it may sit slightly below, never meaningfully
    above; and the Bermudan premium over the best European is real."""
    K = _par_rate(HW)
    pde = pde_bermudan_swaption(HW, K, PAY, n_x=801, n_t=1600)
    sim = SimConfig(n_paths=131_072, n_steps=32, antithetic=True)
    res = price_bermudan_swaption(jax.random.key(3), HW, K, PAY,
                                  spec=SPEC, sim=sim)
    p, se = float(res.price), float(res.stderr)
    assert p < pde + 4.0 * se, (p, pde, se)
    assert p > pde - 0.03 * pde - 4.0 * se, (p, pde, se)
    best_euro = max(jamshidian_swaption_price(HW, K, e, PAY)
                    for e in [1.0, 2.0, 3.0, 4.0])
    assert pde > best_euro
    assert p > best_euro - 4.0 * se


def test_receiver_bermudan_and_premium_ordering():
    K = _par_rate(HW)
    pde_all = pde_bermudan_swaption(HW, K, PAY, payer=False,
                                    n_x=601, n_t=1200)
    pde_two = pde_bermudan_swaption(HW, K, PAY, exercise_times=[1.0, 3.0],
                                    payer=False, n_x=601, n_t=1200)
    pde_one = pde_bermudan_swaption(HW, K, PAY, exercise_times=[1.0],
                                    payer=False, n_x=601, n_t=1200)
    assert pde_all >= pde_two - 1e-9 >= pde_one - 2e-9


def test_engines_agree_xla_vs_mega():
    """Shared paths through the scan engine and the one-kernel ma-mega
    (pathwise discount planes + in-kernel Bermudan schedule)."""
    K = _par_rate(HW)
    sim = SimConfig(n_paths=8192, n_steps=16, antithetic=True)
    kw = dict(exercise_times=[1.0, 2.0], spec=SPEC, sim=sim)
    r_x = price_bermudan_swaption(jax.random.key(5), HW, K,
                                  swap_schedule(1.0, 2.0, 1), **kw)
    r_m = price_bermudan_swaption(jax.random.key(5), HW, K,
                                  swap_schedule(1.0, 2.0, 1),
                                  engine="mega", **kw)
    assert abs(float(r_x.price) - float(r_m.price)) < 3e-4, (
        float(r_x.price), float(r_m.price))


def test_schedule_validation():
    K = _par_rate(HW)
    with pytest.raises(ValueError, match="reset date"):
        price_bermudan_swaption(jax.random.key(0), HW, K, PAY,
                                exercise_times=[1.5])
    with pytest.raises(ValueError, match="grid"):
        price_bermudan_swaption(jax.random.key(0), HW, K, PAY,
                                exercise_times=[1.0, 4.0],
                                sim=SimConfig(n_paths=4096, n_steps=7))


def test_swaption_ccr_surface():
    """Counterparty-value surface semantics: option continuation before
    exercise (nonnegative, near the price at t=0), SIGNED swap MtM after —
    ENE appears only once paths have exercised; bilateral CVA consumes the
    (EPE, ENE) pair."""
    from amcx.exposures import bilateral_cva
    from amcx.rates import swaption_ccr_profile

    K = _par_rate(HW)
    sim = SimConfig(n_paths=32_768, n_steps=32, antithetic=True)
    res = price_bermudan_swaption(jax.random.key(9), HW, K, PAY,
                                  spec=SPEC, sim=sim, return_surface=True)
    S = res.continuation
    assert S.shape == (33, 32_768)
    ccr, ene = swaption_ccr_profile(S)
    epe = np.asarray(ccr.epe)
    ene = np.asarray(ene)
    # t=0: the option is held on every path; no negative exposure, and the
    # surface is the fitted continuation ~ the price
    assert ene[0] == 0.0
    assert abs(epe[0] - float(res.price)) < 0.15 * float(res.price)
    # exercised ATM-payer swaps go negative on some paths by maturity
    assert ene[-1] > 0.0
    assert np.all(np.asarray(ccr.pfe95) >= epe - 1e-7)
    bcva, cva_leg, dva_leg = bilateral_cva(
        jnp.asarray(epe), jnp.asarray(ene), 4.0, HW.r0,
        hazard_cpty=0.02, hazard_own=0.01)
    assert float(cva_leg) > 0.0 and float(dva_leg) > 0.0
    assert np.isfinite(float(bcva))
    # mega path refuses the surface contract loudly
    with pytest.raises(ValueError, match="return_surface"):
        price_bermudan_swaption(jax.random.key(9), HW, K, PAY, spec=SPEC,
                                sim=SimConfig(n_paths=8192, n_steps=32),
                                engine="mega", return_surface=True)


def test_review_fix_regressions():
    """Round-3 code-review fixes: degenerate schedules raise instead of
    hanging/guessing, pay-date order cannot change the closed form, and
    odd antithetic path counts fail loudly."""
    K = _par_rate(HW)
    # expiry on the LAST payment date: no payments remain -> ValueError
    # (previously an infinite bisection-bracket loop)
    with pytest.raises(ValueError, match="no payments"):
        jamshidian_swaption_price(HW, K, 5.0, PAY)
    # single-payment swap cannot infer its accrual period
    with pytest.raises(ValueError, match="first_reset"):
        price_bermudan_swaption(jax.random.key(0), HW, K, [1.25])
    # explicit first_reset makes it well-defined (quarterly accrual)
    p1 = pde_bermudan_swaption(HW, K, [1.25], exercise_times=[1.0],
                               first_reset=1.0, n_x=401, n_t=400)
    e1 = jamshidian_swaption_price(HW, K, 1.0, [1.25], first_reset=1.0)
    assert abs(p1 - e1) < 5e-6
    # pay-date order must not matter
    assert jamshidian_swaption_price(HW, K, 1.0, [4.0, 2.0, 5.0, 3.0]) == (
        jamshidian_swaption_price(HW, K, 1.0, PAY))
    with pytest.raises(ValueError, match="even n_paths"):
        simulate_hw_rates(jax.random.key(0), HW, 1.0,
                          SimConfig(n_paths=1001, n_steps=4,
                                    antithetic=True))


def test_swaption_dual_bracket_contains_pde():
    """(OOS lower, nested AB dual upper) must bracket the f64 CN-PDE anchor
    (VERDICT r3 #3). Small sizes: the gate is bracket validity, not width —
    the production-scale bracket is regenerated on TPU in RESULTS.md."""
    from amcx.rates import (pde_bermudan_swaption, swap_schedule,
                            swaption_dual_bound)

    hw = HW1FParams(r0=0.03, kappa=0.5, sigma_r=0.012)
    pay = swap_schedule(1.0, 3.0, 1)
    sim = SimConfig(n_paths=16_384, n_steps=24, antithetic=True)
    lo, up = swaption_dual_bound(jax.random.key(3), hw, 0.0305, pay, sim=sim,
                                 n_outer=512, n_inner=8)
    pde = pde_bermudan_swaption(hw, 0.0305, pay)
    lo_p, lo_se = float(lo.price), float(lo.stderr)
    up_p, up_se = float(up.upper), float(up.stderr)
    assert lo_p - 4.0 * lo_se <= pde, (lo_p, lo_se, pde)
    assert up_p + 4.0 * up_se >= pde, (up_p, up_se, pde)
    # the degree-2 cross-basis policy is near-optimal: tight bracket
    assert up_p - lo_p < 0.0004 + 4.0 * (lo_se + up_se)  # < ~4 bp + noise
    # policy export present on the lower result
    assert lo.coeffs is not None and len(lo.coeffs) == 3


def test_swaption_dual_european_limit():
    """Single exercise date: the OOS replay reduces to plain discounted-MC
    of the expiry payoff and must match Jamshidian to MC tolerance."""
    from amcx.rates import (jamshidian_swaption_price, swap_schedule,
                            swaption_dual_bound)

    hw = HW1FParams(r0=0.03, kappa=0.5, sigma_r=0.012)
    pay = swap_schedule(1.0, 3.0, 1)
    jam = jamshidian_swaption_price(hw, 0.0305, 1.0, pay)
    sim = SimConfig(n_paths=32_768, n_steps=12, antithetic=True)
    lo, up = swaption_dual_bound(jax.random.key(5), hw, 0.0305, pay,
                                 exercise_times=[1.0], sim=sim,
                                 n_outer=256, n_inner=8)
    assert abs(float(lo.price) - jam) < 4.0 * float(lo.stderr)
    assert float(up.upper) + 4.0 * float(up.stderr) >= jam
