"""On-chip gates for the round-3 third-session products.

Real-TPU-only: (1) Mosaic lowering of the new kernel payoff kinds
(`basket`/`geobasket` use in-kernel log/exp; the constrained swing uses a
scalar forced-exercise predicate per plane) — the CPU interpreter cannot
prove lowering; (2) hardware-PRNG statistics for the lattice/closed-form
anchors. Mirrors tests_tpu/test_lsmc_kernels_tpu.py conventions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (MarketParams, ProductSpec, RegressionSpec, SimConfig,
                  crr_swing_price, price_basket_option, price_swing_option)
from amcx.models.basket import geometric_basket_price

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="real-TPU suite")

CORR = np.array([[1.0, 0.3, 0.3],
                 [0.3, 1.0, 0.3],
                 [0.3, 0.3, 1.0]])
S0 = [100.0, 95.0, 105.0]
W = [1 / 3, 1 / 3, 1 / 3]


def test_fused_basket_onchip():
    """Arithmetic-basket payoff kind lowers and matches the XLA engine at
    scale (shared paths, same regression family)."""
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    kw = dict(corr=CORR, option_type="put", exercise="american",
              averaging="arith", spec=RegressionSpec(basis="chebyshev",
                                                     degree=2), sim=sim)
    res_x = price_basket_option(jax.random.key(5), S0, W, 105.0, 1.0, 0.05,
                                0.25, engine="xla", **kw)
    res_f = price_basket_option(jax.random.key(5), S0, W, 105.0, 1.0, 0.05,
                                0.25, engine="fused", **kw)
    assert abs(float(res_x.price) - float(res_f.price)) < 0.02, (
        float(res_x.price), float(res_f.price))


def test_fused_geobasket_onchip():
    """geobasket (in-kernel log/exp) lowers; the American lower-bounds the
    exact geometric European and sits within LSMC distance of it."""
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    res = price_basket_option(jax.random.key(6), S0, W, 100.0, 1.0, 0.05,
                              0.25, corr=CORR, option_type="put",
                              exercise="american", averaging="geo",
                              spec=RegressionSpec(basis="chebyshev",
                                                  degree=2),
                              sim=sim, engine="fused")
    eu = geometric_basket_price(S0, W, 100.0, 1.0, 0.05, 0.25, corr=CORR,
                                option_type="put")
    assert float(res.price) >= eu - 3.0 * float(res.stderr)
    assert float(res.price) <= eu + 2.0  # sanity ceiling


def test_constrained_swing_mega_onchip():
    """Forward takes + take-or-pay obligations in the one-kernel swing
    engine at 1M×100 vs the exact f64 rights lattice."""
    m = MarketParams(100.0, 0.05, 0.25)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    res = price_swing_option(
        jax.random.key(7), m, prod, 3, RegressionSpec(degree=5),
        SimConfig(n_paths=1_048_576, n_steps=100, backend="pallas",
                  antithetic=True),
        engine="mega", payoff_kind="forward", n_min=2)
    lat = crr_swing_price(100.0, 100.0, 1.0, 0.05, 0.25, 3, n_steps=100,
                          n_sub=20, option_type="put",
                          payoff_kind="forward", n_min=2)
    # Measured policy-bias allowance: the 3-rights/2-obligations forward
    # contract carries a shared −0.021 LSMC policy bias at this config
    # (XLA engine at 1M deg5: 7.8969; mega deg5/6/7: 7.894/7.896/7.890 vs
    # lattice 7.9180 — degree does not close it; same class as the S0=95
    # vanilla bias). Gate the LOW side at bias+noise and the high side at
    # the lattice (in-sample LSMC must not exceed the exact DP value).
    assert lat - 0.035 < float(res.price) < lat + 3.5 * float(res.stderr), (
        float(res.price), lat)


def test_fully_forced_swing_mega_onchip():
    """No-optionality sanity at scale: n_min = n_rights = every date equals
    the closed-form discounted strip. n_steps=11 → 12 rights = the swing
    kernel's full VMEM plane budget (the cap in `lsmc_swing.py`)."""
    m = MarketParams(100.0, 0.05, 0.25)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    n_steps = 11
    n = n_steps + 1
    res = price_swing_option(
        jax.random.key(8), m, prod, n, RegressionSpec(degree=4),
        SimConfig(n_paths=524_288, n_steps=n_steps, antithetic=True),
        engine="mega", payoff_kind="forward", n_min=n)
    t = np.arange(n) * (1.0 / n_steps)
    strip = float(np.sum(100.0 * np.exp(-0.05 * t) - 100.0))
    assert abs(float(res.price) - strip) < 3.5 * float(res.stderr) + 5e-3, (
        float(res.price), strip)


def test_calibrated_local_vol_onchip():
    """quotes → SVI → Dupire → LSMC American on hardware; flat smile
    collapses to the CRR anchor."""
    from amcx.calibrate import dupire_local_vol, fit_svi_surface
    from amcx.dynamics import price_option_local_vol
    from amcx.oracle import crr_price

    mats = np.array([0.5, 1.0])
    strikes = np.tile(np.array([85.0, 95.0, 100.0, 105.0, 115.0]), (2, 1))
    surf = fit_svi_surface(100.0, 0.05, 0.0, mats, strikes,
                           np.full_like(strikes, 0.2))
    lv = dupire_local_vol(surf, 100.0, 0.05, 0.0)
    res = price_option_local_vol(
        jax.random.key(9), 100.0, 0.05, 0.0, lv,
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        RegressionSpec(degree=4),
        SimConfig(n_paths=262_144, n_steps=50, antithetic=True))
    crr = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000,
                          option_type="put", american=True))
    assert abs(float(res.price) - crr) < 3.5 * float(res.stderr) + 0.05, (
        float(res.price), crr)


def test_ma_mega_lowers_and_matches_fused_onchip():
    """The multi-asset mega-kernel (one kernel for the whole (S,X)
    induction) must lower on real Mosaic and match the two-kernel-per-step
    path at scale."""
    from amcx.models.maxcall import backward_induction_fused_maxcall
    from amcx.ops.lsmc_ma_mega import lsmc_price_ma_mega
    from amcx.paths import simulate_gbm_multi

    sim = SimConfig(n_paths=262_144, n_steps=9)
    paths = simulate_gbm_multi(jax.random.key(0),
                               jnp.array([100.0, 100.0]), 0.05, 0.2, 3.0,
                               sim, q=0.1, corr=jnp.eye(2))
    spec = RegressionSpec(basis="chebyshev", degree=2)
    res = backward_induction_fused_maxcall(
        paths, 100.0, 0.05, 3.0 / 9, spec, basis_mode="sorted",
        exercise_from_step=1)
    p, se = lsmc_price_ma_mega(
        paths, 100.0, 0.05, 3.0 / 9, phi=1.0, payoff_kind="maxcall",
        degree=2, sorted_basis=True, exercise_from_step=1)
    assert abs(float(p) - float(res.price)) < 5e-3, (float(p),
                                                     float(res.price))
    # Andersen-Broadie 2-asset bracket ~[13.90, 13.93]
    assert abs(float(p) - 13.90) < 0.15


def test_ma_mega_heston_onchip():
    from amcx.dynamics import HestonParams, price_option_heston

    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.5, theta=0.04,
                      xi=0.5, rho=-0.7)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    r_f = price_option_heston(jax.random.key(1), hp, prod,
                              RegressionSpec(degree=2), sim, engine="fused")
    r_m = price_option_heston(jax.random.key(1), hp, prod,
                              RegressionSpec(degree=2), sim, engine="mega")
    assert abs(float(r_f.price) - float(r_m.price)) < 5e-3, (
        float(r_f.price), float(r_m.price))


def test_heston_qe_onchip():
    """Andersen QE-M on hardware: the coarse-grid European lands on the CF
    oracle (f32 Φ/log/sqrt chain is the lowering risk), and the American
    via the one-kernel ma-mega agrees with the XLA scan on shared paths."""
    import numpy as np

    from amcx.dynamics import (HestonParams, heston_price_cf,
                               price_option_heston, simulate_heston)

    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.0, theta=0.04,
                      xi=1.0, rho=-0.9)
    sim = SimConfig(n_paths=262_144, n_steps=8, antithetic=True)
    S = simulate_heston(jax.random.key(5), hp, 1.0, sim, scheme="qe")
    pay = jnp.maximum(S[-1] - 100.0, 0.0) * np.exp(-hp.r)
    h = sim.n_paths // 2
    pair = 0.5 * (pay[:h] + pay[h:])
    mc = float(jnp.mean(pair))
    se = float(jnp.std(pair)) / np.sqrt(h)
    cf = heston_price_cf(hp, 100.0, 1.0, "call")
    assert abs(mc - cf) < 4 * se + 0.02, (mc, cf, se)

    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    spec = RegressionSpec(degree=2, regress_on="all")
    sim_a = SimConfig(n_paths=262_144, n_steps=20, antithetic=True)
    r_x = price_option_heston(jax.random.key(6), hp, prod, spec, sim_a,
                              scheme="qe")
    r_m = price_option_heston(jax.random.key(6), hp, prod, spec, sim_a,
                              engine="mega", scheme="qe")
    assert abs(float(r_x.price) - float(r_m.price)) < 5e-3, (
        float(r_x.price), float(r_m.price))


def test_deep_engine_onchip():
    """Deep LSMC on hardware: the warm-started Adam scan (optax state in
    the scan carry) compiles and the OOS replay stays a tight lower bound
    vs CRR-2000 at 64k paths."""
    from amcx import crr_price
    from amcx.deep import deep_price_option

    m = MarketParams(100.0, 0.05, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)
    res = deep_price_option(jax.random.key(2), m, prod, sim,
                            out_of_sample=True)
    crr = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000,
                          option_type="put", american=True))
    p, se = float(res.price), float(res.stderr)
    assert p < crr + 3.0 * se, (p, crr)
    assert p > crr - 0.12, (p, crr)


def test_vg_mega_onchip():
    """Variance Gamma through the one-kernel engine on hardware: xla/mega
    agreement on shared paths + the early-exercise premium over the CF
    European oracle."""
    from amcx import VGParams, price_option_vg, vg_price_cf

    vg = VGParams(theta=-0.14, sigma=0.2, nu=0.2)
    m = MarketParams(100.0, 0.05, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    spec = RegressionSpec(degree=4)
    r_x = price_option_vg(jax.random.key(7), m, vg, prod, spec, sim)
    r_m = price_option_vg(jax.random.key(7), m, vg, prod, spec, sim,
                          engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 2.5e-3
    euro = vg_price_cf(100.0, 100.0, 1.0, 0.05, vg, option_type="put")
    assert float(r_m.price) > euro + 0.1


def test_spreadk_mega_onchip():
    """The struck-spread payoff kind (`spreadk`) lowers on hardware and the
    K=0 limit reproduces the exchange product's Margrabe anchor through the
    one-kernel ma-mega engine."""
    from amcx import kirk_price, price_spread_option

    spec = RegressionSpec(degree=4, regress_on="itm")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    res = price_spread_option(
        jax.random.key(9), 100.0, 95.0, 5.0, 1.0, 0.05, 0.25, 0.2, rho=0.3,
        exercise="american", spec=spec, sim=sim, engine="mega")
    kirk = kirk_price(100.0, 95.0, 5.0, 1.0, 0.05, 0.25, 0.2, rho=0.3)
    # q=0: American == European up to policy bias; Kirk absorbs ~bp approx
    assert abs(float(res.price) - kirk) < 4.0 * float(res.stderr) + 0.06, (
        float(res.price), kirk)


def test_lookback_mega_onchip():
    """Lookback (S, M) state on hardware: the running-max plane through
    the one-kernel ma-mega engine agrees with the fused kernels, and the
    European fixed call sits on the BGK-shifted reflection-law anchor."""
    from amcx import MarketParams as _MP
    from amcx.models.lookback import (lookback_fixed_call_cont,
                                      price_lookback_option)

    m = _MP(100.0, 0.05, 0.25)
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    spec = RegressionSpec(basis="chebyshev", degree=2)
    r_e = price_lookback_option(jax.random.key(13), m, 100.0, 1.0,
                                option_type="call", strike_type="fixed",
                                spec=spec, sim=sim, engine="mega")
    anchor = lookback_fixed_call_cont(100.0, 100.0, 1.0, 0.05, 0.25,
                                      n_steps=50)
    assert abs(float(r_e.price) - anchor) < 0.02 * anchor, (
        float(r_e.price), anchor)
    kw = dict(option_type="put", strike_type="floating",
              exercise="american", spec=spec, sim=sim)
    r_f = price_lookback_option(jax.random.key(14), m, 0.0, 1.0,
                                engine="fused", **kw)
    r_m = price_lookback_option(jax.random.key(14), m, 0.0, 1.0,
                                engine="mega", **kw)
    assert abs(float(r_f.price) - float(r_m.price)) < 5e-3


def test_bermudan_swaption_mega_onchip():
    """HW1F Bermudan swaption on hardware: the ma-mega route (pathwise
    discount planes + in-kernel Bermudan schedule — the direct_y df-plane
    stream is the lowering-risk item) agrees with the xla scan engine on
    shared paths, and the European single-date run sits on Jamshidian."""
    from amcx.rates import (HW1FParams, jamshidian_swaption_price,
                            price_bermudan_swaption, swap_schedule)

    hw = HW1FParams(r0=0.03, kappa=0.3, sigma_r=0.012)
    pay = swap_schedule(1.0, 4.0, 1)
    K = 0.0305
    sim = SimConfig(n_paths=262_144, n_steps=32, antithetic=True)
    spec = RegressionSpec(basis="chebyshev", degree=2)
    kw = dict(spec=spec, sim=sim)
    r_x = price_bermudan_swaption(jax.random.key(7), hw, K, pay, **kw)
    r_m = price_bermudan_swaption(jax.random.key(7), hw, K, pay,
                                  engine="mega", **kw)
    assert abs(float(r_x.price) - float(r_m.price)) < 3e-4, (
        float(r_x.price), float(r_m.price))
    exact = jamshidian_swaption_price(hw, K, 1.0, pay)
    r_e = price_bermudan_swaption(jax.random.key(8), hw, K, pay,
                                  exercise_times=[1.0], engine="mega", **kw)
    assert abs(float(r_e.price) - exact) < 4.0 * float(r_e.stderr) + 1e-5, (
        float(r_e.price), exact, float(r_e.stderr))


def test_rbergomi_mega_onchip():
    """Rough Bergomi rides the ma-mega kernel on chip: the (S, v) planes
    come from the exact joint-covariance Volterra matmul (MXU), the
    induction is ONE pallas_call; fused vs mega vs XLA must agree, and the
    η=0 sanity collapse to BS holds on hardware-PRNG statistics."""
    from amcx.oracle import bs_price
    from amcx.roughvol import RBergomiParams, price_option_rbergomi

    rp = RBergomiParams(S0=100.0, r=0.03, xi0=0.04, eta=1.5, rho=-0.7,
                        H=0.1)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    spec = RegressionSpec(degree=2, regress_on="all")
    r_x = price_option_rbergomi(jax.random.key(1), rp, prod, spec, sim)
    r_f = price_option_rbergomi(jax.random.key(1), rp, prod, spec, sim,
                                engine="fused")
    r_m = price_option_rbergomi(jax.random.key(1), rp, prod, spec, sim,
                                engine="mega")
    assert abs(float(r_f.price) - float(r_m.price)) < 5e-3, (
        float(r_f.price), float(r_m.price))
    assert abs(float(r_x.price) - float(r_m.price)) < max(
        1e-2, 0.5 * float(r_x.stderr)), (float(r_x.price), float(r_m.price))

    rp0 = RBergomiParams(S0=100.0, r=0.03, xi0=0.04, eta=0.0, rho=-0.7,
                         H=0.1)
    prod_e = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="european")
    r_e = price_option_rbergomi(jax.random.key(2), rp0, prod_e, spec, sim)
    bs = float(bs_price(100.0, 100.0, 1.0, 0.03, 0.2, option_type="put"))
    assert abs(float(r_e.price) - bs) < 4.0 * float(r_e.stderr), (
        float(r_e.price), bs, float(r_e.stderr))


def test_sabr_mega_onchip():
    """SABR rides the shared two-state tails on chip: fused vs mega vs XLA
    agreement on the (S, σ) induction, plus the exact conditional-mixing
    European twin (β=1, ρ=0 variant) on hardware-PRNG statistics."""
    from amcx.sabr import (SABRParams, price_option_sabr,
                           sabr_mixing_price, simulate_sabr)

    sp = SABRParams(S0=100.0, r=0.03, alpha=0.2, beta=1.0, rho=-0.5,
                    nu=0.6)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    spec = RegressionSpec(degree=2, regress_on="all")
    r_x = price_option_sabr(jax.random.key(1), sp, prod, spec, sim)
    r_f = price_option_sabr(jax.random.key(1), sp, prod, spec, sim,
                            engine="fused")
    r_m = price_option_sabr(jax.random.key(1), sp, prod, spec, sim,
                            engine="mega")
    assert abs(float(r_f.price) - float(r_m.price)) < 5e-3, (
        float(r_f.price), float(r_m.price))
    assert abs(float(r_x.price) - float(r_m.price)) < max(
        1e-2, 0.5 * float(r_x.stderr)), (float(r_x.price), float(r_m.price))

    sp0 = SABRParams(S0=100.0, r=0.03, alpha=0.2, beta=1.0, rho=0.0,
                     nu=0.6)
    S = simulate_sabr(jax.random.key(2), sp0, 1.0, sim)
    pay = jnp.maximum(S[-1] - 100.0, 0.0) * np.exp(-0.03)
    half = sim.n_paths // 2
    pair = 0.5 * (pay[:half] + pay[half:])
    mc = float(jnp.mean(pair))
    se = float(jnp.std(pair)) / np.sqrt(half)
    mix, se_mix = sabr_mixing_price(jax.random.key(3), sp0, 100.0, 1.0, sim)
    assert abs(mc - float(mix)) < 4.0 * np.hypot(se, float(se_mix)), (
        mc, float(mix))


def test_rbergomi_dual_bound_onchip():
    """The conditional-resampling AB dual lowers and runs on chip (the
    (2T×2T) @ (2T, J·n) inner matmuls ride the MXU); the bracket must be
    ordered and tight at a mid-size rough config."""
    from amcx.roughvol import RBergomiParams, rbergomi_dual_bound

    rp = RBergomiParams(S0=100.0, r=0.03, xi0=0.04, eta=1.5, rho=-0.7,
                        H=0.1)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    lo, lo_se, up, up_se = rbergomi_dual_bound(
        jax.random.key(7), rp, prod,
        RegressionSpec(degree=3, regress_on="all"),
        SimConfig(n_paths=65_536, n_steps=12), n_outer=1_024, n_inner=32,
        n_replay=262_144)
    assert float(up) >= float(lo) - 2.0 * np.hypot(float(lo_se),
                                                   float(up_se))
    # J=32 carries the documented O(1/J) inner-noise bias in the upper
    assert float(up) - float(lo) < 0.45, (float(lo), float(up))


def test_heston_barrier_mega_onchip():
    """Mosaic lowering of the ma-mega sign-bit knock decode (abs + compare
    on the streamed asset-0 plane) on hardware: every knock variant must
    reproduce the XLA (S, v) induction on shared paths, and European
    in-out parity must be pathwise exact through the kernel."""
    from amcx.dynamics import HestonParams, price_option_heston

    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.5, theta=0.04,
                      xi=0.5, rho=-0.7)
    spec = RegressionSpec(degree=2, regress_on="all")
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    for b, bt in [(85.0, "down-in"), (85.0, "down-out"), (120.0, "up-out")]:
        prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                           exercise="american", barrier=b, barrier_type=bt)
        rx = price_option_heston(jax.random.key(21), hp, prod, spec, sim)
        rm = price_option_heston(jax.random.key(21), hp, prod, spec, sim,
                                 engine="mega")
        assert abs(float(rx.price) - float(rm.price)) < 5e-3, (
            bt, float(rx.price), float(rm.price))


def test_dividends_mc_vs_pde_onchip():
    """Discrete cash dividends on hardware: the drop-adjusted GBM scan
    prices the European on the CN-PDE jump-condition oracle (simulation
    accuracy, no policy bias), and the American runs identically through
    the XLA scan and the univariate mega kernel on shared paths."""
    from amcx.dividends import DividendSchedule, price_option_divs
    from amcx.pde import PDEGrid, pde_price

    m = MarketParams(S0=100.0, r=0.05, sigma=0.2)
    divs = DividendSchedule([0.3, 0.7], [2.0, 2.0])
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    spec = RegressionSpec(degree=3, regress_on="all")

    prod_e = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="european")
    r_e = price_option_divs(jax.random.key(31), m, divs, prod_e, spec, sim)
    anchor = float(pde_price(m, prod_e, PDEGrid(n_steps=800, n_space=640),
                             dividends=divs).price)
    assert abs(float(r_e.price) - anchor) < 4.0 * float(r_e.stderr) + 0.02, (
        float(r_e.price), anchor, float(r_e.stderr))

    prod_a = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="american")
    r_x = price_option_divs(jax.random.key(32), m, divs, prod_a, spec, sim)
    r_m = price_option_divs(jax.random.key(32), m, divs, prod_a, spec, sim,
                            engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 5e-3, (
        float(r_x.price), float(r_m.price))


def test_g2_bermudan_swaption_onchip():
    """G2++ on hardware: the exact 3-factor scheme's discount hits the
    curve, the MC European lands on the Gauss-Hermite T-forward oracle,
    and the THREE-plane ma-mega route (A=3 + per-path discount planes +
    in-kernel schedule) matches the XLA scan on shared paths."""
    import jax.numpy as jnp

    from amcx.rates import swap_schedule
    from amcx.rates_g2 import (G2Params, g2_swaption_price,
                               price_bermudan_swaption_g2,
                               simulate_g2_rates)

    g2 = G2Params(r0=0.03, a=0.8, b=0.1, sigma=0.012, eta=0.008, rho=-0.7)
    pay = swap_schedule(1.0, 4.0)
    sim = SimConfig(n_paths=262_144, n_steps=64, antithetic=True)
    _, _, df = simulate_g2_rates(jax.random.key(40), g2, 4.0, sim)
    mc = float(jnp.mean(jnp.prod(df, axis=0)))
    assert abs(mc - np.exp(-0.03 * 4.0)) < 5e-4, mc

    spec = RegressionSpec(degree=2, regress_on="all")
    res = price_bermudan_swaption_g2(jax.random.key(41), g2, 0.03, pay,
                                     exercise_times=[1.0], spec=spec,
                                     sim=sim)
    gh = g2_swaption_price(g2, 0.03, 1.0, pay, payer=True)
    assert abs(float(res.price) - gh) < 4.0 * float(res.stderr) + 2e-4, (
        float(res.price), gh)

    rx = price_bermudan_swaption_g2(jax.random.key(42), g2, 0.03, pay,
                                    spec=spec, sim=sim)
    rm = price_bermudan_swaption_g2(jax.random.key(42), g2, 0.03, pay,
                                    spec=spec, sim=sim, engine="mega")
    assert abs(float(rx.price) - float(rm.price)) < 1e-4, (
        float(rx.price), float(rm.price))
