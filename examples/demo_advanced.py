#!/usr/bin/env python
"""Demo: the round-2 desk capabilities beyond the reference notebook.

Walks through the production-serving surface added on top of the core LSMC
parity: book pricing (strike grids and mixed maturities in one kernel),
Brownian-bridge quasi-Monte Carlo, general-dynamics Greeks through the
custom-VJP fused pricer, Heston stochastic volatility with CCR exposures,
and the zero-HBM fused-path engine.

Run:  python examples/demo_advanced.py
On a TPU host everything runs on the chip; on CPU the Pallas kernels use
interpret mode (slow but identical logic) and the hardware-PRNG engines
fall back where noted.
"""

import pathlib
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from amcx import (  # noqa: E402
    HestonParams,
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    bs_price,
    compute_ccr_exposures,
    crr_price,
    heston_price_cf,
    price_and_greeks,
    price_mixed_book,
    price_option_heston,
    price_strike_grid,
    simulate_gbm,
    simulate_gbm_qmc,
)

MARKET = MarketParams(95.0, 0.01, 0.2)
SPEC = RegressionSpec(degree=4)


def section(title):
    print(f"\n=== {title} ===")


def main():
    on_tpu = jax.default_backend() != "cpu"
    key = jax.random.key(0)

    # ------------------------------------------------------------------
    section("Book pricing: 8 strikes on one shared path set")
    sim = SimConfig(n_paths=65_536, n_steps=50)
    paths = simulate_gbm(key, MARKET, 1.0, sim)
    strikes = jnp.linspace(85.0, 115.0, 8)
    engine = "mega" if sim.n_paths % 4096 == 0 else "xla"
    book = price_strike_grid(paths, strikes, MARKET.r, 1.0, "put", True,
                             SPEC, engine=engine)
    for K, p, se in zip(strikes, book.prices, book.stderrs):
        print(f"  K={float(K):6.1f}  {float(p):8.4f} ± {float(se):.4f}")

    # ------------------------------------------------------------------
    section("Mixed maturities: same strike, 3 tenors, one kernel")
    mixed = price_mixed_book(paths, jnp.asarray([100.0] * 3), [10, 25, 50],
                             MARKET.r, 1.0, "put", True, SPEC, engine=engine)
    for m_, p in zip([0.2, 0.5, 1.0], mixed.prices):
        print(f"  T={m_:.1f}y  {float(p):8.4f}")

    # ------------------------------------------------------------------
    section("Brownian-bridge QMC: European put error at 4096 paths")
    simq = SimConfig(n_paths=4096, n_steps=64)
    bs = float(bs_price(95.0, 100.0, 1.0, 0.01, 0.2, option_type="put"))
    from amcx import lsmc_option_pricing  # noqa: F811

    prod_e = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    for label, kwargs in [("increment order", {}), ("bridge order",
                                                    dict(brownian_bridge=True))]:
        pq = simulate_gbm_qmc(0, MARKET, 1.0, simq, **kwargs)
        price = float(lsmc_option_pricing(pq, prod_e, MARKET.r,
                                          RegressionSpec(degree=2), False).price)
        print(f"  Sobol {label:15s}: {price:8.4f}  |err vs BS {bs:.4f}| ="
              f" {abs(price - bs):.4f}")

    # ------------------------------------------------------------------
    section("Greeks at Pallas speed through the custom VJP (fused-ad)")
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    p, g = price_and_greeks(key, MARKET, prod, SPEC,
                            SimConfig(n_paths=65_536, n_steps=50),
                            engine="fused-ad")
    print(f"  price {float(p):.4f}  " +
          "  ".join(f"{k}={float(v):+.4f}" for k, v in g.items()))

    # ------------------------------------------------------------------
    section("Heston stochastic volatility: (S, v) cross-basis American put")
    hp = HestonParams(S0=95.0, r=0.01, q=0.0, v0=0.04, kappa=1.5,
                      theta=0.04, xi=0.5, rho=-0.7)
    res = price_option_heston(jax.random.key(1), hp, prod,
                              RegressionSpec(degree=3),
                              SimConfig(n_paths=65_536, n_steps=50),
                              return_surface=True)
    cf = heston_price_cf(hp, 100.0, 1.0, "put")
    ccr = compute_ccr_exposures(res.continuation)
    epe0 = float(np.asarray(ccr.epe)[1])
    print(f"  American {float(res.price):.4f} ± {float(res.stderr):.4f}  "
          f"(CF European {cf:.4f});  EPE(t=dt) = {epe0:.4f}")

    # ------------------------------------------------------------------
    section("Rough Bergomi (H=0.1): exact-in-law Volterra via one MXU matmul")
    from amcx import RBergomiParams, price_option_rbergomi
    rp = RBergomiParams(S0=95.0, r=0.01, xi0=0.04, eta=1.5, rho=-0.7, H=0.1)
    rb = price_option_rbergomi(jax.random.key(11), rp, prod,
                               RegressionSpec(degree=3),
                               SimConfig(n_paths=65_536, n_steps=50,
                                         antithetic=True))
    rb0 = price_option_rbergomi(
        jax.random.key(11),
        RBergomiParams(S0=95.0, r=0.01, xi0=0.04, eta=0.0, rho=-0.7, H=0.1),
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
        RegressionSpec(degree=3),
        SimConfig(n_paths=65_536, n_steps=50, antithetic=True))
    print(f"  American (S, v) {float(rb.price):.4f} ± "
          f"{float(rb.stderr):.4f}; η=0 European sanity "
          f"{float(rb0.price):.4f} vs BS {bs_price(95., 100., 1., .01, .2, option_type='put'):.4f}")

    # ------------------------------------------------------------------
    section("SABR: Hagan smile oracle + (S, σ) American + slice calibration")
    from amcx import (SABRParams, calibrate_sabr, hagan_implied_vol,
                      price_option_sabr, sabr_european_price)
    sp_d = SABRParams(S0=95.0, r=0.01, alpha=0.2, beta=1.0, rho=-0.5,
                      nu=0.6)
    sa = price_option_sabr(jax.random.key(12), sp_d, prod,
                           RegressionSpec(degree=3),
                           SimConfig(n_paths=65_536, n_steps=50,
                                     antithetic=True))
    ks = np.linspace(75.0, 120.0, 10)
    ivs = hagan_implied_vol(95.0 * np.exp(0.01), ks, 1.0, 0.2, 1.0, -0.5,
                            0.6)
    fit = calibrate_sabr(95.0 * np.exp(0.01), 1.0, ks, ivs, beta=1.0)
    print(f"  American (S, σ) {float(sa.price):.4f} ± "
          f"{float(sa.stderr):.4f} (Hagan European "
          f"{float(sabr_european_price(sp_d, 100.0, 1.0, 'put')):.4f}); "
          f"smile refit α={fit.alpha:.4f} ρ={fit.rho:.3f} ν={fit.nu:.3f}")

    # ------------------------------------------------------------------
    section("Asian options: (S, A) state augmentation, exact geometric oracle")
    from amcx import geometric_asian_price, price_asian_option

    simA = SimConfig(n_paths=65_536, n_steps=32)
    ge = price_asian_option(jax.random.key(6), MARKET, 100.0, 1.0, "call",
                            "european", "geometric", "fixed",
                            RegressionSpec(degree=3), simA)
    exact = geometric_asian_price(95.0, 100.0, 1.0, 0.01, 0.2, 32)
    am_a = price_asian_option(jax.random.key(6), MARKET, 100.0, 1.0, "put",
                              "american", "arithmetic", "fixed",
                              RegressionSpec(degree=3), simA)
    print(f"  geometric European {float(ge.price):.4f} (exact {exact:.4f});"
          f"  American arithmetic average-put {float(am_a.price):.4f}")

    # ------------------------------------------------------------------
    section("Bermudan schedules: quarterly dates on the simulation grid")
    from amcx import lsmc_option_pricing

    q = lsmc_option_pricing(paths, prod, MARKET.r, SPEC,
                            return_surface=False,
                            exercise_steps=tuple(range(12, 50, 12)))
    a = lsmc_option_pricing(paths, prod, MARKET.r, SPEC,
                            return_surface=False)
    print(f"  quarterly {float(q.price):.4f}  <  American {float(a.price):.4f}")

    # ------------------------------------------------------------------
    if on_tpu:
        section("Fused-path engine: price with ZERO path HBM traffic")
        from amcx.engine import price_option

        r2 = price_option(key, MARKET, prod, SPEC,
                          SimConfig(n_paths=1 << 20, n_steps=100),
                          engine="fusedpath")
        print(f"  1M×100 American put in one self-generating kernel: "
              f"{float(r2.price):.4f} ± {float(r2.stderr):.4f}")
    else:
        section("Fused-path engine (skipped: needs the TPU hardware PRNG)")

    # ------------------------------------------------------------------
    section("Flagship analytics: Greeks, boundary, CCR and CVA "
            "off ONE mega-kernel pricing")
    from amcx import cva_from_epe, exercise_boundary, fast_greeks, price_option
    from amcx.exposures import exposures_from_coeffs
    from amcx.paths import gbm_standardization

    simM = SimConfig(n_paths=1 << 20 if on_tpu else 1 << 16, n_steps=50,
                     backend="pallas" if on_tpu else "xla")
    resM = price_option(key, MARKET, prod, SPEC, simM, engine="mega",
                        return_cf_tau=True, return_coeffs=True)
    g = fast_greeks(resM, MARKET, prod, simM.n_steps)
    mt, ist = gbm_standardization(MARKET, 1.0, simM.n_steps)
    pathsM = simulate_gbm(key, MARKET, 1.0, simM)
    ccrM = exposures_from_coeffs(pathsM, resM.coeffs, mt, ist,
                                 degree=SPEC.degree)
    cva = float(cva_from_epe(ccrM.epe, 1.0, MARKET.r, hazard=0.02,
                             recovery=0.4))
    bnd = exercise_boundary(resM.coeffs[:simM.n_steps], mt[:simM.n_steps],
                            ist[:simM.n_steps], 100.0, "put", SPEC,
                            s_lo=40.0, s_hi=100.0)
    b_mid = float(np.asarray(bnd)[simM.n_steps // 2])
    print(f"  price {float(resM.price):.4f}  delta {float(g['delta']):+.4f}  "
          f"vega {float(g['vega']):.2f}")
    print(f"  EPE(T/2) {float(np.asarray(ccrM.epe)[simM.n_steps // 2]):.4f}  "
          f"CVA(λ=2%, R=40%) {cva:.4f}  boundary S*(T/2) ≈ {b_mid:.2f}")

    # ------------------------------------------------------------------
    section("Term structures: two-regime short rate at flagship speed")
    from amcx import TermCurves, crr_price_curves, price_option_curves

    n_tc = 50
    r_t = jnp.concatenate([jnp.full((n_tc // 2,), 0.03),
                           jnp.full((n_tc // 2,), 0.08)])
    curves = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=n_tc)
    sim_tc = SimConfig(n_paths=1 << 20 if on_tpu else 1 << 16, n_steps=n_tc,
                       backend="pallas" if on_tpu else "xla")
    res_tc = price_option_curves(
        key, curves, ProductSpec(K=100.0, T=1.0, option_type="put",
                                 exercise="american"),
        RegressionSpec(degree=4, regress_on="itm"), sim_tc, engine="mega")
    lat = crr_price_curves(100.0, 100.0, 1.0, np.asarray(r_t), 0.25,
                           n_sub=40)
    print(f"  American put, r(t) = 3% then 8%: {float(res_tc.price):.4f} "
          f"± {float(res_tc.stderr):.4f} (per-step-rate f64 lattice "
          f"{lat:.4f}) — the mega kernel is unchanged: curve discounting "
          f"rides its per-step stats rows")

    # ------------------------------------------------------------------
    section("Swing option: 3 exercise rights vs the rights lattice")
    from amcx import crr_swing_price, price_swing_option

    res_sw = price_swing_option(
        key, MarketParams(100.0, 0.05, 0.25),
        ProductSpec(K=105.0, T=1.0, option_type="put", exercise="american"),
        3, RegressionSpec(degree=4, regress_on="itm"),
        SimConfig(n_paths=1 << 17, n_steps=20))
    sw_lat = crr_swing_price(100.0, 105.0, 1.0, 0.05, 0.25, 3, n_steps=20,
                             n_sub=25)
    print(f"  3-rights swing put: {float(res_sw.price):.4f} ± "
          f"{float(res_sw.stderr):.4f} (exact same-date-grid lattice "
          f"{sw_lat:.4f})")

    # ------------------------------------------------------------------
    section("Stochastic rates: Hull-White + GBM hybrid (exact scheme)")
    from amcx import HullWhiteParams, european_price_hw, price_option_hw

    hw = HullWhiteParams(100.0, 0.04, 0.2, kappa=0.8, sigma_r=0.02,
                         rho=-0.4)
    sim_hw = SimConfig(n_paths=1 << 17, n_steps=50, antithetic=True)
    res_eu = price_option_hw(key, hw, ProductSpec(
        K=105.0, T=1.0, option_type="put", exercise="european"),
        RegressionSpec(degree=3), sim_hw)
    res_am = price_option_hw(key, hw, ProductSpec(
        K=105.0, T=1.0, option_type="put", exercise="american"),
        RegressionSpec(degree=4, regress_on="itm"), sim_hw)
    cf = european_price_hw(hw, 105.0, 1.0, "put")
    print(f"  European: {float(res_eu.price):.4f} ± "
          f"{float(res_eu.stderr):.4f} vs exact hybrid closed form {cf:.4f}")
    print(f"  American on the (S, r) cross basis: {float(res_am.price):.4f} "
          f"± {float(res_am.stderr):.4f} (early-exercise premium "
          f"{float(res_am.price) - float(res_eu.price):.4f})")

    # ------------------------------------------------------------------
    section("Calibration: quotes → SVI → Dupire local vol → American LSMC")
    from amcx import dupire_local_vol, fit_svi_surface, price_option_local_vol

    mats = np.array([0.5, 1.0])
    Ks = np.tile(np.array([85.0, 95.0, 100.0, 105.0, 115.0]), (2, 1))
    # synthetic flat-20%-vol quote grid; real desks feed market IVs here
    surf = fit_svi_surface(100.0, 0.05, 0.0, mats, Ks, np.full_like(Ks, 0.2))
    lv = dupire_local_vol(surf, 100.0, 0.05, 0.0)
    res_lv = price_option_local_vol(
        key, 100.0, 0.05, 0.0, lv,
        ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        RegressionSpec(degree=4),
        SimConfig(n_paths=65_536, n_steps=50, antithetic=True))
    print(f"  SVI fit ({len(mats)} slices) → Dupire σ(t,S) → American put: "
          f"{float(res_lv.price):.4f} ± {float(res_lv.stderr):.4f} "
          f"(flat smile collapses to BS dynamics; CRR-2000 anchor 6.0902)")

    # ------------------------------------------------------------------
    section("Volume-constrained swing: take-or-pay via bang-bang counts")
    from amcx import crr_swing_price, price_swing_contract

    m_sw = MarketParams(100.0, 0.05, 0.25)
    sim_sw = SimConfig(n_paths=65_536, n_steps=20, antithetic=True)
    c = price_swing_contract(key, m_sw, 100.0, 1.0, q_take_min=0.5,
                             q_take_max=1.0, Q_min=12.0, Q_max=16.0,
                             option_type="put", spec=RegressionSpec(degree=5),
                             sim=sim_sw,
                             engine="mega" if on_tpu else "xla")
    print(f"  take ∈ [0.5, 1]/date, total ∈ [12, 16] over 21 dates: "
          f"{c.price:.4f} ± {c.stderr:.4f}")
    print(f"  = 0.5 × strip ({c.strip_value:.4f}) + 0.5 × up-swing "
          f"({c.upswing_value:.4f}, counts m ∈ [{c.m_min}, {c.m_max}])")
    lat = crr_swing_price(100.0, 100.0, 1.0, 0.05, 0.25, c.m_max, n_steps=20,
                          n_sub=25, option_type="put",
                          payoff_kind="forward", n_min=c.m_min)
    print(f"  exact rights-lattice composition: "
          f"{0.5 * c.strip_value + 0.5 * lat:.4f}")

    # ------------------------------------------------------------------
    section("Baskets: 3 correlated assets, exact geometric oracle")
    from amcx import geometric_basket_price, price_basket_option

    corr = np.array([[1.0, 0.3, 0.3], [0.3, 1.0, 0.3], [0.3, 0.3, 1.0]])
    s0b, wb = [100.0, 95.0, 105.0], [0.5, 0.3, 0.2]
    sim_b = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)
    rg = price_basket_option(key, s0b, wb, 100.0, 1.0, 0.05, 0.25, corr=corr,
                             option_type="call", exercise="european",
                             averaging="geo", sim=sim_b)
    ge = geometric_basket_price(s0b, wb, 100.0, 1.0, 0.05, 0.25, corr=corr,
                                option_type="call")
    ra = price_basket_option(key, s0b, wb, 105.0, 1.0, 0.05, 0.25, corr=corr,
                             option_type="put", exercise="american",
                             averaging="arith", sim=sim_b,
                             engine="fused" if on_tpu else "xla")
    print(f"  geometric European (w = {wb}): {float(rg.price):.4f} ± "
          f"{float(rg.stderr):.4f} vs EXACT lognormal {ge:.4f}")
    print(f"  arithmetic American put K=105 "
          f"({'fused kernels' if on_tpu else 'xla engine'}): "
          f"{float(ra.price):.4f} ± {float(ra.stderr):.4f}")

    section("Jump / Levy dynamics: Merton, VG, NIG vs their oracles")
    from amcx import (MertonJumps, NIGParams, VGParams, merton_price,
                      nig_price_cf, price_option_merton, price_option_nig,
                      price_option_vg, vg_price_cf)

    m_j = MarketParams(100.0, 0.05, 0.2)
    prod_j = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="american")
    sim_lv = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)
    eng_lv = "mega" if on_tpu else "xla"
    jp = MertonJumps(lam=0.8, mu_j=-0.10, sigma_j=0.2)
    r_me = price_option_merton(key, m_j, jp, prod_j, RegressionSpec(degree=4),
                               sim_lv, engine=eng_lv)
    ser = float(merton_price(100.0, 100.0, 1.0, 0.05, 0.2, jp.lam, jp.mu_j,
                             jp.sigma_j, option_type="put"))
    vgp = VGParams(theta=-0.14, sigma=0.2, nu=0.2)
    r_vg = price_option_vg(key, m_j, vgp, prod_j, RegressionSpec(degree=4),
                           sim_lv, engine=eng_lv)
    cf_v = vg_price_cf(100.0, 100.0, 1.0, 0.05, vgp, option_type="put")
    nigp = NIGParams(alpha=8.0, beta=-3.0, delta=0.3)
    r_ni = price_option_nig(key, m_j, nigp, prod_j, RegressionSpec(degree=4),
                            sim_lv, engine=eng_lv)
    cf_n = nig_price_cf(100.0, 100.0, 1.0, 0.05, nigp, option_type="put")
    print(f"  Merton American put ({eng_lv}): {float(r_me.price):.4f} "
          f"(series European {ser:.4f})")
    print(f"  VG American put:     {float(r_vg.price):.4f} "
          f"(Gil-Pelaez European {cf_v:.4f})")
    print(f"  NIG American put:    {float(r_ni.price):.4f} "
          f"(Gil-Pelaez European {cf_n:.4f})")

    section("PDE engine: Crank-Nicolson + PCR vs CRR-2000")
    from amcx import PDEGrid, pde_price

    rp = pde_price(MarketParams(100.0, 0.05, 0.2), prod_j,
                   PDEGrid(n_space=512, n_steps=128))
    crr_ref = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000,
                              option_type="put", american=True))
    print(f"  American put on a 512x128 grid: {float(rp.price):.4f} "
          f"(CRR-2000 {crr_ref:.4f})")

    section("Deep LSMC: MLP continuation + frozen OOS replay")
    from amcx import deep_price_option

    r_d = deep_price_option(key, MarketParams(100.0, 0.05, 0.2), prod_j,
                            SimConfig(n_paths=16_384, n_steps=50,
                                      antithetic=True),
                            out_of_sample=True)
    print(f"  OOS-replay American put: {float(r_d.price):.4f} ± "
          f"{float(r_d.stderr):.4f} (a TRUE lower bound; CRR {crr_ref:.4f})")

    section("Spread options: Margrabe exact at K=0, Kirk for struck spreads")
    from amcx import kirk_price, price_spread_option

    r_sp = price_spread_option(key, 100.0, 95.0, 5.0, 1.0, 0.05, 0.25, 0.2,
                               rho=0.3, exercise="american",
                               spec=RegressionSpec(degree=4,
                                                   regress_on="itm"),
                               sim=SimConfig(n_paths=65_536, n_steps=50,
                                             antithetic=True))
    kk = kirk_price(100.0, 95.0, 5.0, 1.0, 0.05, 0.25, 0.2, rho=0.3)
    print(f"  American max(S1-S2-5, 0): {float(r_sp.price):.4f} "
          f"(Kirk European {kk:.4f})")

    section("Lookbacks: (S, running-extremum) state, reflection-law oracle")
    from amcx import price_lookback_option
    from amcx.models.lookback import lookback_fixed_call_cont

    sim_lb = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)
    r_lb = price_lookback_option(key, MarketParams(100.0, 0.05, 0.25),
                                 100.0, 1.0, option_type="call",
                                 strike_type="fixed", sim=sim_lb)
    a_lb = lookback_fixed_call_cont(100.0, 100.0, 1.0, 0.05, 0.25,
                                    n_steps=50)
    print(f"  fixed-strike call on the max: {float(r_lb.price):.4f} ± "
          f"{float(r_lb.stderr):.4f} (BGK-shifted quadrature {a_lb:.4f})")

    section("Bermudan swaptions: LSMC on the Hull-White factor + CCR")
    from amcx import (HW1FParams, jamshidian_swaption_price,
                      price_bermudan_swaption, swap_schedule,
                      swaption_ccr_profile)

    hw1 = HW1FParams(r0=0.03, kappa=0.3, sigma_r=0.012)
    pay_sw = swap_schedule(1.0, 4.0, 1)
    r_bm = price_bermudan_swaption(
        key, hw1, 0.0305, pay_sw, first_reset=1.0,
        sim=SimConfig(n_paths=65_536, n_steps=32, antithetic=True),
        return_surface=True)
    eu_sw = jamshidian_swaption_price(hw1, 0.0305, 1.0, pay_sw)
    ccr_sw, ene_sw = swaption_ccr_profile(r_bm.continuation)
    print(f"  1y→5y payer, exercise at every reset: "
          f"{float(r_bm.price) * 1e4:.1f} bp ± "
          f"{float(r_bm.stderr) * 1e4:.1f} (European Jamshidian "
          f"{eu_sw * 1e4:.1f} bp)")
    print(f"  CCR at 2y: EPE {float(np.asarray(ccr_sw.epe)[16]) * 1e4:.1f} "
          f"bp, PFE95 {float(np.asarray(ccr_sw.pfe95)[16]) * 1e4:.1f} bp, "
          f"ENE {float(np.asarray(ene_sw)[16]) * 1e4:.1f} bp "
          f"(signed exercised-swap tail)")

    section("Structured notes: Phoenix autocall, worst-of, TARF")
    from amcx import (AutocallSpec, TARFSpec, autocall_ccr_profile,
                      autocall_pde, price_autocall, price_autocall_worst_of,
                      price_tarf, tarf_strip_value)

    m_ac = MarketParams(100.0, 0.05, 0.2)
    phoenix = AutocallSpec(T=2.0, n_obs=8, autocall_barrier=100.0,
                           coupon=0.02, coupon_barrier=70.0, memory=True,
                           ki_barrier=60.0, put_strike=100.0)
    sim_ac = SimConfig(n_paths=131_072, n_steps=96, antithetic=True)
    r_ac = price_autocall(key, m_ac, phoenix, sim_ac)
    print(f"  Phoenix 2y (memory coupons, KI put 60/100): "
          f"{float(r_ac.price):.4f} ± {float(r_ac.stderr):.4f} of notional "
          f"(multi-state CN-PDE {autocall_pde(m_ac, phoenix, 96):.4f})")
    frac = AutocallSpec(T=2.0, n_obs=8, autocall_barrier=1.0, coupon=0.02,
                        coupon_barrier=0.70, memory=True, ki_barrier=0.60,
                        put_strike=1.0)
    corr3 = np.full((3, 3), 0.5) + 0.5 * np.eye(3)
    r_wo = price_autocall_worst_of(key, [90.0, 100.0, 110.0], 0.05,
                                   [0.2, 0.25, 0.3], corr3, frac, sim_ac,
                                   q=0.02)
    print(f"  worst-of-3 Phoenix (ρ=0.5): {float(r_wo.price):.4f} ± "
          f"{float(r_wo.stderr):.4f} — the correlation discount vs the "
          f"single-asset deck")
    exp_ac, _ = autocall_ccr_profile(key, m_ac, phoenix, sim_ac)
    print(f"  AMC exposure at 1y: EPE "
          f"{float(np.asarray(exp_ac.epe)[48]):.4f}, PFE95 "
          f"{float(np.asarray(exp_ac.pfe95)[48]):.4f} of notional "
          f"(regression MtM sits on the PDE lattice)")
    m_tf = MarketParams(100.0, 0.03, 0.15)
    tf = TARFSpec(K=100.0, T=1.0, n_fix=12, target=15.0, leverage=2.0,
                  knock="capped")
    r_tf = price_tarf(key, m_tf, tf,
                      SimConfig(n_paths=131_072, n_steps=48,
                                antithetic=True))
    print(f"  TARF (2× leverage, capped knockout at +15): "
          f"{float(r_tf.price):.4f} ± {float(r_tf.stderr):.4f} "
          f"(no-knock analytic strip {tarf_strip_value(m_tf, tf):.4f})")


if __name__ == "__main__":
    main()
