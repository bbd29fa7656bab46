"""Calibration layer: SVI fits, Dupire local vol, Heston calibration.

Mirrors the reference's oracle-anchored validation style (`unit_test.py:21`):
every calibrated object is judged by *repricing*, not by parameter equality
(κ/ξ are weakly identified from small grids; prices are not).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
from amcx.calibrate import (
    SVISurface,
    calibrate_heston,
    dupire_local_vol,
    fit_svi_slice,
    fit_svi_surface,
    implied_vol_np,
    svi_total_variance,
)
from amcx.dynamics import HestonParams, heston_price_cf, simulate_local_vol
from amcx.oracle import bs_price


def test_implied_vol_np_roundtrip():
    S0, r, q = 100.0, 0.03, 0.01
    K = np.array([80.0, 100.0, 125.0])
    T = np.array([0.25, 1.0, 2.0])[:, None]
    sigma = 0.27
    px = np.asarray(bs_price(S0, K, T, r, sigma, q, "put"))
    iv = implied_vol_np(px, S0, K, T, r, q, "put")
    # prices come from the f32 on-device bs_price; IV recovers to f32 depth
    np.testing.assert_allclose(iv, sigma, atol=1e-5)


def test_svi_slice_recovers_synthetic_smile():
    true = (0.02, 0.4, -0.3, 0.05, 0.2)
    k = np.linspace(-0.6, 0.6, 17)
    w = svi_total_variance(k, *true)
    fit = fit_svi_slice(k, w)
    w_fit = svi_total_variance(k, *fit)
    np.testing.assert_allclose(w_fit, w, atol=5e-6)


def test_svi_surface_interp_and_extrapolation():
    # two flat slices: w = 0.04*T exactly → interior interp, dwdt = 0.04
    surf = SVISurface(np.array([0.5, 1.0]),
                      np.array([[0.02, 0.0, 0.0, 0.0, 0.1],
                                [0.04, 0.0, 0.0, 0.0, 0.1]]))
    for t in (0.2, 0.5, 0.75, 1.0, 1.5):
        w, dwdt = surf.total_variance(jnp.asarray(0.1), jnp.asarray(t))
        assert abs(float(w) - 0.04 * t) < 1e-7, t
        assert abs(float(dwdt) - 0.04) < 1e-7, t


def test_dupire_flat_surface_gives_constant_sigma():
    sigma = 0.2
    mats = np.array([0.25, 0.5, 1.0])
    params = np.array([[sigma**2 * T, 0.0, 0.0, 0.0, 0.1] for T in mats])
    surf = SVISurface(mats, params)
    lv = dupire_local_vol(surf, S0=100.0, r=0.03, q=0.01)
    for t in (0.01, 0.3, 0.9, 1.2):
        got = jax.vmap(lambda s: lv(t, s))(jnp.array([70.0, 100.0, 140.0]))
        np.testing.assert_allclose(np.asarray(got), sigma, atol=2e-4)


def test_dupire_pipeline_reprices_flat_quotes():
    # quotes → fit_svi_surface → dupire → local-vol MC → BS parity
    S0, r, q, sigma = 100.0, 0.03, 0.0, 0.2
    mats = np.array([0.25, 0.5, 1.0])
    strikes = np.tile(np.array([80.0, 90.0, 100.0, 110.0, 125.0]), (3, 1))
    ivs = np.full_like(strikes, sigma)
    surf = fit_svi_surface(S0, r, q, mats, strikes, ivs)
    lv = dupire_local_vol(surf, S0, r, q)
    sim = SimConfig(n_paths=32768, n_steps=32, antithetic=True)
    S = simulate_local_vol(jax.random.key(7), S0, r, q, lv, 1.0, sim)
    ST = S[-1]
    for K in (90.0, 100.0, 110.0):
        pay = jnp.maximum(ST - K, 0.0) * jnp.exp(-r * 1.0)
        mc = float(jnp.mean(pay))
        se = float(jnp.std(pay) / np.sqrt(sim.n_paths))
        ref = float(bs_price(S0, K, 1.0, r, sigma, q, "call"))
        assert abs(mc - ref) < 3.5 * se + 0.02, (K, mc, ref, se)


def test_dupire_skewed_surface_reprices_its_own_quotes():
    # a skewed SVI surface must be repriced by its OWN Dupire local vol —
    # the defining property of the transform.
    S0, r, q = 100.0, 0.02, 0.0
    mats = np.array([0.5, 1.0])
    params = np.array([[0.010, 0.08, -0.4, 0.0, 0.25],
                       [0.020, 0.12, -0.4, 0.0, 0.30]])
    surf = SVISurface(mats, params)
    lv = dupire_local_vol(surf, S0, r, q)
    sim = SimConfig(n_paths=65536, n_steps=64, antithetic=True)
    S = simulate_local_vol(jax.random.key(11), S0, r, q, lv, 1.0, sim)
    ST = S[-1]
    F = S0 * np.exp((r - q) * 1.0)
    for K in (85.0, 100.0, 115.0):
        iv_surf = float(surf.implied_vol(K, 1.0, F))
        ref = float(bs_price(S0, K, 1.0, r, iv_surf, q, "call"))
        pay = jnp.maximum(ST - K, 0.0) * jnp.exp(-r * 1.0)
        mc = float(jnp.mean(pay))
        se = float(jnp.std(pay) / np.sqrt(sim.n_paths))
        assert abs(mc - ref) < 3.5 * se + 0.05, (K, mc, ref, se)


def test_calibrate_heston_reprices_synthetic_grid():
    S0, r, q = 100.0, 0.03, 0.0
    true = HestonParams(S0=S0, r=r, q=q, v0=0.045, kappa=1.8, theta=0.055,
                        xi=0.45, rho=-0.55)
    mats = np.array([0.5, 1.0])
    strikes = np.tile(np.array([85.0, 95.0, 100.0, 105.0, 115.0]), (2, 1))
    prices = np.array([[heston_price_cf(true, K, T) for K in strikes[i]]
                       for i, T in enumerate(mats)])
    fit = calibrate_heston(S0, r, q, mats, strikes, prices)
    refit = np.array([[heston_price_cf(fit, K, T) for K in strikes[i]]
                      for i, T in enumerate(mats)])
    assert np.max(np.abs(refit - prices)) < 1e-3, fit
    # v0 and theta are well identified by a two-maturity grid
    assert abs(fit.v0 - true.v0) < 0.01
    assert abs(fit.theta - true.theta) < 0.02


def test_calibrated_local_vol_feeds_lsmc_engine():
    # end-to-end: flat quotes → surface → local vol → American LSMC price
    # bracketed by the BS European (below) and CRR American (near).
    from amcx.engine import backward_induction
    from amcx.oracle import crr_price
    from amcx.payoff import intrinsic_value

    S0, r, q, sigma = 100.0, 0.05, 0.0, 0.2
    mats = np.array([0.5, 1.0])
    strikes = np.tile(np.array([80.0, 90.0, 100.0, 110.0, 120.0]), (2, 1))
    surf = fit_svi_surface(S0, r, q, mats, strikes, np.full_like(strikes, sigma))
    lv = dupire_local_vol(surf, S0, r, q)
    sim = SimConfig(n_paths=32768, n_steps=50, antithetic=True)
    S = simulate_local_vol(jax.random.key(3), S0, r, q, lv, 1.0, sim)
    knocked = jnp.ones(S.shape, dtype=bool)
    res = backward_induction(
        S, knocked, r, 1.0 / 50, lambda s: intrinsic_value(s, 100.0, "put"),
        RegressionSpec(degree=4), american=True)
    crr = float(crr_price(S0, 100.0, 1.0, r, sigma, 2000,
                          option_type="put", american=True))
    assert abs(float(res.price) - crr) < 0.1, (float(res.price), crr)


def _write_flat_quotes(tmp_path, sigma=0.2, s0=100.0, r=0.03, q=0.0,
                       kind="iv"):
    import numpy as np
    from amcx.oracle import bs_price

    path = tmp_path / "quotes.csv"
    lines = ["T,K,value"]
    for T in (0.5, 1.0):
        for K in (85.0, 95.0, 100.0, 105.0, 115.0):
            if kind == "iv":
                v = sigma
            else:
                v = float(bs_price(s0, K, T, r, sigma, q, "call"))
            lines.append(f"{T},{K},{v}")
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_cli_calibrate_svi_and_price(tmp_path, capsys):
    import json as _json

    from amcx.cli import main

    quotes = _write_flat_quotes(tmp_path)
    main(["calibrate", "--quotes", quotes, "--model", "svi", "--price",
          "--paths", "16384", "--steps", "20", "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["max_iv_err"] < 1e-4
    assert len(payload["slices"]) == 2
    # flat 20%-vol market: Dupire collapses to BS → CRR American anchor
    from amcx.oracle import crr_price

    crr = float(crr_price(100.0, 100.0, 1.0, 0.03, 0.2, 2000,
                          option_type="put", american=True))
    assert abs(payload["price"] - crr) < 0.2, (payload["price"], crr)


def test_cli_calibrate_heston_prices(tmp_path, capsys):
    import json as _json

    import numpy as np

    from amcx.cli import main
    from amcx.dynamics import HestonParams, heston_price_cf

    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.5, theta=0.04,
                      xi=0.4, rho=-0.6)
    path = tmp_path / "hq.csv"
    lines = []
    for T in (0.5, 1.0):
        for K in (90.0, 100.0, 110.0):
            lines.append(f"{T},{K},{heston_price_cf(hp, K, T, 'call')}")
    path.write_text("\n".join(lines) + "\n")
    main(["calibrate", "--quotes", str(path), "--model", "heston",
          "--quote-kind", "price", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["max_price_err"] < 2e-3
    assert abs(payload["params"]["v0"] - 0.04) < 0.01


def test_single_slice_surface_and_dupire():
    # one maturity: proportional-in-T variance everywhere, constant sigma
    surf = SVISurface(np.array([1.0]),
                      np.array([[0.04, 0.0, 0.0, 0.0, 0.1]]))
    for t in (0.2, 1.0, 1.7):
        w, dwdt = surf.total_variance(jnp.asarray(0.05), jnp.asarray(t))
        assert abs(float(w) - 0.04 * t) < 1e-7
        assert abs(float(dwdt) - 0.04) < 1e-7
    lv = dupire_local_vol(surf, 100.0, 0.03, 0.0)
    got = jax.vmap(lambda s: lv(0.5, s))(jnp.array([80.0, 100.0, 120.0]))
    np.testing.assert_allclose(np.asarray(got), 0.2, atol=2e-4)


def test_calibrated_local_vol_mega_engine():
    # the univariate one-kernel engine consumes any Markov path matrix —
    # calibrated Dupire dynamics run at mega speed, matching the XLA engine
    from amcx.dynamics import price_option_local_vol

    mats = np.array([0.5, 1.0])
    Ks = np.tile(np.array([85.0, 95.0, 100.0, 105.0, 115.0]), (2, 1))
    surf = fit_svi_surface(100.0, 0.05, 0.0, mats, Ks, np.full_like(Ks, 0.2))
    lv = dupire_local_vol(surf, 100.0, 0.05, 0.0)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    sim = SimConfig(n_paths=16_384, n_steps=16, antithetic=True)
    r_x = price_option_local_vol(jax.random.key(5), 100.0, 0.05, 0.0, lv,
                                 prod, RegressionSpec(degree=4), sim)
    r_m = price_option_local_vol(jax.random.key(5), 100.0, 0.05, 0.0, lv,
                                 prod, RegressionSpec(degree=4), sim,
                                 engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 0.02, (
        float(r_x.price), float(r_m.price))
