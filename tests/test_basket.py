"""Basket options: exact geometric oracle, degenerate limits, engine parity.

Validation methodology mirrors the reference's oracle-anchored tests
(`unit_test.py:21`) with the self-hosted closed forms of
`amcx.models.basket`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, price_option
from amcx.models.basket import (basket_level, geometric_basket_price,
                                price_basket_option)
from amcx.oracle import bs_price, crr_price

CORR = np.array([[1.0, 0.3, 0.3],
                 [0.3, 1.0, 0.3],
                 [0.3, 0.3, 1.0]])
S0 = [100.0, 95.0, 105.0]
W = [1 / 3, 1 / 3, 1 / 3]
SPEC = RegressionSpec(basis="chebyshev", degree=2)
SIM = SimConfig(n_paths=65_536, n_steps=20, antithetic=True)


def test_geometric_basket_oracle_single_asset_limit():
    # one asset: geometric basket == vanilla Black-Scholes
    got = geometric_basket_price([100.0], [1.0], 95.0, 1.0, 0.05, 0.2,
                                 option_type="call")
    # bs_price runs on-device in f32; the oracle is host f64
    ref = float(bs_price(100.0, 95.0, 1.0, 0.05, 0.2, 0.0, "call"))
    assert abs(got - ref) < 5e-5


def test_geometric_european_matches_closed_form():
    res = price_basket_option(jax.random.key(0), S0, W, 100.0, 1.0, 0.05,
                              0.25, corr=CORR, option_type="call",
                              exercise="european", averaging="geo",
                              spec=SPEC, sim=SIM)
    ref = geometric_basket_price(S0, W, 100.0, 1.0, 0.05, 0.25, corr=CORR,
                                 option_type="call")
    assert abs(float(res.price) - ref) < 3.5 * float(res.stderr) + 0.01, (
        float(res.price), ref)


def test_arithmetic_dominates_geometric_same_paths():
    # AM-GM: Σw S ≥ Π S^w pathwise → call price ordering on shared key
    arith = price_basket_option(jax.random.key(1), S0, W, 100.0, 1.0, 0.05,
                                0.25, corr=CORR, option_type="call",
                                exercise="european", averaging="arith",
                                spec=SPEC, sim=SIM)
    geo = price_basket_option(jax.random.key(1), S0, W, 100.0, 1.0, 0.05,
                              0.25, corr=CORR, option_type="call",
                              exercise="european", averaging="geo",
                              spec=SPEC, sim=SIM)
    assert float(arith.price) >= float(geo.price)


def test_identical_assets_full_corr_is_single_asset():
    # corr → 1 with identical assets: every basket IS the single asset
    # (0.9999 off-diagonal — exactly 1 is singular and Cholesky NaNs)
    ones = np.full((3, 3), 0.9999) + 0.0001 * np.eye(3)
    res = price_basket_option(jax.random.key(2), [100.0] * 3, W, 100.0, 1.0,
                              0.05, 0.2, corr=ones, option_type="put",
                              exercise="american", averaging="arith",
                              spec=RegressionSpec(basis="chebyshev", degree=4),
                              sim=SIM)
    crr = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000,
                          option_type="put", american=True))
    assert abs(float(res.price) - crr) < 3.5 * float(res.stderr) + 0.05, (
        float(res.price), crr)


def test_degenerate_weights_select_single_asset():
    res = price_basket_option(jax.random.key(3), S0, [1.0, 0.0, 0.0], 100.0,
                              1.0, 0.05, 0.2, corr=CORR, option_type="put",
                              exercise="european", averaging="arith",
                              spec=SPEC, sim=SIM)
    ref = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 0.0, "put"))
    assert abs(float(res.price) - ref) < 3.5 * float(res.stderr) + 0.01


def test_american_geq_european():
    eu = price_basket_option(jax.random.key(4), S0, W, 105.0, 1.0, 0.05,
                             0.25, corr=CORR, option_type="put",
                             exercise="european", averaging="arith",
                             spec=SPEC, sim=SIM)
    am = price_basket_option(jax.random.key(4), S0, W, 105.0, 1.0, 0.05,
                             0.25, corr=CORR, option_type="put",
                             exercise="american", averaging="arith",
                             spec=SPEC, sim=SIM)
    assert float(am.price) >= float(eu.price) - 2.0 * float(eu.stderr)


def test_fused_engine_matches_xla():
    # same paths, same regression family → engines agree to policy noise
    sim = SimConfig(n_paths=32_768, n_steps=10, antithetic=True)
    kw = dict(corr=CORR, option_type="put", exercise="american",
              averaging="arith", spec=SPEC, sim=sim)
    res_x = price_basket_option(jax.random.key(5), S0, W, 105.0, 1.0, 0.05,
                                0.25, engine="xla", **kw)
    res_f = price_basket_option(jax.random.key(5), S0, W, 105.0, 1.0, 0.05,
                                0.25, engine="fused", **kw)
    assert abs(float(res_x.price) - float(res_f.price)) < 0.03, (
        float(res_x.price), float(res_f.price))


def test_fused_geobasket_runs_and_bounds_european():
    sim = SimConfig(n_paths=32_768, n_steps=10, antithetic=True)
    res = price_basket_option(jax.random.key(6), S0, W, 100.0, 1.0, 0.05,
                              0.25, corr=CORR, option_type="put",
                              exercise="american", averaging="geo",
                              spec=SPEC, sim=sim, engine="fused")
    eu = geometric_basket_price(S0, W, 100.0, 1.0, 0.05, 0.25, corr=CORR,
                                option_type="put")
    assert float(res.price) >= eu - 3.5 * float(res.stderr)


def test_basket_validation_errors():
    with pytest.raises(ValueError, match="sum to 1"):
        price_basket_option(jax.random.key(0), S0, [0.5, 0.5, 0.5], 100.0,
                            1.0, 0.05, 0.2, sim=SIM)
    with pytest.raises(ValueError, match="averaging"):
        price_basket_option(jax.random.key(0), S0, W, 100.0, 1.0, 0.05, 0.2,
                            averaging="harmonic", sim=SIM)
    with pytest.raises(ValueError, match="American"):
        price_basket_option(jax.random.key(0), S0, W, 100.0, 1.0, 0.05, 0.2,
                            corr=CORR, engine="fused", exercise="european",
                            sim=SimConfig(n_paths=8192, n_steps=4))


def test_basket_level_shapes():
    S = jnp.ones((5, 7, 3)) * jnp.asarray([1.0, 2.0, 4.0])
    arith = basket_level(S, [1 / 3, 1 / 3, 1 / 3], "arith")
    geo = basket_level(S, [1 / 3, 1 / 3, 1 / 3], "geo")
    assert arith.shape == (5, 7) and geo.shape == (5, 7)
    np.testing.assert_allclose(np.asarray(arith), 7.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(geo), 2.0, rtol=1e-6)


def test_cli_basket_geo_european(capsys):
    import json as _json

    from amcx.cli import main

    main(["basket", "--averaging", "geo", "--exercise", "european",
          "--corr", "0.3", "--paths", "16384", "--steps", "10",
          "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["n_assets"] == 3
    assert abs(payload["price"] - payload["oracle"]) < \
        4.0 * max(payload["stderr"], 1e-4) + 0.02


def test_fused_weighted_basket_matches_xla():
    # non-equal weights baked static into the in-register kernel payoff
    sim = SimConfig(n_paths=32_768, n_steps=10, antithetic=True)
    wts = [0.5, 0.3, 0.2]
    kw = dict(corr=CORR, option_type="put", exercise="american",
              averaging="arith", spec=SPEC, sim=sim)
    res_x = price_basket_option(jax.random.key(8), S0, wts, 105.0, 1.0, 0.05,
                                0.25, engine="xla", **kw)
    res_f = price_basket_option(jax.random.key(8), S0, wts, 105.0, 1.0, 0.05,
                                0.25, engine="fused", **kw)
    assert abs(float(res_x.price) - float(res_f.price)) < 0.03, (
        float(res_x.price), float(res_f.price))


def test_basket_greeks_match_closed_form():
    # geometric European: autodiff delta/vega/rho vs FD on the EXACT oracle
    from amcx.models.basket import basket_greeks

    sim = SimConfig(n_paths=65_536, n_steps=20, antithetic=True)
    p, g = basket_greeks(jax.random.key(0), S0, W, 100.0, 1.0, 0.05, 0.25,
                         corr=CORR, option_type="call", exercise="european",
                         averaging="geo", sim=sim)

    def oracle(s0_0, sig, r):
        return geometric_basket_price([s0_0, 95.0, 105.0], W, 100.0, 1.0, r,
                                      sig, corr=CORR, option_type="call")

    eps = 0.25
    d0 = (oracle(100.0 + eps, 0.25, 0.05) - oracle(100.0 - eps, 0.25, 0.05)) / (2 * eps)
    v = (oracle(100.0, 0.25 + 1e-3, 0.05) - oracle(100.0, 0.25 - 1e-3, 0.05)) / 2e-3
    rho = (oracle(100.0, 0.25, 0.05 + 1e-3) - oracle(100.0, 0.25, 0.05 - 1e-3)) / 2e-3
    assert abs(float(g["delta"][0]) - d0) < 0.01, (float(g["delta"][0]), d0)
    # per-asset vegas sum ≈ total sigma sensitivity
    assert abs(float(jnp.sum(g["vega"])) - v) < 0.6, (float(jnp.sum(g["vega"])), v)
    assert abs(float(g["rho"]) - rho) < 1.2, (float(g["rho"]), rho)


def test_exchange_option_margrabe_gate():
    # q=0: American exchange == European closed form (no early exercise);
    # the recommended itm/degree-4 spec must reproduce Margrabe
    from amcx.models.basket import margrabe_price, price_exchange_option

    sim = SimConfig(n_paths=65_536, n_steps=20, antithetic=True)
    ref = margrabe_price(100.0, 95.0, 1.0, 0.25, 0.2, rho=0.4)
    spec = RegressionSpec(basis="chebyshev", degree=4, regress_on="itm")
    res = price_exchange_option(jax.random.key(0), 100.0, 95.0, 1.0, 0.05,
                                0.25, 0.2, rho=0.4, spec=spec, sim=sim)
    assert abs(float(res.price) - ref) < 3.5 * float(res.stderr) + 0.01, (
        float(res.price), ref)
    # rate-independence of the exchange payoff (Margrabe): r=12% same price
    res_r = price_exchange_option(jax.random.key(0), 100.0, 95.0, 1.0, 0.12,
                                  0.25, 0.2, rho=0.4, spec=spec, sim=sim)
    assert abs(float(res_r.price) - float(res.price)) < \
        2.0 * float(res.stderr) + 0.02


def test_exchange_option_engines_agree():
    from amcx.models.basket import price_exchange_option

    sim = SimConfig(n_paths=16_384, n_steps=10, antithetic=True)
    spec = RegressionSpec(basis="chebyshev", degree=2)
    ps = [float(price_exchange_option(
        jax.random.key(1), 100.0, 95.0, 1.0, 0.05, 0.25, 0.2, rho=0.4,
        spec=spec, sim=sim, engine=e).price) for e in ("xla", "fused",
                                                       "mega")]
    assert abs(ps[0] - ps[1]) < 5e-3 and abs(ps[1] - ps[2]) < 5e-3, ps


def test_margrabe_degenerate_limits():
    from amcx.models.basket import margrabe_price
    from amcx.oracle import bs_price

    # S2 -> deterministic cash K: margrabe(S1, K e^{-rT}->?): with sigma2=0
    # and q2 = r the second asset IS a bond worth K at T -> vanilla call
    ref = float(bs_price(100.0, 95.0, 1.0, 0.05, 0.25, 0.0, "call"))
    got = margrabe_price(100.0, 95.0 * np.exp(-0.05), 1.0, 0.25, 0.0,
                         rho=0.0, q2=0.0)
    assert abs(got - ref) < 5e-5, (got, ref)
    # identical assets, full correlation: exchange is worthless (the
    # 1e-8 vol floor leaves ~4e-7 of residual value)
    assert margrabe_price(100.0, 100.0, 1.0, 0.2, 0.2, rho=1.0) < 1e-5


def test_exchange_option_itm_spec_engines_agree():
    # the RECOMMENDED itm spec must also be engine-consistent (fused
    # derives itm_weights from spec internally — regression for review #2)
    from amcx.models.basket import price_exchange_option

    sim = SimConfig(n_paths=16_384, n_steps=10, antithetic=True)
    spec = RegressionSpec(basis="chebyshev", degree=4, regress_on="itm")
    ps = [float(price_exchange_option(
        jax.random.key(3), 100.0, 95.0, 1.0, 0.05, 0.25, 0.2, rho=0.4,
        spec=spec, sim=sim, engine=e).price) for e in ("xla", "fused",
                                                       "mega")]
    # fused/mega share the unweighted standardization frame — tight gate;
    # the XLA route standardizes with ITM-weighted stats, so its itm
    # policy differs by legitimate frame noise (~0.014 at 16k paths)
    assert abs(ps[1] - ps[2]) < 5e-3, ps
    assert abs(ps[0] - ps[1]) < 0.05, ps
