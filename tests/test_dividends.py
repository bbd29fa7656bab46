"""Discrete cash dividends: MC pathgen vs the CN-PDE jump-condition oracle.

Reference scope: continuous yield only (`american_monte_carlo.py:57`);
this certifies the production cash-dividend model (amcx/dividends.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx.dividends import (DividendSchedule, dividend_step_amounts,
                            price_option_divs, simulate_gbm_divs)
from amcx.pde import PDEGrid, pde_price
from amcx.types import MarketParams, ProductSpec, RegressionSpec, SimConfig

M = MarketParams(100.0, 0.05, 0.2)
DIVS = DividendSchedule([0.3, 0.7], [2.0, 2.0])
SIM = SimConfig(n_paths=131_072, n_steps=50, antithetic=True)
GRID = PDEGrid(n_steps=512, n_space=512)


def _prod(option_type="put", exercise="european", **kw):
    return ProductSpec(K=100.0, T=1.0, option_type=option_type,
                       exercise=exercise, **kw)


def test_forward_matches_dividend_adjusted_parity():
    """E[e^{-rT} S_T] = S0 − Σ D_j e^{-r t_j} (the martingale identity of
    the cash-drop model; both ex-dates land exactly on the 50-step grid)."""
    S = simulate_gbm_divs(jax.random.key(0), M, DIVS, 1.0, SIM)
    f = np.asarray(S[-1], np.float64) * np.exp(-M.r)
    h = SIM.n_paths // 2
    pair = 0.5 * (f[:h] + f[h:])
    want = M.S0 - DIVS.pv(M.r, 1.0)
    se = pair.std() / np.sqrt(h)
    assert abs(pair.mean() - want) < 4 * se, (pair.mean(), want, se)


def test_snap_and_validation():
    row = dividend_step_amounts(DIVS, 1.0, 50)
    assert row[14, 0] == 2.0 and row[34, 0] == 2.0 and row[:, 0].sum() == 4.0
    assert row[:, 1].sum() == 0.0
    # beyond-T dates are ignored; near-zero dates snap to the 1st boundary
    row2 = dividend_step_amounts(DividendSchedule([0.001, 2.0], [1.0, 9.0]),
                                 1.0, 50)
    assert row2[0, 0] == 1.0 and row2[:, 0].sum() == 1.0
    # same-boundary fractions compound
    row3 = dividend_step_amounts(
        DividendSchedule([0.5, 0.5], [0.0, 0.0], [0.1, 0.1]), 1.0, 2)
    np.testing.assert_allclose(row3[0, 1], 1.0 - 0.9 * 0.9)
    with pytest.raises(ValueError, match="positive"):
        DividendSchedule([0.0], [1.0])
    with pytest.raises(ValueError, match="nonnegative"):
        DividendSchedule([0.5], [-1.0])
    with pytest.raises(ValueError, match="fraction"):
        DividendSchedule([0.5], [0.0], [1.5])


def test_proportional_dividends_exact_bs_equivalence():
    """A PURE proportional schedule is exactly lognormal with spot
    S0·Π(1−f_j): the PDE European must land on the Black-Scholes closed
    form, and the MC forward on the shed spot."""
    from amcx.oracle import bs_price

    prop = DividendSchedule([0.25, 0.75], [0.0, 0.0], [0.02, 0.03])
    pe = pde_price(M, _prod(), GRID, dividends=prop)
    want = float(bs_price(100.0 * prop.forward_factor(1.0), 100.0, 1.0,
                          M.r, M.sigma, option_type="put"))
    np.testing.assert_allclose(float(pe.price), want, atol=5e-3)
    S = simulate_gbm_divs(jax.random.key(5), M, prop, 1.0, SIM)
    f = np.asarray(S[-1], np.float64) * np.exp(-M.r)
    h = SIM.n_paths // 2
    pair = 0.5 * (f[:h] + f[h:])
    want_f = M.S0 * prop.forward_factor(1.0)
    assert abs(pair.mean() - want_f) < 4 * pair.std() / np.sqrt(h)


def test_mixed_cash_proportional_forward_identity():
    """E[e^{-rT} S_T] = S0·Π(1−f_j) − Σ D_j e^{-r t_j}·Π_{t_k>t_j}(1−f_k)
    — the general identity `DividendSchedule.pv` implements; MC and PDE
    European agree under the mixed schedule."""
    mixed = DividendSchedule([0.3, 0.7], [2.0, 0.0], [0.0, 0.025])
    S = simulate_gbm_divs(jax.random.key(6), M, mixed, 1.0, SIM)
    f = np.asarray(S[-1], np.float64) * np.exp(-M.r)
    h = SIM.n_paths // 2
    pair = 0.5 * (f[:h] + f[h:])
    want = M.S0 * mixed.forward_factor(1.0) - mixed.pv(M.r, 1.0)
    # the cash leg at 0.3 is shed by the 0.7 fraction: check pv does that
    np.testing.assert_allclose(
        mixed.pv(M.r, 1.0), 2.0 * np.exp(-M.r * 0.3) * (1 - 0.025))
    assert abs(pair.mean() - want) < 4 * pair.std() / np.sqrt(h)
    pe = pde_price(M, _prod(), GRID, dividends=mixed)
    pay = np.maximum(100.0 - np.asarray(S[-1], np.float64), 0.0) * \
        np.exp(-M.r)
    pairp = 0.5 * (pay[:h] + pay[h:])
    se = pairp.std() / np.sqrt(h)
    assert abs(pairp.mean() - float(pe.price)) < 4 * se + 5e-3


def test_european_put_mc_matches_pde():
    pe = pde_price(M, _prod(), GRID, dividends=DIVS)
    res = price_option_divs(jax.random.key(1), M, DIVS, _prod(),
                            RegressionSpec(degree=3), SIM)
    assert abs(float(res.price) - float(pe.price)) < \
        4 * float(res.stderr) + 5e-3, (float(res.price), float(pe.price))


def test_american_call_dividend_premium():
    """Early exercise cum-dividend makes the American call worth MORE —
    impossible at q=0 without discrete dividends (both PDE legs)."""
    big = DividendSchedule([0.5], [8.0])
    pa = pde_price(M, _prod("call", "american"), GRID, dividends=big)
    pe = pde_price(M, _prod("call", "european"), GRID, dividends=big)
    assert float(pa.price) > float(pe.price) + 0.1
    # without dividends the two coincide (q=0 no-early-exercise fact)
    va = pde_price(M, _prod("call", "american"), GRID)
    ve = pde_price(M, _prod("call", "european"), GRID)
    np.testing.assert_allclose(float(va.price), float(ve.price), atol=2e-3)


def test_american_put_mc_vs_pde_and_mega_parity():
    prod = _prod(exercise="american")
    spec = RegressionSpec(degree=4, regress_on="all")
    res = price_option_divs(jax.random.key(2), M, DIVS, prod, spec, SIM)
    pap = pde_price(M, prod, GRID, dividends=DIVS)
    # LSMC policy sits slightly below the PDE truth; bound both sides
    gap = float(res.price) - float(pap.price)
    assert -4 * float(res.stderr) - 0.03 < gap < 4 * float(res.stderr)
    mega = price_option_divs(jax.random.key(2), M, DIVS, prod, spec, SIM,
                             engine="mega")
    assert abs(float(mega.price) - float(res.price)) < max(
        2e-2, 0.5 * float(res.stderr))


def test_zero_dividend_collapse_and_barrier_parity():
    z = pde_price(M, _prod(), PDEGrid(n_steps=256, n_space=256),
                  dividends=DividendSchedule([0.5], [0.0]))
    z0 = pde_price(M, _prod(), PDEGrid(n_steps=256, n_space=256))
    np.testing.assert_allclose(float(z.price), float(z0.price), atol=1e-5)
    # barriers ride the univariate tail: exact European in-out parity
    sim = SimConfig(n_paths=32_768, n_steps=25, antithetic=True)
    key = jax.random.key(3)
    spec = RegressionSpec(degree=3)
    van = price_option_divs(key, M, DIVS, _prod(), spec, sim)
    din = price_option_divs(key, M, DIVS,
                            _prod(barrier=85.0, barrier_type="down-in"),
                            spec, sim)
    dout = price_option_divs(key, M, DIVS,
                             _prod(barrier=85.0, barrier_type="down-out"),
                             spec, sim)
    np.testing.assert_allclose(float(din.price) + float(dout.price),
                               float(van.price), atol=2e-3)


def test_pde_greeks_with_dividends():
    """Autodiff vega/rho survive the interp jump condition; delta reflects
    the forward shed of PV(divs) (FD cross-check on the put delta)."""
    from amcx.pde import pde_greeks

    g = pde_greeks(M, _prod(), GRID, dividends=DIVS)
    assert np.isfinite([float(g[k]) for k in
                        ("price", "delta", "gamma", "theta", "vega",
                         "rho")]).all()
    # put delta in (-1, 0); vega > 0
    assert -1.0 < float(g["delta"]) < 0.0
    assert float(g["vega"]) > 0.0
    # FD check of rho: bump r (re-solves include the div re-discounting)
    eps = 1e-3
    up = pde_price(MarketParams(100.0, 0.05 + eps, 0.2), _prod(), GRID,
                   dividends=DIVS)
    dn = pde_price(MarketParams(100.0, 0.05 - eps, 0.2), _prod(), GRID,
                   dividends=DIVS)
    fd_rho = (float(up.price) - float(dn.price)) / (2 * eps)
    np.testing.assert_allclose(float(g["rho"]), fd_rho, rtol=0.02,
                               atol=0.05)
