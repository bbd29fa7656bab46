"""Finite-difference (PDE) engine gates.

A third independent pricing methodology (Crank-Nicolson + PCR tridiagonal
solves + Ikonen-Toivanen splitting) cross-checked against the closed-form
and lattice oracles the reference validated with
(`/root/reference/american_monte_carlo.py:30-68` role parity) and against
the term-structure lattice. Grids are kept at 512x128 to bound CPU cost;
the accuracy at the default 1024x256 grid is characterized in
docs/PARITY.md.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    PDEGrid,
    ProductSpec,
    pde_greeks,
    pde_price,
    pde_price_ladder,
    tridiag_solve,
)
from amcx.oracle import bs_greeks, bs_price, crr_price
from amcx.term import crr_price_curves

GRID = PDEGrid(n_space=512, n_steps=128)
M = MarketParams(95.0, 0.01, 0.2)
PUT_AM = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
PUT_EU = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")


def test_tridiag_solve_matches_dense():
    rng = np.random.default_rng(7)
    for n in (16, 37, 128):  # non-power-of-two included
        a = rng.normal(size=n)
        c = rng.normal(size=n)
        b = 4.0 + np.abs(a) + np.abs(c) + rng.random(n)
        d = rng.normal(size=(3, n))
        dense = np.diag(b) + np.diag(a[1:], -1) + np.diag(c[:-1], 1)
        ref = np.linalg.solve(dense, d.T).T
        got = np.asarray(tridiag_solve(a, b, c, d))
        assert np.abs(got - ref).max() < 1e-5


def test_european_put_matches_bs():
    res = pde_price(M, PUT_EU, GRID)
    ref = bs_price(95.0, 100.0, 1.0, 0.01, 0.2, 0.0, "put")
    assert abs(float(res.price) - float(ref)) < 1.5e-3


def test_european_call_matches_bs():
    m = MarketParams(100.0, 0.05, 0.25)
    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="european")
    res = pde_price(m, prod, GRID)
    ref = bs_price(100.0, 100.0, 1.0, 0.05, 0.25, 0.0, "call")
    assert abs(float(res.price) - float(ref)) < 2e-3


def test_american_put_matches_crr():
    res = pde_price(M, PUT_AM, GRID)
    ref = crr_price(95.0, 100.0, 1.0, 0.01, 0.2, 2000, option_type="put", american=True)
    assert abs(float(res.price) - float(ref)) < 2.5e-3


def test_american_call_with_dividends_matches_crr():
    m = MarketParams(100.0, 0.05, 0.25, q=0.04)
    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american")
    res = pde_price(m, prod, GRID)
    ref = crr_price(100.0, 100.0, 1.0, 0.05, 0.25, 2000, q=0.04,
                    option_type="call", american=True)
    assert abs(float(res.price) - float(ref)) < 5e-3


def test_american_call_no_dividends_equals_european():
    # Never optimal to exercise early: American == European (BS).
    m = MarketParams(100.0, 0.05, 0.25)
    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american")
    res = pde_price(m, prod, GRID)
    ref = bs_price(100.0, 100.0, 1.0, 0.05, 0.25, 0.0, "call")
    assert abs(float(res.price) - float(ref)) < 2.5e-3


def test_bermudan_between_european_and_american():
    quarterly = jnp.array([31, 63, 95, 127])
    berm = pde_price(M, PUT_AM, GRID, exercise_steps=quarterly)
    euro = pde_price(M, PUT_EU, GRID)
    amer = pde_price(M, PUT_AM, GRID)
    assert float(euro.price) - 2e-4 <= float(berm.price) <= float(amer.price) + 2e-4
    # Quarterly exercise should recover most of the early-exercise premium.
    assert float(berm.price) - float(euro.price) > 0.3 * (
        float(amer.price) - float(euro.price)
    )


def test_strike_ladder_matches_per_strike_crr():
    strikes = jnp.array([80.0, 90.0, 100.0, 110.0, 120.0])
    lad = np.asarray(pde_price_ladder(M, PUT_AM, strikes, GRID))
    for k, p in zip(np.asarray(strikes), lad):
        ref = float(crr_price(95.0, float(k), 1.0, 0.01, 0.2, 2000,
                              option_type="put", american=True))
        assert abs(p - ref) < 3e-3, (k, p, ref)


def test_term_structure_matches_lattice():
    n = GRID.n_steps
    r_t = jnp.where(jnp.arange(n) < n // 2, 0.05, 0.01).astype(jnp.float32)
    res = pde_price(M, PUT_AM, GRID, r_t=r_t)
    ref = crr_price_curves(
        95.0, 100.0, 1.0,
        np.where(np.arange(100) < 50, 0.05, 0.01), 0.2,
        n_sub=20, option_type="put", american=True,
    )
    assert abs(float(res.price) - float(ref)) < 3e-3


def test_grid_greeks_match_bs_european():
    res = pde_price(M, PUT_EU, GRID)
    g = bs_greeks(95.0, 100.0, 1.0, 0.01, 0.2, 0.0, "put")
    assert abs(float(res.delta) - float(g["delta"])) < 2e-3
    assert float(res.gamma) > 0.0
    assert float(res.theta) < 0.0  # long option decays


def test_autodiff_vega_rho_match_bs_european():
    g = pde_greeks(M, PUT_EU, GRID)
    ref = bs_greeks(95.0, 100.0, 1.0, 0.01, 0.2, 0.0, "put")
    assert abs(float(g["vega"]) - float(ref["vega"])) / float(ref["vega"]) < 0.01
    assert abs(float(g["rho"]) - float(ref["rho"])) / abs(float(ref["rho"])) < 0.01


def test_autodiff_greeks_american_sane():
    g = pde_greeks(M, PUT_AM, GRID)
    assert float(g["vega"]) > 0.0
    assert float(g["rho"]) < 0.0  # put rho negative
    # American delta steeper (more ITM exercise region) than European's
    assert float(g["delta"]) < -0.5


@pytest.mark.parametrize("n_space,n_steps", [(256, 64), (512, 128)])
def test_refinement_reduces_european_error(n_space, n_steps):
    # O(dx^2 + dt^2): halving both should not worsen the error materially.
    res = pde_price(M, PUT_EU, PDEGrid(n_space=n_space, n_steps=n_steps))
    ref = bs_price(95.0, 100.0, 1.0, 0.01, 0.2, 0.0, "put")
    assert abs(float(res.price) - float(ref)) < 6e-3 if n_space == 256 else 1.5e-3
