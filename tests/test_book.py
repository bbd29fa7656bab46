"""Batched strike-grid pricing (one jit over the book)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    lsmc_option_pricing,
    simulate_gbm,
)
from amcx.book import price_strike_grid

M = MarketParams(100.0, 0.03, 0.2)
SPEC = RegressionSpec(degree=4)


@pytest.fixture(scope="module")
def paths():
    return simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=32_768, n_steps=20))


def test_matches_individual_pricing(paths):
    strikes = [90.0, 100.0, 110.0]
    book = price_strike_grid(paths, jnp.asarray(strikes), M.r, 1.0,
                             option_type="put", american=True, spec=SPEC)
    for i, K in enumerate(strikes):
        prod = ProductSpec(K=K, T=1.0, option_type="put", exercise="american")
        single = lsmc_option_pricing(paths, prod, M.r, SPEC, return_surface=False)
        np.testing.assert_allclose(float(book.prices[i]), float(single.price), rtol=1e-4)


def test_monotone_in_strike(paths):
    strikes = jnp.linspace(80.0, 120.0, 9)
    put_book = price_strike_grid(paths, strikes, M.r, 1.0, option_type="put",
                                 american=True, spec=SPEC)
    call_book = price_strike_grid(paths, strikes, M.r, 1.0, option_type="call",
                                  american=True, spec=SPEC)
    p = np.asarray(put_book.prices)
    c = np.asarray(call_book.prices)
    assert (np.diff(p) > -1e-4).all()   # puts increase in K
    assert (np.diff(c) < 1e-4).all()    # calls decrease in K
    # convexity in strike (no-arbitrage) up to MC noise
    assert (np.diff(p, 2) > -0.05).all()


def test_book_shapes(paths):
    book = price_strike_grid(paths, jnp.asarray([95.0, 105.0]), M.r, 1.0, spec=SPEC)
    assert book.prices.shape == (2,)
    assert book.cashflows.shape == (2, 32_768)
    assert book.exercise_times.shape == (2, 32_768)
