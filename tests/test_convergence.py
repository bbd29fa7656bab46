"""Convergence studies (C15) behave like the reference scripts
(`american_monte_carlo_additional_plots.py`)."""

import jax
import numpy as np
import pytest

from amcx import (MarketParams, ProductSpec, RegressionSpec, SimConfig,
                  lsmc_option_pricing, simulate_gbm)
import amcx.convergence as cv
from amcx.convergence import error_heatmap, price_vs_degree, price_vs_paths, price_vs_steps

M = MarketParams(100.0, 0.05, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")


def test_price_vs_paths_converges():
    res = price_vs_paths(jax.random.key(0), M, PROD, [1_000, 8_000, 64_000], n_steps=25)
    assert res.prices.shape == (3,)
    # errors shrink (loose: last better than first)
    errs = np.abs(res.prices - res.benchmark)
    assert errs[-1] < errs[0] + 0.1
    assert abs(res.prices[-1] - res.benchmark) < 0.15


def test_price_vs_steps_shapes_and_benchmark():
    res = price_vs_steps(jax.random.key(1), M, PROD, [5, 10, 25], n_paths=20_000)
    assert res.prices.shape == (3,)
    assert res.benchmark > 0
    # high-res benchmark: oracle at 10x max steps
    assert np.all(np.isfinite(res.prices))


def test_error_heatmap_argmin():
    res = error_heatmap(
        jax.random.key(2), M, PROD, [2_000, 16_000], [5, 25],
    )
    assert res.prices.shape == (2, 2)
    assert res.extra["min_n_paths"] in (2_000, 16_000)
    assert res.extra["min_n_steps"] in (5, 25)
    assert res.extra["min_error"] == res.prices.min()


def test_price_vs_degree_shared_paths():
    out = price_vs_degree(jax.random.key(3), M, PROD, max_degree=4,
                          bases=("chebyshev", "power"), n_paths=5_000, n_steps=25)
    assert set(out) == {"chebyshev", "power"}
    for res in out.values():
        assert res.x.tolist() == [0, 1, 2, 3, 4]
        # degree-0 fit (constant continuation) prices differently from deg 4
        assert np.all(np.isfinite(res.prices))
    # same shared paths: degree-0 price identical across bases (constant fit)
    np.testing.assert_allclose(out["chebyshev"].prices[0], out["power"].prices[0], atol=1e-4)


def test_batched_path_sweep_matches_masked_semantics():
    """The batched sweep's masked pricing must equal a plain run at the full
    path count (mask all-ones case), and errors must broadly shrink with
    more paths."""
    from amcx.convergence import _sweep_paths_batched

    m = MarketParams(100.0, 0.01, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=3)
    rng = (500, 2000, 8000)
    prices = np.asarray(_sweep_paths_batched(jax.random.key(3), m, prod, spec, rng, 12))
    assert prices.shape == (3,)
    # full-count cell == unmasked pipeline on the same key/shapes
    paths = simulate_gbm(jax.random.key(3), m, 1.0, SimConfig(n_paths=8000, n_steps=12))
    full = lsmc_option_pricing(paths, prod, m.r, spec, return_surface=False)
    np.testing.assert_allclose(prices[2], float(full.price), atol=2e-4)
    assert np.all(np.isfinite(prices))


def test_error_heatmap_batched_equals_structure():
    m = MarketParams(100.0, 0.01, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    res = cv.error_heatmap(jax.random.key(0), m, prod, (1000, 4000), (5, 10),
                           RegressionSpec(degree=3))
    assert res.prices.shape == (2, 2)
    assert res.extra["min_n_paths"] in (1000, 4000)
