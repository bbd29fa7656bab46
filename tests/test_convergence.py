"""Convergence studies (C15) behave like the reference scripts
(`american_monte_carlo_additional_plots.py`)."""

import jax
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec
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
