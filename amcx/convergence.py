"""Convergence studies (reference C15).

Computational equivalents of the plotting-scripts layer
(`/root/reference/american_monte_carlo_additional_plots.py:22-171`), split
into *compute* (here, returns arrays — batched/jitted where profitable) and
*render* (`amcx.plots`). Four studies:

- price vs number of paths         (`:22-52`)
- price vs number of time steps    (`:55-86`, oracle at 10× resolution)
- |error| heatmap over (paths × steps) grid with argmin (`:89-135`)
- price vs basis degree for several families on SHARED paths (`:138-171`)

Each cell re-runs the full simulate→price stack — embarrassingly parallel
across configs (SURVEY §3.4). Static shapes per cell mean one XLA program
per (n_paths, n_steps); fresh threefry subkeys replace the reference's
sequential global-RNG draws.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import numpy as np

from .engine import lsmc_option_pricing
from .oracle import oracle_price
from .paths import simulate_gbm
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = [
    "ConvergenceResult",
    "price_vs_paths",
    "price_vs_steps",
    "error_heatmap",
    "price_vs_degree",
]


class ConvergenceResult(NamedTuple):
    x: np.ndarray          # swept values (or (paths, steps) grids)
    prices: np.ndarray     # LSMC prices (or |error| matrix)
    benchmark: float       # oracle price
    extra: dict


def _price_once(key, market, product, spec, n_paths, n_steps):
    sim = SimConfig(n_paths=int(n_paths), n_steps=int(n_steps))
    paths = simulate_gbm(key, market, product.T, sim)
    return lsmc_option_pricing(paths, product, market.r, spec, return_surface=False).price


def price_vs_paths(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    path_range: Sequence[int],
    n_steps: int = 100,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=4),
    oracle_steps: int | None = None,
) -> ConvergenceResult:
    """LSMC price convergence in the number of paths
    (`additional_plots.py:22-52`); benchmark = oracle at the same step
    count (matching the reference's engine choice)."""
    bench = float(
        oracle_price(
            market.S0, product.K, product.T, market.r, market.sigma,
            n_steps=oracle_steps or n_steps, q=market.q,
            option_type=product.option_type, exercise=product.exercise,
            barrier=product.barrier,
        )
    )
    prices = []
    for i, n_paths in enumerate(path_range):
        prices.append(
            float(_price_once(jax.random.fold_in(key, i), market, product, spec, n_paths, n_steps))
        )
    return ConvergenceResult(np.asarray(path_range), np.asarray(prices), bench, {})


def price_vs_steps(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    step_range: Sequence[int],
    n_paths: int = 10_000,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=4),
) -> ConvergenceResult:
    """Convergence in time steps; the benchmark oracle uses a 10×-resolution
    grid, like `additional_plots.py:59-63`."""
    high_res = max(step_range) * 10
    bench = float(
        oracle_price(
            market.S0, product.K, product.T, market.r, market.sigma,
            n_steps=high_res, q=market.q,
            option_type=product.option_type, exercise=product.exercise,
            barrier=product.barrier,
        )
    )
    prices = []
    for i, n_steps in enumerate(step_range):
        prices.append(
            float(_price_once(jax.random.fold_in(key, i), market, product, spec, n_paths, n_steps))
        )
    return ConvergenceResult(np.asarray(step_range), np.asarray(prices), bench, {})


def error_heatmap(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    path_range: Sequence[int],
    step_range: Sequence[int],
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=4),
) -> ConvergenceResult:
    """|LSMC − oracle| over the (paths × steps) grid with the argmin cell
    (`additional_plots.py:89-135`). Fresh paths per cell, like the
    reference (:103)."""
    high_res = max(step_range) * 10
    bench = float(
        oracle_price(
            market.S0, product.K, product.T, market.r, market.sigma,
            n_steps=high_res, q=market.q,
            option_type=product.option_type, exercise=product.exercise,
            barrier=product.barrier,
        )
    )
    err = np.zeros((len(path_range), len(step_range)))
    c = 0
    for i, n_paths in enumerate(path_range):
        for j, n_steps in enumerate(step_range):
            p = float(
                _price_once(jax.random.fold_in(key, c), market, product, spec, n_paths, n_steps)
            )
            err[i, j] = abs(p - bench)
            c += 1
    imin = np.unravel_index(np.argmin(err), err.shape)
    extra = {
        "min_error": float(err[imin]),
        "min_n_paths": int(path_range[imin[0]]),
        "min_n_steps": int(step_range[imin[1]]),
    }
    return ConvergenceResult(
        np.asarray(path_range), err, bench, {**extra, "step_range": np.asarray(step_range)}
    )


def price_vs_degree(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    max_degree: int = 10,
    bases: Sequence[str] = ("chebyshev", "power", "legendre"),
    n_paths: int = 5_000,
    n_steps: int = 100,
) -> Dict[str, ConvergenceResult]:
    """Price vs basis degree for several families on one shared path set
    (`additional_plots.py:138-171`, shared paths at :144)."""
    bench = float(
        oracle_price(
            market.S0, product.K, product.T, market.r, market.sigma,
            n_steps=n_steps, q=market.q,
            option_type=product.option_type, exercise=product.exercise,
            barrier=product.barrier,
        )
    )
    sim = SimConfig(n_paths=n_paths, n_steps=n_steps)
    paths = simulate_gbm(key, market, product.T, sim)
    out = {}
    degrees = list(range(0, max_degree + 1))
    for basis in bases:
        prices = []
        for d in degrees:
            spec = RegressionSpec(basis=basis, degree=d)
            prices.append(
                float(lsmc_option_pricing(paths, product, market.r, spec, False).price)
            )
        out[basis] = ConvergenceResult(np.asarray(degrees), np.asarray(prices), bench, {})
    return out
