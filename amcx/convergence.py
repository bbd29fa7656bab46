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


from functools import partial as _partial  # noqa: E402

import jax.numpy as jnp  # noqa: E402


@_partial(
    jax.jit,
    static_argnames=("spec", "path_range", "n_steps", "option_type",
                     "exercise", "barrier_type"),
)
def _prices_masked_over_paths(key, S0, r, sigma, q, K, T, barrier, spec,
                              path_range, n_steps, option_type, exercise,
                              barrier_type):
    """All path-counts of one sweep column in ONE compiled program.

    Simulates max(path_range) paths once and prices every cell as a
    weight-masked run on the shared array: the regression moments, the
    standardization statistics, and the final mean are all restricted to the
    first n_c paths by a 0/1 weight vector, which is *exactly* the n_c-path
    program (inactive paths never feed back) — so the whole column costs one
    compile + one tunnel sync instead of one per cell (SURVEY §3.4's batched
    sweep; VERDICT r1 weak #8). Cells share the path prefix (common random
    numbers) instead of the reference's fresh draw per cell — statistically
    equivalent, and the monotone-convergence plot is less noisy.
    """
    from .engine import backward_induction
    from .payoff import barrier_gate, payoff_fn_for
    from .regress import fit_continuation

    market = MarketParams(S0, r, sigma, q)
    product = ProductSpec(K=K, T=T, barrier=barrier, option_type=option_type,
                          exercise=exercise, barrier_type=barrier_type)
    N = max(path_range)
    sim = SimConfig(n_paths=int(N), n_steps=int(n_steps))
    paths = simulate_gbm(key, market, product.T, sim)
    knocked = barrier_gate(paths, product.barrier, product.barrier_type)
    dt = product.T / n_steps
    masks = (jnp.arange(N)[None, :] < jnp.asarray(path_range)[:, None]).astype(
        paths.dtype
    )

    def price_one(mask):
        def fit(x, y, spec_, w, ax):
            w2 = mask if w is None else w * mask
            return fit_continuation(x, y, spec_, w2, ax)

        res = backward_induction(
            paths, knocked, market.r, dt, payoff_fn_for(product), spec,
            american=product.is_american, return_surface=False, fit_fn=fit,
        )
        disc = res.cashflows * jnp.exp(-market.r * dt * res.exercise_times)
        return jnp.sum(disc * mask) / jnp.sum(mask)

    # scan, not vmap: batched regression reductions lower to MXU dots on
    # TPU whose conditioning-amplified noise perturbs the fit (round-3 gap
    # study, amcx.book._price_strike_grid_xla) — still ONE compile + one
    # sync for the whole column.
    _, prices = jax.lax.scan(lambda c, m: (c, price_one(m)), 0, masks)
    return prices


def _sweep_paths_batched(key, market, product, spec, path_range, n_steps):
    from .engine import resolve_regression_spec

    # resolve "auto" here (q-less): every cell of the sweep must run the
    # same estimator as the single-pricing route it is compared against
    spec = resolve_regression_spec(spec, product)
    dtype = jnp.float32
    barrier = None if product.barrier is None else jnp.asarray(product.barrier, dtype)
    return _prices_masked_over_paths(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        jnp.asarray(product.K, dtype),
        jnp.asarray(product.T, dtype),
        barrier,
        spec,
        tuple(int(n) for n in path_range),
        int(n_steps),
        product.option_type,
        product.exercise,
        product.barrier_type,
    )


def price_vs_paths(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    path_range: Sequence[int],
    n_steps: int = 100,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=4),
    oracle_steps: int | None = None,
    batched: bool = True,
) -> ConvergenceResult:
    """LSMC price convergence in the number of paths
    (`additional_plots.py:22-52`); benchmark = oracle at the same step
    count (matching the reference's engine choice).

    ``batched=True`` (default) prices the whole sweep in one compiled
    program on a shared path prefix (one tunnel sync; common random numbers
    across cells); ``batched=False`` reproduces the reference's
    fresh-paths-per-cell loop."""
    bench = float(
        oracle_price(
            market.S0, product.K, product.T, market.r, market.sigma,
            n_steps=oracle_steps or n_steps, q=market.q,
            option_type=product.option_type, exercise=product.exercise,
            barrier=product.barrier,
        )
    )
    if batched:
        prices = np.asarray(
            _sweep_paths_batched(key, market, product, spec, path_range, n_steps)
        )
        return ConvergenceResult(np.asarray(path_range), prices, bench, {})
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
    batched: bool = True,
) -> ConvergenceResult:
    """|LSMC − oracle| over the (paths × steps) grid with the argmin cell
    (`additional_plots.py:89-135`).

    ``batched=True`` (default) runs one compiled program per step count with
    the whole path column weight-masked inside (|steps| syncs instead of
    |paths|·|steps|); ``batched=False`` is the reference's
    fresh-paths-per-cell loop (:103)."""
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
    if batched:
        for j, n_steps in enumerate(step_range):
            col = np.asarray(_sweep_paths_batched(
                jax.random.fold_in(key, j), market, product, spec,
                path_range, n_steps,
            ))
            err[:, j] = np.abs(col - bench)
    else:
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
