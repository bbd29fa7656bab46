"""GBM path simulation, TPU-native.

Replaces `generate_asset_paths` (`/root/reference/american_monte_carlo.py:
72-81`): the reference draws one ``(n_paths, n_steps)`` block from NumPy's
global MT19937 and cumprods exact-GBM increments. Here:

- RNG is counter-based (`jax.random`, threefry) — every path is a pure
  function of ``(key, index)``, which is also the recovery/determinism story
  (SURVEY §5, Q8: values differ from MT19937; equivalence is statistical).
- The cumulative product is done in log-space (``cumsum`` of log-increments,
  then one ``exp``) — same exact-GBM distribution, better f32 numerics.
- Layout is **time-major** ``(n_steps+1, n_paths)``: the backward-induction
  ``lax.scan`` consumes one contiguous HBM row per step instead of a strided
  column. `to_path_major` converts to the reference's layout.
- Antithetic variates (BASELINE config 3): the second half of the path axis
  uses the negated normals of the first half.

The Pallas kernel variant (on-device RNG + in-kernel cumsum, no HBM round
trip for the normals) lives in `amcx.ops.gbm_pallas` and is selected with
``SimConfig.backend="pallas"``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .types import MarketParams, SimConfig

__all__ = [
    "simulate_gbm",
    "simulate_gbm_multi",
    "to_path_major",
    "brownian_normals",
    "gbm_standardization",
]


def to_path_major(paths_tm: jnp.ndarray) -> jnp.ndarray:
    """(n_steps+1, n_paths, ...) -> (n_paths, n_steps+1, ...) reference layout."""
    return jnp.swapaxes(paths_tm, 0, 1)


def gbm_standardization(market, T, n_steps: int, dtype=jnp.float32):
    """Closed-form per-step standardization statistics for GBM spot paths:
    ``(mean_t, 1/std_t)`` with ``E[S_t] = S0 e^{(r−q)t}`` and
    ``Var[S_t] = S0² e^{2(r−q)t}(e^{σ²t} − 1)``.

    Standardizing the regressor is pure numerical conditioning — any affine
    map yields identical fitted values in exact arithmetic — so for the
    simulate→price pipeline the analytic moments replace the XLA
    data-statistics pass (which costs several full sweeps over the path
    array: ~5.8 ms of the 1M×100 pricing before this existed). At t=0 the
    variance is 0; the clamped 1/std then multiplies an exactly-zero
    deviation, matching the data-statistics behaviour (SURVEY Q3).
    """
    t = jnp.arange(n_steps + 1, dtype=dtype) * (jnp.asarray(T, dtype) / n_steps)
    growth = jnp.exp((market.r - market.q) * t)
    mean = market.S0 * growth
    var = (market.S0 * growth) ** 2 * jnp.expm1(market.sigma**2 * t)
    return mean, 1.0 / jnp.maximum(jnp.sqrt(var), 1e-6)


def brownian_normals(key: jax.Array, n_steps: int, n_paths: int, dtype, antithetic: bool):
    """Standard-normal increments, time-major ``(n_steps, n_paths)``."""
    if antithetic:
        half = jax.random.normal(key, (n_steps, n_paths // 2), dtype=dtype)
        return jnp.concatenate([half, -half], axis=1)
    return jax.random.normal(key, (n_steps, n_paths), dtype=dtype)


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "dtype", "antithetic"))
def _simulate_gbm_xla(key, S0, r, sigma, q, T, n_steps, n_paths, dtype, antithetic):
    dt = T / n_steps
    Z = brownian_normals(key, n_steps, n_paths, dtype, antithetic)
    drift = (r - q - 0.5 * sigma**2) * dt
    log_inc = drift + sigma * jnp.sqrt(dt) * Z  # (n_steps, n_paths)
    log_rel = jnp.cumsum(log_inc, axis=0)
    log_rel = jnp.concatenate([jnp.zeros((1, n_paths), dtype=dtype), log_rel], axis=0)
    return S0 * jnp.exp(log_rel)  # (n_steps+1, n_paths)


def simulate_gbm(
    key: jax.Array,
    market: MarketParams,
    T,
    sim: SimConfig,
) -> jnp.ndarray:
    """Simulate GBM paths; returns time-major ``(n_steps+1, n_paths)``.

    Exact-GBM marginals identical to `generate_asset_paths`
    (`american_monte_carlo.py:72-81`); see module docstring for the
    layout/RNG differences.
    """
    if sim.backend == "pallas":
        from .ops.gbm_pallas import simulate_gbm_pallas

        return simulate_gbm_pallas(key, market, T, sim)
    dtype = sim.jnp_dtype
    return _simulate_gbm_xla(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        jnp.asarray(T, dtype),
        sim.n_steps,
        sim.n_paths,
        dtype,
        sim.antithetic,
    )


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "dtype", "antithetic"))
def _simulate_gbm_multi_xla(key, S0, r, sigma, q, corr_chol, T, n_steps, n_paths, dtype, antithetic):
    n_assets = S0.shape[0]
    if antithetic:
        half = jax.random.normal(key, (n_steps, n_paths // 2, n_assets), dtype=dtype)
        Z = jnp.concatenate([half, -half], axis=1)
    else:
        Z = jax.random.normal(key, (n_steps, n_paths, n_assets), dtype=dtype)
    # Correlate: W = Z @ Lᵀ so cov(W) = L Lᵀ = corr.
    W = jnp.einsum("tpa,ba->tpb", Z, corr_chol)
    dt = T / n_steps
    drift = (r - q - 0.5 * sigma**2) * dt  # (n_assets,)
    log_inc = drift[None, None, :] + (sigma * jnp.sqrt(dt))[None, None, :] * W
    log_rel = jnp.cumsum(log_inc, axis=0)
    log_rel = jnp.concatenate(
        [jnp.zeros((1, n_paths, n_assets), dtype=dtype), log_rel], axis=0
    )
    return S0[None, None, :] * jnp.exp(log_rel)


def simulate_gbm_multi(
    key: jax.Array,
    S0,
    r,
    sigma,
    T,
    sim: SimConfig,
    q=None,
    corr: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Correlated multi-asset GBM, time-major ``(n_steps+1, n_paths, n_assets)``.

    For the Bermudan max-call family (BASELINE config 5). ``corr`` is the
    asset correlation matrix (identity if None); per-asset vectors for
    S0/r/sigma/q broadcast from scalars.
    """
    dtype = sim.jnp_dtype
    S0 = jnp.atleast_1d(jnp.asarray(S0, dtype))
    n_assets = S0.shape[0]

    def vec(x):
        return jnp.broadcast_to(jnp.asarray(x, dtype), (n_assets,))

    if corr is None:
        chol = jnp.eye(n_assets, dtype=dtype)
    else:
        chol = jnp.linalg.cholesky(jnp.asarray(corr, dtype))
    return _simulate_gbm_multi_xla(
        key,
        S0,
        vec(r),
        vec(sigma),
        vec(0.0 if q is None else q),
        chol,
        jnp.asarray(T, dtype),
        sim.n_steps,
        sim.n_paths,
        dtype,
        sim.antithetic,
    )
