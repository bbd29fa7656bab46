"""Fused Pallas engine vs the XLA reference engine: exact parity.

The fused kernels run in Pallas interpreter mode on CPU (no TPU-only
primitives), so full cross-engine parity is testable hermetically. Prices
must match bit-for-bit (identical arithmetic order); surfaces to f32 noise.
"""

import itertools

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
from amcx.engine_pallas import lsmc_option_pricing_fused
from amcx.ops.lsmc_pallas import pack_dim, unpack_moments

M = MarketParams(100.0, 0.01, 0.2)


@pytest.fixture(scope="module")
def paths():
    return simulate_gbm(jax.random.key(42), M, 1.0, SimConfig(n_paths=8192, n_steps=20))


CASES = list(itertools.product(["put", "call"], ["american", "european"], [None, 80.0]))


@pytest.mark.parametrize("ot,ex,barrier", CASES)
def test_fused_price_matches_xla_engine(paths, ot, ex, barrier):
    prod = ProductSpec(K=100.0, T=1.0, barrier=barrier, option_type=ot, exercise=ex)
    spec = RegressionSpec(degree=4)
    a = lsmc_option_pricing(paths, prod, M.r, spec, return_surface=False)
    b = lsmc_option_pricing_fused(paths, prod, M.r, spec, return_surface=False)
    # atol term: the auto-resolved ITM fit on the knocked∧ITM subset (a few
    # hundred of 8k paths for the barrier rows) has an ill-conditioned
    # weighted Gram, so f32 route noise flips more near-boundary exercise
    # decisions than the all-paths fit — tolerance is a small fraction of
    # the MC stderr, not of the price
    np.testing.assert_allclose(float(b.price), float(a.price), rtol=1e-4,
                               atol=0.05 * float(a.stderr))
    np.testing.assert_allclose(float(b.stderr), float(a.stderr), rtol=5e-3)
    # exercise decisions may flip on a handful of near-boundary paths
    # (f32 reduction-order noise in the moments)
    mismatch = np.mean(np.asarray(b.exercise_times) != np.asarray(a.exercise_times))
    assert mismatch < 5e-3, mismatch


def test_fused_surface_matches_xla_engine(paths):
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=4)
    a = lsmc_option_pricing(paths, prod, M.r, spec, return_surface=True)
    b = lsmc_option_pricing_fused(paths, prod, M.r, spec, return_surface=True)
    assert b.continuation.shape == a.continuation.shape
    np.testing.assert_allclose(
        np.asarray(b.continuation), np.asarray(a.continuation), atol=2e-3
    )


@pytest.mark.parametrize("mode", ["itm", "all"])
def test_fused_regress_modes(paths, mode):
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=3, regress_on=mode)
    a = lsmc_option_pricing(paths, prod, M.r, spec, return_surface=False)
    b = lsmc_option_pricing_fused(paths, prod, M.r, spec, return_surface=False)
    np.testing.assert_allclose(float(b.price), float(a.price), rtol=2e-5)


def test_fused_scaling_semantics(paths):
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=6, scaling=True, scaling_factor=2.0)
    a = lsmc_option_pricing(paths, prod, M.r, spec, return_surface=False)
    b = lsmc_option_pricing_fused(paths, prod, M.r, spec, return_surface=False)
    np.testing.assert_allclose(float(b.price), float(a.price), atol=2e-3)


def test_fused_rejects_unaligned_paths():
    small = simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=1000, n_steps=5))
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    with pytest.raises(ValueError, match="divisible"):
        lsmc_option_pricing_fused(small, prod, M.r)


def test_moment_packing_roundtrip():
    k = 5
    rng = np.random.default_rng(0)
    Gt = rng.standard_normal((k, k))
    G = (Gt + Gt.T) / 2
    b = rng.standard_normal(k)
    packed = np.zeros(pack_dim(k), np.float32)
    p = 0
    for i in range(k):
        for j in range(i, k):
            packed[p] = G[i, j]
            p += 1
    packed[p:] = b
    G2, b2 = unpack_moments(jnp.asarray(packed), k)
    np.testing.assert_allclose(np.asarray(G2), G, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(b2), b, rtol=1e-6)
