"""Variance reduction: antithetic + European control variate (BASELINE
config 3)."""

import jax
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, simulate_gbm
from amcx.oracle import crr_price
from amcx.variates import control_variate_price

M = MarketParams(100.0, 0.05, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SPEC = RegressionSpec(degree=4)


@pytest.fixture(scope="module")
def cv():
    paths = simulate_gbm(jax.random.key(3), M, 1.0, SimConfig(n_paths=100_000, n_steps=50))
    return control_variate_price(paths, M, PROD, SPEC)


def test_cv_reduces_variance(cv):
    assert float(cv.variance_ratio) > 1.3
    assert float(cv.stderr) < float(cv.raw_stderr)


def test_cv_price_consistent_with_oracle(cv):
    want = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000, option_type="put", american=True))
    assert abs(float(cv.price) - want) < 0.2


def test_cv_fixed_beta_unbiasedness_structure(cv):
    """β=0 must reproduce the raw estimator exactly."""
    paths = simulate_gbm(jax.random.key(3), M, 1.0, SimConfig(n_paths=20_000, n_steps=20))
    res = control_variate_price(paths, M, PROD, SPEC, beta=0.0)
    np.testing.assert_allclose(float(res.price), float(res.raw_price), rtol=1e-6)


def test_cv_rejects_barrier_products():
    paths = simulate_gbm(jax.random.key(3), M, 1.0, SimConfig(n_paths=1000, n_steps=5))
    barrier_prod = ProductSpec(K=100.0, T=1.0, barrier=80.0, option_type="put", exercise="american")
    with pytest.raises(ValueError, match="barrier"):
        control_variate_price(paths, M, barrier_prod, SPEC)


def test_antithetic_reduces_stderr():
    from amcx import lsmc_option_pricing

    key = jax.random.key(11)
    plain = simulate_gbm(key, M, 1.0, SimConfig(n_paths=50_000, n_steps=20))
    anti = simulate_gbm(key, M, 1.0, SimConfig(n_paths=50_000, n_steps=20, antithetic=True))
    prod_e = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    r_plain = lsmc_option_pricing(plain, prod_e, M.r, SPEC, return_surface=False)
    r_anti = lsmc_option_pricing(anti, prod_e, M.r, SPEC, return_surface=False)
    # Antithetic pairing reduces the path-mean variance for monotone payoffs.
    # stderr here is computed pathwise (ignores pairing), so compare realized
    # half-sample dispersion instead: the paired estimator's true stderr uses
    # pair means.
    import jax.numpy as jnp

    y_anti = r_anti.cashflows * jnp.exp(-M.r * (1.0 / 20) * r_anti.exercise_times)
    pair_means = 0.5 * (y_anti[:25_000] + y_anti[25_000:])
    se_paired = float(jnp.std(pair_means) / jnp.sqrt(25_000))
    assert se_paired < float(r_plain.stderr)
