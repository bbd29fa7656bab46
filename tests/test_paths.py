"""GBM simulator: distributional and structural checks.

The reference's RNG is seed-and-shape-dependent MT19937; equivalence with
the counter-based threefry simulator is statistical (SURVEY Q8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import MarketParams, SimConfig, simulate_gbm, simulate_gbm_multi, to_path_major


@pytest.fixture(scope="module")
def paths():
    sim = SimConfig(n_paths=100_000, n_steps=32)
    return simulate_gbm(jax.random.key(7), MarketParams(100.0, 0.03, 0.25), 2.0, sim)


def test_shape_and_initial_value(paths):
    assert paths.shape == (33, 100_000)
    np.testing.assert_allclose(np.asarray(paths[0]), 100.0)
    assert np.isfinite(np.asarray(paths)).all()


def test_layout_roundtrip(paths):
    pm = to_path_major(paths)
    assert pm.shape == (100_000, 33)
    np.testing.assert_array_equal(np.asarray(pm[:, 0]), np.asarray(paths[0]))


def test_log_return_moments(paths):
    """Increment distribution: exact GBM log-increments N((r-σ²/2)dt, σ²dt),
    matching `generate_asset_paths` (`american_monte_carlo.py:74-76`)."""
    r, sigma, T, n = 0.03, 0.25, 2.0, 32
    dt = T / n
    logs = np.diff(np.log(np.asarray(paths, np.float64)), axis=0)
    want_mean = (r - 0.5 * sigma**2) * dt
    want_std = sigma * np.sqrt(dt)
    se = want_std / np.sqrt(logs.size)
    assert abs(logs.mean() - want_mean) < 5 * se
    np.testing.assert_allclose(logs.std(), want_std, rtol=5e-3)


def test_martingale_terminal_mean(paths):
    """E[S_T] = S0 e^{rT} under the risk-neutral measure."""
    ST = np.asarray(paths[-1], np.float64)
    want = 100.0 * np.exp(0.03 * 2.0)
    se = ST.std() / np.sqrt(ST.size)
    assert abs(ST.mean() - want) < 4 * se


def test_antithetic_pairing():
    sim = SimConfig(n_paths=2000, n_steps=10, antithetic=True)
    p = simulate_gbm(jax.random.key(0), MarketParams(100.0, 0.01, 0.2), 1.0, sim)
    logs = np.log(np.asarray(p, np.float64) / 100.0)
    drift = (0.01 - 0.5 * 0.04) * (1.0 / 10) * np.arange(11)[:, None]
    centered = logs - drift
    # Second half mirrors the first half's Brownian part exactly.
    np.testing.assert_allclose(centered[:, :1000], -centered[:, 1000:], atol=1e-5)


def test_multi_asset_correlation():
    corr = np.array([[1.0, 0.6], [0.6, 1.0]])
    sim = SimConfig(n_paths=200_000, n_steps=4)
    p = simulate_gbm_multi(
        jax.random.key(3), [100.0, 50.0], 0.02, [0.2, 0.3], 1.0, sim, corr=corr
    )
    assert p.shape == (5, 200_000, 2)
    np.testing.assert_allclose(np.asarray(p[0, :, 0]), 100.0)
    np.testing.assert_allclose(np.asarray(p[0, :, 1]), 50.0)
    logret = np.diff(np.log(np.asarray(p, np.float64)), axis=0).reshape(-1, 2)
    got = np.corrcoef(logret.T)[0, 1]
    assert abs(got - 0.6) < 0.01


def test_antithetic_requires_even_paths():
    with pytest.raises(ValueError):
        SimConfig(n_paths=1001, antithetic=True)
