"""Nested dual bound for the Bermudan max-call: two-sided validation of the
flagship multi-asset product (Andersen-Broadie benchmark family)."""

import jax
import numpy as np
import pytest

from amcx import RegressionSpec, SimConfig
from amcx.dual import dual_upper_bound_max_call
from amcx.models.maxcall import maxcall_standardization, price_max_call
from amcx.paths import simulate_gbm_multi

B = dict(K=100.0, T=3.0, r=0.05, sigma=0.2, q=0.10, n_exercise_dates=9)


@pytest.fixture(scope="module")
def run():
    spec = RegressionSpec(basis="chebyshev", degree=3)
    res, fit_paths = price_max_call(
        jax.random.key(42), [100.0, 100.0], n_paths=50_000, spec=spec,
        return_coeffs=True, return_paths=True, **B,
    )
    stats = maxcall_standardization(fit_paths, "sorted")
    paths_out = simulate_gbm_multi(
        jax.random.key(777), [100.0, 100.0], 0.05, 0.2, 3.0,
        SimConfig(n_paths=2_048, n_steps=9), q=0.10,
    )
    d = dual_upper_bound_max_call(
        jax.random.key(5), paths_out, res, 100.0, 3.0, 0.05, 0.2, stats, spec,
        q=0.10, n_inner=64,
    )
    return res, d


def test_bracket_contains_literature_value(run):
    """AB 2004 report the 2-asset Bermudan max-call ≈ 13.90 (interval
    [13.90, 13.93]); the [lower, upper] bracket must contain it."""
    res, d = run
    lower = float(res.price) - 4 * float(res.stderr)
    upper = float(d.upper) + 4 * float(d.stderr)
    assert lower <= 13.902 <= upper, (lower, upper)


def test_gap_is_tight(run):
    res, d = run
    assert float(d.upper) >= float(res.price) - 1e-6
    assert float(d.gap) < 0.35  # small-sample CPU config; TPU run: ~0.08


def test_coeffs_shape(run):
    res, _ = run
    # degree-3 total-degree basis on 2 assets: C(2+3,3) = 10 terms
    assert res.coeffs.shape == (9, 10)
