"""Payoff and barrier-monitor unit tests.

`test_intrinsic_value` mirrors the reference's only pure-function test
(`/root/reference/unit_test.py:54-62`).
"""

import jax.numpy as jnp
import numpy as np

from amcx import intrinsic_value, barrier_knocked, max_call_payoff


def test_intrinsic_value():
    S = jnp.asarray([90.0, 100.0, 110.0])
    K = 100.0
    np.testing.assert_array_almost_equal(np.asarray(intrinsic_value(S, K, "put")), [10, 0, 0])
    np.testing.assert_array_almost_equal(np.asarray(intrinsic_value(S, K, "call")), [0, 0, 10])


def test_barrier_knock_is_cumulative():
    """Parity with `precompute_barrier_hit_matrix`
    (`american_monte_carlo.py:171-176`): once knocked, always knocked."""
    paths_tm = jnp.asarray(
        [
            [100.0, 100.0],
            [79.0, 101.0],
            [120.0, 80.5],
            [130.0, 79.9],
        ]
    )
    got = np.asarray(barrier_knocked(paths_tm, 80.0))
    want_ref = np.maximum.accumulate(np.asarray(paths_tm) <= 80.0, axis=0)
    np.testing.assert_array_equal(got, want_ref)
    # path 0 knocks at t=1 and stays knocked; path 1 knocks at t=3
    np.testing.assert_array_equal(got[:, 0], [False, True, True, True])
    np.testing.assert_array_equal(got[:, 1], [False, False, False, True])


def test_no_barrier_all_true():
    paths_tm = jnp.ones((5, 7))
    assert bool(barrier_knocked(paths_tm, None).all())


def test_max_call_payoff():
    S = jnp.asarray([[90.0, 120.0], [80.0, 95.0]])
    np.testing.assert_allclose(np.asarray(max_call_payoff(S, 100.0)), [20.0, 0.0])
