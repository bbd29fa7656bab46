"""Single-kernel backward induction vs the reference XLA engine.

Runs in Pallas interpreter mode on CPU. The in-kernel ridge-Cholesky solve
replaces the eigh pseudo-inverse, so American parity is to ~1e-3 (coefficient
noise near the exercise boundary); European (no exercise, pure discounting)
is exact to f32 rounding — which isolates the V-carry/pipeline algebra.
"""

import jax
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
from amcx.oracle import bs_price
from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

M = MarketParams(100.0, 0.01, 0.2)


@pytest.fixture(scope="module")
def paths():
    return simulate_gbm(jax.random.key(42), M, 1.0, SimConfig(n_paths=131_072, n_steps=20))


def test_american_put_matches_xla_engine(paths):
    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        M.r, RegressionSpec(degree=4), return_surface=False,
    )
    p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4)
    assert abs(float(p) - float(ref.price)) < 2.5e-3


def test_european_exact_discounting(paths):
    """European path: V-carry is pure discounting; must match the XLA engine
    to f32 rounding and the analytic price to MC tolerance."""
    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
        M.r, RegressionSpec(degree=4), return_surface=False,
    )
    p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4, american=False)
    np.testing.assert_allclose(float(p), float(ref.price), atol=5e-5)
    bs = float(bs_price(100.0, 100.0, 1.0, M.r, 0.2, option_type="put"))
    assert abs(float(p) - bs) < 4 * float(ref.stderr)


def test_call_side(paths):
    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american"),
        M.r, RegressionSpec(degree=4), return_surface=False,
    )
    p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, +1.0, degree=4)
    assert abs(float(p) - float(ref.price)) < 2.5e-3


def test_degree_and_basis_variants(paths):
    for basis, degree in [("power", 2), ("legendre", 5)]:
        ref = lsmc_option_pricing(
            paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
            M.r, RegressionSpec(basis=basis, degree=degree), return_surface=False,
        )
        p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0,
                                  basis=basis, degree=degree)
        assert abs(float(p) - float(ref.price)) < 2.5e-3, (basis, degree)


def test_mega_stderr_matches_xla(paths):
    """return_stats=True emits Σ/ΣV² from the kernel; the resulting MC
    standard error must agree with the XLA engine's (same estimator, same
    paths — only boundary-flip noise differs)."""
    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        M.r, RegressionSpec(degree=4), return_surface=False,
    )
    p, se = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4,
                                  return_stats=True)
    assert float(se) > 0.0
    np.testing.assert_allclose(float(se), float(ref.stderr), rtol=0.05)
    assert abs(float(p) - float(ref.price)) < 2.5e-3


def test_alignment_validation(paths):
    with pytest.raises(ValueError, match="divisible"):
        lsmc_price_megakernel(paths[:, :1000], 100.0, M.r, 0.05, -1.0)


@pytest.mark.parametrize("am", [True, False])
def test_barrier_sign_encoding(paths, am):
    """Down-and-in via sign-encoded knock state matches the XLA engine."""
    prod = ProductSpec(K=100.0, T=1.0, barrier=80.0, option_type="put",
                       exercise="american" if am else "european")
    ref = lsmc_option_pricing(paths, prod, M.r, RegressionSpec(degree=4), return_surface=False)
    p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4,
                              american=am, barrier=80.0)
    assert abs(float(p) - float(ref.price)) < 2.5e-3


def test_barrier_bounded_by_vanilla_mega(paths):
    di = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4, barrier=80.0)
    vanilla = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4)
    assert 0.0 <= float(di) <= float(vanilla) + 1e-6


def test_megakernel_bermudan_schedule():
    """The mega kernel's per-step exercise gate matches the XLA engine's
    Bermudan schedule semantics."""
    import jax.numpy as jnp

    from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
    from amcx import lsmc_option_pricing, simulate_gbm
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

    m = MarketParams(100.0, 0.05, 0.2)
    paths = simulate_gbm(jax.random.key(3), m, 1.0,
                         SimConfig(n_paths=32_768, n_steps=24))
    sched = tuple(range(6, 24, 6))
    xla = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put",
                           exercise="american"),
        m.r, RegressionSpec(degree=4), return_surface=False,
        exercise_steps=sched)
    mega = float(lsmc_price_megakernel(paths, 100.0, m.r, 1.0 / 24, -1.0,
                                       degree=4, exercise_steps=sched))
    assert abs(mega - float(xla.price)) < max(5e-3, 0.5 * float(xla.stderr))
    # the schedule must bite: quarterly < full American on the same paths
    am = float(lsmc_price_megakernel(paths, 100.0, m.r, 1.0 / 24, -1.0,
                                     degree=4))
    assert mega < am - 1e-3
