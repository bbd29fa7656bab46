"""Single-kernel backward induction vs the reference XLA engine.

Runs in Pallas interpreter mode on CPU. The in-kernel ridge-Cholesky solve
replaces the eigh pseudo-inverse, so American parity is to ~1e-3 (coefficient
noise near the exercise boundary); European (no exercise, pure discounting)
is exact to f32 rounding — which isolates the V-carry/pipeline algebra.
"""

import jax
import numpy as np
import pytest

# Raw lsmc_price_megakernel calls fit on all paths (itm_weights=False);
# the engine-side twin in each identity test pins regress_on="all" so both
# routes run the same estimator (the auto->itm default is covered by
# engine-level tests and tests_tpu).

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
        M.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False,
    )
    p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4)
    assert abs(float(p) - float(ref.price)) < 2.5e-3


def test_european_exact_discounting(paths):
    """European path: V-carry is pure discounting; must match the XLA engine
    to f32 rounding and the analytic price to MC tolerance."""
    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
        M.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False,
    )
    p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4, american=False)
    np.testing.assert_allclose(float(p), float(ref.price), atol=5e-5)
    bs = float(bs_price(100.0, 100.0, 1.0, M.r, 0.2, option_type="put"))
    assert abs(float(p) - bs) < 4 * float(ref.stderr)


def test_call_side(paths):
    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american"),
        M.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False,
    )
    p = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, +1.0, degree=4)
    assert abs(float(p) - float(ref.price)) < 2.5e-3


def test_degree_and_basis_variants(paths):
    for basis, degree in [("power", 2), ("legendre", 5)]:
        ref = lsmc_option_pricing(
            paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
            M.r, RegressionSpec(basis=basis, degree=degree, regress_on="all"), return_surface=False,
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
        M.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False,
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
    ref = lsmc_option_pricing(paths, prod, M.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False)
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
                         SimConfig(n_paths=16_384, n_steps=12))
    sched = tuple(range(3, 12, 3))
    xla = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put",
                           exercise="american"),
        m.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False,
        exercise_steps=sched)
    mega = float(lsmc_price_megakernel(paths, 100.0, m.r, 1.0 / 12, -1.0,
                                       degree=4, exercise_steps=sched))
    assert abs(mega - float(xla.price)) < max(5e-3, 0.5 * float(xla.stderr))
    # the schedule must bite: quarterly < full American on the same paths
    am = float(lsmc_price_megakernel(paths, 100.0, m.r, 1.0 / 12, -1.0,
                                     degree=4))
    assert mega < am - 1e-3


def test_mega_cf_tau_self_consistent_and_matches_xla(paths):
    """return_cf_tau=True: the (cashflows, τ) planes must reproduce the
    kernel's own price (mean of cf·e^{-r·dt·τ}) exactly, and match the XLA
    engine's carry on (nearly) every path — unblocking fast_greeks, CCR and
    dual bounds at flagship speed (VERDICT r2 next-step #1)."""
    import jax.numpy as jnp

    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        M.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False,
    )
    out = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4,
                                return_cf_tau=True)
    d = out.cashflows * jnp.exp(-M.r * (1.0 / 20) * out.exercise_times)
    np.testing.assert_allclose(float(jnp.mean(d)), float(out.price), atol=2e-5)
    # solver noise near the boundary may flip a few exercise decisions
    flip = float(jnp.mean((out.cashflows != ref.cashflows).astype(jnp.float32)))
    assert flip < 1e-3, flip
    assert abs(float(out.price) - float(ref.price)) < 2.5e-3


def test_mega_coeffs_match_xla(paths):
    """return_coeffs=True: per-step solved coefficients must match the XLA
    engine's export (equilibrated ridge-Cholesky vs eigh pinv — f32-level
    agreement away from the degenerate t=0 row)."""
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        M.r, RegressionSpec(degree=4, regress_on="all"), return_surface=False, return_coeffs=True,
    )
    out = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4,
                                return_coeffs=True)
    n_steps = paths.shape[0] - 1
    assert out.coeffs.shape == (n_steps + 1, 5)
    # rows 1..n_steps-1 (t=0 is rank-1/degenerate, maturity row is zeros)
    got = np.asarray(out.coeffs)[1:n_steps]
    want = np.asarray(ref.coeffs)[1:n_steps]
    np.testing.assert_allclose(got, want, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.coeffs)[n_steps], 0.0)


def test_mega_exposures_from_coeffs(paths):
    """The coeff-reconstructed CCR profile matches the XLA engine's
    surface-based profile (the reference's continuation→CCR pipeline,
    american_monte_carlo.py:164-167,400-414, at mega-kernel speed)."""
    from amcx.engine_pallas import precompute_standardization
    from amcx.exposures import compute_ccr_exposures, exposures_from_coeffs
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

    spec = RegressionSpec(degree=4)
    mean_t, inv_std_t = precompute_standardization(paths, None, spec)
    out = lsmc_price_megakernel(paths, 100.0, M.r, 1.0 / 20, -1.0, degree=4,
                                mean_t=mean_t, inv_std_t=inv_std_t,
                                return_coeffs=True)
    em = exposures_from_coeffs(paths, out.coeffs, mean_t, inv_std_t, degree=4)
    ref = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        M.r, spec, return_surface=True,
    )
    eref = compute_ccr_exposures(ref.continuation)
    np.testing.assert_allclose(np.asarray(em.epe), np.asarray(eref.epe), atol=5e-3)
    np.testing.assert_allclose(np.asarray(em.pfe95), np.asarray(eref.pfe95), atol=2e-2)


def test_price_option_mega_feeds_fast_greeks():
    """price_option(engine='mega', return_cf_tau=True) → fast_greeks agrees
    with the XLA engine's fixed-boundary pathwise Greeks."""
    from amcx import price_option
    from amcx.greeks import fast_greeks

    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=4)
    sim = SimConfig(n_paths=16384, n_steps=10)
    key = jax.random.key(11)
    rm = price_option(key, M, prod, spec, sim, engine="mega",
                      return_cf_tau=True, return_coeffs=True)
    rx = price_option(key, M, prod, spec, sim, engine="xla")
    gm = fast_greeks(rm, M, prod, 10)
    gx = fast_greeks(rx, M, prod, 10)
    for k in ("delta", "vega", "rho"):
        # mixed gate: the mega route fits in the closed-form GBM frame, the
        # XLA route in the ITM-weighted data frame — same polynomial span in
        # exact arithmetic, but the f32 conditioning difference flips a few
        # boundary decisions, and τ-sensitive greeks (rho ~44) move ~4e-3
        # relative at this path count
        assert abs(float(gm[k]) - float(gx[k])) < 5e-3 + 4e-3 * abs(float(gx[k])), k
    assert rm.coeffs is not None


def test_bermudan_schedule_four_engine_parity():
    """xla / fused / mega agree on a quarterly Bermudan schedule within the
    cross-engine gate; fusedpath accepts the schedule and runs (its CPU
    statistics are stubbed — hardware parity lives in tests_tpu)."""
    from amcx import price_option

    m = MarketParams(100.0, 0.05, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=4)
    sim = SimConfig(n_paths=8192, n_steps=12)
    sched = tuple(range(3, 12, 3))
    key = jax.random.key(7)
    px = price_option(key, m, prod, spec, sim, engine="xla", exercise_steps=sched)
    pf = price_option(key, m, prod, spec, sim, engine="fused", exercise_steps=sched)
    pm = price_option(key, m, prod, spec, sim, engine="mega", exercise_steps=sched)
    pp = price_option(key, m, prod, spec, sim, engine="fusedpath",
                      exercise_steps=sched)
    assert abs(float(px.price) - float(pf.price)) < 2.5e-3
    assert abs(float(px.price) - float(pm.price)) < 2.5e-3
    assert np.isfinite(float(pp.price))
    # and the schedule binds: the Bermudan price sits strictly below the
    # American price (fewer exercise rights)
    pa = price_option(key, m, prod, spec, sim, engine="xla")
    assert float(px.price) < float(pa.price)
