"""Two-pass (out-of-sample) Longstaff-Schwartz: fit once, replay frozen.

The replay contract is exact: on the SAME paths and standardization frame
as the fit, replaying the exported coefficients must reproduce the
in-sample cashflows — for the mega kernel bit-for-bit (identical pass-2
select, coefficients round-trip f32 through the stats stream losslessly),
for the XLA forward walk to f32 summation tolerance. On an independent
path set the replayed price is the out-of-sample lower bound
(`amcx.policy` module docstring; the reference prices in-sample only,
`american_monte_carlo.py:180-197`).
"""

import jax
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    price_option,
    price_out_of_sample,
    reprice_with_coeffs,
    simulate_gbm,
)
from amcx.oracle import crr_price
from amcx.ops.lsmc_megakernel import lsmc_price_megakernel
from amcx.paths import gbm_standardization

M = MarketParams(100.0, 0.05, 0.25)
PUT = ProductSpec(K=105.0, T=1.0, option_type="put", exercise="american")
N_STEPS = 20


@pytest.fixture(scope="module")
def frame():
    return gbm_standardization(M, PUT.T, N_STEPS)


@pytest.fixture(scope="module")
def paths():
    return simulate_gbm(jax.random.key(7), M, PUT.T,
                        SimConfig(n_paths=65_536, n_steps=N_STEPS))


@pytest.fixture(scope="module")
def mega_fit(paths, frame):
    mean_t, inv_std_t = frame
    return lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_coeffs=True,
    )


def test_mega_replay_same_paths_bitwise(paths, frame, mega_fit):
    """Replaying the fit's own coefficients on the fit's own paths runs the
    identical pass-2 select — the price must be bit-for-bit the in-sample
    price (the regression pass is skipped, nothing else changes)."""
    mean_t, inv_std_t = frame
    p, _ = lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_stats=True,
        replay_coeffs=mega_fit.coeffs,
    )
    assert float(p) == float(mega_fit.price)


def test_xla_replay_matches_mega_replay(paths, frame, mega_fit):
    """The XLA forward first-hit walk and the kernel's backward fixed-policy
    overwrite are the same estimator (last write wins at the smallest
    exercising t) — prices agree to f32 summation noise."""
    mean_t, inv_std_t = frame
    res = reprice_with_coeffs(paths, mega_fit.coeffs, PUT, M.r,
                              mean_t, inv_std_t, RegressionSpec(degree=4))
    np.testing.assert_allclose(float(res.price), float(mega_fit.price),
                               atol=2e-4)


def test_xla_replay_cashflows_match_mega(paths, frame, mega_fit):
    mean_t, inv_std_t = frame
    res = reprice_with_coeffs(paths, mega_fit.coeffs, PUT, M.r,
                              mean_t, inv_std_t, RegressionSpec(degree=4))
    out = lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_cf_tau=True,
        replay_coeffs=mega_fit.coeffs,
    )
    np.testing.assert_array_equal(np.asarray(res.exercise_times),
                                  np.asarray(out.exercise_times))
    np.testing.assert_allclose(np.asarray(res.cashflows),
                               np.asarray(out.cashflows), atol=1e-6)


def test_mega_replay_bermudan_schedule(paths, frame):
    mean_t, inv_std_t = frame
    sched = (5, 10, 15)
    fit = lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_coeffs=True,
        exercise_steps=sched,
    )
    p, _ = lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_stats=True,
        exercise_steps=sched, replay_coeffs=fit.coeffs,
    )
    assert float(p) == float(fit.price)
    res = reprice_with_coeffs(paths, fit.coeffs, PUT, M.r, mean_t, inv_std_t,
                              RegressionSpec(degree=4), exercise_steps=sched)
    np.testing.assert_allclose(float(res.price), float(fit.price), atol=2e-4)


def test_mega_replay_barrier(paths, frame):
    prod = ProductSpec(K=105.0, T=1.0, barrier=85.0, option_type="put",
                       exercise="american", barrier_type="down-in")
    mean_t, inv_std_t = frame
    fit = lsmc_price_megakernel(
        paths, prod.K, M.r, prod.T / N_STEPS, -1.0, degree=4,
        barrier=85.0, mean_t=mean_t, inv_std_t=inv_std_t,
        return_coeffs=True,
    )
    p, _ = lsmc_price_megakernel(
        paths, prod.K, M.r, prod.T / N_STEPS, -1.0, degree=4,
        barrier=85.0, mean_t=mean_t, inv_std_t=inv_std_t,
        return_stats=True, replay_coeffs=fit.coeffs,
    )
    assert float(p) == float(fit.price)
    res = reprice_with_coeffs(paths, fit.coeffs, prod, M.r, mean_t,
                              inv_std_t, RegressionSpec(degree=4))
    np.testing.assert_allclose(float(res.price), float(fit.price), atol=2e-4)


def test_replay_requires_explicit_frame(paths, mega_fit):
    with pytest.raises(ValueError, match="mean_t"):
        lsmc_price_megakernel(
            paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
            replay_coeffs=mega_fit.coeffs,
        )


def test_replay_coeff_shape_validation(paths, frame, mega_fit):
    mean_t, inv_std_t = frame
    with pytest.raises(ValueError, match="replay_coeffs"):
        lsmc_price_megakernel(
            paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
            mean_t=mean_t, inv_std_t=inv_std_t,
            replay_coeffs=mega_fit.coeffs[:, :3],
        )
    with pytest.raises(ValueError, match="step rows"):
        lsmc_price_megakernel(
            paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
            mean_t=mean_t, inv_std_t=inv_std_t,
            replay_coeffs=mega_fit.coeffs[:7],
        )


def test_fusedpath_replay_same_seed_reproduces_fit():
    """On CPU the TPU interpreter stubs the PRNG (zero bits), so the same
    seed regenerates the identical deterministic path fan — replay of the
    fit's coefficients on the fit's seed must reproduce the in-sample price
    exactly (regression pass skipped, pass 2 identical)."""
    from amcx.ops.lsmc_fusedpath import lsmc_price_fusedpath

    kw = dict(S0=100.0, K=105.0, r=0.05, sigma=0.25, dt=1.0 / N_STEPS,
              n_steps=N_STEPS, n_paths=8_192, phi=-1.0, degree=4)
    fit = lsmc_price_fusedpath(seed=3, return_coeffs=True, **kw)
    p, _ = lsmc_price_fusedpath(seed=3, return_stats=True,
                                replay_coeffs=fit.coeffs, **kw)
    assert float(p) == float(fit.price)


def test_price_out_of_sample_two_pass():
    """End-to-end two-pass estimator: OOS price is statistically consistent
    with the in-sample fit and with the binomial oracle (the foresight bias
    at 131k paths/degree 4 is well below MC noise)."""
    res = price_out_of_sample(
        jax.random.key(11), M, PUT, RegressionSpec(degree=4),
        SimConfig(n_paths=131_072, n_steps=N_STEPS), engine="mega",
    )
    crr = float(crr_price(M.S0, PUT.K, PUT.T, M.r, M.sigma, 2000,
                          option_type="put", american=True))
    tol = 4.0 * (float(res.fit.stderr) + float(res.oos.stderr))
    assert abs(float(res.oos.price) - crr) < max(tol, 5e-2)
    assert abs(float(res.oos.price) - float(res.fit.price)) < max(tol, 5e-2)


def test_price_out_of_sample_mega_replay_matches_xla_walk():
    """replay_engine='mega' and the XLA walk replay the same frozen policy
    on the same pricing paths — prices agree to f32 summation noise."""
    spec = RegressionSpec(degree=4)
    sim = SimConfig(n_paths=65_536, n_steps=N_STEPS)
    key = jax.random.key(23)
    a = price_out_of_sample(key, M, PUT, spec, sim, engine="mega")
    b = price_out_of_sample(key, M, PUT, spec, sim, engine="mega",
                            replay_engine="mega")
    assert float(a.fit.price) == float(b.fit.price)
    np.testing.assert_allclose(float(a.oos.price), float(b.oos.price),
                               atol=2e-4)


def test_price_out_of_sample_small_fit_split():
    """Production split: fit on few paths, replay on many."""
    res = price_out_of_sample(
        jax.random.key(5), M, PUT, RegressionSpec(degree=4),
        SimConfig(n_paths=131_072, n_steps=N_STEPS), engine="mega",
        n_fit_paths=16_384,
    )
    tol = 4.0 * (float(res.fit.stderr) + float(res.oos.stderr))
    assert abs(float(res.oos.price) - float(res.fit.price)) < max(tol, 5e-2)


def test_reprice_antithetic_pairs_fold():
    sim = SimConfig(n_paths=65_536, n_steps=N_STEPS, antithetic=True)
    paths = simulate_gbm(jax.random.key(9), M, PUT.T, sim)
    mean_t, inv_std_t = gbm_standardization(M, PUT.T, N_STEPS)
    fit = lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_coeffs=True,
        antithetic=True,
    )
    res = reprice_with_coeffs(paths, fit.coeffs, PUT, M.r, mean_t,
                              inv_std_t, RegressionSpec(degree=4),
                              antithetic=True)
    np.testing.assert_allclose(float(res.price), float(fit.price), atol=2e-4)
    plain = reprice_with_coeffs(paths, fit.coeffs, PUT, M.r, mean_t,
                                inv_std_t, RegressionSpec(degree=4))
    # pair-folded stderr must differ from the (dishonest) pathwise one
    assert float(res.stderr) != float(plain.stderr)


def test_valuation_interval_brackets_crr():
    """One fit → [OOS replay lower, AB dual upper]: the binomial truth must
    land inside the sandwich (with 2-sigma slack on each side)."""
    from amcx import valuation_interval

    res = valuation_interval(
        jax.random.key(17), M, PUT, RegressionSpec(degree=4),
        SimConfig(n_paths=65_536, n_steps=N_STEPS), engine="mega",
        n_dual_paths=2_048, n_inner=32, nested=True,
    )
    crr = float(crr_price(M.S0, PUT.K, PUT.T, M.r, M.sigma, 2000,
                          option_type="put", american=True))
    lo = float(res.lower.price) - 3.0 * float(res.lower.stderr)
    hi = float(res.upper.upper) + 3.0 * float(res.upper.stderr)
    assert lo <= crr <= hi
    # informative, not vacuous (hermetic config: only 32 inner samples, so
    # the dual side is loose; the tight on-chip sandwich is in RESULTS.md)
    assert hi - lo < 1.0
    assert float(res.lower.price) <= float(res.upper.upper) + 1e-6


def test_valuation_interval_rejects_barrier():
    from amcx import valuation_interval

    prod = ProductSpec(K=105.0, T=1.0, barrier=85.0, option_type="put",
                       exercise="american")
    with pytest.raises(ValueError, match="barrier"):
        valuation_interval(jax.random.key(0), M, prod)


def test_price_out_of_sample_replay_blocks_identity():
    """Block-chained fusedpath replay (the 16M-paths long-axis route): on
    CPU the interpreter stubs the PRNG, so every block regenerates the
    identical fan — B blocks must then combine to exactly the single-block
    price with stderr shrunk by sqrt(B) (the iid-block combination math,
    checked deterministically; the statistical version runs on hardware)."""
    spec = RegressionSpec(degree=4)
    sim = SimConfig(n_paths=8_192, n_steps=N_STEPS)
    key = jax.random.key(31)
    one = price_out_of_sample(key, M, PUT, spec, sim, engine="fusedpath",
                              replay_engine="fusedpath")
    four = price_out_of_sample(key, M, PUT, spec, sim, engine="fusedpath",
                               replay_engine="fusedpath", replay_blocks=4)
    np.testing.assert_allclose(float(four.oos.price), float(one.oos.price),
                               rtol=1e-6)
    np.testing.assert_allclose(float(four.oos.stderr),
                               float(one.oos.stderr) / 2.0, rtol=1e-5)


def test_replay_blocks_requires_fusedpath():
    with pytest.raises(ValueError, match="replay_blocks"):
        price_out_of_sample(
            jax.random.key(1), M, PUT, RegressionSpec(degree=4),
            SimConfig(n_paths=8_192, n_steps=N_STEPS), engine="mega",
            replay_engine="mega", replay_blocks=4)
