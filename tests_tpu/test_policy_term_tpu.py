"""Out-of-sample replay + term-structure curves on REAL TPU.

The hermetic suite covers these paths in interpreter mode; on-chip the
replay branch exercises dynamic SMEM coefficient indexing in Mosaic and
the real hardware PRNG (the CPU interpreter stubs it), and the curve rows
exercise the generalized discount-row host path feeding the unmodified
mega kernel. Run directly on the TPU host: ``python -m pytest tests_tpu/ -q``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    TermCurves,
    crr_price_curves,
    price_option_curves,
    price_out_of_sample,
    simulate_gbm,
)
from amcx.ops.lsmc_megakernel import lsmc_price_megakernel
from amcx.paths import gbm_standardization

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a real TPU"
)

M = MarketParams(100.0, 0.05, 0.25)
PUT = ProductSpec(K=105.0, T=1.0, option_type="put", exercise="american")
N_STEPS = 50


def test_mega_replay_bitwise_onchip():
    """Same-paths replay must be bit-for-bit the in-sample price on
    hardware (identical pass-2 select; coefficients round-trip f32 through
    SMEM losslessly)."""
    sim = SimConfig(n_paths=262_144, n_steps=N_STEPS)
    paths = simulate_gbm(jax.random.key(7), M, PUT.T, sim)
    mean_t, inv_std_t = gbm_standardization(M, PUT.T, N_STEPS)
    fit = lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_coeffs=True)
    p, _ = lsmc_price_megakernel(
        paths, PUT.K, M.r, PUT.T / N_STEPS, -1.0, degree=4,
        mean_t=mean_t, inv_std_t=inv_std_t, return_stats=True,
        replay_coeffs=fit.coeffs)
    assert float(p) == float(fit.price)


def test_fusedpath_replay_bitwise_onchip():
    """Hardware PRNG: same seed regenerates the same paths in-kernel, so
    replay of the fit's own coefficients reproduces its price exactly."""
    from amcx.ops.lsmc_fusedpath import lsmc_price_fusedpath

    kw = dict(S0=100.0, K=105.0, r=0.05, sigma=0.25, dt=1.0 / N_STEPS,
              n_steps=N_STEPS, n_paths=262_144, phi=-1.0, degree=4)
    fit = lsmc_price_fusedpath(seed=3, return_coeffs=True, **kw)
    p, _ = lsmc_price_fusedpath(seed=3, return_stats=True,
                                replay_coeffs=fit.coeffs, **kw)
    assert float(p) == float(fit.price)


def test_two_pass_oos_onchip():
    """Independent-stream two-pass estimate lands within MC noise of the
    in-sample fit (the policy is well-fit at this path count)."""
    res = price_out_of_sample(
        jax.random.key(11), M, PUT, RegressionSpec(degree=4),
        SimConfig(n_paths=262_144, n_steps=N_STEPS), engine="mega",
        replay_engine="mega")
    gap = abs(float(res.oos.price) - float(res.fit.price))
    tol = 4.0 * (float(res.fit.stderr) + float(res.oos.stderr))
    assert gap < tol, (float(res.fit.price), float(res.oos.price))


def test_rate_curve_vs_lattice_onchip():
    """Two-regime short rate through the unmodified mega kernel vs the
    exact per-step-rate f64 lattice (seed-pinned bound ~3 MC stderr)."""
    r_t = jnp.concatenate([jnp.full((N_STEPS // 2,), 0.03),
                           jnp.full((N_STEPS // 2,), 0.08)])
    c = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=N_STEPS)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    truth = crr_price_curves(100.0, 100.0, 1.0, np.asarray(r_t), 0.25,
                             n_sub=40)
    res = price_option_curves(
        jax.random.key(5), c, prod, RegressionSpec(degree=4, regress_on="itm"),
        SimConfig(n_paths=524_288, n_steps=N_STEPS), engine="mega")
    assert abs(float(res.price) - truth) < 3.0 * float(res.stderr) + 2e-3, (
        float(res.price), truth)


def test_fusedpath_curves_vs_lattice_onchip():
    """Zero-path-HBM pricing under a two-regime rate curve: the in-kernel
    time-changed-Brownian bridge + curve discount rows vs the exact
    per-step-rate f64 lattice."""
    r_t = jnp.concatenate([jnp.full((N_STEPS // 2,), 0.03),
                           jnp.full((N_STEPS // 2,), 0.08)])
    c = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=N_STEPS)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    truth = crr_price_curves(100.0, 100.0, 1.0, np.asarray(r_t), 0.25,
                             n_sub=40)
    res = price_option_curves(
        jax.random.key(6), c, prod, RegressionSpec(degree=4, regress_on="itm"),
        SimConfig(n_paths=524_288, n_steps=N_STEPS), engine="fusedpath")
    assert abs(float(res.price) - truth) < 3.0 * float(res.stderr) + 2e-3, (
        float(res.price), truth)


def test_fusedpath_sigma_curve_european_exact_onchip():
    """Time-varying σ(t) exercises the non-uniform bridge clock: the
    backward-regenerated terminal law must price a European at the exact
    effective-parameter closed form."""
    from amcx import european_price_curves

    r_t = jnp.linspace(0.01, 0.09, N_STEPS)
    sig_t = jnp.linspace(0.15, 0.35, N_STEPS)
    c = TermCurves.make(100.0, r_t, sig_t, 0.0, n_steps=N_STEPS)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="european")
    exact = float(european_price_curves(c, 100.0, 1.0, "put"))
    res = price_option_curves(
        jax.random.key(7), c, prod, RegressionSpec(degree=4),
        SimConfig(n_paths=524_288, n_steps=N_STEPS), engine="fusedpath")
    assert abs(float(res.price) - exact) < 4.0 * float(res.stderr), (
        float(res.price), exact)


def test_fusedpath_curves_replay_bitwise_onchip():
    """Curve fit → same-seed in-kernel replay is bit-exact (layout offsets
    for the three extra curve rows verified on real Mosaic SMEM indexing)."""
    from amcx.ops.lsmc_fusedpath import lsmc_price_fusedpath

    r_t = jnp.linspace(0.02, 0.08, N_STEPS)
    sig_t = jnp.linspace(0.35, 0.15, N_STEPS)
    kw = dict(S0=100.0, K=105.0, r=r_t, sigma=sig_t, dt=1.0 / N_STEPS,
              n_steps=N_STEPS, n_paths=262_144, phi=-1.0, degree=4)
    fit = lsmc_price_fusedpath(seed=9, return_coeffs=True, **kw)
    p, _ = lsmc_price_fusedpath(seed=9, return_stats=True,
                                replay_coeffs=fit.coeffs, **kw)
    assert float(p) == float(fit.price)


def test_curve_pipeline_pallas_backend_onchip():
    """The fully-Pallas curve pipeline (blocked in-kernel curve pathgen →
    mega kernel) agrees with the XLA-pathgen route at 1M paths (same
    estimator, independent streams; measured backend gap 4e-4 at a
    −0.015 shared discrete-exercise/policy offset vs the lattice)."""
    r_t = jnp.concatenate([jnp.full((N_STEPS // 2,), 0.03),
                           jnp.full((N_STEPS // 2,), 0.08)])
    c = TermCurves.make(100.0, r_t, 0.25, 0.0, n_steps=N_STEPS)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    spec = RegressionSpec(degree=4, regress_on="itm")
    res_p = price_option_curves(
        jax.random.key(5), c, prod, spec,
        SimConfig(n_paths=1_048_576, n_steps=N_STEPS, backend="pallas"),
        engine="mega")
    res_x = price_option_curves(
        jax.random.key(5), c, prod, spec,
        SimConfig(n_paths=1_048_576, n_steps=N_STEPS), engine="mega")
    gap = abs(float(res_p.price) - float(res_x.price))
    tol = 4.0 * (float(res_p.stderr) + float(res_x.stderr))
    assert gap < tol, (float(res_p.price), float(res_x.price))


def test_hybrid_hw_european_cf_onchip():
    """Hull-White+GBM hybrid on hardware: the exact simulation must hit
    the hybrid closed form; the American (S, r)-basis run sits above its
    European floor."""
    from amcx import HullWhiteParams, european_price_hw, price_option_hw

    hw = HullWhiteParams(100.0, 0.04, 0.2, kappa=0.8, sigma_r=0.02,
                         rho=-0.4)
    sim = SimConfig(n_paths=524_288, n_steps=N_STEPS, antithetic=True)
    prod_e = ProductSpec(K=105.0, T=1.0, option_type="put",
                         exercise="european")
    res = price_option_hw(jax.random.key(1), hw, prod_e,
                          RegressionSpec(degree=3), sim)
    cf = european_price_hw(hw, 105.0, 1.0, "put")
    assert abs(float(res.price) - cf) < 4.0 * float(res.stderr), (
        float(res.price), cf)
    prod_a = ProductSpec(K=105.0, T=1.0, option_type="put",
                         exercise="american")
    res_a = price_option_hw(jax.random.key(1), hw, prod_a,
                            RegressionSpec(degree=4, regress_on="itm"), sim)
    assert float(res_a.price) > float(res.price)


def test_swing_mega_kernel_onchip():
    """One-kernel 3-rights swing at 1M×100 on hardware vs the exact
    same-date-grid rights lattice (seed-pinned; measured 0.14σ)."""
    from amcx import MarketParams, crr_swing_price, price_swing_option

    m = MarketParams(100.0, 0.05, 0.25)
    prod = ProductSpec(K=105.0, T=1.0, option_type="put",
                       exercise="american")
    res = price_swing_option(
        jax.random.key(5), m, prod, 3,
        RegressionSpec(degree=4, regress_on="itm"),
        SimConfig(n_paths=1_048_576, n_steps=100, backend="pallas"),
        engine="mega")
    lat = crr_swing_price(100.0, 105.0, 1.0, 0.05, 0.25, 3, n_steps=100,
                          n_sub=20)
    assert abs(float(res.price) - lat) < 3.0 * float(res.stderr) + 2e-3, (
        float(res.price), lat)
