"""Quasi-Monte Carlo paths: distribution + convergence advantage over MC."""

import jax
import numpy as np
import pytest
import jax.numpy as jnp

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, bs_price, lsmc_option_pricing
from amcx.qmc import simulate_gbm_qmc, sobol_normals

M = MarketParams(100.0, 0.05, 0.2)


def test_sobol_normals_distribution():
    z = sobol_normals(0, 8, 4096)
    assert z.shape == (8, 4096)
    # near-perfect first moments (QMC stratification)
    assert abs(z.mean()) < 5e-3
    np.testing.assert_allclose(z.std(), 1.0, atol=5e-3)


def test_qmc_paths_structure():
    sim = SimConfig(n_paths=2048, n_steps=16)
    p = simulate_gbm_qmc(1, M, 1.0, sim)
    assert p.shape == (17, 2048)
    np.testing.assert_allclose(np.asarray(p[0]), 100.0)
    assert np.isfinite(np.asarray(p)).all()


def test_qmc_beats_mc_on_european_price():
    """RMSE over scrambled replicates must beat plain MC at equal budget
    (the whole point of QMC)."""
    import jax

    from amcx import simulate_gbm

    sim = SimConfig(n_paths=4096, n_steps=16)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    want = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, option_type="put"))

    def price(paths):
        return float(lsmc_option_pricing(paths, prod, M.r,
                                         RegressionSpec(degree=2), False).price)

    qmc_err = [price(simulate_gbm_qmc(s, M, 1.0, sim)) - want for s in range(8)]
    mc_err = [price(simulate_gbm(jax.random.key(s), M, 1.0, sim)) - want for s in range(8)]
    rmse_qmc = float(np.sqrt(np.mean(np.square(qmc_err))))
    rmse_mc = float(np.sqrt(np.mean(np.square(mc_err))))
    assert rmse_qmc < 0.5 * rmse_mc, (rmse_qmc, rmse_mc)


def test_qmc_american_prices_sanely():
    from amcx.oracle import crr_price

    sim = SimConfig(n_paths=16_384, n_steps=32)
    paths = simulate_gbm_qmc(3, M, 1.0, sim)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    res = lsmc_option_pricing(paths, prod, M.r, RegressionSpec(degree=4), False)
    crr = float(crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000, option_type="put", american=True))
    assert abs(float(res.price) - crr) < 0.1


def test_device_sobol_kernel_matches_scipy_pointset():
    """The on-device Sobol kernel (natural-order digital net from scipy's
    scrambled direction numbers) must reproduce the scipy engine's point set
    per dimension up to f32 mantissa truncation (interpret mode)."""
    from scipy.stats import norm, qmc

    from amcx.ops.sobol_pallas import sobol_gbm_paths

    n, steps, seed = 2048, 8, 42
    paths = sobol_gbm_paths(seed, 100.0, 0.01, 0.2, 0.0, 1.0, steps, n,
                            interpret=True)
    assert paths.shape == (steps + 1, n)
    np.testing.assert_allclose(np.asarray(paths[0]), 100.0)
    lp = np.diff(np.log(np.asarray(paths, np.float64)), axis=0)
    dt = 1.0 / steps
    z = (lp - (0.01 - 0.5 * 0.04) * dt) / (0.2 * np.sqrt(dt))
    u_mine = norm.cdf(z.T)  # (n, steps)
    u_ref = qmc.Sobol(d=steps, scramble=True, seed=seed).random(n)
    # same point set per dimension (order is a block permutation)
    for d in range(steps):
        gap = np.abs(np.sort(u_mine[:, d]) - np.sort(u_ref[:, d])).max()
        assert gap < 5e-5, (d, gap)


def test_norm_ppf_accuracy():
    from scipy.stats import norm

    from amcx.ops.sobol_pallas import norm_ppf

    p = jnp.linspace(1e-6, 1 - 1e-6, 100_001, dtype=jnp.float32)
    err = np.abs(np.asarray(norm_ppf(p)) - norm.ppf(np.asarray(p, np.float64)))
    assert err.max() < 5e-4


def test_device_qmc_wrapper_cpu_fallback():
    from amcx.ops.sobol_pallas import simulate_gbm_qmc_device

    m = MarketParams(100.0, 0.01, 0.2)
    p = simulate_gbm_qmc_device(3, m, 1.0, SimConfig(n_paths=4096, n_steps=10))
    assert p.shape == (11, 4096)


def test_bridge_matrix_covariance():
    """B @ B.T must reproduce the Brownian covariance min(t_i, t_j)."""
    from amcx.qmc import brownian_bridge_matrix

    n, dt = 13, 0.07  # non-power-of-two: exercises uneven bisection
    B = brownian_bridge_matrix(n, dt)
    t = np.arange(1, n + 1) * dt
    cov = np.minimum(t[:, None], t[None, :])
    np.testing.assert_allclose(B @ B.T, cov, atol=1e-12)


def test_bridge_paths_distribution_matches_increment_order():
    """Bridged paths are the same point set re-ordered: terminal-distribution
    moments agree with the increment ordering."""
    sim = SimConfig(n_paths=4096, n_steps=16)
    p_inc = np.asarray(simulate_gbm_qmc(3, M, 1.0, sim))
    p_bb = np.asarray(simulate_gbm_qmc(3, M, 1.0, sim, brownian_bridge=True))
    assert p_bb.shape == p_inc.shape
    np.testing.assert_allclose(p_bb[0], 100.0)
    # identical terminal log-mean/var up to f32 matmul noise: W_T uses
    # dimension 0 in bridge order vs the sum of all dims in increment order,
    # but both are exactly N(0, T) under the Sobol marginals
    lt_i = np.log(p_inc[-1] / 100.0)
    lt_b = np.log(p_bb[-1] / 100.0)
    assert abs(lt_i.mean() - lt_b.mean()) < 5e-3
    np.testing.assert_allclose(lt_i.std(), lt_b.std(), rtol=2e-2)


def test_bridge_tightens_long_grid_european():
    """On a long step grid the bridge ordering must not lose accuracy vs
    increment ordering (it typically wins; assert no regression beyond
    noise and that both beat plain-MC stderr)."""
    sim = SimConfig(n_paths=4096, n_steps=64)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    want = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, option_type="put"))

    def price(paths):
        return float(lsmc_option_pricing(paths, prod, M.r,
                                         RegressionSpec(degree=2), False).price)

    bb_err = [price(simulate_gbm_qmc(s, M, 1.0, sim, brownian_bridge=True)) - want
              for s in range(6)]
    inc_err = [price(simulate_gbm_qmc(s, M, 1.0, sim)) - want for s in range(6)]
    rmse_bb = float(np.sqrt(np.mean(np.square(bb_err))))
    rmse_inc = float(np.sqrt(np.mean(np.square(inc_err))))
    # MC stderr at 4096 paths is ~0.11; both orderings should be far under
    assert rmse_bb < 0.05, (rmse_bb, rmse_inc)
    assert rmse_bb < 1.5 * rmse_inc, (rmse_bb, rmse_inc)


def test_device_bridge_kernel_matches_host():
    """The in-kernel B@Z matmul (interpret mode) agrees with the host/XLA
    bridge construction on the same scrambled point set."""
    from amcx.ops.sobol_pallas import sobol_gbm_paths

    sim = SimConfig(n_paths=1024, n_steps=8)
    host = np.asarray(simulate_gbm_qmc(5, M, 1.0, sim, brownian_bridge=True))
    dev = np.asarray(sobol_gbm_paths(5, M.S0, M.r, M.sigma, M.q, 1.0, 8, 1024,
                                     interpret=True, brownian_bridge=True))
    # same seed → same scrambled net (natural vs gray-code order is a block
    # permutation); compare sorted terminal values + Acklam-vs-scipy ppf noise
    np.testing.assert_allclose(np.sort(dev[-1]), np.sort(host[-1]), rtol=2e-4)


def test_multi_asset_qmc_beats_mc_and_bridge_helps():
    from amcx.models.basket import basket_level, geometric_basket_price
    from amcx.paths import simulate_gbm_multi
    from amcx.qmc import simulate_gbm_multi_qmc

    corr = np.array([[1.0, 0.3, 0.3], [0.3, 1.0, 0.3], [0.3, 0.3, 1.0]])
    S0, W = [100.0, 95.0, 105.0], [1 / 3] * 3
    ref = geometric_basket_price(S0, W, 100.0, 1.0, 0.05, 0.25, corr=corr,
                                 option_type="call")
    sim = SimConfig(n_paths=2048, n_steps=16)

    def price(paths):
        G = basket_level(paths[-1], W, "geo")
        return float(jnp.mean(jnp.maximum(G - 100.0, 0.0))
                     * np.exp(-0.05))

    e_mc, e_q, e_qb = [], [], []
    for s in range(4):
        e_mc.append(price(simulate_gbm_multi(
            jax.random.key(s), jnp.asarray(S0), 0.05, 0.25, 1.0, sim,
            corr=jnp.asarray(corr))) - ref)
        e_q.append(price(simulate_gbm_multi_qmc(
            s, S0, 0.05, 0.25, 1.0, sim, corr=corr)) - ref)
        e_qb.append(price(simulate_gbm_multi_qmc(
            s, S0, 0.05, 0.25, 1.0, sim, corr=corr,
            brownian_bridge=True)) - ref)
    rms = lambda e: float(np.sqrt(np.mean(np.square(e))))
    # measured at this config: MC ~0.25, sobol ~0.05, bridge ~0.01
    assert rms(e_q) < 0.5 * rms(e_mc), (rms(e_q), rms(e_mc))
    assert rms(e_qb) < rms(e_q) + 1e-9


def test_multi_asset_qmc_single_asset_limit():
    from amcx.qmc import simulate_gbm_multi_qmc, simulate_gbm_qmc
    from amcx import MarketParams

    sim = SimConfig(n_paths=1024, n_steps=8)
    single = simulate_gbm_qmc(3, MarketParams(100.0, 0.05, 0.2), 1.0, sim)
    multi = simulate_gbm_multi_qmc(3, [100.0], 0.05, 0.2, 1.0, sim)
    np.testing.assert_allclose(np.asarray(multi[..., 0]),
                               np.asarray(single), rtol=1e-6)
