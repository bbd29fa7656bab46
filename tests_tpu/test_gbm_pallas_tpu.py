"""Pallas GBM kernel statistical tests — REAL TPU ONLY.

Run directly on the TPU host (no conftest platform override here):
    python -m pytest tests_tpu/ -q
The hardware PRNG has no CPU implementation (the interpreter stubs it), so
these cannot run under the CPU-forced main suite in ``tests/``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, price_option
from amcx.oracle import crr_price
from amcx.paths import simulate_gbm

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a real TPU (hardware PRNG)"
)

M = MarketParams(100.0, 0.01, 0.2)


def test_pallas_path_statistics():
    sim = SimConfig(n_paths=102_400, n_steps=50, backend="pallas")
    paths = simulate_gbm(jax.random.key(5), M, 1.0, sim)
    lp = np.diff(np.log(np.asarray(paths, np.float64)), axis=0)
    dt = 1.0 / 50
    want_mean = (0.01 - 0.5 * 0.04) * dt
    want_std = 0.2 * np.sqrt(dt)
    se = want_std / np.sqrt(lp.size)
    assert abs(lp.mean() - want_mean) < 5 * se
    np.testing.assert_allclose(lp.std(), want_std, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(paths[0]), 100.0)


def test_pallas_antithetic_mirroring():
    sim = SimConfig(n_paths=102_400, n_steps=50, backend="pallas", antithetic=True)
    paths = np.log(np.asarray(simulate_gbm(jax.random.key(5), M, 1.0, sim), np.float64) / 100.0)
    drift = (0.01 - 0.02) * (1.0 / 50) * np.arange(51)[:, None]
    c = paths - drift
    half = 51_200
    np.testing.assert_allclose(c[:, :half], -c[:, half:], atol=2e-5)


def test_pallas_price_matches_oracle():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    sim = SimConfig(n_paths=102_400, n_steps=100, backend="pallas")
    res = price_option(jax.random.key(0), M, prod, RegressionSpec(degree=4), sim)
    crr = float(crr_price(100.0, 100.0, 1.0, 0.01, 0.2, 2000, option_type="put", american=True))
    assert abs(float(res.price) - crr) < 0.2


def test_fused_engine_on_hardware():
    from amcx import RegressionSpec, SimConfig
    from amcx.engine_pallas import lsmc_option_pricing_fused
    from amcx.paths import simulate_gbm

    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    paths = simulate_gbm(jax.random.key(1), M, 1.0,
                         SimConfig(n_paths=102_400, n_steps=100, backend="pallas"))
    res = lsmc_option_pricing_fused(paths, prod, M.r, RegressionSpec(degree=4))
    crr = float(crr_price(100.0, 100.0, 1.0, 0.01, 0.2, 2000, option_type="put", american=True))
    assert abs(float(res.price) - crr) < 0.2


def test_megakernel_on_hardware():
    from amcx import SimConfig
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel
    from amcx.paths import simulate_gbm

    paths = simulate_gbm(jax.random.key(2), M, 1.0,
                         SimConfig(n_paths=131_072, n_steps=100, backend="pallas"))
    p = lsmc_price_megakernel(paths, 100.0, 0.01, 0.01, -1.0, degree=4)
    crr = float(crr_price(100.0, 100.0, 1.0, 0.01, 0.2, 2000, option_type="put", american=True))
    assert abs(float(p) - crr) < 0.2


def test_bench_contract_line():
    """bench.py must print exactly one parseable JSON line with the driver
    contract keys."""
    import json
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True, timeout=900,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    payload = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["vs_baseline"] > 1.0


def test_blocked_pathgen_statistics_and_mega():
    """Blocked-layout path generation (the relayout-free production path):
    log-increment statistics match GBM, and the mega-kernel on the blocked
    array agrees with itself on the 2-D reshape of the same array."""
    from amcx.ops.gbm_pallas import gbm_paths_pallas
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel
    from amcx.paths import gbm_standardization

    n_paths, n_steps = 262_144, 50
    pb = gbm_paths_pallas(7, M.S0, M.r, M.sigma, M.q, 1.0, n_steps, n_paths,
                          out_blocked=True)
    assert pb.shape == (n_steps + 1, n_paths // 512, 512)
    p2 = np.asarray(pb, np.float64).reshape(n_steps + 1, n_paths)
    lp = np.diff(np.log(p2), axis=0)
    dt = 1.0 / n_steps
    want_mean = (M.r - 0.5 * M.sigma**2) * dt
    want_std = M.sigma * np.sqrt(dt)
    se = want_std / np.sqrt(lp.size)
    assert abs(lp.mean() - want_mean) < 5 * se
    np.testing.assert_allclose(lp.std(), want_std, rtol=3e-3)
    np.testing.assert_allclose(p2[0], 100.0)

    mean_t, inv_std_t = gbm_standardization(M, 1.0, n_steps)
    pm3 = lsmc_price_megakernel(pb, 100.0, M.r, dt, -1.0, degree=4,
                                mean_t=mean_t, inv_std_t=inv_std_t)
    pm2 = lsmc_price_megakernel(jnp_asarray(pb).reshape(n_steps + 1, n_paths),
                                100.0, M.r, dt, -1.0, degree=4,
                                mean_t=mean_t, inv_std_t=inv_std_t)
    assert abs(float(pm3) - float(pm2)) < 1e-5
    crr = float(crr_price(100.0, 100.0, 1.0, M.r, M.sigma, 2000,
                          option_type="put", american=True))
    assert abs(float(pm3) - crr) < 0.05


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_device_sobol_on_hardware():
    """On-device scrambled-Sobol pathgen: prices the European put with
    QMC-grade error (well under the MC stderr at this size) on the chip."""
    from amcx.ops.sobol_pallas import sobol_gbm_paths
    from amcx import ProductSpec, RegressionSpec, lsmc_option_pricing
    from amcx.oracle import bs_price

    n, steps = 65_536, 50
    bs = float(bs_price(100.0, 100.0, 1.0, M.r, M.sigma, option_type="put"))
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    errs = []
    for seed in (1, 2, 3):
        pq = sobol_gbm_paths(seed, M.S0, M.r, M.sigma, M.q, 1.0, steps, n)
        r = lsmc_option_pricing(pq, prod, M.r, RegressionSpec(degree=4),
                                return_surface=False)
        errs.append(abs(float(r.price) - bs))
    # MC stderr at 65k paths is ~0.037; scrambled Sobol should sit well
    # inside it on every seed (typical ~0.002-0.012)
    assert max(errs) < 0.02, errs


def test_device_sobol_bridge_on_hardware():
    """Brownian-bridge mode of the Sobol kernel (in-kernel MXU matmul
    against B): lowers on the chip, agrees with the host/XLA bridge path on
    the same scrambled net, and keeps QMC-grade pricing error."""
    from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
    from amcx import lsmc_option_pricing
    from amcx.oracle import bs_price
    from amcx.ops.sobol_pallas import sobol_gbm_paths
    from amcx.qmc import simulate_gbm_qmc

    m = MarketParams(100.0, 0.05, 0.2)
    dev = sobol_gbm_paths(5, 100.0, 0.05, 0.2, 0.0, 1.0, 64, 8192,
                          brownian_bridge=True)
    host = simulate_gbm_qmc(5, m, 1.0, SimConfig(n_paths=8192, n_steps=64),
                            brownian_bridge=True)
    # same point set, Acklam-vs-scipy Φ⁻¹ + f32 MXU noise
    np.testing.assert_allclose(float(jnp.mean(dev[-1])),
                               float(jnp.mean(host[-1])), rtol=1e-4)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    p = float(lsmc_option_pricing(dev, prod, 0.05, RegressionSpec(degree=2),
                                  return_surface=False).price)
    want = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, option_type="put"))
    assert abs(p - want) < 0.02, (p, want)  # MC stderr here would be ~0.11
