"""Randomized no-arbitrage property sweep across engines.

For a grid of random-but-fixed market/product configs, every engine must
satisfy the model-free bounds:

- American ≥ European (same paths/config)
- European LSMC within MC error of the analytic price
- price ≥ discounted intrinsic lower bounds, ≤ upper bounds
- put-call inequality consistency

This catches sign/discounting/exercise bugs that config-specific tests can
miss.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    bs_price,
    lsmc_option_pricing,
    simulate_gbm,
)
from amcx.engine_pallas import lsmc_option_pricing_fused
from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

rng = np.random.default_rng(2026)
CONFIGS = [
    dict(
        S0=float(rng.uniform(50, 150)),
        K=float(rng.uniform(50, 150)),
        T=float(rng.uniform(0.25, 2.0)),
        r=float(rng.uniform(0.0, 0.08)),
        sigma=float(rng.uniform(0.1, 0.5)),
        ot=str(rng.choice(["put", "call"])),
    )
    for _ in range(8)
]


@pytest.mark.parametrize("cfg", CONFIGS, ids=[f"cfg{i}" for i in range(len(CONFIGS))])
def test_no_arbitrage_bounds_all_engines(cfg):
    m = MarketParams(cfg["S0"], cfg["r"], cfg["sigma"])
    sim = SimConfig(n_paths=32_768, n_steps=20)
    # zlib.crc32, NOT hash(): str hashes are salted per process, which made
    # the path RNG key differ between pytest runs (observed tail flakes).
    paths = simulate_gbm(
        jax.random.key(zlib.crc32(str(cfg).encode()) % 2**31), m, cfg["T"], sim
    )
    # all-paths: the raw megakernel call below fits on all paths, and this
    # test checks ENGINE agreement (the auto->itm default is covered by
    # tests/test_autospec.py)
    spec = RegressionSpec(degree=4, regress_on="all")
    dt = cfg["T"] / 20
    phi = 1.0 if cfg["ot"] == "call" else -1.0

    prod_eu = ProductSpec(K=cfg["K"], T=cfg["T"], option_type=cfg["ot"], exercise="european")
    prod_am = ProductSpec(K=cfg["K"], T=cfg["T"], option_type=cfg["ot"], exercise="american")

    eu = lsmc_option_pricing(paths, prod_eu, m.r, spec, return_surface=False)
    am = lsmc_option_pricing(paths, prod_am, m.r, spec, return_surface=False)
    am_fused = lsmc_option_pricing_fused(paths, prod_am, m.r, spec)
    am_mega = float(lsmc_price_megakernel(paths, cfg["K"], m.r, dt, phi, degree=4))

    p_eu, p_am = float(eu.price), float(am.price)
    se = float(eu.stderr)

    # engines agree (f32 reduction order differs between the chunked kernel
    # accumulators and XLA's tree reduce, which can flip near-boundary
    # exercises; bound by a fraction of the MC error)
    assert abs(float(am_fused.price) - p_am) < max(2e-3, 0.5 * se)
    assert abs(am_mega - p_am) < max(2.5e-3, 0.5 * se)

    # American >= European (regression noise allowance)
    assert p_am >= p_eu - 3 * se

    # European matches analytic within MC error
    analytic = float(bs_price(cfg["S0"], cfg["K"], cfg["T"], cfg["r"], cfg["sigma"],
                              option_type=cfg["ot"]))
    assert abs(p_eu - analytic) < 5 * max(se, 1e-4)

    # model-free bounds
    disc_K = cfg["K"] * np.exp(-cfg["r"] * cfg["T"])
    if cfg["ot"] == "call":
        lower = max(cfg["S0"] - disc_K, 0.0)
        upper = cfg["S0"]
    else:
        lower = max(disc_K - cfg["S0"], 0.0)
        upper = disc_K
        # American put upper bound is K
        assert p_am <= cfg["K"] + 3 * se
    assert p_eu >= lower - 4 * se
    assert p_eu <= upper + 4 * se
    # American put >= intrinsic
    if cfg["ot"] == "put":
        assert p_am >= max(cfg["K"] - cfg["S0"], 0.0) - 3 * se
