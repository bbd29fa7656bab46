"""Aux subsystems (SURVEY §5): determinism/recovery, result IO, NaN checks,
throughput harness."""

import jax
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    price_option,
)
from amcx.utils.io import load_result, replay, save_result
from amcx.utils.profiling import Throughput, annotate, enable_nan_checks

M = MarketParams(100.0, 0.01, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SPEC = RegressionSpec(degree=3)
SIM = SimConfig(n_paths=8192, n_steps=10)


def _run(seed):
    return price_option(jax.random.key(seed), M, PROD, SPEC, SIM, return_surface=False)


def test_deterministic_rerun_from_key_and_config():
    """Counter-based RNG: (key, config) fully determines the price — the
    recovery story (SURVEY §5)."""
    a = _run(7)
    b = _run(7)
    # same key, same config -> same result (tolerance: XLA CPU threadpool
    # reductions are not guaranteed bitwise-stable run to run)
    np.testing.assert_allclose(float(a.price), float(b.price), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.cashflows), np.asarray(b.cashflows), rtol=1e-5)
    assert abs(float(_run(8).price) - float(a.price)) > 1e-3


def test_save_load_replay(tmp_path):
    from amcx import lsmc_option_pricing, simulate_gbm

    paths = simulate_gbm(jax.random.key(7), M, 1.0, SIM)
    res = lsmc_option_pricing(paths, PROD, M.r, SPEC, return_surface=True,
                              surface_stats=True, return_coeffs=True)
    cfg = {"seed": 7, "n_paths": SIM.n_paths, "n_steps": SIM.n_steps}
    f = tmp_path / "run.npz"
    save_result(f, res, cfg)
    loaded = load_result(f)
    assert loaded["config"] == cfg
    np.testing.assert_allclose(loaded["price"], float(res.price))
    assert loaded["coeffs"].shape == (10, 4)
    assert loaded["epe"].shape == (11,)

    def price_fn(config):
        p = simulate_gbm(jax.random.key(config["seed"]), M, 1.0, SIM)
        # return_surface=True: the saved run requested the surface, which
        # resolves the auto spec to the all-paths estimator — the replay
        # must reprice with the same resolution to reproduce the price
        return lsmc_option_pricing(p, PROD, M.r, SPEC, return_surface=True).price

    assert replay(f, price_fn)
    assert not replay(f, lambda c: 0.0)


def test_nan_checks_toggle():
    import jax.numpy as jnp

    enable_nan_checks(True)
    try:
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jnp.log(x) * 0 + jnp.sqrt(x - 2.0))(jnp.float32(1.0)).block_until_ready()
    finally:
        enable_nan_checks(False)


def test_throughput_harness():
    import jax.numpy as jnp

    th = Throughput(n_paths=SIM.n_paths, n_steps=SIM.n_steps, iters=2)
    out = th.measure(lambda key: _run(0).price)
    assert out["path_steps_per_sec"] > 0


def test_trace_annotation_context():
    with annotate("simulate"):
        _ = _run(0)


def test_device_op_times():
    """Profile parsing works on the CPU plane too."""
    import jax.numpy as jnp

    from amcx.utils.profiling import device_op_times

    f = jax.jit(lambda x: jnp.sin(x) @ x)
    rows = device_op_times(f, jnp.ones((256, 256)))
    assert rows and all(ms >= 0 for _, ms in rows)
