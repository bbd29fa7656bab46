"""Pallas GBM kernel: CPU-side plumbing checks + XLA fallback.

The hardware PRNG has no CPU lowering and the TPU interpreter stubs
`prng_random_bits` with constant zero bits, so *statistical* kernel tests
live in ``tests_tpu/`` (run on real TPU by the bench driver). Here we verify,
via the TPU interpreter on CPU:

- block plumbing: shapes, S0 row, per-block layout;
- the deterministic zero-bits case: bits=0 → uniform=1.0 → Box-Muller z=0 →
  every log-increment is exactly the drift term (validates the whole
  bit-trick + cumsum-unroll chain around the RNG);
- the documented CPU fallback of `simulate_gbm_pallas` to the XLA simulator.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amcx import MarketParams, SimConfig
from amcx.ops.gbm_pallas import BLOCK_PATHS, _gbm_kernel, simulate_gbm_pallas
from amcx.paths import simulate_gbm


def _run_interpret(n_steps, n_paths, S0=100.0, drift_dt=-1e-4, vol_sdt=0.02,
                   antithetic=False, seed=7):
    kernel = functools.partial(_gbm_kernel, n_steps=n_steps, antithetic=antithetic)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps + 1, n_paths), jnp.float32),
        grid=(n_paths // BLOCK_PATHS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (n_steps + 1, BLOCK_PATHS), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=pltpu.InterpretParams(),
    )(
        jnp.asarray([seed], jnp.int32),
        jnp.asarray([S0, drift_dt, vol_sdt], jnp.float32),
    )


def test_kernel_plumbing_zero_bits_gives_pure_drift():
    out = np.asarray(_run_interpret(20, 1024))
    assert out.shape == (21, 1024)
    np.testing.assert_allclose(out[0], 100.0)
    # interpreter PRNG yields constant zero bits -> z == 0 -> each increment
    # is exactly exp(drift_dt)
    logs = np.diff(np.log(out.astype(np.float64)), axis=0)
    np.testing.assert_allclose(logs, -1e-4, rtol=1e-3)


def test_kernel_antithetic_blocks_mirror():
    out = np.asarray(_run_interpret(10, 2048, vol_sdt=0.02, antithetic=True))
    # with zero-bit PRNG both halves are drift-only; the structural check is
    # that the mirrored half equals drift - (brownian) = same here
    assert out.shape == (11, 2048)
    np.testing.assert_allclose(out[:, :1024], out[:, 1024:], rtol=1e-5)


def test_simulate_gbm_pallas_cpu_fallback_matches_xla():
    """On CPU the pallas backend must transparently produce the XLA paths."""
    sim_x = SimConfig(n_paths=2048, n_steps=16, backend="xla")
    sim_p = SimConfig(n_paths=2048, n_steps=16, backend="pallas")
    m = MarketParams(100.0, 0.01, 0.2)
    key = jax.random.key(3)
    a = simulate_gbm(key, m, 1.0, sim_x)
    b = simulate_gbm(key, m, 1.0, sim_p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_multiple_validation():
    with pytest.raises(ValueError, match="multiple"):
        from amcx.ops.gbm_pallas import gbm_paths_pallas

        gbm_paths_pallas(0, 100.0, 0.01, 0.2, 0.0, 1.0, 10, 1000)
