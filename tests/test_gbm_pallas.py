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


def test_sincos_2pi_polynomial_accuracy():
    """The quadrant-folded minimax sincos must match numpy over (0, 1] to
    a few f32 ulps (it replaces Mosaic's ~16-cycle transcendental lowering
    in the Box-Muller hot loop)."""
    from amcx.ops.gbm_pallas import _sincos_2pi

    u = jnp.linspace(1e-6, 1.0, 20001, dtype=jnp.float32)
    sn, cs = _sincos_2pi(u)
    ref_s = np.sin(2 * np.pi * np.asarray(u, np.float64))
    ref_c = np.cos(2 * np.pi * np.asarray(u, np.float64))
    np.testing.assert_allclose(np.asarray(sn), ref_s, atol=3e-7)
    np.testing.assert_allclose(np.asarray(cs), ref_c, atol=3e-7)


def test_gbm_standardization_matches_data_stats():
    """Closed-form GBM standardization stats agree with data statistics of a
    large simulated path set (the analytic stats replace the XLA sweep in
    the production mega pipeline)."""
    from amcx.paths import gbm_standardization

    m = MarketParams(100.0, 0.03, 0.25, 0.01)
    sim = SimConfig(n_paths=200_000, n_steps=12)
    paths = simulate_gbm(jax.random.key(3), m, 2.0, sim)
    mean_a, inv_std_a = gbm_standardization(m, 2.0, 12)
    mean_d = jnp.mean(paths, axis=1)
    std_d = jnp.std(paths, axis=1)
    # t=0: exact
    assert float(mean_a[0]) == 100.0
    np.testing.assert_allclose(np.asarray(mean_a)[1:], np.asarray(mean_d)[1:], rtol=3e-3)
    np.testing.assert_allclose(1.0 / np.asarray(inv_std_a)[1:], np.asarray(std_d)[1:], rtol=2e-2)


def test_megakernel_blocked_input_matches_2d():
    """The mega-kernel accepts pre-blocked (T+1, rows, 512) paths (the
    relayout-free production layout) and must price identically to the same
    paths passed 2-D."""
    from amcx.ops.lsmc_megakernel import LANES, lsmc_price_megakernel

    m = MarketParams(100.0, 0.01, 0.2)
    sim = SimConfig(n_paths=8192, n_steps=6)
    paths = simulate_gbm(jax.random.key(11), m, 1.0, sim)
    blocked = paths.reshape(7, sim.n_paths // LANES, LANES)
    p2 = lsmc_price_megakernel(paths, 100.0, m.r, 1.0 / 6, -1.0, degree=3)
    p3 = lsmc_price_megakernel(blocked, 100.0, m.r, 1.0 / 6, -1.0, degree=3)
    np.testing.assert_allclose(float(p3), float(p2), atol=1e-6)
    # analytic stats give the same price up to conditioning noise
    from amcx.paths import gbm_standardization

    mean_t, inv_std_t = gbm_standardization(m, 1.0, 6)
    pa = lsmc_price_megakernel(blocked, 100.0, m.r, 1.0 / 6, -1.0, degree=3,
                               mean_t=mean_t, inv_std_t=inv_std_t)
    np.testing.assert_allclose(float(pa), float(p2), atol=2.5e-3)


def test_curve_pathgen_interpret_zero_noise():
    """Term-structure pathgen (per-step drift/vol planes): with the
    interpreter's zero PRNG bits every path is exactly S0·e^{D_t}, the
    cumulative curve drift — validates the plane plumbing and the
    blocked-layout broadcast; flat vectors reproduce the scalar path."""
    from amcx.ops.gbm_pallas import gbm_paths_pallas

    I = pltpu.InterpretParams()
    n_steps = 10
    r_t = jnp.linspace(0.02, 0.08, n_steps)
    sig_t = jnp.linspace(0.15, 0.35, n_steps)
    p = gbm_paths_pallas(3, 100.0, r_t, sig_t, 0.0, 1.0, n_steps, 4096,
                         interpret=I)
    dt = 1.0 / n_steps
    D = np.concatenate([[0.0], np.cumsum(
        (np.asarray(r_t) - 0.5 * np.asarray(sig_t) ** 2) * dt)])
    np.testing.assert_allclose(np.asarray(p[:, 0]), 100.0 * np.exp(D),
                               rtol=2e-6)
    pb = gbm_paths_pallas(3, 100.0, r_t, sig_t, 0.0, 1.0, n_steps, 8 * 4096,
                         interpret=I, out_blocked=True)
    np.testing.assert_allclose(np.asarray(pb[:, 0, 0]), 100.0 * np.exp(D),
                               rtol=2e-6)
    pf = gbm_paths_pallas(3, 100.0, 0.05, 0.2, 0.0, 1.0, n_steps, 4096,
                          interpret=I)
    pv = gbm_paths_pallas(3, 100.0, jnp.full(n_steps, 0.05),
                          jnp.full(n_steps, 0.2), 0.0, 1.0, n_steps, 4096,
                          interpret=I)
    np.testing.assert_allclose(np.asarray(pv), np.asarray(pf), rtol=2e-7)
    with pytest.raises(ValueError, match="scalar or an"):
        gbm_paths_pallas(3, 100.0, r_t[:5], 0.2, 0.0, 1.0, n_steps, 4096,
                         interpret=I)
