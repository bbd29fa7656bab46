"""Pallas TPU kernel: GBM path generation with on-device counter-based RNG.

The BASELINE.json north star: "the GBM path simulator becomes a Pallas
kernel driven by counter-based RNG with paths resident in HBM". Compared to
the plain-XLA simulator (`amcx.paths._simulate_gbm_xla`), this kernel

- draws random bits with the TPU per-core PRNG (`pltpu.prng_random_bits`),
  seeded per path-block — no HBM round-trip for the normals (the XLA path
  materializes a full (n_steps, n_paths) normals array in HBM before the
  cumsum; here normals live only in VMEM registers),
- converts bits to standard normals via Box-Muller on the VPU,
- does the log-space cumulative sum and exponentiation in-kernel, streaming
  one (n_steps+1, BLOCK_PATHS) tile of finished paths straight to HBM.

Memory traffic drops from ~2 reads + 2 writes per path-step to a single
write — path generation becomes purely store-bandwidth-bound.

Reference semantics: exact-GBM increments as in `generate_asset_paths`
(`/root/reference/american_monte_carlo.py:72-81`); RNG equivalence is
statistical (SURVEY Q8). Reproducibility: the output is a pure function of
(seed, shape, grid), independent of how many chips the caller shards over
(each block folds its global block index into the seed).

Antithetic variates: the mirrored path is an exact function of the original
(S_anti(t) = S0² e^{2·drift·t} / S(t)), computed in-kernel for the second
half of the path axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import MarketParams, SimConfig

__all__ = ["simulate_gbm_pallas", "gbm_paths_pallas"]

BLOCK_PATHS = 512  # lanes: multiple of 128; 101×512 f32 tile ≈ 200 KB VMEM
_TWO_PI = 6.283185307179586

# Minimax polynomial coefficients for sin/cos on [-π/2, π/2] (least-squares
# on Chebyshev nodes; max abs error 3.4e-9 / 2.2e-10 — below f32 eps).
# Mosaic's general-range sin/cos lowering costs ~16 cycles per vreg each;
# with the argument already in (0, 1] turns the pair into ~18 single-cycle
# VPU ops via quadrant folding (measured: 1M×100 pathgen 5.2 → 3.5 ms).
_SIN_C = (9.99999977e-01, -1.66666476e-01, 8.33289921e-03, -1.98008646e-04,
          2.59042857e-06)
_COS_C = (1.00000000e+00, -4.99999994e-01, 4.16666362e-02, -1.38883608e-03,
          2.47601340e-05, -2.60510518e-07)


def _sincos_2pi(u):
    """``(sin(2πu), cos(2πu))`` for ``u ∈ (0, 1]``.

    Quadrant folding in the *uniform* domain (exact arithmetic on u, no
    large-angle reduction needed): fold to ``b ∈ [0, 1/4]`` (x = 2πb ∈
    [0, π/2]), evaluate odd/even minimax polynomials, restore signs.
    """
    t = u - jnp.round(u)               # [-1/2, 1/2], cos/sin(2πt) == (2πu)
    a = jnp.abs(t)
    big = a > 0.25
    b = jnp.where(big, 0.5 - a, a)     # [0, 1/4]
    x = _TWO_PI * b                    # [0, π/2]
    x2 = x * x
    s = jnp.float32(_SIN_C[-1])
    for c in _SIN_C[-2::-1]:
        s = s * x2 + c
    s = s * x
    cpoly = jnp.float32(_COS_C[-1])
    for c in _COS_C[-2::-1]:
        cpoly = cpoly * x2 + c
    # sin(2πa) == sin poly for both folds; cos flips sign past the quadrant
    return jnp.where(t < 0, -s, s), jnp.where(big, -cpoly, cpoly)


def _random_uniform(shape):
    """float32 uniform in (0, 1] from raw PRNG bits.

    Mosaic supports neither uint32->f32 casts nor logical shifts of the
    int32 PRNG output, so build the float bitwise: 23 random mantissa bits
    OR'd with the exponent of 1.0 gives [1, 2); ``2 - x`` maps to (0, 1]
    (safe for log).
    """
    bits = pltpu.prng_random_bits(shape)  # int32 on TPU
    mantissa = jnp.bitwise_and(bits, jnp.int32(0x007FFFFF))
    one_to_two = pltpu.bitcast(
        jnp.bitwise_or(mantissa, jnp.int32(0x3F800000)), jnp.float32
    )
    return 2.0 - one_to_two


def _box_muller(shape):
    """Standard normals via the full Box-Muller pair (hardware PRNG must
    already be seeded).

    Both the cosine and sine normals are used, so each output normal costs
    one uniform draw and ~0.5 log + 0.5 sqrt + the polynomial sincos pair.
    ``shape[0]`` (time steps) may be odd; one surplus row is dropped.
    ``shape`` may have extra trailing dims (blocked layouts).
    """
    rows = shape[0]
    half = (rows + 1) // 2
    u1 = _random_uniform((half,) + shape[1:])
    u2 = _random_uniform((half,) + shape[1:])
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    sn, cs = _sincos_2pi(u2)
    z = jnp.concatenate([r * cs, r * sn], axis=0)
    return z[:rows]


def _gbm_kernel(seed_ref, params_ref, *refs, n_steps, antithetic,
                curves=False):
    # refs = ([drift plane, vol plane] if curves) + [out]
    if curves:
        drift_ref, vol_ref, out_ref = refs
    else:
        (out_ref,) = refs
    pid = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    S0 = params_ref[0]
    drift_dt = params_ref[1]  # (r - q - σ²/2)·dt
    vol_sdt = params_ref[2]  # σ·√dt

    if antithetic:
        # Blocks [half, 2·half) mirror blocks [0, half): same seed stream.
        half = n_blocks // 2
        mirror = pid >= half
        base = jnp.where(mirror, pid - half, pid)
    else:
        mirror = False
        base = pid

    pltpu.prng_seed(seed_ref[0], base)

    z = _box_muller((n_steps,) + out_ref.shape[1:])
    if antithetic:
        sign = jnp.where(mirror, -1.0, 1.0)
        z = z * sign
    if curves:
        # deterministic term structures: per-step (r_t − q_t − σ_t²/2)·dt
        # and σ_t·√dt arrive as (n_steps, lanes) planes (host-replicated
        # across lanes); the blocked layout broadcasts them over the unit
        # sublane axis. Everything downstream (prefix sum, exp) unchanged.
        d_t = drift_ref[...]
        w_t = vol_ref[...]
        if len(out_ref.shape) == 3:
            d_t = d_t[:, None, :]
            w_t = w_t[:, None, :]
        log_inc = d_t + w_t * z
    else:
        log_inc = drift_dt + vol_sdt * z
    # Running log-sum over time. jnp.cumsum has no Mosaic lowering, and a
    # row-by-row unrolled loop runs 1/8-utilized (1, lanes) VPU ops — so do
    # a Hillis-Steele prefix sum: ceil(log2(n_steps)) full-shape shifted
    # adds, then ONE bulk exp over the whole (n_steps, lanes) tile.
    cum = log_inc
    rows = jax.lax.broadcasted_iota(jnp.int32, cum.shape, 0)
    shift = 1
    while shift < n_steps:
        rolled = pltpu.roll(cum, shift=shift, axis=0)
        cum = cum + jnp.where(rows >= shift, rolled, 0.0)
        shift *= 2
    out_ref[0] = jnp.full(out_ref.shape[1:], S0, jnp.float32)
    out_ref[1:] = S0 * jnp.exp(cum)


@functools.partial(jax.jit, static_argnames=("n_steps", "n_paths", "antithetic",
                                              "interpret", "out_blocked"))
def gbm_paths_pallas(seed, S0, r, sigma, q, T, n_steps, n_paths, antithetic=False,
                     interpret=False, out_blocked=False):
    """Time-major ``(n_steps+1, n_paths)`` float32 GBM paths, generated
    entirely in-kernel.

    ``seed`` is an int32 scalar; every path block derives its stream from
    ``(seed, block_index)`` so results are independent of sharding layout.

    ``r``/``sigma``/``q`` may each be an ``(n_steps,)`` piecewise-constant
    curve (`amcx.term` grid): the per-step drift/vol rows ride as two small
    lane-replicated VMEM planes and scale the increments before the prefix
    sum — exact log-normal curve paths at flagship pathgen speed.

    ``out_blocked=True`` emits ``(n_steps+1, n_paths // 512, 512)`` — the
    lane-blocked layout the LSMC kernels consume. This is not cosmetic: on
    TPU the 2-D→blocked reshape splits the (tiled) lane dimension, which XLA
    must implement as a physical transpose-copy plus a slice (~2×800 MB of
    HBM traffic at 1M×100, ≈4 ms — measured). Generating blocked avoids the
    relayout entirely. Each grid block then spans 8 sublane rows (4096
    paths, tile-aligned), so blocked and unblocked modes draw different —
    equally valid — PRNG streams for the same seed.
    """
    if n_paths % BLOCK_PATHS:
        raise ValueError(f"n_paths must be a multiple of {BLOCK_PATHS}, got {n_paths}")
    if out_blocked and n_paths % (8 * BLOCK_PATHS):
        raise ValueError(
            f"blocked output needs n_paths divisible by {8 * BLOCK_PATHS}, got {n_paths}"
        )
    n_blocks = (n_paths // (8 * BLOCK_PATHS)) if out_blocked else (n_paths // BLOCK_PATHS)
    if antithetic and n_blocks % 2:
        raise ValueError("antithetic pallas paths need an even number of path blocks")
    dt = T / n_steps
    # deterministic term structures: r/sigma/q may each be an (n_steps,)
    # curve (amcx.term grid); per-step drift/vol rows ride as VMEM planes
    r_a = jnp.asarray(r, jnp.float32)
    sig_a = jnp.asarray(sigma, jnp.float32)
    q_a = jnp.asarray(q, jnp.float32)
    curves = any(x.ndim > 0 for x in (r_a, sig_a, q_a))
    if curves:
        for name, x in (("r", r_a), ("sigma", sig_a), ("q", q_a)):
            if x.ndim > 1 or (x.ndim == 1 and x.shape != (n_steps,)):
                raise ValueError(
                    f"{name} must be a scalar or an (n_steps,) vector; got "
                    f"shape {x.shape} for n_steps={n_steps}")
        dt_f = jnp.asarray(dt, jnp.float32)
        r_t = jnp.broadcast_to(r_a, (n_steps,))
        sig_t = jnp.broadcast_to(sig_a, (n_steps,))
        q_t = jnp.broadcast_to(q_a, (n_steps,))
        drift_plane = jnp.broadcast_to(
            ((r_t - q_t - 0.5 * jnp.square(sig_t)) * dt_f)[:, None],
            (n_steps, BLOCK_PATHS))
        vol_plane = jnp.broadcast_to(
            (sig_t * jnp.sqrt(dt_f))[:, None], (n_steps, BLOCK_PATHS))
        drift_eff = jnp.float32(0.0)
        sig_eff = jnp.float32(0.0)
    else:
        drift_eff = jnp.asarray((r - q - 0.5 * sigma**2) * dt, jnp.float32)
        sig_eff = sig_a * jnp.sqrt(jnp.asarray(dt, jnp.float32))
    params = jnp.stack(
        [
            jnp.asarray(S0, jnp.float32),
            drift_eff,
            sig_eff,
        ]
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))

    kernel = functools.partial(_gbm_kernel, n_steps=n_steps,
                               antithetic=antithetic, curves=curves)
    compiler_params = None
    if out_blocked:
        # (101, 8, 512) blocks: 8-sublane rows keep the step-plane blocks of
        # the consuming LSMC kernels tile-aligned.
        out_shape = jax.ShapeDtypeStruct(
            (n_steps + 1, n_paths // BLOCK_PATHS, BLOCK_PATHS), jnp.float32
        )
        out_spec = pl.BlockSpec(
            (n_steps + 1, 8, BLOCK_PATHS), lambda i: (0, i, 0),
            memory_space=pltpu.VMEM,
        )
        # z/u/cum temporaries are 8x the unblocked variant's; the whole
        # time axis is VMEM-resident, so long grids need a proportionally
        # higher cap (100-step flagship fits in 48 MB; ~1000 steps needs
        # ~3 planes x 16 MB + Box-Muller temps)
        plane_bytes = (n_steps + 1) * 8 * BLOCK_PATHS * 4
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=min(110 * 1024 * 1024,
                                 max(48 * 1024 * 1024, 6 * plane_bytes)))
    else:
        out_shape = jax.ShapeDtypeStruct((n_steps + 1, n_paths), jnp.float32)
        out_spec = pl.BlockSpec(
            (n_steps + 1, BLOCK_PATHS), lambda i: (0, i),
            memory_space=pltpu.VMEM,
        )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [seed_arr, params]
    if curves:
        plane_spec = pl.BlockSpec((n_steps, BLOCK_PATHS), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        in_specs += [plane_spec, plane_spec]
        operands += [drift_plane, vol_plane]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=compiler_params,
        interpret=interpret,
    )(*operands)


def _key_to_seed(key: jax.Array) -> jnp.ndarray:
    """Derive an int32 seed from a jax PRNG key (keeps the public API keyed
    like `amcx.paths.simulate_gbm`)."""
    data = jax.random.key_data(key)
    return jnp.asarray(data.ravel()[-1], jnp.int32)


def simulate_gbm_pallas(key: jax.Array, market: MarketParams, T, sim: SimConfig):
    """`amcx.paths.simulate_gbm`-compatible wrapper around the kernel.

    TPU-only: the hardware PRNG has no CPU lowering and the TPU interpreter
    stubs it with constant bits, so on non-TPU backends this silently falls
    back to the XLA threefry simulator (same distribution, different
    stream).
    """
    if jax.default_backend() == "cpu":
        from ..paths import _simulate_gbm_xla

        dtype = sim.jnp_dtype
        return _simulate_gbm_xla(
            key,
            jnp.asarray(market.S0, dtype),
            jnp.asarray(market.r, dtype),
            jnp.asarray(market.sigma, dtype),
            jnp.asarray(market.q, dtype),
            jnp.asarray(T, dtype),
            sim.n_steps,
            sim.n_paths,
            dtype,
            sim.antithetic,
        )
    return gbm_paths_pallas(
        _key_to_seed(key),
        market.S0,
        market.r,
        market.sigma,
        market.q,
        T,
        sim.n_steps,
        sim.n_paths,
        antithetic=sim.antithetic,
    )
