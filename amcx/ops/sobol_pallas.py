"""On-device scrambled-Sobol GBM path generation (Pallas TPU kernel).

Replaces the host-side scipy generation of `amcx.qmc` for throughput runs
(VERDICT r1 weak #7 / ROADMAP "on-device Sobol"): the only host work left is
deriving the (LMS-scrambled) direction numbers — the actual point set, the
inverse-CDF normal transform, the log-space prefix sum, and the path write
all run in one kernel, so QMC paths cost about the same as the Box-Muller
pseudo-random kernel instead of a multi-second host round trip.

Construction: a digital (base-2) net point in natural order is
``x_i = shift ⊕ (⊕_{j∈bits(i)} v_j)`` per dimension. The XOR over index bits
factorizes over bit ranges, so with 512-path blocks

    u(i) = u_hi(i >> 9)  ⊕  u_lo(i & 511)

where both tables are precomputed uint32 arrays (``(n_steps, n_blocks)`` and
``(n_steps, 512)``) — the kernel does ONE xor per element. Natural order is
a block-permutation of scipy's gray-code order: identical point sets for
power-of-two path counts (verified against ``scipy.stats.qmc.Sobol``), and
the direction numbers/shift come from scipy's scrambled engine, so the
randomization matches `amcx.qmc.sobol_normals`' Owen/LMS quality.

Normals via the Acklam inverse-CDF rational approximation (branchless
central/tail select; |err| ≲ 1e-6 in f32 — QMC-irrelevant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..types import MarketParams, SimConfig

__all__ = ["sobol_gbm_paths", "simulate_gbm_qmc_device", "norm_ppf"]

LANES = 512
_LOW_BITS = 9  # 2^9 = LANES

# Acklam's inverse normal CDF coefficients
_A = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
_P_LOW = 0.02425


def norm_ppf(p):
    """Branchless Acklam Φ⁻¹ for ``p ∈ (0, 1)`` (f32-safe, Mosaic-lowerable:
    only mul/add/div/log/sqrt)."""
    half = p - 0.5
    # central region
    r = half * half
    num = jnp.float32(_A[0])
    for a in _A[1:]:
        num = num * r + a
    den = jnp.float32(_B[0])
    for b in _B[1:]:
        den = den * r + b
    den = den * r + 1.0
    x_c = num * half / den
    # tails (evaluate on min(p, 1-p); sign restored below)
    pt = jnp.minimum(p, 1.0 - p)
    qt = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(pt, 1e-38)))
    num = jnp.float32(_C[0])
    for c in _C[1:]:
        num = num * qt + c
    den = jnp.float32(_D[0])
    for d in _D[1:]:
        den = den * qt + d
    den = den * qt + 1.0
    x_t = num / den                      # negative (lower-tail form)
    x_t = jnp.where(half < 0, x_t, -x_t)
    return jnp.where(jnp.abs(half) <= 0.5 - _P_LOW, x_c, x_t)


def _bits_to_uniform(u):
    """int32 Sobol integer (30 significant bits) → uniform in (0, 1)."""
    mant = jnp.bitwise_and(u >> 7, jnp.int32(0x007FFFFF))
    f = pltpu.bitcast(jnp.bitwise_or(mant, jnp.int32(0x3F800000)), jnp.float32)
    return f - (1.0 - 2.0 ** -24)  # strictly inside (0, 1)


def _sobol_gbm_kernel(params_ref, uhi_ref, ulo_ref, *rest, n_steps, bridge):
    if bridge:
        bmat_ref, out_ref = rest
    else:
        (out_ref,) = rest
    S0 = params_ref[0]
    drift_dt = params_ref[1]
    vol_sdt = params_ref[2]
    # uhi_ref is a (n_steps, 128) column group; pick this block's column by
    # masked reduction (TPU block lane dims must be 128-divisible, so a
    # (n_steps, 1) block is not liftable directly)
    pid = pl.program_id(0)
    lane = jax.lax.rem(pid, 128)
    mask = jax.lax.broadcasted_iota(jnp.int32, (n_steps, 128), 1) == lane
    col = jnp.sum(jnp.where(mask, uhi_ref[...], 0), axis=1, keepdims=True)
    u = jnp.bitwise_xor(col, ulo_ref[...])  # (n_steps, LANES)
    z = norm_ppf(_bits_to_uniform(u))
    if bridge:
        # Brownian-bridge ordering: W = B @ Z on the MXU (B carries the √dt
        # scale and the dimension permutation; see
        # `amcx.qmc.brownian_bridge_matrix`), then log-levels directly —
        # no prefix sum.
        W = jax.lax.dot_general(
            bmat_ref[...], z, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # Mosaic iota is integer-only; cast to f32 after
        trow = (jax.lax.broadcasted_iota(jnp.int32, W.shape, 0) + 1).astype(
            jnp.float32)
        cum = drift_dt * trow + vol_sdt * W
    else:
        cum = drift_dt + vol_sdt * z
        rows = jax.lax.broadcasted_iota(jnp.int32, cum.shape, 0)
        shift = 1
        while shift < n_steps:
            rolled = pltpu.roll(cum, shift=shift, axis=0)
            cum = cum + jnp.where(rows >= shift, rolled, 0.0)
            shift *= 2
    out_ref[0, :] = jnp.full((out_ref.shape[1],), S0, jnp.float32)
    out_ref[1:, :] = S0 * jnp.exp(cum)


def _direction_tables(seed: int, n_steps: int, n_paths: int):
    """Host-side (numpy) factored XOR tables from scipy's scrambled engine."""
    from scipy.stats import qmc

    eng = qmc.Sobol(d=n_steps, scramble=True, seed=int(seed))
    sv = np.asarray(eng._sv, dtype=np.uint32)          # (n_steps, bits)
    shift = np.asarray(eng._shift, dtype=np.uint32)    # (n_steps,)
    bits = int(eng.bits)
    if n_paths > 1 << bits:
        raise ValueError(f"n_paths exceeds the {bits}-bit Sobol period")
    # scale so bit (bits-1) is the leading fraction bit at position 29
    n_blocks = n_paths // LANES

    def xor_table(indices: np.ndarray) -> np.ndarray:
        acc = np.zeros((n_steps, indices.size), dtype=np.uint32)
        for j in range(bits):
            mask = ((indices >> j) & 1).astype(bool)
            acc[:, mask] ^= sv[:, j:j + 1]
        return acc

    u_lo = xor_table(np.arange(LANES, dtype=np.uint64))
    u_hi = xor_table((np.arange(n_blocks, dtype=np.uint64) << _LOW_BITS))
    u_hi ^= shift[:, None]
    # pad block columns to a multiple of 128 (TPU lane-tiling requirement)
    pad = (-n_blocks) % 128
    if pad:
        u_hi = np.concatenate([u_hi, np.zeros((n_steps, pad), np.uint32)], axis=1)
    # left-align the `bits`-bit integers to 30 bits (the uniform conversion
    # consumes bits 29..7)
    if bits < 30:
        u_hi = u_hi << (30 - bits)
        u_lo = u_lo << (30 - bits)
    return u_hi.view(np.int32), u_lo.view(np.int32)


@functools.partial(jax.jit, static_argnames=("n_steps", "n_paths", "interpret"))
def _run(u_hi, u_lo, params, n_steps, n_paths, interpret, bmat=None):
    kernel = functools.partial(_sobol_gbm_kernel, n_steps=n_steps,
                               bridge=bmat is not None)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((n_steps, 128), lambda i: (0, i // 128),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_steps, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [params, u_hi, u_lo]
    if bmat is not None:
        in_specs.append(
            pl.BlockSpec((n_steps, n_steps), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(bmat)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps + 1, n_paths), jnp.float32),
        grid=(n_paths // LANES,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (n_steps + 1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(*args)


def sobol_gbm_paths(seed, S0, r, sigma, q, T, n_steps, n_paths,
                    interpret: bool = False, brownian_bridge: bool = False):
    """Time-major ``(n_steps+1, n_paths)`` GBM paths from scrambled-Sobol
    increments, generated on device. Power-of-two ``n_paths`` (multiple of
    512) recommended for digital-net balance. ``brownian_bridge`` applies
    the bridge dimension ordering in-kernel (one small MXU matmul per block
    instead of the prefix sum)."""
    if n_paths % LANES:
        raise ValueError(f"n_paths must be a multiple of {LANES}, got {n_paths}")
    u_hi, u_lo = _direction_tables(seed, n_steps, n_paths)
    dt = T / n_steps
    params = jnp.stack([
        jnp.asarray(S0, jnp.float32),
        jnp.asarray((r - q - 0.5 * sigma**2) * dt, jnp.float32),
        # bridge mode: B carries √dt, so the scale is σ alone
        jnp.asarray(sigma, jnp.float32)
        * (1.0 if brownian_bridge
           else jnp.sqrt(jnp.asarray(dt, jnp.float32))),
    ])
    bmat = None
    if brownian_bridge:
        from ..qmc import brownian_bridge_matrix

        bmat = jnp.asarray(brownian_bridge_matrix(n_steps, dt), jnp.float32)
    return _run(jnp.asarray(u_hi), jnp.asarray(u_lo), params, n_steps, n_paths,
                interpret, bmat=bmat)


def simulate_gbm_qmc_device(seed: int, market: MarketParams, T, sim: SimConfig,
                            brownian_bridge: bool = False):
    """`amcx.qmc.simulate_gbm_qmc` signature, kernel execution. Falls back
    to the host-scipy path on CPU backends (the kernel itself lowers under
    the interpreter, but there is no throughput reason to use it there)."""
    if jax.default_backend() == "cpu":
        from ..qmc import simulate_gbm_qmc

        return simulate_gbm_qmc(seed, market, T, sim,
                                brownian_bridge=brownian_bridge)
    return sobol_gbm_paths(seed, market.S0, market.r, market.sigma, market.q,
                           T, sim.n_steps, sim.n_paths,
                           brownian_bridge=brownian_bridge)
