"""Fused Pallas kernels for the multi-asset (max-call) LSMC step.

Brings BASELINE config 5 onto the TPU-native kernel path (VERDICT r1 #9):
the XLA multi-asset engine (`amcx.models.maxcall.max_call_fit`) materializes
the ``(n_paths, m)`` cross-term design matrix in HBM every step (~84 MB at
1M paths, m=21) and re-reads it for the MXU einsum; these kernels build the
cross-term columns in-register from the asset planes and accumulate the
packed Gram/moment vector in one pass, exactly like the univariate
`amcx.ops.lsmc_pallas` kernels.

Layout: the multi-asset path array is kept **asset-major blocked** per step:
``(n_assets, rows, 512)`` — each asset plane is a tile-aligned (rows, 512)
matrix, so a ``(A, 8, 512)`` grid block streams all assets of 4096 paths.
The basket sort (``mode="sorted"`` — the order-statistics feature space of
`amcx.models.maxcall`) runs as a static compare-exchange network over the A
tile values.

Per-step cost at m basis columns is ``m(m+1)/2 + m`` multiply-accumulate
sweeps on the VPU; for the benchmark basis sizes (m ≤ ~30) this beats the
HBM-round-tripping einsum. For much larger m the MXU einsum wins — keep the
XLA engine for those.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..basis import BASIS_FAMILIES, _first_order, _multi_index_set
from .lsmc_pallas import LANES, TILE_ROWS, pack_dim as _pack_dim  # noqa: F401

__all__ = ["ma_step_moments", "ma_step_apply", "ma_pack_dim"]


def ma_pack_dim(m: int) -> int:
    return m * (m + 1) // 2 + m


def _pairs(m: int):
    return [(i, j) for i in range(m) for j in range(i, m)]


def _sort_desc(vals):
    """Static compare-exchange network: descending sort of the A tile values
    (bubble — fine for A ≤ ~8)."""
    vals = list(vals)
    A = len(vals)
    for i in range(A):
        for j in range(A - 1 - i):
            hi = jnp.maximum(vals[j], vals[j + 1])
            lo = jnp.minimum(vals[j], vals[j + 1])
            vals[j], vals[j + 1] = hi, lo
    return vals


def _columns(planes, stats_ref, basis, degree, mode, sorted_basis, n_steps_off):
    """Standardize the (possibly sorted) asset planes with per-asset stats
    from SMEM and build the cross-term columns (static unroll; order matches
    `amcx.basis.multi_asset_design_matrix`)."""
    A = len(planes)
    feats = _sort_desc(planes) if sorted_basis else list(planes)
    rec = BASIS_FAMILIES[basis]
    uni = []  # uni[a][d]
    for a in range(A):
        mean = stats_ref[n_steps_off + a]
        inv_std = stats_ref[n_steps_off + A + a]
        x = (feats[a] - mean) * inv_std
        cols = [jnp.ones_like(x)]
        if degree >= 1:
            cols.append(_first_order(basis, x))
        for n in range(2, degree + 1):
            cols.append(rec(x, cols[-1], cols[-2], float(n)))
        uni.append(cols)
    out = []
    for alpha in _multi_index_set(A, degree, mode):
        term = None
        for a, d in enumerate(alpha):
            if d == 0:
                continue
            f = uni[a][d]
            term = f if term is None else term * f
        if term is None:
            term = jnp.ones_like(feats[0])
        out.append(term)
    return out


def _payoff_for(planes, K, payoff_kind, phi, weights=None):
    """Static payoff select: ``maxcall`` = max-of-basket call; ``first`` =
    vanilla φ·(planes[0] − K) on the first plane only — the (S, v) Heston
    state prices vanilla American puts/calls while regressing on both
    planes (extra planes are regression features, not payoff inputs);
    ``second`` = φ·(planes[1] − K) — fixed-strike Asian on the (S, A)
    state where plane 1 carries the running average; ``spread`` =
    φ·(planes[0] − planes[1]) — floating-strike (average-strike) Asian;
    ``basket`` = φ·(mean(planes) − K) equal-weight arithmetic basket;
    ``geobasket`` = φ·(Πplanes^{1/A} − K) geometric basket (exact
    lognormal European oracle — see `amcx.models.basket`)."""
    if payoff_kind == "maxcall":
        ex = planes[0]
        for p in planes[1:]:
            ex = jnp.maximum(ex, p)
        return jnp.maximum(ex - K, 0.0)
    if payoff_kind == "first":
        return jnp.maximum(phi * (planes[0] - K), 0.0)
    if payoff_kind == "second":
        return jnp.maximum(phi * (planes[1] - K), 0.0)
    if payoff_kind == "spread":
        return jnp.maximum(phi * (planes[0] - planes[1]), 0.0)
    if payoff_kind == "spreadk":
        # struck spread φ·(S1 − S2 − K); a SEPARATE static kind so the
        # K = 0 products (floating-strike Asian, Margrabe exchange) keep
        # their bit-exact compiled payoff (an explicit "− K" with a traced
        # K = 0 changes fusion/rounding enough to move in-sample exercise
        # boundaries — measured 0.024 on the exchange engines-agree gate)
        return jnp.maximum(phi * (planes[0] - planes[1] - K), 0.0)
    if payoff_kind == "basket":
        w = weights or (1.0 / len(planes),) * len(planes)
        acc = planes[0] * float(w[0])
        for p, wi in zip(planes[1:], w[1:]):
            acc = acc + p * float(wi)
        return jnp.maximum(phi * (acc - K), 0.0)
    if payoff_kind == "geobasket":
        w = weights or (1.0 / len(planes),) * len(planes)
        acc = jnp.log(planes[0]) * float(w[0])
        for p, wi in zip(planes[1:], w[1:]):
            acc = acc + jnp.log(p) * float(wi)
        return jnp.maximum(phi * (jnp.exp(acc) - K), 0.0)
    raise ValueError(f"unknown payoff_kind {payoff_kind!r}")


def _ma_moments_kernel(scal_ref, s_ref, cf_ref, tau_ref, out_ref, acc,
                       *, n_assets, basis, degree, mode, sorted_basis,
                       itm_weights, payoff_kind, phi, weights=None, direct_y=False):
    m = len(_multi_index_set(n_assets, degree, mode))
    pairs = _pairs(m)
    P = len(pairs) + m
    pid = pl.program_id(0)
    n_prog = pl.num_programs(0)

    t = scal_ref[0]
    rdt = scal_ref[1]
    K = scal_ref[2]

    @pl.when(pid == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    planes = [s_ref[a] for a in range(n_assets)]
    cf = cf_ref[...]
    tau = tau_ref[...]
    if direct_y:
        # pathwise-discount mode (stochastic rates, amcx.hybrid): the host
        # hands the regression target y = df_t ⊙ V_{t+1} directly — the
        # (cf, τ)-with-scalar-rate reconstruction above has no meaning
        # when the discount is per-path. τ plane unused.
        y = cf
    else:
        y = cf * jnp.exp(-rdt * (tau - t))
    cols = _columns(planes, scal_ref, basis, degree, mode, sorted_basis, 3)

    if itm_weights:
        w = (_payoff_for(planes, K, payoff_kind, phi, weights)
             > 0.0).astype(jnp.float32)
        cols_w = [c * w for c in cols]
        y = y * w
    else:
        cols_w = cols

    for p, (i, j) in enumerate(pairs):
        acc[p, :] += jnp.sum(cols_w[i] * cols[j], axis=0)
    for i in range(m):
        acc[len(pairs) + i, :] += jnp.sum(cols[i] * y, axis=0)

    @pl.when(pid == n_prog - 1)
    def _():
        out_ref[:, 0] = jnp.sum(acc[...], axis=1)[:P]


@functools.partial(
    jax.jit,
    static_argnames=("n_assets", "basis", "degree", "mode", "sorted_basis",
                     "itm_weights", "interpret", "payoff_kind", "phi",
                     "weights", "direct_y"),
)
def ma_step_moments(
    scalars: jnp.ndarray,   # (3 + 2A,) f32: [t, r*dt, K, mean_a..., inv_std_a...]
    S_planes: jnp.ndarray,  # (n_assets, rows, LANES) f32
    cf_rows: jnp.ndarray,   # (rows, LANES)
    tau_rows: jnp.ndarray,
    *,
    n_assets: int,
    basis: str = "chebyshev",
    degree: int = 2,
    mode: str = "total",
    sorted_basis: bool = True,
    itm_weights: bool = False,
    interpret: bool = False,
    payoff_kind: str = "maxcall",
    phi: float = 1.0,
    weights: Optional[tuple] = None,
    direct_y: bool = False,
) -> jnp.ndarray:
    """Packed cross-term moment vector for one backward step.

    ``direct_y=True``: ``cf_rows`` IS the regression target (already
    discounted to this step, e.g. pathwise ``df ⊙ V`` under stochastic
    rates); the τ input is ignored."""
    m = len(_multi_index_set(n_assets, degree, mode))
    P = ma_pack_dim(m)
    rows = cf_rows.shape[0]
    grid = (rows // TILE_ROWS,)
    plane = pl.BlockSpec((n_assets, TILE_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _ma_moments_kernel, n_assets=n_assets, basis=basis, degree=degree,
        mode=mode, sorted_basis=sorted_basis, itm_weights=itm_weights,
        payoff_kind=payoff_kind, phi=phi, weights=weights,
        direct_y=direct_y,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), plane, tile, tile],
        out_specs=pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, LANES), jnp.float32)],
        interpret=interpret,
    )(scalars, S_planes, cf_rows, tau_rows)
    return out[:, 0]


def _ma_apply_kernel(scal_ref, coef_ref, s_ref, cf_in_ref, tau_in_ref,
                     cf_out_ref, tau_out_ref, *, n_assets, basis, degree,
                     mode, sorted_basis, payoff_kind, phi, weights=None):
    t = scal_ref[0]
    K = scal_ref[2]
    allow = scal_ref[3 + 2 * n_assets]  # 1.0 once t >= exercise_from_step

    planes = [s_ref[a] for a in range(n_assets)]
    cf = cf_in_ref[...]
    tau = tau_in_ref[...]
    cols = _columns(planes, scal_ref, basis, degree, mode, sorted_basis, 3)
    m = len(cols)
    fitted = cols[0] * coef_ref[0]
    for i in range(1, m):
        fitted = fitted + cols[i] * coef_ref[i]
    cont = jnp.maximum(fitted, 0.0)  # SURVEY Q2

    ex = _payoff_for(planes, K, payoff_kind, phi, weights)
    mask = (ex > 0.0) & (ex > cont) & (allow > 0.0)
    cf_out_ref[...] = jnp.where(mask, ex, cf)
    tau_out_ref[...] = jnp.where(mask, t, tau)


@functools.partial(
    jax.jit,
    static_argnames=("n_assets", "basis", "degree", "mode", "sorted_basis",
                     "interpret", "payoff_kind", "phi", "weights"),
)
def ma_step_apply(
    scalars: jnp.ndarray,
    coeffs: jnp.ndarray,    # (m,) f32
    S_planes: jnp.ndarray,
    cf_rows: jnp.ndarray,
    tau_rows: jnp.ndarray,
    *,
    n_assets: int,
    basis: str = "chebyshev",
    degree: int = 2,
    mode: str = "total",
    sorted_basis: bool = True,
    interpret: bool = False,
    payoff_kind: str = "maxcall",
    phi: float = 1.0,
    weights: Optional[tuple] = None,
):
    """One fused pass: cross-term fitted continuation → exercise select."""
    rows = cf_rows.shape[0]
    grid = (rows // TILE_ROWS,)
    plane = pl.BlockSpec((n_assets, TILE_ROWS, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _ma_apply_kernel, n_assets=n_assets, basis=basis, degree=degree,
        mode=mode, sorted_basis=sorted_basis,
        payoff_kind=payoff_kind, phi=phi, weights=weights,
    )
    shape = jax.ShapeDtypeStruct(cf_rows.shape, jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            plane,
            tile,
            tile,
        ],
        out_specs=(tile, tile),
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(scalars, coeffs, S_planes, cf_rows, tau_rows)
    return out
