"""Fused Pallas kernels for the LSMC backward-induction step.

Profiling the XLA engine at the 1M×100 north-star config shows the per-step
regression dominates: XLA evaluates the ~k² Gram reductions as separate
passes over S_t/y (~0.33 ms/step, ~25× the bandwidth roofline). These
kernels restore a speed-of-light schedule — per time step:

1. :func:`step_moments` — ONE pass over (S_t, cashflows, τ[, knocked]):
   computes the regression target ``y = cf·exp(-rdt·(τ−t))`` in-register,
   standardizes the regressor with precomputed per-step statistics, runs the
   basis recurrence on the VPU, and accumulates every Gram/moment entry into
   VMEM scratch across the (sequential) grid — emitting the packed
   ``k(k+1)/2 + k`` moment vector once, on the last tile.
2. tiny replicated solve (XLA, `amcx.regress.pinv_solve`) — and, under
   ``shard_map``, the psum of the packed moments: the only cross-chip bytes.
3. :func:`step_apply` — ONE pass over (S_t, cf, τ[, knocked]): rebuilds the
   fitted polynomial by recurrence from the solved coefficients (no design
   matrix is ever materialized anywhere), clamps at 0 (SURVEY Q2), applies
   the ITM ∧ knocked exercise rule (Q4), and rewrites cf/τ in place
   (``input_output_aliases``).

HBM traffic per step drops to ~12 MB read + 8 MB write (vanilla case) — vs
~80+ MB for the unfused XLA path. The standardization statistics (weighted
mean/std per step, SURVEY Q1/scaling semantics) are precomputed for ALL
steps in one vectorized pass over the path array before the scan
(`amcx.engine_pallas.precompute_standardization`).

Layout: the path axis is reshaped to ``(rows, 512)`` lanes; each grid step
processes an ``(8, 512)``-tile (4096 paths). All kernels are shape-static;
degree and product flags are Python-level (compiled in).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..basis import BASIS_FAMILIES, _first_order

__all__ = [
    "LANES",
    "TILE_ROWS",
    "step_moments",
    "step_apply",
    "pack_dim",
    "unpack_moments",
]

LANES = 512
TILE_ROWS = 8  # 8×512 f32 tile = 4096 paths per grid step


def ring_entry_barrier(ring_axis, ring_size, step_index):
    """Neighbor barrier at collective-kernel entry.

    Mosaic requires kernels compiled with ``collective_id`` to synchronize
    through the global barrier semaphore before any cross-chip RDMA — a
    device must not write into a neighbor's comm buffer before that
    neighbor has entered the kernel. The CPU interpret machinery cannot
    see this hazard (all "devices" share one process); it surfaced as a
    hard compile error under the round-4 deviceless AOT topology gates
    (tests_tpu/test_multichip_compile.py). Runs ONCE at the first grid
    step; with data flowing rightward only, the both-neighbor signal/wait-2
    is the canonical safe pattern (ring_size == 2 degenerates to two
    signals to the same device, still wait-2-consistent).
    """
    if ring_axis is None or ring_size <= 1:
        return

    @pl.when(step_index == 0)
    def _barrier():
        bsem = pltpu.get_barrier_semaphore()
        my = jax.lax.axis_index(ring_axis)
        left = jax.lax.rem(my + ring_size - 1, ring_size)
        right = jax.lax.rem(my + 1, ring_size)
        pltpu.semaphore_signal(bsem, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(bsem, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(bsem, 2)


def pack_dim(k: int) -> int:
    """Length of the packed moment vector: upper-triangular Gram + rhs."""
    return k * (k + 1) // 2 + k


def _pairs(k: int):
    return [(i, j) for i in range(k) for j in range(i, k)]


def _basis_rows(x, basis: str, degree: int):
    """Unrolled recurrence: list of (tile) arrays [P_0(x) .. P_degree(x)]."""
    rec = BASIS_FAMILIES[basis]
    cols = [jnp.ones_like(x)]
    if degree >= 1:
        cols.append(_first_order(basis, x))
    for n in range(2, degree + 1):
        cols.append(rec(x, cols[-1], cols[-2], float(n)))
    return cols


def _payoff(S, K, phi):
    return jnp.maximum(phi * (S - K), 0.0)


# ---------------------------------------------------------------------------
# Kernel 1: fused moment accumulation
# ---------------------------------------------------------------------------


def _moments_kernel(scal_ref, s_ref, cf_ref, tau_ref, *rest, basis, degree,
                    itm_weights, has_barrier):
    if has_barrier:
        knocked_ref, out_ref, acc = rest
    else:
        out_ref, acc = rest
        knocked_ref = None
    k = degree + 1
    pairs = _pairs(k)
    P = len(pairs) + k

    pid = pl.program_id(0)
    n_prog = pl.num_programs(0)

    t = scal_ref[0]
    rdt = scal_ref[1]
    K = scal_ref[2]
    mean = scal_ref[3]
    inv_std = scal_ref[4]
    phi = scal_ref[5]

    @pl.when(pid == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    S = s_ref[...]
    cf = cf_ref[...]
    tau = tau_ref[...]
    y = cf * jnp.exp(-rdt * (tau - t))
    xhat = (S - mean) * inv_std
    cols = _basis_rows(xhat, basis, degree)

    if itm_weights:
        # scal_ref[6]: per-step degenerate-weight fallback flag (computed
        # host-side: 0 when the ITM∧knocked mass at this step is below
        # k+1 effective points — fit all paths instead, exactly matching
        # `amcx.regress._fit`'s fallback so XLA↔fused parity holds on
        # thin-mass steps, e.g. t=0 at the money or deep-OTM barrier-call
        # steps where a zero Gram would fabricate cont = 0)
        use_w = scal_ref[6]
        w = (_payoff(S, K, phi) > 0.0).astype(jnp.float32)
        if knocked_ref is not None:
            w = w * knocked_ref[...]
        w = jnp.where(use_w > 0.0, w, 1.0)
        cols_w = [c * w for c in cols]
        y = y * w
    else:
        cols_w = cols

    # Accumulate each Gram entry / rhs entry as a lane-vector partial sum
    # (reduce the 8 sublanes now, keep 512 lanes; the cross-lane reduction
    # happens once, on the last tile).
    for p, (i, j) in enumerate(pairs):
        acc[p, :] += jnp.sum(cols_w[i] * cols[j], axis=0)
    for i in range(k):
        acc[len(pairs) + i, :] += jnp.sum(cols[i] * y, axis=0)

    @pl.when(pid == n_prog - 1)
    def _():
        out_ref[:, 0] = jnp.sum(acc[...], axis=1)[:P]


@functools.partial(
    jax.jit,
    static_argnames=("basis", "degree", "itm_weights", "interpret"),
)
def step_moments(
    scalars: jnp.ndarray,          # (7,) f32: [t, r*dt, K, mean, inv_std,
                                   #  phi, use_w] (use_w read when
                                   #  itm_weights; (6,) legacy shape works
                                   #  for unweighted fits)
    S_rows: jnp.ndarray,           # (rows, LANES) f32
    cf_rows: jnp.ndarray,
    tau_rows: jnp.ndarray,
    knocked_rows: Optional[jnp.ndarray] = None,
    *,
    basis: str = "chebyshev",
    degree: int = 4,
    itm_weights: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Packed moment vector ``(pack_dim(k),)`` for one backward step."""
    k = degree + 1
    P = pack_dim(k)
    rows = S_rows.shape[0]
    assert rows % TILE_ROWS == 0, rows
    grid = (rows // TILE_ROWS,)
    has_barrier = knocked_rows is not None

    tile = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), tile, tile, tile]
    args = [scalars, S_rows, cf_rows, tau_rows]
    if has_barrier:
        in_specs.append(tile)
        args.append(knocked_rows)

    kernel = functools.partial(
        _moments_kernel,
        basis=basis,
        degree=degree,
        itm_weights=itm_weights,
        has_barrier=has_barrier,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((P, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((P, LANES), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:, 0]


def unpack_moments(packed: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed vector -> symmetric Gram ``(k,k)`` + rhs ``(k,)``."""
    pairs = _pairs(k)
    G = jnp.zeros((k, k), packed.dtype)
    for p, (i, j) in enumerate(pairs):
        G = G.at[i, j].set(packed[p])
        if i != j:
            G = G.at[j, i].set(packed[p])
    b = packed[len(pairs):len(pairs) + k]
    return G, b


# ---------------------------------------------------------------------------
# Kernel 2: fused exercise application
# ---------------------------------------------------------------------------


def _apply_kernel(scal_ref, coef_ref, s_ref, cf_in_ref, tau_in_ref, *rest,
                  basis, degree, has_barrier, emit_surface):
    if has_barrier:
        knocked_ref = rest[0]
        rest = rest[1:]
    else:
        knocked_ref = None
    if emit_surface:
        cf_out_ref, tau_out_ref, cont_ref = rest
    else:
        cf_out_ref, tau_out_ref = rest

    t = scal_ref[0]
    K = scal_ref[2]
    mean = scal_ref[3]
    inv_std = scal_ref[4]
    phi = scal_ref[5]

    S = s_ref[...]
    cf = cf_in_ref[...]
    tau = tau_in_ref[...]
    xhat = (S - mean) * inv_std
    cols = _basis_rows(xhat, basis, degree)
    fitted = cols[0] * coef_ref[0]
    for i in range(1, degree + 1):
        fitted = fitted + cols[i] * coef_ref[i]
    cont = jnp.maximum(fitted, 0.0)  # SURVEY Q2

    ex = _payoff(S, K, phi)
    # ex > cont ⟹ ex > 0 (cont clamped ≥ 0): the ITM clause is implied
    mask = ex > cont
    if knocked_ref is not None:
        mask = mask & (knocked_ref[...] > 0.0)  # SURVEY Q4
    cf_out_ref[...] = jnp.where(mask, ex, cf)
    tau_out_ref[...] = jnp.where(mask, t, tau)
    if emit_surface:
        cont_ref[...] = cont


@functools.partial(
    jax.jit,
    static_argnames=("basis", "degree", "emit_surface", "interpret"),
)
def step_apply(
    scalars: jnp.ndarray,
    coeffs: jnp.ndarray,           # (k,) f32
    S_rows: jnp.ndarray,
    cf_rows: jnp.ndarray,
    tau_rows: jnp.ndarray,
    knocked_rows: Optional[jnp.ndarray] = None,
    *,
    basis: str = "chebyshev",
    degree: int = 4,
    emit_surface: bool = False,
    interpret: bool = False,
):
    """One fused pass: fitted continuation by recurrence → exercise select.

    Returns ``(cf', tau')`` (and the clamped continuation surface rows when
    ``emit_surface``). ``cf``/``tau`` buffers are donated and updated in
    place.
    """
    rows = S_rows.shape[0]
    grid = (rows // TILE_ROWS,)
    has_barrier = knocked_rows is not None

    tile = pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        tile,
        tile,
        tile,
    ]
    args = [scalars, coeffs, S_rows, cf_rows, tau_rows]
    if has_barrier:
        in_specs.append(tile)
        args.append(knocked_rows)

    shape = jax.ShapeDtypeStruct(S_rows.shape, jnp.float32)
    out_shape = (shape, shape) + ((shape,) if emit_surface else ())
    out_specs = (tile, tile) + ((tile,) if emit_surface else ())
    # alias cf -> cf', tau -> tau' (positions among *tensor* call operands,
    # counting every operand including SMEM scalars)
    cf_pos = 3
    tau_pos = 4
    kernel = functools.partial(
        _apply_kernel,
        basis=basis,
        degree=degree,
        has_barrier=has_barrier,
        emit_surface=emit_surface,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        input_output_aliases={cf_pos: 0, tau_pos: 1},
        interpret=interpret,
    )(*args)
    return out
