"""Multi-asset mega-kernel: the WHOLE multi-state LSMC in one kernel.

`amcx.ops.maxcall_pallas` brought multi-asset products onto the fused
kernel path — two `pallas_call`s per backward step (moments, then apply)
with the tiny solve on the host between them. This module is the
multi-asset twin of `amcx.ops.lsmc_megakernel._mega_kernel`: ONE
`pallas_call` for the entire backward induction. Per grid step it

1. streams this step's ``(A, rows, 512)`` asset planes from HBM (Mosaic
   double-buffers the grid input; the value plane V stays VMEM-resident in
   TIME-T UNITS — the carry discipline every amcx kernel shares),
2. accumulates the packed cross-term Gram/moment vector over row chunks
   (columns built in-register via the per-asset recurrences + static
   total-degree cross products; optional static sort network for the
   order-statistics basis),
3. solves the m×m system in-kernel (equilibrated ridge-Cholesky with
   un-ridged iterative refinement — `lsmc_megakernel`'s solver, generic in
   m), and
4. applies the exercise select for any of the multi-asset payoff kinds
   (`maxcall` / `first` (Heston (S,v)) / `second`·`spread` (Asian (S,A)) /
   `basket`·`geobasket` with static weights).

What the one-kernel form buys over the per-step pair (measured on the
univariate twin, CLAUDE.md ledger): no per-step kernel-launch/HBM
round-trip for cashflow/τ planes — V never leaves VMEM — and no host
sync per step for the solve.

Sizing: VMEM = A·(rows·512·4) double-buffered input + one resident V plane
+ the (P, 512) accumulator; at 1M paths A=2 fits easily, A=5 is ~45 MB
(inside the 64 MB budget). The moment head P = m(m+1)/2 + m for m
cross-term columns (A=2, total degree 2 → m=6, P=27; A=5, d=2 → m=21,
P=252).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..basis import _multi_index_set
from .lsmc_megakernel import (
    LANES,
    _chunk_rows_for,
    _pairs,
    _ring_allreduce_moments,
    _solve_equilibrated_ridge,
)
from .maxcall_pallas import _payoff_for, _sort_desc
from .lsmc_pallas import TILE_ROWS as _TILE_ROWS  # noqa: F401 (layout doc)
from .lsmc_pallas import ring_entry_barrier

__all__ = ["lsmc_price_ma_mega"]


def _ma_cols(planes, stats_ref, t, n_assets, T1, basis, degree, mode,
             sorted_basis):
    """Cross-term basis columns for one row chunk, standardized with the
    per-asset per-step stats from SMEM (same column order as
    `amcx.basis.multi_asset_design_matrix`)."""
    from ..basis import BASIS_FAMILIES, _first_order

    A = n_assets
    feats = _sort_desc(planes) if sorted_basis else list(planes)
    rec = BASIS_FAMILIES[basis]
    uni = []
    for a in range(A):
        mean = stats_ref[a * T1 + t]
        inv_std = stats_ref[(A + a) * T1 + t]
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


def _ma_mega_kernel(scal_ref, stats_ref, s_ref, *refs, n_steps, n_rows,
                    chunk_rows, n_assets, basis, degree, mode, sorted_basis,
                    itm_weights, payoff_kind, weights, antithetic,
                    emit_cf_tau, direct_y=False, barrier=False,
                    ring_axis=None, ring_size=1):
    it = iter(refs)
    df_ref = next(it) if direct_y else None
    out_ref, out_sq_ref = next(it), next(it)
    cf_ref = tau_ref = None
    if emit_cf_tau:
        cf_ref, tau_ref = next(it), next(it)
    V, macc = next(it), next(it)
    rest = tuple(it)
    if ring_axis is not None:
        comm, send_sem, recv_sem = rest

    A = n_assets
    m = len(_multi_index_set(A, degree, mode))
    pairs = _pairs(m)
    T1 = n_steps + 1
    i = pl.program_id(0)
    t = n_steps - i
    ring_entry_barrier(ring_axis, ring_size, i)

    K = scal_ref[1]
    phi = scal_ref[2]
    rcond = scal_ref[3]
    # Scalar/curve rates: V carried in TIME-T UNITS (see
    # lsmc_megakernel._mega_kernel). direct_y (pathwise discounting,
    # stochastic rates): V carries TIME-t VALUES and every step applies the
    # per-path discount plane — the per-step carry multiply is inherent to
    # per-path rates (same estimator as amcx.hybrid's engines).
    c_t = stats_ref[2 * A * T1 + t]
    inv_c_t = stats_ref[(2 * A + 1) * T1 + t]
    allow = stats_ref[(2 * A + 2) * T1 + t]  # 1.0 = exercise date

    n_chunks = n_rows // chunk_rows

    def payoff(planes):
        return _payoff_for(planes, K, payoff_kind, phi, weights)

    def read_planes(sl):
        # barrier runs carry the knock-eligibility gate in the SIGN BIT of
        # the asset-0 plane (the univariate mega's zero-extra-HBM encoding,
        # lsmc_megakernel.py:32); decode before basis/payoff evaluation
        planes = [s_ref[0, a, sl, :] for a in range(A)]
        if barrier:
            kn = planes[0] > 0.0
            planes[0] = jnp.abs(planes[0])
            return planes, kn
        return planes, None

    @pl.when(i == 0)
    def _maturity():
        def body(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            planes, kn = read_planes(sl)
            pay = payoff(planes)
            if barrier:
                # maturity cashflow only on gate-open paths (Q4 semantics
                # extended to all four knock variants via barrier_gate)
                pay = jnp.where(kn, pay, 0.0)
            V[sl, :] = pay
            if emit_cf_tau:
                cf_ref[sl, :] = pay
                tau_ref[sl, :] = jnp.full((chunk_rows, LANES),
                                          float(n_steps), jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(i > 0)
    def _step():
        macc[...] = jnp.zeros_like(macc)

        def pass1(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            planes, kn = read_planes(sl)
            if direct_y:
                y = df_ref[0, sl, :] * V[sl, :]
            else:
                y = c_t * V[sl, :]
            cols = _ma_cols(planes, stats_ref, t, A, T1, basis, degree,
                            mode, sorted_basis)
            if itm_weights:
                w = (payoff(planes) > 0.0).astype(jnp.float32)
                if barrier:
                    # canonical LS localization: fit on ITM ∧ gate-open
                    w = w * kn.astype(jnp.float32)
                cols_w = [c_ * w for c_ in cols]
                yw = y * w
            else:
                cols_w = cols
                yw = y
            for p, (a, b_) in enumerate(pairs):
                macc[p, :] += jnp.sum(cols_w[a] * cols[b_], axis=0)
            for a in range(m):
                macc[len(pairs) + a, :] += jnp.sum(cols[a] * yw, axis=0)
            return 0

        jax.lax.fori_loop(0, n_chunks, pass1, 0)
        if ring_axis is None:
            packed = jnp.sum(macc[...], axis=1)
        else:
            # global fit: the packed moments all-reduce over the in-kernel
            # RDMA ring (lsmc_megakernel's parity-double-buffered hops)
            packed = _ring_allreduce_moments(
                macc, comm, send_sem, recv_sem, t, ring_axis, ring_size)
        coeffs = _solve_equilibrated_ridge(packed, m, rcond, "pairs", basis)

        def pass2(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            planes, kn = read_planes(sl)
            cols = _ma_cols(planes, stats_ref, t, A, T1, basis, degree,
                            mode, sorted_basis)
            fitted = cols[0] * coeffs[0]
            for a in range(1, m):
                fitted = fitted + cols[a] * coeffs[a]
            cont = jnp.maximum(fitted, 0.0)  # SURVEY Q2
            ex = payoff(planes)
            mask = (ex > cont) & (allow > 0.0)
            if barrier:
                mask = mask & kn  # Q4: exercise only while the gate is open
            if direct_y:
                # V_t = exercised value or discounted roll-back of V_{t+1}
                V[sl, :] = jnp.where(mask, ex, df_ref[0, sl, :] * V[sl, :])
            else:
                V[sl, :] = jnp.where(mask, ex * inv_c_t, V[sl, :])
            if emit_cf_tau:
                cf_ref[sl, :] = jnp.where(mask, ex, cf_ref[sl, :])
                tau_ref[sl, :] = jnp.where(mask, t.astype(jnp.float32),
                                           tau_ref[sl, :])
            return 0

        jax.lax.fori_loop(0, n_chunks, pass2, 0)

    @pl.when(i == n_steps)
    def _emit():
        if direct_y:
            v = V[...]  # already time-0 values (pathwise discounting)
        else:
            v = c_t * V[...]  # t == 0: discount time-T units to time 0
        out_ref[...] = jnp.sum(v).reshape(1, 1)
        if antithetic:
            half = n_rows // 2
            fold = 0.5 * (v[:half, :] + v[half:, :])
            out_sq_ref[...] = jnp.sum(fold * fold).reshape(1, 1)
        else:
            out_sq_ref[...] = jnp.sum(v * v).reshape(1, 1)


def _run_ma_mega(scalars, stats, planes_blocked, n_steps, n_rows, n_assets,
                 basis, degree, mode, sorted_basis, itm_weights, payoff_kind,
                 weights, antithetic, emit_cf_tau, interpret,
                 df_blocked=None, barrier=False, ring_axis=None,
                 ring_size=1):
    m = len(_multi_index_set(n_assets, degree, mode))
    P = len(_pairs(m)) + m
    direct_y = df_blocked is not None
    kernel = functools.partial(
        _ma_mega_kernel,
        n_steps=n_steps, n_rows=n_rows,
        chunk_rows=_chunk_rows_for(n_rows), n_assets=n_assets, basis=basis,
        degree=degree, mode=mode, sorted_basis=sorted_basis,
        itm_weights=itm_weights, payoff_kind=payoff_kind, weights=weights,
        antithetic=antithetic, emit_cf_tau=emit_cf_tau, direct_y=direct_y,
        barrier=barrier, ring_axis=ring_axis, ring_size=ring_size,
    )
    scalar_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    out_shapes = [scalar_shape, scalar_shape]
    out_specs = [scalar_spec, scalar_spec]
    if emit_cf_tau:
        plane_shape = jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)
        plane_spec = pl.BlockSpec((n_rows, LANES), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        out_shapes += [plane_shape, plane_shape]
        out_specs += [plane_spec, plane_spec]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, n_assets, n_rows, LANES),
            lambda i: (n_steps - i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [scalars, stats, planes_blocked]
    if direct_y:
        # df padded to (n_steps+1) step rows; the maturity step reads the
        # dummy last row and never uses it
        in_specs.append(pl.BlockSpec(
            (1, n_rows, LANES), lambda i: (n_steps - i, 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(df_blocked)
    scratch_shapes = [
        pltpu.VMEM((n_rows, LANES), jnp.float32),
        pltpu.VMEM((P, LANES), jnp.float32),
    ]
    compiler_kwargs = dict(vmem_limit_bytes=100 * 1024 * 1024)
    if ring_axis is not None:
        scratch_shapes += [
            pltpu.VMEM((2, ring_size, P, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ring_size)),
            pltpu.SemaphoreType.DMA((2, ring_size)),
        ]
        compiler_kwargs["collective_id"] = 0
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(n_steps + 1,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(**compiler_kwargs),
        interpret=interpret,
    )(*operands)
    price_sum, sq_sum = outs[0], outs[1]
    head = jnp.stack([price_sum[0, 0], sq_sum[0, 0]])
    if emit_cf_tau:
        return head, outs[2], outs[3]
    return head, None, None


_run_ma_mega_jit = jax.jit(
    _run_ma_mega,
    static_argnames=("n_steps", "n_rows", "n_assets", "basis", "degree",
                     "mode", "sorted_basis", "itm_weights", "payoff_kind",
                     "weights", "antithetic", "emit_cf_tau", "interpret",
                     "barrier", "ring_axis", "ring_size"),
)


def lsmc_price_ma_mega(
    paths_tm: jnp.ndarray,
    K,
    r,
    dt,
    phi: float = 1.0,
    payoff_kind: str = "maxcall",
    basis: str = "chebyshev",
    degree: int = 2,
    mode: str = "total",
    sorted_basis: bool = False,
    weights=None,
    rcond: float = 1e-6,
    itm_weights: bool = False,
    exercise_from_step: int = 0,
    exercise_steps=None,
    antithetic: bool = False,
    return_cf_tau: bool = False,
    discount_planes=None,
    barrier=None,
    barrier_type: str = "down-in",
    interpret=None,
    axis_name=None,
    axis_size: int = 1,
):
    """Whole multi-asset LSMC induction in ONE kernel.

    ``paths_tm``: ``(n_steps+1, n_paths, n_assets)`` (time-major, as from
    `amcx.paths.simulate_gbm_multi`) or pre-blocked
    ``(n_steps+1, A, rows, 512)``. ``r`` is a scalar or an ``(n_steps,)``
    short-rate curve (discounting rides per-step stats rows, exactly as
    the univariate mega kernel). Returns ``(price, stderr)`` or, with
    ``return_cf_tau``, ``(price, stderr, cashflows, exercise_steps)``
    flattened per path (same contract as `lsmc_price_megakernel`).

    ``exercise_steps``: optional explicit Bermudan schedule (step indices in
    0..n_steps-1, `amcx.payoff.exercise_allow_row` semantics) — overrides
    ``exercise_from_step``; maturity always pays the payoff.

    ``discount_planes``: optional ``(n_steps, n_paths)`` per-path one-step
    discount factors (stochastic rates — `amcx.hybrid`): switches the
    kernel to pathwise discounting (``direct_y``), where ``r``/``dt`` are
    ignored for the carry and the value plane rolls back through the
    per-path planes every step.

    ``barrier``/``barrier_type``: optional knock level monitored on the
    ASSET-0 plane (the spot under the two-state dynamics — Heston/Bates/
    SABR/rBergomi (S, state) engines; reference Q4 discrete monitoring on
    the simulation grid, all four up/down × in/out variants via
    `amcx.payoff.barrier_gate`). The gate rides the sign bit of the
    asset-0 plane — zero extra HBM traffic, exactly the univariate mega's
    encoding; standardization stats are computed on the raw spots first.

    **Collective mode** (``axis_name`` inside ``shard_map``): ``paths_tm``
    is this rank's shard; the standardization statistics are psum-global
    (the hardened-dryrun lesson — per-shard frames break the psum'd
    moments) and the packed Gram all-reduces over the in-kernel RDMA ring,
    so every rank solves the same global fit. Returns replicated
    global-price scalars.

    Validated against `amcx.models.maxcall.backward_induction_fused_maxcall`
    (same math, per-step kernel pair) and the XLA engines per payoff kind
    (tests/test_ma_mega.py); payoff kinds documented in
    `amcx.ops.maxcall_pallas._payoff_for`.
    """
    n_steps = paths_tm.shape[0] - 1
    if paths_tm.ndim == 3:
        n_paths, n_assets = paths_tm.shape[1], paths_tm.shape[2]
    elif paths_tm.ndim == 4:
        n_assets, n_paths = paths_tm.shape[1], paths_tm.shape[2] * LANES
    else:
        raise ValueError("paths_tm must be (T+1, n, A) or blocked 4-D")
    if n_paths % (8 * LANES):
        raise ValueError(
            f"ma-mega kernel needs n_paths divisible by {8 * LANES}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret is True:
        interpret = pltpu.InterpretParams()
    n_rows = n_paths // LANES
    if paths_tm.ndim == 3:
        blocked = jnp.moveaxis(paths_tm, -1, 1).reshape(
            n_steps + 1, n_assets, n_rows, LANES)
    else:
        blocked = paths_tm

    from ..models.maxcall import maxcall_standardization

    if paths_tm.ndim == 3:
        X_stats = paths_tm
    else:
        X_stats = jnp.moveaxis(
            blocked.reshape(n_steps + 1, n_assets, n_paths), 1, 2)
    if axis_name is None:
        mean_t, inv_std_t = maxcall_standardization(
            X_stats, "sorted" if sorted_basis else mode)
    else:
        # psum-GLOBAL standardization frame (per-shard frames would break
        # the ring-summed global moments)
        Xf = (jnp.sort(X_stats, axis=-1)[..., ::-1] if sorted_basis
              else X_stats)
        n_glob_s = n_paths * axis_size
        s1 = jax.lax.psum(jnp.sum(Xf, axis=1), axis_name)
        s2 = jax.lax.psum(jnp.sum(Xf * Xf, axis=1), axis_name)
        mean_t = s1 / n_glob_s
        var = jnp.maximum(s2 / n_glob_s - mean_t * mean_t, 0.0)
        inv_std_t = 1.0 / jnp.maximum(jnp.sqrt(var), 1e-6)

    if barrier is not None:
        # stats above used the RAW spots; now fold the knock-eligibility
        # gate into the sign bit of the asset-0 plane (rank-local state —
        # the collective route needs no extra comm)
        from ..payoff import barrier_gate

        gate = barrier_gate(blocked[:, 0], barrier, barrier_type)
        blocked = blocked.at[:, 0].set(
            jnp.where(gate, blocked[:, 0], -blocked[:, 0]))

    r_arr = jnp.asarray(r, jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(jnp.mean(r_arr) * dt, jnp.float32),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(phi, jnp.float32),
        jnp.asarray(rcond, jnp.float32),
    ])
    if r_arr.ndim == 0:
        rem = n_steps - jnp.arange(n_steps + 1, dtype=jnp.float32)
        r_rem = r_arr * jnp.asarray(dt, jnp.float32) * rem
    else:
        r_rem = jnp.concatenate(
            [jnp.cumsum((r_arr * jnp.asarray(dt, jnp.float32))[::-1])[::-1],
             jnp.zeros((1,), jnp.float32)])
    if exercise_steps is not None:
        # explicit Bermudan schedule (same validation/row semantics as the
        # univariate engines); maturity always pays — the terminal slot is
        # unread by the kernel, exactly like lsmc_price_megakernel
        from ..payoff import exercise_allow_row

        allow = exercise_allow_row(exercise_steps, n_steps, jnp.float32)
    else:
        allow = (jnp.arange(n_steps + 1) >= exercise_from_step).astype(
            jnp.float32)
    stats = jnp.concatenate([
        mean_t.T.reshape(-1).astype(jnp.float32),      # A rows of (T+1,)
        inv_std_t.T.reshape(-1).astype(jnp.float32),
        jnp.exp(-r_rem), jnp.exp(r_rem), allow,
    ])
    w_stat = None if weights is None else tuple(float(x) for x in weights)
    df_blocked = None
    if discount_planes is not None:
        if discount_planes.shape != (n_steps, n_paths):
            raise ValueError("discount_planes must be (n_steps, n_paths)")
        # pad a dummy maturity row so the grid's i=0 block index is valid
        df_blocked = jnp.concatenate(
            [discount_planes.astype(jnp.float32),
             jnp.ones((1, n_paths), jnp.float32)]).reshape(
            n_steps + 1, n_rows, LANES)
    # (interpret=True was already converted to InterpretParams() above —
    # the TPU interpreter simulates the ring's remote DMAs on CPU meshes)
    run = _run_ma_mega if axis_name is not None else _run_ma_mega_jit
    head, cf, tau = run(
        scalars, stats, blocked, n_steps, n_rows, int(n_assets), basis,
        int(degree), mode, bool(sorted_basis), bool(itm_weights),
        payoff_kind, w_stat, bool(antithetic), bool(return_cf_tau),
        interpret, df_blocked=df_blocked, barrier=barrier is not None,
        ring_axis=axis_name, ring_size=int(axis_size))
    n_glob = n_paths * (axis_size if axis_name is not None else 1)
    if axis_name is not None:
        head = jax.lax.psum(head, axis_name)
    price = head[0] / n_glob
    n_eff = n_glob // 2 if antithetic else n_glob
    var = jnp.maximum(head[1] / n_eff - price * price, 0.0)
    stderr = jnp.sqrt(var / n_eff)
    if return_cf_tau:
        return price, stderr, cf.reshape(-1), tau.reshape(-1)
    return price, stderr
