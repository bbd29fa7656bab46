"""Fully-fused LSMC: path generation INSIDE the backward induction.

The pipeline `gbm_paths_pallas → lsmc_price_megakernel` is bounded below by
~800 MB of HBM traffic at 1M×100 (write the paths, read them back). But a
Brownian path can be generated **backward** with the bridge recursion

    W_T = √(T)·ξ_T,     W_t = (t/(t+1))·W_{t+1} + √(dt·t/(t+1))·ξ_t

which reproduces the exact joint law of (W_1..W_T) — conditionally on
W_{t+1}, W_t is Gaussian with mean (t/(t+1))·W_{t+1} and variance
dt·t/(t+1), and induction gives Var(W_t) = t·dt and the Brownian covariance.
At t = 0 the same formula collapses to W_0 = 0 identically. So the backward
induction can *regenerate* each spot column just before pricing it:

    S_t = S0·exp((r−q−σ²/2)·t·dt + σ·W_t)

with W resident in VMEM next to the value carry V. The kernel has NO tensor
inputs: path-step traffic is zero HBM bytes; pricing is pure VPU compute
(hardware PRNG → Box-Muller ξ, bridge update, exp, moments, select).

Same statistical footing as the forward kernel (counter-based hardware PRNG,
streams keyed by (seed, t, chunk)); prices agree with the pathgen+mega
pipeline to MC tolerance, not bit-for-bit. Standardization uses the
closed-form GBM statistics (`amcx.paths.gbm_standardization` semantics) —
pure conditioning, fitted values are affine-invariant.

**Barriers** (all four knock kinds) run zero-path-HBM too: the knock state
at step t is the *prefix* extremum of the forward path, which the bridge
recursion cannot see — so barrier mode switches the generator to the
counter-based FORWARD walk. Grid step 0 sweeps each chunk forward
(W ← W + √dt·ξ_s, streams keyed by (seed, s, chunk)), records the first
barrier-crossing step τ_B in one VMEM plane (the only extra state), and
lands on W_T for the maturity leg; every backward step then regenerates the
SAME path by backward-differencing the SAME increments
(W_t = W_{t+1} − √dt·ξ_{t+1} — exact in real arithmetic; the ~√T·ulp f32
replay drift vs the forward sweep is ≤1e-7 relative on S and cannot move
the knock plane, which is fixed by the prepass). The gate ``τ_B ≤ t``
(knocked for -in, its complement for -out) masks the maturity cashflow,
the exercise select, and the ITM fit weights — exactly the
`barrier_gate` semantics of the XLA engine (engine.py Q4) and the mega
kernel's sign-bit encoding. Analytics: ``return_cf_tau``/``return_coeffs`` emit the
per-path (cashflow, τ) planes and per-step regression coefficients (same
contract as the mega kernel), so Greeks, dual bounds, and coefficient-route
exposures run off the zero-HBM engine too.

Reference semantics preserved: Q1 both fit modes, Q2 clamp, Q3 via the
equilibrated ridge solve, Q5/Q7 discounting/exercise (same step structure as
`lsmc_megakernel._mega_kernel`, which cites the reference lines).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gbm_pallas import _box_muller
from .lsmc_pallas import ring_entry_barrier
from .lsmc_megakernel import (
    LANES,
    MegaOutputs,
    _basis_cols,
    _chunk_rows_for,
    _coeff_row,
    _g_raw_fn,
    _factor_equilibrated_ridge,
    _moment_layout,
    _pairs,
    _ring_allreduce_moments,
    _solve_factored,
)

__all__ = ["lsmc_price_fusedpath"]


def _fusedpath_kernel(seed_ref, scal_ref, stats_ref, *refs,
                      n_steps, n_rows, chunk_rows, basis,
                      degree, american, itm_weights, antithetic,
                      schedule=False, ring_axis=None, ring_size=1,
                      emit_cf_tau=False, emit_coeffs=False, replay=False,
                      curves=False, barrier=False, barrier_down=True,
                      barrier_in=True):
    # refs = outputs (price Σ, ΣV², [cf, τ], [coeff rows]) then scratch
    # (V, W, Sp, macc, [τ_B knock plane], [ring comm buffers]) — unpacked by
    # the same static flags that built the pallas_call signature (mirrors
    # _mega_kernel).
    it = iter(refs)
    out_ref, out_sq_ref = next(it), next(it)
    cf_ref = tau_ref = coef_ref = None
    if emit_cf_tau:
        cf_ref, tau_ref = next(it), next(it)
    if emit_coeffs:
        coef_ref = next(it)
    V, W, Sp, macc = next(it), next(it), next(it), next(it)
    TB = next(it) if barrier else None
    rest = tuple(it)
    if ring_axis is not None:
        comm, send_sem, recv_sem = rest
    k = degree + 1
    layout, P = _moment_layout(basis, degree)
    i = pl.program_id(0)
    t = n_steps - i
    ring_entry_barrier(ring_axis, ring_size, i)
    tf = t.astype(jnp.float32)

    K = scal_ref[1]
    phi = scal_ref[2]
    rcond = scal_ref[3]
    sigma = scal_ref[4]
    drift_dt = scal_ref[5]  # (r − q − σ²/2)·dt
    dt = scal_ref[6]
    S0 = scal_ref[7]
    # time-T-units value carry (see lsmc_megakernel._mega_kernel): V stores
    # value·e^{+r·dt·(n_steps−τ)}, written only at exercise; one precomputed
    # scalar multiply discounts to the current step — per-step rounding
    # never compounds into the carry.
    c_t = stats_ref[2 * (n_steps + 1) + t]
    inv_c_t = stats_ref[3 * (n_steps + 1) + t]
    # deterministic term structures (amcx.term): the spot map becomes
    # S_t = S0·e^{D_t + X_t} with D_t = Σ_{s<t}(r_s−q_s−σ_s²/2)·dt and
    # X_t = Σ_{s<t} σ_s·ΔW_s a TIME-CHANGED Brownian motion, X_t = B(v_t),
    # v_t = Σ_{s<t} σ_s²·dt. The backward-bridge recursion generalizes to
    # the non-uniform clock v: conditionally on X_{t+1},
    #   X_t = (v_t/v_{t+1})·X_{t+1} + √(v_t·Δv_t/v_{t+1})·ξ
    # so three per-step host-precomputed rows (D, A = v_t/v_{t+1},
    # B = √(v_t·Δv_t/v_{t+1}), with B[n_steps] = √v_T for the terminal
    # draw) replace the flat drift/σ scalars; flat curves reproduce the
    # scalar recursion exactly (v_t = σ²·t·dt ⟹ A = t/(t+1)).
    n_extra = 3 if curves else 0
    if curves:
        D_t = stats_ref[4 * (n_steps + 1) + t]

    n_chunks = n_rows // chunk_rows
    half_chunks = n_chunks // 2

    def draw(c, step=None):
        """Fresh ξ tile for (step, chunk c); antithetic mirrors the
        second half of the chunks onto the first half's stream. ``step``
        defaults to this grid step's time index t; barrier mode passes it
        explicitly so the backward difference replays the forward prepass's
        exact increments (counter-based: same (seed, step, chunk) → same
        bits)."""
        if antithetic:
            mirror = c >= half_chunks
            base = jnp.where(mirror, c - half_chunks, c)
            sign = jnp.where(mirror, -1.0, 1.0)
        else:
            base = c
            sign = 1.0
        # Mosaic prng_seed takes ≤ 2 values: fold (step, chunk) into one
        # stream index (chunk count < 2^16 at any realistic path count)
        pltpu.prng_seed(seed_ref[0], (t if step is None else step) * 65536 + base)
        return _box_muller((chunk_rows, LANES)) * sign

    if barrier:
        B_lvl = scal_ref[8]
        NEVER = float(n_steps + 1)
        sqrt_dt = jnp.sqrt(dt)

        def _cross(S):
            return S <= B_lvl if barrier_down else S >= B_lvl

        def _gate(tb, upto):
            kn = tb <= upto
            return kn if barrier_in else jnp.logical_not(kn)

    @pl.when(i == 0)
    def _maturity():
        if curves:
            wT = stats_ref[6 * (n_steps + 1) + n_steps]  # √v_T
        else:
            wT = jnp.sqrt(dt * float(n_steps))

        def body(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            if barrier:
                # FORWARD walk (prefix knock state is unknowable backward):
                # accumulate W and the first-crossing step τ_B per path;
                # τ_B = 0 covers the S_0 monitor date (constant per config).
                tb0 = jnp.where(_cross(S0), 0.0, NEVER)

                def fwd(s, carry):
                    Wc, tb = carry
                    Wc = Wc + sqrt_dt * draw(c, step=s)
                    Sg = S0 * jnp.exp(drift_dt * s.astype(jnp.float32)
                                      + sigma * Wc)
                    tb = jnp.minimum(
                        tb, jnp.where(_cross(Sg), s.astype(jnp.float32),
                                      NEVER))
                    return Wc, tb

                Wt, tb = jax.lax.fori_loop(
                    1, n_steps + 1, fwd,
                    (jnp.zeros((chunk_rows, LANES), jnp.float32),
                     jnp.zeros((chunk_rows, LANES), jnp.float32) + tb0))
                TB[sl, :] = tb
            else:
                Wt = wT * draw(c)
            W[sl, :] = Wt
            if curves:
                S = S0 * jnp.exp(D_t + Wt)  # W carries X = B(v)
            else:
                S = S0 * jnp.exp(drift_dt * float(n_steps) + sigma * Wt)
            vT = jnp.maximum(phi * (S - K), 0.0)
            if barrier:
                # maturity cashflow only where the gate is open (Q4 parity
                # with engine.py's knocked_tm[n_steps] select)
                vT = jnp.where(_gate(tb, float(n_steps)), vT, 0.0)
            V[sl, :] = vT
            if emit_cf_tau:
                # cashflow carry stores UNdiscounted exercise values (Q5);
                # τ initialized to n_steps everywhere (Q7) — the same
                # contract as the mega kernel / XLA engine exports.
                cf_ref[sl, :] = vT
                tau_ref[sl, :] = jnp.full(
                    (chunk_rows, LANES), float(n_steps), jnp.float32
                )
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)
        if emit_coeffs:
            # maturity row recorded as zeros (no regression at t = n_steps)
            coef_ref[...] = jnp.zeros((1, 8, 128), jnp.float32)

    @pl.when(i > 0)
    def _step():
        mean = stats_ref[t]
        inv_std = stats_ref[n_steps + 1 + t]
        # Bermudan schedule: per-step allow flag appended after the
        # standardization/discount (+ curve) stats (1.0 = exercise date)
        allow = (stats_ref[(4 + n_extra) * (n_steps + 1) + t]
                 if schedule else None)
        if curves:
            a = stats_ref[5 * (n_steps + 1) + t]        # v_t/v_{t+1}
            bscale = stats_ref[6 * (n_steps + 1) + t]   # √(v_t·Δv_t/v_{t+1})
        else:
            a = tf / (tf + 1.0)
            bscale = jnp.sqrt(dt * a)  # √(dt·t/(t+1)); exactly 0 at t = 0

        if replay:
            # frozen-policy replay (two-pass out-of-sample pricing): the
            # fitted coefficients arrive through the stats stream; pass 1
            # below only regenerates the bridge/spot state (no moments),
            # and the whole ring/solve is skipped (see amcx.policy).
            base = (4 + n_extra + (1 if schedule else 0)) * (n_steps + 1)
            coeffs = [stats_ref[base + t * k + a_] for a_ in range(k)]

        # ---- pass 1: bridge-regenerate S_t, accumulate moments ----
        if not replay:
            macc[...] = jnp.zeros_like(macc)

        def pass1(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            if barrier:
                # backward-difference the forward walk's own increments
                # (same (seed, t+1, chunk) stream the prepass consumed)
                Wt = W[sl, :] - sqrt_dt * draw(c, step=t + 1)
            else:
                Wt = a * W[sl, :] + bscale * draw(c)
            W[sl, :] = Wt
            if curves:
                S = S0 * jnp.exp(D_t + Wt)
            else:
                S = S0 * jnp.exp(drift_dt * tf + sigma * Wt)
            Sp[sl, :] = S  # pass 2 re-reads from VMEM, not HBM
            if replay:
                return 0
            y = c_t * V[sl, :]
            xhat = (S - mean) * inv_std
            w = ((jnp.maximum(phi * (S - K), 0.0) > 0.0).astype(jnp.float32)
                 if itm_weights else None)
            if itm_weights and barrier:
                # canonical LS fit weights: ITM ∧ gate (mega pass1 parity);
                # the all-paths fit stays ungated (y already carries the
                # gated cashflows)
                w = w * _gate(TB[sl, :], tf).astype(jnp.float32)
            if layout == "identity":
                n_pow = 2 * degree + 1
                cols = _basis_cols(xhat, basis, 2 * degree)
                yw = y if w is None else y * w
                for m in range(n_pow):
                    cm = cols[m] if w is None else cols[m] * w
                    macc[m, :] += jnp.sum(cm, axis=0)
                for a_ in range(k):
                    macc[n_pow + a_, :] += jnp.sum(cols[a_] * yw, axis=0)
            else:
                pairs = _pairs(k)
                cols = _basis_cols(xhat, basis, degree)
                cols_w = cols if w is None else [c_ * w for c_ in cols]
                yw = y if w is None else y * w
                for p, (a_, b_) in enumerate(pairs):
                    macc[p, :] += jnp.sum(cols_w[a_] * cols[b_], axis=0)
                for a_ in range(k):
                    macc[len(pairs) + a_, :] += jnp.sum(cols[a_] * yw, axis=0)
            return 0

        jax.lax.fori_loop(0, n_chunks, pass1, 0)
        if not replay:
            if ring_axis is None:
                packed = jnp.sum(macc[...], axis=1)
            else:
                # collective zero-HBM pricing: the ONLY bytes that ever move
                # — on-chip or off — are these packed moments riding the
                # RDMA ring (paths are regenerated in VMEM on every chip).
                packed = _ring_allreduce_moments(
                    macc, comm, send_sem, recv_sem, t, ring_axis, ring_size
                )

            g_raw = _g_raw_fn(packed, k, layout, basis)
            L, d, G = _factor_equilibrated_ridge(g_raw, k, rcond)
            off = (2 * degree + 1) if layout == "identity" else len(_pairs(k))
            coeffs = _solve_factored(
                L, d, G, [packed[off + a_] for a_ in range(k)], k)
        if emit_coeffs:
            coef_ref[...] = _coeff_row(coeffs, k)

        # ---- pass 2: fitted continuation + exercise on the cached S ----
        # (European needs no carry update at all — pass skipped)
        def pass2(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            S = Sp[sl, :]
            xhat = (S - mean) * inv_std
            cols = _basis_cols(xhat, basis, degree)
            fitted = cols[0] * coeffs[0]
            for a_ in range(1, k):
                fitted = fitted + cols[a_] * coeffs[a_]
            cont = jnp.maximum(fitted, 0.0)  # Q2
            ex = jnp.maximum(phi * (S - K), 0.0)
            mask = ex > cont  # ex>cont ⟹ ITM
            if schedule:
                mask = mask & (allow > 0.0)
            if barrier:
                # Q4: exercise only where the knock gate is open at t
                mask = mask & _gate(TB[sl, :], tf)
            # exercised paths re-anchor at ex·e^{+r·dt·(n_steps−t)}
            V[sl, :] = jnp.where(mask, ex * inv_c_t, V[sl, :])
            if emit_cf_tau:
                cf_ref[sl, :] = jnp.where(mask, ex, cf_ref[sl, :])
                tau_ref[sl, :] = jnp.where(
                    mask, t.astype(jnp.float32), tau_ref[sl, :]
                )
            return 0

        if american:
            jax.lax.fori_loop(0, n_chunks, pass2, 0)

    @pl.when(i == n_steps)
    def _emit():
        v = c_t * V[...]  # t == 0 here: discount time-T-units to time 0
        out_ref[...] = jnp.sum(v).reshape(1, 1)
        if antithetic:
            # honest stderr: chunk c ≥ n_chunks/2 mirrors chunk c − n_chunks/2,
            # i.e. row j pairs with row j + n_rows/2 — fold pairs before Σ²
            half = n_rows // 2
            fold = 0.5 * (v[:half, :] + v[half:, :])
            out_sq_ref[...] = jnp.sum(fold * fold).reshape(1, 1)
        else:
            out_sq_ref[...] = jnp.sum(v * v).reshape(1, 1)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_rows", "basis", "degree", "american",
                     "itm_weights", "antithetic", "interpret", "schedule",
                     "ring_axis", "ring_size", "emit_cf_tau", "emit_coeffs",
                     "replay", "curves", "barrier", "barrier_down",
                     "barrier_in"),
)
def _run_fusedpath(seed, scalars, stats, n_steps, n_rows, basis, degree,
                   american, itm_weights, antithetic, interpret,
                   schedule=False, ring_axis=None, ring_size=1,
                   emit_cf_tau=False, emit_coeffs=False, replay=False,
                   curves=False, barrier=False, barrier_down=True,
                   barrier_in=True):
    _, P = _moment_layout(basis, degree)
    kernel = functools.partial(
        _fusedpath_kernel,
        n_steps=n_steps,
        n_rows=n_rows,
        chunk_rows=_chunk_rows_for(n_rows),
        basis=basis,
        degree=degree,
        american=american,
        itm_weights=itm_weights,
        antithetic=antithetic,
        schedule=schedule,
        ring_axis=ring_axis,
        ring_size=ring_size,
        emit_cf_tau=emit_cf_tau,
        emit_coeffs=emit_coeffs,
        replay=replay,
        curves=curves,
        barrier=barrier,
        barrier_down=barrier_down,
        barrier_in=barrier_in,
    )
    scratch_shapes = [
        pltpu.VMEM((n_rows, LANES), jnp.float32),  # V carry
        pltpu.VMEM((n_rows, LANES), jnp.float32),  # W bridge carry
        pltpu.VMEM((n_rows, LANES), jnp.float32),  # S_t stage for pass 2
        pltpu.VMEM((P, LANES), jnp.float32),
    ]
    if barrier:
        # τ_B first-crossing plane (written once by the forward prepass)
        scratch_shapes.append(pltpu.VMEM((n_rows, LANES), jnp.float32))
    compiler_kwargs = dict(vmem_limit_bytes=64 * 1024 * 1024)
    if ring_axis is not None:
        scratch_shapes += [
            pltpu.VMEM((2, ring_size, P, 128), jnp.float32),  # parity × hop
            pltpu.SemaphoreType.DMA((2, ring_size)),
            pltpu.SemaphoreType.DMA((2, ring_size)),
        ]
        compiler_kwargs["collective_id"] = 0
    scalar_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shapes = [scalar_shape, scalar_shape]
    out_specs = [scalar_spec, scalar_spec]
    if emit_cf_tau:
        # (cf, τ) planes live in VMEM as constant-index output blocks for
        # the whole scan and are written back to HBM once, at the end —
        # the ONLY per-path HBM bytes this engine ever writes.
        plane = jax.ShapeDtypeStruct((n_rows, LANES), jnp.float32)
        plane_spec = pl.BlockSpec(
            (n_rows, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [plane, plane]
        out_specs += [plane_spec, plane_spec]
    if emit_coeffs:
        # one (8, 128) tile per time step, written by that grid step (the
        # sublane padding satisfies Mosaic's block-shape minimum; the host
        # slices row 0 / the first k lanes)
        out_shapes.append(jax.ShapeDtypeStruct((n_steps + 1, 8, 128), jnp.float32))
        out_specs.append(pl.BlockSpec(
            (1, 8, 128), lambda i: (n_steps - i, 0, 0), memory_space=pltpu.VMEM
        ))
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        grid=(n_steps + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(**compiler_kwargs),
        interpret=interpret,
    )(seed, scalars, stats)
    it = iter(outs)
    out, out_sq = next(it), next(it)
    cf = tau = coefs = None
    if emit_cf_tau:
        cf, tau = next(it), next(it)
    if emit_coeffs:
        coefs = next(it)
    return jnp.stack([out[0, 0], out_sq[0, 0]]), cf, tau, coefs


def lsmc_price_fusedpath(
    seed,
    S0,
    K,
    r,
    sigma,
    dt,
    n_steps: int,
    n_paths: int,
    phi: float,
    q=0.0,
    basis: str = "chebyshev",
    degree: int = 4,
    rcond: float = 1e-6,
    american: bool = True,
    itm_weights: bool = False,
    antithetic: bool = False,
    return_stats: bool = False,
    interpret=None,
    exercise_steps=None,
    axis_name=None,
    axis_size: int = 1,
    return_cf_tau: bool = False,
    return_coeffs: bool = False,
    replay_coeffs=None,
    barrier=None,
    barrier_type: str = "down-in",
):
    """American/European vanilla GBM price with ZERO path HBM traffic.

    One kernel generates the paths backward (Brownian-bridge recursion,
    hardware PRNG) and runs the Longstaff-Schwartz induction on them as they
    appear. ``seed`` is an int32 scalar (counter-based: the price is a pure
    function of (seed, n_paths, n_steps)). Returns the price scalar, or
    ``(price, stderr)`` with ``return_stats=True``.

    **Collective mode** (``axis_name`` inside ``shard_map``): ``seed`` is
    the rank-local stream seed and ``n_paths`` the per-rank shard; the
    packed regression moments all-reduce mid-scan over the same in-kernel
    parity-double-buffered RDMA ring as the mega kernel — multi-chip
    pricing whose ONLY moving bytes (HBM or ICI) are the moment ring
    (VERDICT r2 next-step #8). Standardization is closed-form (identical on
    every rank); the final Σ/Σ² pair is psum'd. Returns the global price,
    replicated.

    TPU-only for statistics: the TPU interpreter stubs the PRNG with zero
    bits, so CPU/interpret runs produce the deterministic zero-noise path
    fan (useful for compile checks only).

    ``return_cf_tau`` / ``return_coeffs``: emit the per-path undiscounted
    cashflow/τ planes and per-step solved regression coefficients (the same
    contract as `lsmc_price_megakernel` — returns a `MegaOutputs`). The
    planes are VMEM-resident output blocks written back once, so the
    zero-path-HBM property degrades only to two (n_paths,) planes of
    *result* traffic; every analytics consumer (`amcx.greeks.fast_greeks`,
    `amcx.dual.dual_upper_bound`, `amcx.exposures.exposures_from_coeffs`
    with any same-law path set) runs off them.

    ``replay_coeffs``: frozen per-step coefficients (``(n_steps[+1],
    degree+1)``, any engine's ``return_coeffs=True`` export) — the kernel
    skips the regression (moments + ring + solve) and replays the fixed
    policy on its own freshly generated paths: the out-of-sample pricing
    pass of the two-pass Longstaff-Schwartz estimator (`amcx.policy`).
    The coefficient frame is automatically consistent: this engine always
    standardizes with the closed-form GBM statistics, so any mega/fusedpath
    fit under the same market parameters replays exactly. Use a ``seed``
    disjoint from the fit's so the pricing paths are independent.

    **Term structures**: ``r``/``sigma``/``q`` may each be an ``(n_steps,)``
    piecewise-constant curve (`amcx.term.TermCurves` grid). The kernel then
    regenerates the time-changed Brownian ``X_t = B(Σ_{s<t}σ_s²·dt)``
    backward with per-step bridge rows and prices with exact curve
    discounting — zero path HBM under any deterministic term structure.
    Composes with replay/schedules/collective mode; flat scalars are
    bitwise-unchanged.

    **Barriers**: ``barrier`` (knock level) + ``barrier_type`` in
    {down,up}×{in,out} switch the kernel to the forward-walk + τ_B-plane
    scheme (module docstring): one extra VMEM plane, still zero path HBM.
    Gate semantics are exactly the XLA engine's `barrier_gate` (Q4):
    maturity cashflow, exercise select, and ITM fit weights are masked by
    knocked-by-t (-in) or never-knocked-by-t (-out); the all-paths fit is
    ungated. Monitoring is discrete on the step grid including t = 0.
    Term-structure curves are not yet supported together with barriers.
    """
    if n_paths % (8 * LANES):
        raise ValueError(
            f"fusedpath needs n_paths divisible by {8 * LANES}, got {n_paths}"
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret is True:
        # plain interpret mode has no prng_seed rule; the TPU interpreter
        # stubs the PRNG (zero bits) — enough for control-flow checks
        interpret = pltpu.InterpretParams()
    n_rows = n_paths // LANES
    if antithetic and (n_rows // _chunk_rows_for(n_rows)) % 2:
        raise ValueError("antithetic fusedpath needs an even chunk count")
    # deterministic term structures (amcx.term): any of r/sigma/q given as
    # an (n_steps,) vector switches the kernel to the time-changed-Brownian
    # bridge (see the curve note in _fusedpath_kernel). The flat scalar path
    # is bitwise-unchanged.
    r_a = jnp.asarray(r, jnp.float32)
    sig_a = jnp.asarray(sigma, jnp.float32)
    q_a = jnp.asarray(q, jnp.float32)
    curves = any(x.ndim > 0 for x in (r_a, sig_a, q_a))
    has_barrier = barrier is not None
    if has_barrier:
        bt = barrier_type.strip().lower()
        if bt not in ("down-in", "down-out", "up-in", "up-out"):
            raise ValueError(f"unknown barrier_type {barrier_type!r}")
        if curves:
            raise NotImplementedError(
                "fusedpath barriers under term-structure curves are not "
                "implemented yet; use the forward pipeline (engine='mega')"
            )
        barrier_down = bt.startswith("down")
        barrier_in = bt.endswith("in")
    else:
        barrier_down = barrier_in = True
    if curves:
        for name, x in (("r", r_a), ("sigma", sig_a), ("q", q_a)):
            if x.ndim > 1 or (x.ndim == 1 and x.shape != (n_steps,)):
                raise ValueError(
                    f"{name} must be a scalar or an (n_steps,) vector; got "
                    f"shape {x.shape} for n_steps={n_steps}")
        r_t = jnp.broadcast_to(r_a, (n_steps,))
        sig_t = jnp.broadcast_to(sig_a, (n_steps,))
        q_t = jnp.broadcast_to(q_a, (n_steps,))
        from ..term import TermCurves, curve_standardization

        mean_t, inv_std_t = curve_standardization(
            TermCurves(jnp.asarray(S0, jnp.float32), r_t, sig_t, q_t), dt)
        r_eff = jnp.mean(r_t)
        drift_eff = jnp.float32(0.0)  # unused in curve mode
        sig_eff = jnp.float32(0.0)
    else:
        from ..paths import gbm_standardization
        from ..types import MarketParams

        mean_t, inv_std_t = gbm_standardization(
            MarketParams(float(S0), float(r), float(sigma), float(q)),
            float(dt) * n_steps, n_steps,
        )
        r_eff = r_a
        drift_eff = jnp.asarray((r - q - 0.5 * sigma**2) * dt, jnp.float32)
        sig_eff = sig_a
    scalars = jnp.stack([
        jnp.asarray(r_eff * dt, jnp.float32),
        jnp.asarray(K, jnp.float32),
        jnp.asarray(phi, jnp.float32),
        jnp.asarray(rcond, jnp.float32),
        sig_eff,
        drift_eff,
        jnp.asarray(dt, jnp.float32),
        jnp.asarray(S0, jnp.float32),
        jnp.asarray(barrier if has_barrier else 0.0, jnp.float32),
    ])
    dt_f = jnp.asarray(dt, jnp.float32)
    if curves:
        # Rrem[t] = Σ_{s≥t} r_s·dt (0 at maturity) — same rows as the mega
        # kernel's generalized discounting
        r_rem = jnp.concatenate(
            [jnp.cumsum((r_t * dt_f)[::-1])[::-1], jnp.zeros((1,), jnp.float32)])
    else:
        rem = n_steps - jnp.arange(n_steps + 1, dtype=jnp.float32)
        r_rem = jnp.asarray(r * dt, jnp.float32) * rem
    stats_parts = [mean_t.astype(jnp.float32), inv_std_t.astype(jnp.float32),
                   jnp.exp(-r_rem), jnp.exp(r_rem)]
    if curves:
        # bridge clock v_t = Σ_{s<t} σ_s²·dt and drift D_t (t = 0..n_steps)
        zero = jnp.zeros((1,), jnp.float32)
        v = jnp.concatenate([zero, jnp.cumsum(jnp.square(sig_t) * dt_f)])
        D = jnp.concatenate([zero, jnp.cumsum(
            (r_t - q_t - 0.5 * jnp.square(sig_t)) * dt_f)])
        v_next = v[1:]                      # v_{t+1}, t = 0..n_steps−1
        safe = jnp.maximum(v_next, 1e-30)   # σ≡0 prefix: A = B = 0
        A = jnp.concatenate([v[:n_steps] / safe, zero])
        B = jnp.concatenate(
            [jnp.sqrt(v[:n_steps] * (v_next - v[:n_steps]) / safe),
             jnp.sqrt(v[n_steps:])])        # B[n_steps] = √v_T
        stats_parts += [D, A, B]
    if exercise_steps is not None:
        from ..payoff import exercise_allow_row

        stats_parts.append(exercise_allow_row(exercise_steps, n_steps,
                                              jnp.float32))
    replay = replay_coeffs is not None
    if replay:
        replay_coeffs = jnp.asarray(replay_coeffs, jnp.float32)
        _k = degree + 1
        if replay_coeffs.ndim != 2 or replay_coeffs.shape[1] != _k:
            raise ValueError(
                f"replay_coeffs must be (n_steps[+1], degree+1={_k}), "
                f"got {replay_coeffs.shape}"
            )
        if replay_coeffs.shape[0] == n_steps + 1:
            replay_coeffs = replay_coeffs[:n_steps]  # zero maturity row
        elif replay_coeffs.shape[0] != n_steps:
            raise ValueError(
                f"replay_coeffs has {replay_coeffs.shape[0]} step rows; "
                f"expected n_steps={n_steps}"
            )
        # frozen-policy coefficients ride the stats stream, flattened
        # row-major: the kernel reads stats[base + t*k + a] per step
        stats_parts.append(replay_coeffs.reshape(-1))
    stats = jnp.concatenate(stats_parts)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape((1,))
    sums, cf, tau, coefs = _run_fusedpath(
        seed_arr, scalars, stats, n_steps, n_rows, basis,
        degree, american, itm_weights, antithetic, interpret,
        schedule=exercise_steps is not None,
        ring_axis=axis_name, ring_size=axis_size,
        emit_cf_tau=return_cf_tau, emit_coeffs=return_coeffs, replay=replay,
        curves=curves, barrier=has_barrier, barrier_down=barrier_down,
        barrier_in=barrier_in)
    n_glob = n_paths * (axis_size if axis_name is not None else 1)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
    price = sums[0] / n_glob
    # antithetic: ΣV² was emitted over the n/2 pair means (honest stderr)
    n_eff = n_glob // 2 if antithetic else n_glob
    var = jnp.maximum(sums[1] / n_eff - price * price, 0.0)
    stderr = jnp.sqrt(var / n_eff)
    if return_cf_tau or return_coeffs:
        return MegaOutputs(
            price, stderr,
            None if cf is None else cf.reshape(-1),
            None if tau is None else tau.reshape(-1),
            None if coefs is None else coefs[:, 0, : degree + 1],
        )
    if not return_stats:
        return price
    return price, stderr
