"""Single-kernel swing pricing: the multiple-stopping DP at mega speed.

`amcx.swing.price_swing_option` runs the rights ladder through the XLA
scan engine; this kernel runs the ENTIRE multiple-stopping backward
induction — (n_rights+1) value planes, n_rights regressions per step, the
descending-k exercise cascade — in ONE `pallas_call`, the swing twin of
`amcx.ops.lsmc_megakernel._mega_kernel` (same VMEM-resident time-T-units
carry discipline, same two-pass step, same equilibrated-ridge solve).

The rights dimension is nearly free on TPU:

- all n_rights regressions at a step share the SAME design matrix and ITM
  weights (the basis depends only on S_t), so pass 1 accumulates ONE Gram
  + n_rights y-moment rows, and the solve is ONE Cholesky factorization
  with n_rights right-hand sides (`_factor_equilibrated_ridge` /
  `_solve_factored` were built multi-RHS for the book kernel);
- pass 2 evaluates the shared basis columns once and runs the exercise
  cascade DESCENDING in k, so ``V[k-1]`` is read pre-update — exercising
  one right hands the path to the (k−1)-rights policy from t+1 on, at
  most one exercise per date (`amcx.swing` has the DP derivation and the
  exact rights-lattice oracle this kernel is validated against).

VMEM: (n_rights+1) resident value planes + the spot double-buffer — at 1M
paths ≈ 4·(n_rights+3) MB, so rights ≤ ~12 fit the 64 MB budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lsmc_megakernel import (
    LANES,
    _basis_cols,
    _chunk_rows_for,
    _factor_equilibrated_ridge,
    _g_raw_fn,
    _pairs,
    _solve_factored,
)

__all__ = ["lsmc_price_swing"]


def _swing_kernel(scal_ref, stats_ref, s_ref, out_ref, out_sq_ref, V, macc,
                  *, n_steps, n_rows, chunk_rows, basis, degree, n_rights,
                  itm_weights, antithetic, payoff_kind="option", n_min=0):
    k = degree + 1
    pairs = _pairs(k)
    nP = len(pairs)
    R = n_rights
    forward = payoff_kind == "forward"
    i = pl.program_id(0)
    t = n_steps - i

    K = scal_ref[1]
    phi = scal_ref[2]
    rcond = scal_ref[3]
    c_t = stats_ref[2 * (n_steps + 1) + t]
    inv_c_t = stats_ref[3 * (n_steps + 1) + t]
    n_chunks = n_rows // chunk_rows

    def obligations(kk):
        # kk rights remaining ⇒ R − kk already exercised (static per plane)
        return max(0, n_min - (R - kk))

    def take(S):
        signed = phi * (S - K)
        return signed if forward else jnp.maximum(signed, 0.0)

    @pl.when(i == 0)
    def _maturity():
        # maturity is an exercise date: exactly one right is usable
        # (V^k_T = payoff for every k ≥ 1), matching the rights lattice;
        # an outstanding obligation forces the (possibly negative) take
        def body(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            S = s_ref[0, sl, :]
            pay = take(S)
            V[0, sl, :] = jnp.zeros_like(pay)
            for kk in range(1, R + 1):
                # exactly ONE take at maturity, forced or not (the
                # k-1 ladder would add a phantom second take)
                if obligations(kk) >= 1:
                    V[kk, sl, :] = pay
                else:
                    V[kk, sl, :] = jnp.maximum(pay, 0.0)
            return 0

        jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(i > 0)
    def _step():
        mean = stats_ref[t]
        inv_std = stats_ref[n_steps + 1 + t]
        macc[...] = jnp.zeros_like(macc)

        def pass1(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            S = s_ref[0, sl, :]
            xhat = (S - mean) * inv_std
            cols = _basis_cols(xhat, basis, degree)
            if itm_weights and not forward:
                # itm localization is meaningless for signed takes
                # (obligations force exercise OTM) — see amcx.swing
                w = (phi * (S - K) > 0.0).astype(jnp.float32)
                cols_w = [c_ * w for c_ in cols]
            else:
                w = None
                cols_w = cols
            for p, (a, b_) in enumerate(pairs):
                macc[p, :] += jnp.sum(cols_w[a] * cols[b_], axis=0)
            for kk in range(1, R + 1):
                y = c_t * V[kk, sl, :]
                yw = y if w is None else y * w
                for a in range(k):
                    macc[nP + (kk - 1) * k + a, :] += jnp.sum(
                        cols[a] * yw, axis=0)
            return 0

        jax.lax.fori_loop(0, n_chunks, pass1, 0)
        packed = jnp.sum(macc[...], axis=1)
        g_raw = _g_raw_fn(packed, k, "pairs", basis)
        L, d, Gnr = _factor_equilibrated_ridge(g_raw, k, rcond)
        # one factorization, R right-hand sides: coeffs[kk] fits C^{kk+1}
        coeffs = [
            _solve_factored(
                L, d, Gnr, [packed[nP + kk * k + a] for a in range(k)], k)
            for kk in range(R)
        ]

        def pass2(c, _):
            sl = pl.ds(c * chunk_rows, chunk_rows)
            S = s_ref[0, sl, :]
            xhat = (S - mean) * inv_std
            cols = _basis_cols(xhat, basis, degree)
            conts = []
            for kk in range(R):
                fitted = cols[0] * coeffs[kk][0]
                for a in range(1, k):
                    fitted = fitted + cols[a] * coeffs[kk][a]
                # Q2 clamp only for nonnegative (option) cashflows — a
                # floored SIGNED continuation disables OTM forced takes
                conts.append(fitted if forward
                             else jnp.maximum(fitted, 0.0))
            ex = take(S)
            itm = ex > 0.0
            # dates t..n_steps inclusive remain at grid position t
            dates_remaining = n_steps - t + 1
            for kk in range(R, 0, -1):  # descending: V[kk-1] pre-update
                cont_k = conts[kk - 1]
                cont_km1 = conts[kk - 2] if kk >= 2 else 0.0
                hit = ex + cont_km1 > cont_k
                if not forward:
                    hit = itm & hit
                if obligations(kk) > 0:
                    hit = hit | (dates_remaining <= obligations(kk))
                V[kk, sl, :] = jnp.where(
                    hit, ex * inv_c_t + V[kk - 1, sl, :], V[kk, sl, :])
            return 0

        jax.lax.fori_loop(0, n_chunks, pass2, 0)

    @pl.when(i == n_steps)
    def _emit():
        v = c_t * V[R]  # t == 0: discount time-T units to time 0
        out_ref[...] = jnp.sum(v).reshape(1, 1)
        if antithetic:
            half = n_rows // 2
            fold = 0.5 * (v[:half, :] + v[half:, :])
            out_sq_ref[...] = jnp.sum(fold * fold).reshape(1, 1)
        else:
            out_sq_ref[...] = jnp.sum(v * v).reshape(1, 1)


@functools.partial(
    jax.jit,
    static_argnames=("n_steps", "n_rows", "basis", "degree", "n_rights",
                     "itm_weights", "antithetic", "interpret",
                     "payoff_kind", "n_min"),
)
def _run_swing(scalars, stats, paths_blocks, n_steps, n_rows, basis, degree,
               n_rights, itm_weights, antithetic, interpret,
               payoff_kind="option", n_min=0):
    k = degree + 1
    P = len(_pairs(k)) + n_rights * k
    kernel = functools.partial(
        _swing_kernel,
        n_steps=n_steps,
        n_rows=n_rows,
        chunk_rows=_chunk_rows_for(n_rows),
        basis=basis,
        degree=degree,
        n_rights=n_rights,
        itm_weights=itm_weights,
        antithetic=antithetic,
        payoff_kind=payoff_kind,
        n_min=n_min,
    )
    scalar_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    out, out_sq = pl.pallas_call(
        kernel,
        out_shape=(scalar_shape, scalar_shape),
        grid=(n_steps + 1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, n_rows, LANES),
                lambda i: (n_steps - i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(scalar_spec, scalar_spec),
        scratch_shapes=[
            pltpu.VMEM((n_rights + 1, n_rows, LANES), jnp.float32),
            pltpu.VMEM((P, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scalars, stats, paths_blocks)
    return jnp.stack([out[0, 0], out_sq[0, 0]])


def lsmc_price_swing(
    paths_tm: jnp.ndarray,
    K,
    r,
    dt,
    phi: float,
    n_rights: int,
    basis: str = "chebyshev",
    degree: int = 4,
    rcond: float = 1e-6,
    itm_weights: bool = False,
    mean_t=None,
    inv_std_t=None,
    interpret=None,
    antithetic: bool = False,
    payoff_kind: str = "option",
    n_min: int = 0,
):
    """Swing price (``n_rights`` exercises, ≤ 1 per date) in one kernel.

    Same input contract as `lsmc_price_megakernel`: time-major paths
    (``(n_steps+1, n_paths)`` or pre-blocked 3-D), optional precomputed
    standardization rows, ``r`` a scalar or an ``(n_steps,)`` short-rate
    curve. ``payoff_kind="forward"`` / ``n_min`` price the constrained
    (take-or-pay) swing — same semantics as `amcx.swing._swing_engine_impl`
    (signed takes, unclamped continuations, forced-exercise region).
    Returns ``(price, stderr)``. Validated against the XLA swing engine
    (`amcx.swing`) and the exact rights lattice
    (`amcx.swing.crr_swing_price`).
    """
    if n_rights < 1:
        raise ValueError("n_rights must be >= 1")
    if n_rights > 12:
        raise ValueError("n_rights > 12 exceeds the VMEM plane budget")
    if payoff_kind not in ("option", "forward"):
        raise ValueError(f"unknown payoff_kind {payoff_kind!r}")
    if not 0 <= n_min <= n_rights:
        raise ValueError("need 0 <= n_min <= n_rights")
    n_steps = paths_tm.shape[0] - 1
    n_paths = (paths_tm.shape[1] if paths_tm.ndim == 2
               else paths_tm.shape[1] * paths_tm.shape[2])
    if n_paths % (8 * LANES):
        raise ValueError(
            f"swing kernel needs n_paths divisible by {8 * LANES}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if interpret is True:
        interpret = pltpu.InterpretParams()
    n_rows = n_paths // LANES
    path_axes = 1 if paths_tm.ndim == 2 else (1, 2)
    if mean_t is None:
        mean_t = jnp.mean(paths_tm, axis=path_axes)
        var = jnp.mean(
            jnp.square(paths_tm - mean_t.reshape(
                (-1,) + (1,) * (paths_tm.ndim - 1))), axis=path_axes)
        inv_std_t = 1.0 / jnp.maximum(jnp.sqrt(var), 1e-6)
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
    stats = jnp.concatenate(
        [mean_t.astype(jnp.float32), inv_std_t.astype(jnp.float32),
         jnp.exp(-r_rem), jnp.exp(r_rem)])
    blocks = (paths_tm if paths_tm.ndim == 3
              else paths_tm.reshape(n_steps + 1, n_rows, LANES))
    sums = _run_swing(scalars, stats, blocks, n_steps, n_rows, basis, degree,
                      int(n_rights), itm_weights, antithetic, interpret,
                      payoff_kind=payoff_kind, n_min=int(n_min))
    price = sums[0] / n_paths
    n_eff = n_paths // 2 if antithetic else n_paths
    var = jnp.maximum(sums[1] / n_eff - price * price, 0.0)
    stderr = jnp.sqrt(var / n_eff)
    return price, stderr
