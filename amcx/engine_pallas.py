"""Backward induction driven by the fused Pallas step kernels.

Drop-in alternative to `amcx.engine.backward_induction` for the univariate
product family (vanilla + down-and-in barrier puts/calls). Orchestration
stays a `lax.scan`, but each step runs exactly two fused passes over HBM
(`amcx.ops.lsmc_pallas`) instead of XLA's unfused reduction swarm, plus the
tiny replicated solve.

Extra structural win: the per-step standardization statistics (weighted
mean/std of the regressor, SURVEY Q1 + reference scaling semantics
`american_monte_carlo.py:111-114`) do not depend on the backward recursion —
they are precomputed for ALL steps in one vectorized sweep over the path
array before the scan starts.

On CPU the kernels run in Pallas interpreter mode (they use no TPU-only
primitives), so the full engine parity tests run in the hermetic suite.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .engine import LSMCResult
from .ops.lsmc_pallas import LANES, TILE_ROWS, step_apply, step_moments, unpack_moments
from .payoff import barrier_gate, intrinsic_value
from .regress import pinv_solve
from .types import ProductSpec, RegressionSpec

__all__ = ["precompute_standardization", "backward_induction_fused", "lsmc_option_pricing_fused"]


def precompute_standardization(paths_tm, weights_tm, spec: RegressionSpec,
                               eps=1e-6, axis_name=None):
    """Per-step (weighted) mean and 1/(factor·std) over the path axis, for
    every time step at once — one vectorized pass over the path array.

    Under ``axis_name`` (inside ``shard_map``) the statistics are GLOBAL
    (psum'd): every rank must standardize in the same frame, or the psum'd
    regression moments mix incompatible bases (found by the hardened
    multichip dryrun gate, round 3 — the per-shard frames put a ~1e-2 error
    on the 8-way fused price).
    """
    def gsum(x):
        s = jnp.sum(x, axis=1)
        return lax.psum(s, axis_name) if axis_name is not None else s

    n = paths_tm.shape[1]
    n_glob = (lax.psum(jnp.asarray(float(n), paths_tm.dtype), axis_name)
              if axis_name is not None else float(n))
    if weights_tm is None:
        mean = gsum(paths_tm) / n_glob
        var = gsum(jnp.square(paths_tm - mean[:, None])) / n_glob
    else:
        wsum = jnp.maximum(gsum(weights_tm), eps)
        mean = gsum(weights_tm * paths_tm) / wsum
        var = gsum(weights_tm * jnp.square(paths_tm - mean[:, None])) / wsum
    std = jnp.maximum(jnp.sqrt(var), eps)
    factor = spec.scaling_factor if spec.scaling else 1.0
    if not (spec.scaling or spec.internal_standardize):
        return jnp.zeros_like(mean), jnp.ones_like(std)
    return mean, 1.0 / (factor * std)


def backward_induction_fused(
    paths_tm: jnp.ndarray,
    r,
    dt,
    K,
    phi: float,
    spec: RegressionSpec,
    barrier=None,
    barrier_type: str = "down-in",
    american: bool = True,
    return_surface: bool = False,
    axis_name: Optional[str] = None,
    interpret: Optional[bool] = None,
    exercise_steps=None,
    antithetic: bool = False,
) -> LSMCResult:
    """Fused-kernel LSMC for single-asset put/call (φ=+1 call, −1 put).

    ``exercise_steps``: optional Bermudan schedule (step indices where early
    exercise is allowed); the regression still runs every step (Q6 — the
    surface feeds exposures), the (cf, τ) select is gated per step with a
    ``where`` outside the kernel. ``antithetic``: paths pair i with
    i + n_paths/2; folds pairs before the variance reduction so the
    reported stderr is honest (see `amcx.engine.backward_induction`).
    """
    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    if n_paths % (TILE_ROWS * LANES):
        raise ValueError(
            f"fused engine needs n_paths divisible by {TILE_ROWS * LANES}, got {n_paths}"
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = paths_tm.dtype
    rows = n_paths // LANES
    k = spec.degree + 1
    rdt = jnp.asarray(r * dt, dtype)
    K = jnp.asarray(K, dtype)
    phi_f = jnp.asarray(phi, dtype)

    knocked_tm = None
    if barrier is not None:
        knocked_tm = barrier_gate(paths_tm, barrier, barrier_type).astype(dtype)

    weights_tm = None
    use_w_t = jnp.ones((paths_tm.shape[0],), dtype)
    if spec.regress_on == "itm":
        w = (intrinsic_value(paths_tm, K, "call" if phi > 0 else "put") > 0).astype(dtype)
        weights_tm = w if knocked_tm is None else w * knocked_tm
        # degenerate-weight fallback, mirroring `amcx.regress._fit`: steps
        # whose ITM∧knocked mass is below k+1 effective points fit (and
        # standardize) on all paths instead — a zero Gram would fabricate
        # cont = 0 and the XLA engine would silently diverge from the
        # kernel route on thin-mass configs (deep-OTM barrier calls, t=0
        # at the money)
        wsum_t = jnp.sum(weights_tm, axis=1)
        if axis_name is not None:
            wsum_t = lax.psum(wsum_t, axis_name)
        use_w_t = (wsum_t >= float(spec.degree + 2)).astype(dtype)
        weights_tm = jnp.where(use_w_t[:, None] > 0, weights_tm,
                               jnp.ones_like(weights_tm))
    mean_t, inv_std_t = precompute_standardization(paths_tm, weights_tm, spec,
                                                   axis_name=axis_name)

    def rows_of(a):
        return a.reshape(a.shape[0], rows, LANES) if a is not None else None

    paths_r = rows_of(paths_tm)
    knocked_r = rows_of(knocked_tm)

    S_T = paths_r[n_steps]
    payoff_T = jnp.maximum(phi_f * (S_T - K), 0.0)
    if knocked_r is not None:
        payoff_T = jnp.where(knocked_r[n_steps] > 0, payoff_T, 0.0)
    cf0 = payoff_T
    tau0 = jnp.full((rows, LANES), float(n_steps), dtype)

    moments = partial(
        step_moments,
        basis=spec.basis,
        degree=spec.degree,
        itm_weights=spec.regress_on == "itm",
        interpret=interpret,
    )
    apply_ = partial(
        step_apply,
        basis=spec.basis,
        degree=spec.degree,
        emit_surface=return_surface,
        interpret=interpret,
    )

    def step(carry, xs):
        cf, tau = carry
        xs, allowed_t = (xs[:-1], xs[-1]) if exercise_steps is not None else (xs, None)
        if knocked_r is not None:
            S_t, kn_t, t, mean, inv_std, use_w = xs
        else:
            S_t, t, mean, inv_std, use_w = xs
            kn_t = None
        scalars = jnp.stack([t, rdt, K, mean, inv_std, phi_f, use_w])
        packed = moments(scalars, S_t, cf, tau, kn_t)
        if axis_name is not None:
            packed = lax.psum(packed, axis_name)  # the only cross-chip bytes
        G, b = unpack_moments(packed, k)
        coeffs = pinv_solve(G, b, spec.rcond)
        if american:
            out = apply_(scalars, coeffs, S_t, cf, tau, kn_t)
            if return_surface:
                cf_new, tau_new, cont = out
            else:
                cf_new, tau_new = out
            if exercise_steps is not None:
                # Bermudan gate: keep the carry on non-exercise dates (the
                # kernel's select is undone by a scalar-predicated where —
                # XLA fuses it into the copy-out, no extra sweep).
                cf_new = jnp.where(allowed_t, cf_new, cf)
                tau_new = jnp.where(allowed_t, tau_new, tau)
            cf, tau = cf_new, tau_new
        elif return_surface:
            # European: regression only feeds the exposure surface (SURVEY
            # Q6); evaluate fitted values without the exercise select.
            _, _, cont = apply_(scalars, coeffs, S_t, cf, tau, kn_t)
        ys = cont.reshape(-1) if return_surface else None
        return (cf, tau), ys

    ts = jnp.arange(n_steps, dtype=dtype)
    xs = (
        (paths_r[:n_steps], knocked_r[:n_steps], ts, mean_t[:n_steps],
         inv_std_t[:n_steps], use_w_t[:n_steps])
        if knocked_r is not None
        else (paths_r[:n_steps], ts, mean_t[:n_steps], inv_std_t[:n_steps],
              use_w_t[:n_steps])
    )
    if exercise_steps is not None:
        from .payoff import exercise_allow_row

        xs = xs + (exercise_allow_row(exercise_steps, n_steps)[:n_steps],)
    (cf, tau), conts = lax.scan(step, (cf0, tau0), xs, reverse=True)

    discounted = (cf * jnp.exp(-rdt * tau)).reshape(-1)
    if antithetic:
        # honest antithetic stderr: fold pair (i, i + n/2) before Σ/Σ²
        # (see amcx.engine.backward_induction; pairing holds in both the
        # XLA and the Pallas path layouts).
        half = n_paths // 2
        stat = 0.5 * (discounted[:half] + discounted[half:])
        n_stat = float(half)
    else:
        stat = discounted
        n_stat = float(n_paths)
    if axis_name is None:
        price = jnp.mean(stat)
        var = jnp.mean(jnp.square(stat - price))
        n_total = n_stat
    else:
        n_total = lax.psum(jnp.asarray(n_stat, dtype), axis_name)
        price = lax.psum(jnp.sum(stat), axis_name) / n_total
        var = lax.psum(jnp.sum(jnp.square(stat - price)), axis_name) / n_total
    stderr = jnp.sqrt(var) / jnp.sqrt(n_total)

    surface = None
    if return_surface:
        surface = jnp.concatenate(
            [conts, jnp.zeros((1, n_paths), dtype)], axis=0
        )
    return LSMCResult(price, stderr, cf.reshape(-1), tau.reshape(-1), surface)


def lsmc_option_pricing_fused(
    paths_tm: jnp.ndarray,
    product: ProductSpec,
    r,
    spec: RegressionSpec = RegressionSpec(),
    return_surface: bool = False,
    axis_name: Optional[str] = None,
    exercise_steps=None,
    antithetic: bool = False,
) -> LSMCResult:
    """`amcx.engine.lsmc_option_pricing` signature, fused-kernel execution."""
    from .engine import resolve_regression_spec

    n_steps = paths_tm.shape[0] - 1
    dt = product.T / n_steps
    spec = resolve_regression_spec(spec, product, for_surface=return_surface)
    phi = 1.0 if product.option_type == "call" else -1.0
    return backward_induction_fused(
        paths_tm,
        r,
        dt,
        product.K,
        phi,
        spec,
        barrier=product.barrier,
        barrier_type=product.barrier_type,
        american=product.is_american,
        return_surface=return_surface,
        axis_name=axis_name,
        exercise_steps=exercise_steps,
        antithetic=antithetic,
    )
