"""Duality-based upper bound for American options (Andersen-Broadie).

LSMC is a *lower*-bound estimator (any suboptimal exercise rule under-
prices). The dual formulation (Rogers 2002 / Haugh-Kogan 2004) gives an
upper bound from any martingale M:

    price ≤ E[ max_t ( disc_t · payoff_t − M_t ) ]

Andersen-Broadie (2004) build M from the LSMC value surrogate
``V̂_t(S) = max(intrinsic, Ĉ_t(S))`` with one-step sub-simulation:

    M_{t+1} − M_t = disc_{t+1} V̂_{t+1}(S_{t+1})
                    − E[ disc_{t+1} V̂_{t+1}(S_{t+1}) | S_t ]

where the conditional expectation is estimated with J inner one-step GBM
samples. Everything runs from the engine's exported per-step regression
coefficients (``return_coeffs=True``) — no re-fitting. The whole
(outer × time × inner) tensor evaluates as one ``lax.scan`` over time with a
J-wide inner axis; on TPU the inner sub-simulation is just one more
elementwise batch dimension.

Together with the LSMC price this brackets the true value:
``lower − ε ≤ price ≤ upper + ε`` with MC errors on both sides.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .basis import design_matrix
from .payoff import intrinsic_value
from .types import MarketParams, ProductSpec, RegressionSpec

__all__ = ["DualResult", "dual_upper_bound"]


class DualResult(NamedTuple):
    upper: jnp.ndarray      # dual upper bound estimate
    stderr: jnp.ndarray     # MC stderr of the upper bound
    gap: jnp.ndarray        # upper − lower (duality gap, given lower input)


@partial(jax.jit, static_argnames=("spec", "option_type", "n_inner"))
def _dual_impl(key, paths_tm, coeffs, mean_t, inv_std_t, K, r, q, sigma, dt,
               lower_price, spec, option_type, n_inner):
    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dtype = paths_tm.dtype

    put = option_type.strip().lower() == "put"

    def vhat(S, t_idx, coef, mean, inv_std):
        """Value surrogate at step t: max(intrinsic, clamped continuation);
        at maturity, intrinsic.

        The regression polynomial is only meaningful inside the fitted spot
        range; clip x̂ to ±2.5σ (flat extrapolation) and cap the surrogate
        by model-free value bounds — otherwise degree-k extrapolation noise
        inflates the dual max enormously.
        """
        intrinsic = intrinsic_value(S, K, option_type)
        xhat = jnp.clip((S - mean) * inv_std, -2.5, 2.5)
        A = design_matrix(xhat, spec.basis, spec.degree)
        cont = jnp.maximum(jnp.sum(A * coef, axis=-1), 0.0)
        v = jnp.maximum(intrinsic, cont)
        v = jnp.minimum(v, K) if put else jnp.minimum(v, S)
        return jnp.where(t_idx >= n_steps, intrinsic, v)

    drift = (r - q - 0.5 * sigma**2) * dt
    vol = sigma * jnp.sqrt(dt)

    def step(carry, xs):
        M, running_max = carry
        S_t, S_t1, t, key_t, coef_t1, mean_t1, inv_std_t1 = xs
        t1 = t + 1.0
        disc_t1 = jnp.exp(-r * dt * t1)
        # realized next-step value
        v_next = disc_t1 * vhat(S_t1, t1, coef_t1, mean_t1, inv_std_t1)
        # conditional expectation via J antithetic inner one-step samples
        z_half = jax.random.normal(key_t, (n_inner // 2, n_paths), dtype)
        z = jnp.concatenate([z_half, -z_half], axis=0)
        S_inner = S_t[None, :] * jnp.exp(drift + vol * z)
        v_inner = disc_t1 * vhat(S_inner, t1, coef_t1, mean_t1, inv_std_t1)
        cond_exp = jnp.mean(v_inner, axis=0)
        M = M + (v_next - cond_exp)
        # dual payoff at t+1
        h = jnp.exp(-r * dt * t1) * intrinsic_value(S_t1, K, option_type)
        running_max = jnp.maximum(running_max, h - M)
        return (M, running_max), None

    # t = 0 term: h_0 − M_0 = intrinsic(S_0)
    M0 = jnp.zeros((n_paths,), dtype)
    run0 = intrinsic_value(paths_tm[0], K, option_type)

    keys = jax.random.split(key, n_steps)
    # per-step data for t = 0..n_steps-1, evaluating V̂ at t+1
    coef_t1 = jnp.concatenate([coeffs[1:], jnp.zeros((1, coeffs.shape[1]), dtype)], axis=0)
    mean_t1 = mean_t[1:]
    inv_std_t1 = inv_std_t[1:]
    xs = (
        paths_tm[:n_steps],
        paths_tm[1:],
        jnp.arange(n_steps, dtype=dtype),
        keys,
        coef_t1,
        mean_t1,
        inv_std_t1,
    )
    (M, running_max), _ = lax.scan(step, (M0, run0), xs)
    upper = jnp.mean(running_max)
    stderr = jnp.std(running_max) / jnp.sqrt(float(n_paths))
    return DualResult(upper, stderr, upper - lower_price)


@partial(jax.jit, static_argnames=("spec", "option_type", "n_inner"))
def _dual_nested_impl(key, paths_tm, coeffs, mean_t, inv_std_t, K, r, q, sigma,
                      dt, lower_price, spec, option_type, n_inner):
    """Full nested Andersen-Broadie: the martingale uses the *rule value*
    L_t (payoff of following the LSMC exercise rule from t), with the
    conditional expectation estimated by J inner paths simulated forward
    under the rule until exercise. O(T² · J · N) path-steps — a pittance on
    TPU, prohibitive on the reference's CPU stack."""
    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dtype = paths_tm.dtype

    drift = (r - q - 0.5 * sigma**2) * dt
    vol = sigma * jnp.sqrt(dt)

    def rule_exercise(S, t_idx, coef, mean, inv_std):
        """The LSMC rule at step t: exercise iff ITM and h > clamped Ĉ
        (maturity: exercise whenever ITM)."""
        h = intrinsic_value(S, K, option_type)
        xhat = jnp.clip((S - mean) * inv_std, -2.5, 2.5)
        A = design_matrix(xhat, spec.basis, spec.degree)
        cont = jnp.maximum(jnp.sum(A * coef, axis=-1), 0.0)
        ex = (h > 0.0) & (h > cont)
        return jnp.where(t_idx >= n_steps, h > 0.0, ex), h

    ts = jnp.arange(n_steps, dtype=dtype)
    coef_full = jnp.concatenate([coeffs, jnp.zeros((1, coeffs.shape[1]), dtype)], 0)
    mean_full = mean_t
    inv_full = inv_std_t

    def inner_rule_value(S_start, t1, key_t):
        """Ê[rule value at t1 (t1-dollars) | spot S_start at t1−1]: J
        antithetic inner paths transition one step then follow the rule
        until exercise (fixed-length masked scan to maturity)."""
        J = n_inner
        z0 = jax.random.normal(key_t, (n_steps, J // 2, n_paths), dtype)
        z = jnp.concatenate([z0, -z0], axis=1)  # (n_steps, J, N)

        def istep(carry, xs):
            S, alive, val = carry
            z_s, s = xs
            run = s >= t1  # only steps at/after t1 participate
            # transition into step s first (the conditional expectation is
            # over S_{t1} | S_t, so the very first participating step must
            # evolve the spot before the rule is evaluated)
            S = jnp.where(run, S * jnp.exp(drift + vol * z_s), S)
            coef_s = coef_full[jnp.minimum(s, n_steps).astype(jnp.int32)]
            mean_s = mean_full[jnp.minimum(s, n_steps).astype(jnp.int32)]
            inv_s = inv_full[jnp.minimum(s, n_steps).astype(jnp.int32)]
            e, h = rule_exercise(S, s, coef_s, mean_s, inv_s)
            stop = alive & e & run
            # value discounted back to t1
            val = jnp.where(stop, jnp.exp(-r * dt * (s - t1)) * h, val)
            alive = alive & ~stop
            return (S, alive, val), None

        S0 = jnp.broadcast_to(S_start[None, :], (J, n_paths))
        alive0 = jnp.ones((J, n_paths), bool)
        val0 = jnp.zeros((J, n_paths), dtype)
        ss = jnp.arange(1, n_steps + 1, dtype=dtype)
        (S, alive, val), _ = lax.scan(istep, (S0, alive0, val0), (z, ss))
        return jnp.mean(val, axis=0)  # (N,) in t1-dollars

    # --- dual recursion over t ---
    # Andersen-Broadie with noise telescoping: the realized value at t+1 is
    # L̂_{t+1} = h_{t+1} if the rule exercises there, else the discounted
    # sub-sim estimate ĉ(t+1, S_{t+1}) — and the SAME ĉ realization is
    # reused as the next step's conditional-expectation term, so its inner
    # noise cancels across consecutive martingale increments (it survives
    # only at exercise dates). Without the reuse, per-step inner noise
    # random-walks into the pathwise max and inflates the bound by orders
    # of magnitude.
    keys = jax.random.split(key, n_steps + 1)

    def step(carry, xs):
        M, rmax, c_prev = carry  # c_prev = ĉ(t, S_t) in (t+1)-dollars
        S_t1, t, key_t = xs
        t1 = t + 1.0
        disc1 = jnp.exp(-r * dt * t1)
        idx1 = jnp.minimum(t1, float(n_steps)).astype(jnp.int32)
        e1, h1 = rule_exercise(S_t1, t1, coef_full[idx1], mean_full[idx1], inv_full[idx1])
        # ĉ(t+1, S_{t+1}) in (t+2)-dollars (zero past maturity)
        c_next = jnp.where(
            t1 < n_steps,
            inner_rule_value(S_t1, t1 + 1.0, key_t),
            jnp.zeros((n_paths,), dtype),
        )
        realized = jnp.where(e1, h1, jnp.exp(-r * dt) * c_next)  # L̂_{t+1}, (t+1)-dollars
        M = M + disc1 * (realized - c_prev)
        rmax = jnp.maximum(rmax, disc1 * h1 - M)
        return (M, rmax, c_next), None

    M0 = jnp.zeros((n_paths,), dtype)
    r0 = intrinsic_value(paths_tm[0], K, option_type)
    c0 = inner_rule_value(paths_tm[0], 1.0, keys[n_steps])  # ĉ(0, S_0)
    xs = (paths_tm[1:], ts, keys[:n_steps])
    (M, rmax, _), _ = lax.scan(step, (M0, r0, c0), xs)
    upper = jnp.mean(rmax)
    stderr = jnp.std(rmax) / jnp.sqrt(float(n_paths))
    return DualResult(upper, stderr, upper - lower_price)


@partial(jax.jit, static_argnames=("spec", "basis_mode", "n_inner"))
def _dual_nested_maxcall_impl(key, paths_tm, coeffs, mean_t, inv_std_t, K, r, q,
                              sigma, chol, dt, lower_price, spec, basis_mode,
                              n_inner):
    """Nested AB dual bound for the Bermudan max-call (telescoped, as in
    the univariate `_dual_nested_impl`). ``paths_tm``: (T+1, N, A)."""
    from .basis import multi_asset_design_matrix
    from .payoff import max_call_payoff

    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    n_assets = paths_tm.shape[2]
    dtype = paths_tm.dtype
    drift = (r - q - 0.5 * sigma**2) * dt
    vol = sigma * jnp.sqrt(dt)

    def rule_exercise(S, t_idx, coef, mean, inv_std):
        """The max-call LSMC rule at step t (first exercise at step 1, the
        Bermudan convention)."""
        h = max_call_payoff(S, K)
        X = jnp.sort(S, axis=-1)[..., ::-1] if basis_mode == "sorted" else S
        xh = jnp.clip((X - mean) * inv_std, -2.5, 2.5)
        A = multi_asset_design_matrix(xh, spec.basis, spec.degree, "total")
        cont = jnp.maximum(jnp.sum(A * coef, axis=-1), 0.0)
        ex = (h > 0.0) & (h > cont)
        return jnp.where(t_idx >= n_steps, h > 0.0, ex), h

    coef_full = jnp.concatenate([coeffs, jnp.zeros((1, coeffs.shape[1]), dtype)], 0)

    def inner_rule_value(S_start, t1, key_t):
        J = n_inner
        z0 = jax.random.normal(key_t, (n_steps, J // 2, n_paths, n_assets), dtype)
        z = jnp.concatenate([z0, -z0], axis=1)

        def istep(carry, xs):
            S, alive, val = carry
            z_s, s = xs
            run = s >= t1
            W = jnp.einsum("jna,ba->jnb", z_s, chol)
            S = jnp.where(run, S * jnp.exp(drift + vol * W), S)
            idx = jnp.minimum(s, n_steps).astype(jnp.int32)
            e, h = rule_exercise(S, s, coef_full[idx], mean_t[idx], inv_std_t[idx])
            stop = alive & e & run
            val = jnp.where(stop, jnp.exp(-r * dt * (s - t1)) * h, val)
            alive = alive & ~stop
            return (S, alive, val), None

        S0 = jnp.broadcast_to(S_start[None], (J,) + S_start.shape)
        ss = jnp.arange(1, n_steps + 1, dtype=dtype)
        (S, alive, val), _ = lax.scan(
            istep, (S0, jnp.ones((J, n_paths), bool), jnp.zeros((J, n_paths), dtype)),
            (z, ss),
        )
        return jnp.mean(val, axis=0)

    keys = jax.random.split(key, n_steps + 1)
    ts = jnp.arange(n_steps, dtype=dtype)

    def step(carry, xs):
        M, rmax, c_prev = carry
        S_t1, t, key_t = xs
        t1 = t + 1.0
        disc1 = jnp.exp(-r * dt * t1)
        idx1 = jnp.minimum(t1, float(n_steps)).astype(jnp.int32)
        e1, h1 = rule_exercise(S_t1, t1, coef_full[idx1], mean_t[idx1], inv_std_t[idx1])
        c_next = jnp.where(
            t1 < n_steps,
            inner_rule_value(S_t1, t1 + 1.0, key_t),
            jnp.zeros((n_paths,), dtype),
        )
        realized = jnp.where(e1, h1, jnp.exp(-r * dt) * c_next)
        M = M + disc1 * (realized - c_prev)
        rmax = jnp.maximum(rmax, disc1 * h1 - M)
        return (M, rmax, c_next), None

    M0 = jnp.zeros((n_paths,), dtype)
    # first exercise date is step 1 (Bermudan convention) → no t=0 term
    r0 = jnp.zeros((n_paths,), dtype)
    c0 = inner_rule_value(paths_tm[0], 1.0, keys[n_steps])
    (M, rmax, _), _ = lax.scan(step, (M0, r0, c0), (paths_tm[1:], ts, keys[:n_steps]))
    upper = jnp.mean(rmax)
    stderr = jnp.std(rmax) / jnp.sqrt(float(n_paths))
    return DualResult(upper, stderr, upper - lower_price)


def dual_upper_bound_max_call(
    key: jax.Array,
    paths_tm: jnp.ndarray,
    result,
    K,
    T,
    r,
    sigma,
    coeff_stats,
    spec: RegressionSpec,
    q=0.0,
    corr=None,
    basis_mode: str = "sorted",
    n_inner: int = 64,
) -> DualResult:
    """Nested AB upper bound for the Bermudan max-call.

    ``result`` must come from `price_max_call(..., return_coeffs=True)`;
    ``coeff_stats`` = `maxcall_standardization(fit_paths, basis_mode)`.
    ``paths_tm``: fresh (n_steps+1, N, A) outer paths (e.g.
    `simulate_gbm_multi` with a disjoint key), n_steps = exercise dates.
    """
    if result.coeffs is None:
        raise ValueError("run price_max_call with return_coeffs=True")
    n_steps = paths_tm.shape[0] - 1
    n_assets = paths_tm.shape[2]
    dtype = paths_tm.dtype
    mean_t, inv_std_t = coeff_stats
    if mean_t.shape[0] != n_steps + 1:
        raise ValueError("coeff_stats must cover n_steps+1 rows")
    chol = (
        jnp.eye(n_assets, dtype=dtype)
        if corr is None
        else jnp.linalg.cholesky(jnp.asarray(corr, dtype))
    )
    return _dual_nested_maxcall_impl(
        key,
        paths_tm,
        result.coeffs.astype(dtype),
        jnp.asarray(mean_t, dtype),
        jnp.asarray(inv_std_t, dtype),
        jnp.asarray(K, dtype),
        jnp.asarray(r, dtype),
        jnp.asarray(q, dtype),
        jnp.asarray(sigma, dtype),
        chol,
        jnp.asarray(T / n_steps, dtype),
        result.price.astype(dtype),
        spec,
        basis_mode,
        n_inner,
    )


def dual_upper_bound(
    key: jax.Array,
    paths_tm: jnp.ndarray,
    result,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec,
    mean_t: jnp.ndarray,
    inv_std_t: jnp.ndarray,
    n_inner: int = 32,
    nested: bool = False,
) -> DualResult:
    """Andersen-Broadie upper bound from an engine run with exported
    coefficients.

    Args:
      paths_tm: fresh or reused outer paths (reuse biases the bound slightly
        low; a fresh key-disjoint path set is cleaner).
      result: `LSMCResult` with ``coeffs`` (run the engine with
        ``return_coeffs=True``).
      mean_t/inv_std_t: standardization stats of the fit (from
        `amcx.engine_pallas.precompute_standardization`).
      n_inner: inner samples per (path, step) for the conditional
        expectation.
      nested: False → fast one-step surrogate variant (gap ~0.1-0.2 on the
        benchmark put); True → full nested Andersen-Broadie (inner paths
        follow the exercise rule to stopping; tight, costs O(T²·J·N)
        path-steps — still sub-second on TPU).

    Estimator caveat: the one-step surrogate uses the fitted continuation
    as a GLOBAL value-function estimate, so it needs an all-paths fit; an
    ITM-localized fit (the auto-resolved pricing default since round 4)
    extrapolates OTM and loosens the bound by ~10×. The nested variant only
    consumes the exercise *rule* (gated on intrinsic > 0), which is sound
    for any fit — use ``nested=True`` to certify the shipped ITM policy.
    """
    import warnings

    from .engine import resolve_regression_spec

    if result.coeffs is None:
        raise ValueError("run the engine with return_coeffs=True")
    # the fit resolved "auto" before solving (possibly bumping the degree
    # for q=0 calls); the replayed design matrices must match it
    spec = resolve_regression_spec(spec, product, q=market.q)
    if not nested and spec.regress_on == "itm":
        warnings.warn(
            "one-step dual surrogate with an ITM-localized fit: the "
            "continuation polynomial is extrapolated OTM and the bound "
            "will be loose — use nested=True (policy-based) to certify "
            "an ITM-fit policy", stacklevel=2)
    n_steps = paths_tm.shape[0] - 1
    dt = product.T / n_steps
    dtype = paths_tm.dtype
    coeffs = result.coeffs
    if coeffs.shape[0] == n_steps + 1:
        # mega-kernel export carries a zero maturity row; the XLA engine's
        # (n_steps, k) convention drops it
        coeffs = coeffs[:n_steps]
    impl = _dual_nested_impl if nested else _dual_impl
    return impl(
        key,
        paths_tm,
        coeffs.astype(dtype),
        jnp.asarray(mean_t, dtype),
        jnp.asarray(inv_std_t, dtype),
        jnp.asarray(product.K, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.q, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(dt, dtype),
        result.price.astype(dtype),
        spec,
        product.option_type,
        n_inner,
    )
