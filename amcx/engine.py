"""Longstaff-Schwartz backward induction as a `lax.scan`.

This is the TPU re-architecture of the reference's engine layer
(`/root/reference/american_monte_carlo.py:139-197`):

- the Python ``for t in reversed(range(n_steps+1))`` loop
  (`american_monte_carlo.py:141`) becomes a single ``lax.scan`` with
  ``reverse=True`` over the time-major path array — one compiled program,
  no host round trips;
- the in-place scatter of `apply_exercise` (`american_monte_carlo.py:90-94`)
  becomes a pure ``jnp.where`` select on the ``(cashflows, exercise_times)``
  scan carry — no mutation, trivially race-free (SURVEY §5);
- the per-step LAPACK ``lstsq`` becomes the on-device Gram-moment fit of
  `amcx.regress` (one big MXU matmul + tiny replicated solve). Under a
  sharded path axis, XLA inserts the moment all-reduce automatically.

Behavioural parity points (SURVEY quirks):

- Q1: regression fits on **all** paths by default (``regress_on="all"``);
- Q2: continuation clamped at zero before the exercise comparison;
- Q3: t=0 is part of the loop (degenerate rank-1 design handled by the
  pseudo-inverse solve);
- Q4: down-and-in barrier — maturity cashflow only on knocked paths, early
  exercise only on knocked paths;
- Q5: the cashflow carry stores *undiscounted* exercise values; regression
  targets discount from the stored exercise time τ back to t, the final
  price discounts from τ to 0;
- Q6: European products still run the regression every step (the
  continuation surface feeds CCR exposures) but never exercise early;
- Q7: never-exercised paths keep τ = n_steps with zero cashflow.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .payoff import barrier_gate, payoff_fn_for
from .regress import fit_continuation
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = ["LSMCResult", "backward_induction", "backward_induction_tvr",
           "lsmc_option_pricing", "price_option", "q0_call_advisory",
           "resolve_regression_spec", "policy_frame"]


def resolve_regression_spec(
    spec: RegressionSpec,
    product: ProductSpec,
    q=None,
    for_surface: bool = False,
) -> RegressionSpec:
    """Resolve ``regress_on="auto"`` into a concrete estimator per product.

    The reference fits the continuation regression on **all** paths
    (`american_monte_carlo.py:127`, SURVEY Q1), which carries a measured
    policy bias on early-exercisable configs: −0.064 (S0=95 put), −0.094
    (ATM put) and −0.22 (q=0 call) at 1M×100 paths vs CRR-2000 with the
    degree-4 Chebyshev basis. The ITM-localized fit (canonical
    Longstaff-Schwartz) removes it: same configs measure −0.0006 / −0.0004 /
    −0.014 (round-4 TPU measurement, docs/PARITY.md). Resolution rules:

    - explicit ``"all"`` / ``"itm"`` pass through untouched (``"all"`` is
      the reference-parity opt-out);
    - European → ``"all"``: the regression only feeds the continuation
      surface (CCR exposures, SURVEY Q6), where a global fit is the right
      estimator — ITM localization would extrapolate OTM;
    - ``for_surface=True`` (the caller asked for the dense continuation
      surface or streaming surface stats — the CCR/exposure use-case) →
      ``"all"`` for the same reason: the surface must be a global
      conditional-expectation estimate, not an ITM-localized fit
      polynomial extrapolated OTM. CCR callers who want the
      bias-reduced *price* should price separately (or use
      `amcx.exposures.exposures_from_coeffs` with explicit all-paths
      coefficients);
    - American → ``"itm"``; for calls with a concretely-zero dividend
      yield ``q`` the degree is raised to ≥ 6 (the documented
      recommended-practice spec for the q=0 call, where ITM-only
      localization still needs curvature headroom near the boundary).

    ``q`` may be omitted (e.g. `lsmc_option_pricing` prices from
    pre-simulated paths and never sees the market): the ITM upgrade still
    applies, only the q=0-call degree bump is skipped.
    """
    import dataclasses

    if spec.regress_on != "auto":
        return spec
    if not product.is_american or for_surface:
        return dataclasses.replace(spec, regress_on="all")
    degree = spec.degree
    if product.option_type == "call" and q is not None:
        try:
            if float(q) == 0.0:
                degree = max(degree, 6)
        except (TypeError, jax.errors.TracerArrayConversionError):
            pass  # traced q inside jit: best-effort only
    return dataclasses.replace(spec, regress_on="itm", degree=degree)


class LSMCResult(NamedTuple):
    """Engine output.

    ``price`` mirrors `lsmc_option_pricing`'s first return
    (`american_monte_carlo.py:196`); ``continuation`` is the dense
    ``(n_steps+1, n_paths)`` continuation-value surface, the functional
    equivalent of the reference's list of ``(t, S_t, Ĉ_t)`` tuples
    (`american_monte_carlo.py:164,197`) and the input to CCR exposures.
    ``stderr`` is the Monte-Carlo standard error of the price (new).
    ``exposures`` carries streaming per-step EPE/PFE when the engine runs
    with ``surface_stats=True`` (summary-stats mode: the CCR profile without
    materializing the O(n_steps·n_paths) surface — SURVEY §5). ``coeffs`` is
    the ``(n_steps, degree+1)`` per-step regression-coefficient dump
    (observability + deterministic re-run artifact, SURVEY §5).
    """

    price: jnp.ndarray
    stderr: jnp.ndarray
    cashflows: jnp.ndarray
    exercise_times: jnp.ndarray
    continuation: Optional[jnp.ndarray]
    exposures: Optional[object] = None
    coeffs: Optional[jnp.ndarray] = None


def backward_induction(
    paths_tm: jnp.ndarray,
    knocked_tm: jnp.ndarray,
    r,
    dt,
    payoff: Callable[[jnp.ndarray], jnp.ndarray],
    spec: RegressionSpec,
    regressor: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    american: bool = True,
    return_surface: bool = True,
    fit_fn: Optional[Callable] = None,
    axis_name: Optional[str] = None,
    surface_stats: bool = False,
    return_coeffs: bool = False,
    exercise_from_step: int = 0,
    fit_fn_returns_coeffs: bool = False,
    exercise_steps=None,
    antithetic: bool = False,
) -> LSMCResult:
    """Generic LSMC backward induction.

    Args:
      paths_tm: time-major state, ``(n_steps+1, n_paths)`` or
        ``(n_steps+1, n_paths, n_assets)``.
      knocked_tm: ``(n_steps+1, n_paths)`` bool knock-state (all-True for
        vanilla), per `precompute_barrier_hit_matrix` semantics.
      payoff: ``S_t -> (n_paths,)`` intrinsic value.
      spec: regression configuration.
      regressor: optional map from state to the scalar regression variable
        (default: identity for 1-D state).
      american: early exercise enabled (`american_monte_carlo.py:154`).
      return_surface: emit the dense continuation surface (zeros at maturity,
        matching `american_monte_carlo.py:145-149`).
      fit_fn: override ``(x, y, spec, weights, axis_name) -> clamped fitted
        values`` (used by the multi-asset engine to swap in a cross-term
        basis).
      axis_name: mesh axis the path dimension is sharded over (inside
        ``shard_map``). Turns the regression moments, the standardization
        statistics, and the final price/stderr reductions into global
        ``psum``s — the only cross-chip traffic per step (SURVEY §5).
      surface_stats: emit per-step EPE / PFE-5% / PFE-95% of the continuation
        estimate directly from the scan (exact, sort-based) instead of — or
        in addition to — the dense surface. This is the summary-stats export
        for path counts where the O(n_steps·n_paths) surface is undesirable
        (SURVEY §5). Under ``axis_name`` the quantiles come from a psum'd
        2048-bin histogram (`amcx.exposures.distributed_percentiles`) —
        global to one bin width of the global range; EPE is an exact psum.
      return_coeffs: also return the ``(n_steps, degree+1)`` solved
        regression coefficients per step (requires the default fitter).
      exercise_from_step: earliest step index at which early exercise is
        permitted. 0 reproduces the reference (its backward loop includes
        t=0, SURVEY Q3); Bermudan benchmarks (max-call) use 1 so the first
        exercise date is T/n, not inception.
      exercise_steps: optional explicit Bermudan exercise schedule — an
        iterable of step indices (1..n_steps-1) at which early exercise is
        allowed, e.g. quarterly dates on a daily simulation grid. Composes
        with ``exercise_from_step``; maturity always pays intrinsic. The
        regression still runs every step (Q6: the continuation surface
        feeds exposures), only the exercise select is gated.
      antithetic: the paths were generated with antithetic variates (path i
        mirrors path i + n_paths/2, the layout every amcx generator uses).
        Folds each pair's discounted cashflows BEFORE the variance
        reduction, so the reported stderr is that of the n/2 independent
        pair means — the honest MC error of an antithetic estimator (a
        pathwise variance ignores the pairing and overstates it). Under
        ``axis_name`` the pairing is within each shard (how the shard_map
        pipelines simulate), so the fold stays local and the psum
        aggregates pair statistics.
    """
    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dtype = paths_tm.dtype
    r = jnp.asarray(r, dtype)
    dt = jnp.asarray(dt, dtype)
    if surface_stats and axis_name is not None:
        from .exposures import distributed_percentiles
    if return_coeffs and fit_fn is not None and not fit_fn_returns_coeffs:
        raise ValueError(
            "return_coeffs requires the default univariate fitter or a "
            "custom fit_fn declared with fit_fn_returns_coeffs=True"
        )
    custom_fit = fit_fn is not None and not fit_fn_returns_coeffs
    if fit_fn is None:
        from .regress import fit_continuation_with_coeffs

        fit_fn = fit_continuation_with_coeffs

    # Maturity leg (`american_monte_carlo.py:147-149`): intrinsic on knocked
    # paths only; τ initialized to n_steps everywhere (Q7).
    S_T = paths_tm[n_steps]
    cf0 = jnp.where(knocked_tm[n_steps], payoff(S_T), jnp.zeros((n_paths,), dtype))
    tau0 = jnp.full((n_paths,), float(n_steps), dtype)

    def step(carry, xs):
        cashflows, tau = carry
        S_t, knocked_t, t, allowed_t = xs
        # Regression target: discount each cashflow from its stored exercise
        # time back to t (Q5, `american_monte_carlo.py:128`).
        y = cashflows * jnp.exp(-r * dt * (tau - t))
        x = S_t if regressor is None else regressor(S_t)
        ex = payoff(S_t)
        if spec.regress_on == "itm":
            weights = (ex > 0).astype(dtype) * knocked_t.astype(dtype)
        else:
            weights = None  # reference behaviour: fit on all paths (Q1)
        if custom_fit:
            cont = fit_fn(x, y, spec, weights, axis_name)  # clamped at 0 (Q2)
            coefs = None
        else:
            cont, coefs = fit_fn(x, y, spec, weights, axis_name)
        if american:
            # Exercise where intrinsic beats continuation on knocked ∧ ITM
            # paths (`american_monte_carlo.py:154-162`), as a pure select.
            exercise = knocked_t & (ex > 0) & (ex > cont)
            if exercise_from_step > 0:
                exercise = exercise & (t >= exercise_from_step)
            if exercise_steps is not None:
                exercise = exercise & allowed_t
            cashflows = jnp.where(exercise, ex, cashflows)
            tau = jnp.where(exercise, t, tau)
        if surface_stats:
            if axis_name is None:
                stats_t = (jnp.mean(cont), jnp.percentile(cont, jnp.asarray([5.0, 95.0])))
            else:
                # global EPE via psum; global PFE quantiles via the psum'd
                # histogram (no global sort needed under shard_map)
                n_g = lax.psum(jnp.asarray(float(n_paths), dtype), axis_name)
                epe_t = lax.psum(jnp.sum(cont), axis_name) / n_g
                stats_t = (
                    epe_t,
                    distributed_percentiles(cont, jnp.asarray([5.0, 95.0]), axis_name),
                )
        ys = (
            cont if return_surface else None,
            stats_t if surface_stats else None,
            coefs if return_coeffs else None,
        )
        return (cashflows, tau), ys

    ts = jnp.arange(n_steps, dtype=dtype)
    if exercise_steps is not None:
        from .payoff import exercise_allow_row

        allowed = exercise_allow_row(exercise_steps, n_steps)[:n_steps]
    else:
        allowed = jnp.ones((n_steps,), bool)  # traced but unused xs leaf
    (cashflows, tau), (conts, stats, coefs) = lax.scan(
        step,
        (cf0, tau0),
        (paths_tm[:n_steps], knocked_tm[:n_steps], ts, allowed),
        reverse=True,
    )

    discounted = cashflows * jnp.exp(-r * dt * tau)
    if antithetic:
        # Fold antithetic pairs (path i with its mirror i + n/2) before the
        # variance reduction: the n/2 pair means ARE the independent draws,
        # so their spread is the honest stderr (VERDICT r2 weak #1). The
        # fold preserves the price (mean of pair means == overall mean).
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
        # psum-based global mean/variance across the sharded path axis
        # (BASELINE north star: "psum-based reduction for the final
        # discounted-payoff mean").
        n_total = lax.psum(jnp.asarray(n_stat, dtype), axis_name)
        price = lax.psum(jnp.sum(stat), axis_name) / n_total
        var = lax.psum(jnp.sum(jnp.square(stat - price)), axis_name) / n_total
    stderr = jnp.sqrt(var) / jnp.sqrt(n_total)

    surface = None
    if return_surface:
        # Maturity row is recorded as zeros, like the reference's
        # ``continuation_estimated`` at t == n_steps (:145-149).
        surface = jnp.concatenate([conts, jnp.zeros((1, n_paths), dtype)], axis=0)
    exposures = None
    if surface_stats:
        from .exposures import CCRExposures

        epe, pfes = stats
        zero = jnp.zeros((1,), dtype)
        # maturity row recorded as zeros, matching the reference surface
        exposures = CCRExposures(
            pfe5=jnp.concatenate([pfes[:, 0], zero]),
            pfe95=jnp.concatenate([pfes[:, 1], zero]),
            epe=jnp.concatenate([epe, zero]),
        )
    return LSMCResult(
        price, stderr, cashflows, tau, surface,
        exposures=exposures,
        coeffs=coefs if return_coeffs else None,
    )


def backward_induction_tvr(
    paths_tm: jnp.ndarray,
    r,
    dt,
    payoff: Callable[[jnp.ndarray], jnp.ndarray],
    spec: RegressionSpec,
    regressor: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    antithetic: bool = False,
) -> LSMCResult:
    """Tsitsiklis–van Roy (2001) fitted value iteration — the OTHER classic
    regression estimator, for comparison against Longstaff-Schwartz.

    Where LS regresses the REALIZED discounted future cashflow along each
    path and uses the fit only for the exercise decision
    (:func:`backward_induction`, reference semantics
    `american_monte_carlo.py:139-167`), TvR regresses the one-step-
    discounted FITTED value ``V_{t+1}`` and propagates
    ``V_t = max(exercise, Ĉ_t)`` itself — the fitted surface replaces the
    path value entirely. Projection errors therefore COMPOUND through the
    recursion, and the per-step max over fitted noise makes the in-sample
    estimate upward-biased; with a well-specified basis both converge, and
    the LS/TvR gap is a practical basis-misspecification diagnostic
    (tests/test_tvr.py pins both properties). LS stays the default
    everywhere; this exists as a certification tool.

    Returns an :class:`LSMCResult` with price/stderr only (the TvR carry
    has no exercise-time vector — cashflows/tau/surface are None). The
    t=0 "regression" of the reference loop (Q3) is a rank-1 design — the
    fit is just the cross-path mean — so it is evaluated explicitly:
    ``price = max(intrinsic(S₀), mean(e^{-rΔ} V₁))``, with the stderr of
    that mean (pair-folded under ``antithetic``) as the error bar."""
    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dtype = paths_tm.dtype
    r = jnp.asarray(r, dtype)
    dt = jnp.asarray(dt, dtype)
    from .regress import fit_continuation_with_coeffs

    disc1 = jnp.exp(-r * dt)
    V_T = payoff(paths_tm[n_steps])

    def step(V, xs):
        S_t, t = xs
        y = V * disc1  # one-step discount of the time-(t+1) value
        x = S_t if regressor is None else regressor(S_t)
        ex = payoff(S_t)
        if spec.regress_on == "itm":
            weights = (ex > 0).astype(dtype)
        else:
            weights = None
        cont, _ = fit_continuation_with_coeffs(x, y, spec, weights, None)
        V2 = jnp.maximum(ex, cont)  # value iteration: fitted value carries
        return V2, None

    # scan stops at t=1; the degenerate t=0 leg is the explicit mean below
    ts = jnp.arange(1, n_steps, dtype=dtype)
    V1, _ = lax.scan(step, V_T, (paths_tm[1:n_steps], ts), reverse=True)
    y0 = V1 * disc1
    if antithetic:
        half = n_paths // 2
        stat = 0.5 * (y0[:half] + y0[half:])
    else:
        stat = y0
    cont0 = jnp.mean(stat)
    ex0 = payoff(paths_tm[0])[0]
    price = jnp.maximum(ex0, cont0)
    stderr = jnp.std(stat) / jnp.sqrt(stat.shape[0])
    return LSMCResult(price, stderr, None, None, None)


def lsmc_option_pricing(
    paths_tm: jnp.ndarray,
    product: ProductSpec,
    r,
    spec: RegressionSpec = RegressionSpec(),
    return_surface: bool = True,
    axis_name: Optional[str] = None,
    surface_stats: bool = False,
    return_coeffs: bool = False,
    exercise_steps=None,
    antithetic: bool = False,
) -> LSMCResult:
    """Price a (possibly barrier) put/call from pre-simulated paths.

    Functional equivalent of the reference's public entry point
    `lsmc_option_pricing` (`american_monte_carlo.py:180-197`): computes the
    knock matrix, runs backward induction, returns the discounted mean and
    the continuation surface. ``dt = T / n_steps`` is derived from the path
    grid.

    ``exercise_steps``: optional Bermudan schedule — a tuple of step
    indices where early exercise is allowed (e.g. ``tuple(range(0, 252,
    21))`` for monthly dates on a daily grid). None = American (every
    step, reference behaviour).
    """
    n_steps = paths_tm.shape[0] - 1
    dt = product.T / n_steps
    spec = resolve_regression_spec(
        spec, product, for_surface=return_surface or surface_stats)
    knocked = barrier_gate(paths_tm, product.barrier, product.barrier_type)
    return backward_induction(
        paths_tm,
        knocked,
        r,
        dt,
        payoff_fn_for(product),
        spec,
        american=product.is_american,
        return_surface=return_surface,
        exercise_steps=exercise_steps,
        axis_name=axis_name,
        surface_stats=surface_stats,
        return_coeffs=return_coeffs,
        antithetic=antithetic,
    )


@partial(jax.jit, static_argnames=("spec", "sim", "option_type", "exercise",
                                   "barrier_type", "return_surface",
                                   "exercise_steps", "return_coeffs"))
def _price_option_impl(key, S0, r, sigma, q, K, T, barrier, spec, sim, option_type,
                       exercise, barrier_type, return_surface,
                       exercise_steps=None, return_coeffs=False):
    from .paths import simulate_gbm

    market = MarketParams(S0, r, sigma, q)
    paths = simulate_gbm(key, market, T, sim)
    product = ProductSpec(K=K, T=T, barrier=barrier, option_type=option_type,
                          exercise=exercise, barrier_type=barrier_type)
    return lsmc_option_pricing(paths, product, r, spec,
                               return_surface=return_surface,
                               exercise_steps=exercise_steps,
                               return_coeffs=return_coeffs,
                               antithetic=sim.antithetic)


def policy_frame(
    paths_tm: jnp.ndarray,
    product: ProductSpec,
    spec: RegressionSpec,
    axis_name: Optional[str] = None,
):
    """Standardization frame matching an engine fit's coefficients.

    The XLA engine standardizes the regressor per step with statistics
    weighted by the SAME weights as the fit (ITM∧knocked for a resolved
    ``regress_on="itm"`` spec, uniform otherwise), so replaying exported
    coefficients (`amcx.policy.reprice_with_coeffs`,
    `amcx.dual.dual_upper_bound`) needs that exact frame. This helper
    reconstructs it from the fit paths — resolve-then-weight, one source
    of truth. Returns ``(mean_t, inv_std_t)`` of shape ``(n_steps+1,)``.

    (The mega/fusedpath kernels instead fit in the exogenous closed-form
    GBM frame `amcx.paths.gbm_standardization`, which is what their
    replay/dual callers pass — those routes are frame-consistent by
    construction.)
    """
    from .engine_pallas import precompute_standardization

    spec = resolve_regression_spec(spec, product)
    weights = None
    if spec.regress_on == "itm":
        knocked = barrier_gate(paths_tm, product.barrier, product.barrier_type)
        pay = payoff_fn_for(product)
        weights = (pay(paths_tm) > 0).astype(paths_tm.dtype) * knocked.astype(
            paths_tm.dtype)
    return precompute_standardization(paths_tm, weights, spec)


def q0_call_advisory(market: MarketParams, product: ProductSpec,
                     spec: RegressionSpec) -> Optional[str]:
    """Recommended-practice advisory for no-dividend American calls.

    With q = 0 an American call is never optimally exercised early, but the
    reference-parity estimator (``regress_on="all"``, SURVEY Q1) lets
    regression noise trigger spurious early exercise deep ITM — a documented
    −0.2-at-1M-paths bias (docs/PARITY.md item 5). Returns a warning string
    when that configuration is requested (``None`` otherwise); callers warn
    but honour the explicit parity request. Since round 4 the default
    ``regress_on="auto"`` resolves to the bias-reduced itm spec *before*
    this check, so the advisory only fires on an explicit
    ``regress_on="all"`` opt-in.
    """
    try:
        q_zero = float(market.q) == 0.0
    except (TypeError, jax.errors.TracerArrayConversionError):
        return None  # traced q (inside jit): advisory is best-effort only
    if (product.option_type == "call" and product.is_american
            and q_zero and spec.regress_on == "all"
            and not product.has_barrier):
        return (
            "American call with q=0 and regress_on='all': early exercise is "
            "never optimal, but all-paths regression noise can trigger it "
            "deep ITM (documented ~-0.2 bias at 1M paths, docs/PARITY.md "
            "item 5). Recommended: RegressionSpec(regress_on='itm', "
            "degree>=6), or price the European equivalent."
        )
    return None


def price_option(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    return_surface: bool = False,
    engine: str = "xla",
    exercise_steps=None,
    return_cf_tau: bool = False,
    return_coeffs: bool = False,
) -> LSMCResult:
    """One-shot jitted simulate→price pipeline (the reference's
    `generate_asset_paths` + `lsmc_option_pricing` composition at
    `american_monte_carlo.py:465-471`).

    ``engine``: ``"xla"`` (reference engine), ``"fused"`` (two Pallas
    kernels/step), ``"mega"`` (single-kernel backward induction), or
    ``"fusedpath"`` (single kernel that also *generates* the paths backward
    in-kernel via the Brownian-bridge recursion — zero path HBM
    traffic/storage; vanilla GBM only, TPU for real statistics).

    ``exercise_steps``: optional Bermudan schedule (tuple of step indices);
    supported by all four engines.

    ``return_cf_tau``: fill ``cashflows``/``exercise_times`` in the result
    for the "mega" and "fusedpath" engines (the "xla"/"fused" engines always
    return them) — feeds `amcx.greeks.fast_greeks` and the exposure helpers
    at flagship-kernel speed. ``return_coeffs``: fill ``coeffs`` (per-step
    regression coefficients; "xla", "mega", "fusedpath") — feeds
    `amcx.dual.dual_upper_bound` and `amcx.exposures.exposures_from_coeffs`.
    """
    import warnings

    spec = resolve_regression_spec(spec, product, q=market.q,
                                   for_surface=return_surface)
    advisory = q0_call_advisory(market, product, spec)
    if advisory is not None:
        warnings.warn(advisory, stacklevel=2)
    if exercise_steps is not None:
        exercise_steps = tuple(int(i) for i in exercise_steps)
    if engine == "fusedpath":
        if return_surface:
            raise ValueError(
                "engine='fusedpath' stores no paths, so no dense surface; "
                "use return_coeffs=True + "
                "amcx.exposures.exposures_from_coeffs on any same-law paths"
            )
        from .ops.gbm_pallas import _key_to_seed
        from .ops.lsmc_fusedpath import lsmc_price_fusedpath

        out = lsmc_price_fusedpath(
            _key_to_seed(key), market.S0, product.K, market.r, market.sigma,
            product.T / sim.n_steps, sim.n_steps, sim.n_paths,
            1.0 if product.option_type == "call" else -1.0, q=market.q,
            basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
            american=product.is_american,
            itm_weights=spec.regress_on == "itm",
            antithetic=sim.antithetic, return_stats=True,
            exercise_steps=exercise_steps,
            return_cf_tau=return_cf_tau, return_coeffs=return_coeffs,
            barrier=product.barrier, barrier_type=product.barrier_type,
        )
        if return_cf_tau or return_coeffs:
            return LSMCResult(out.price, out.stderr, out.cashflows,
                              out.exercise_times, None, coeffs=out.coeffs)
        price, stderr = out
        return LSMCResult(price, stderr, None, None, None)
    if engine == "fused":
        if return_coeffs:
            raise ValueError(
                "engine='fused' does not export coeffs; use 'xla' or 'mega'"
            )
        from .engine_pallas import lsmc_option_pricing_fused
        from .paths import simulate_gbm

        paths = simulate_gbm(key, market, product.T, sim)
        return lsmc_option_pricing_fused(paths, product, market.r, spec,
                                         return_surface=return_surface,
                                         exercise_steps=exercise_steps,
                                         antithetic=sim.antithetic)
    if engine == "mega":
        if return_surface:
            raise ValueError(
                "engine='mega' is price-only for dense surfaces; use "
                "'fused', or return_coeffs=True + "
                "amcx.exposures.exposures_from_coeffs"
            )
        from .ops.lsmc_megakernel import lsmc_price_megakernel
        from .paths import gbm_standardization, simulate_gbm

        n_steps = sim.n_steps
        # GBM pipeline: standardization statistics come in closed form
        # (conditioning-equivalent, saves several full XLA sweeps over the
        # path array), and the pallas path generator emits the lane-blocked
        # layout the kernel consumes (avoids a ~4 ms physical relayout).
        mean_t, inv_std_t = gbm_standardization(market, product.T, n_steps)
        blocked = (
            sim.backend == "pallas"
            and jax.default_backend() != "cpu"
            and sim.n_paths % 4096 == 0
        )
        if blocked:
            from .ops.gbm_pallas import _key_to_seed, gbm_paths_pallas

            paths = gbm_paths_pallas(
                _key_to_seed(key), market.S0, market.r, market.sigma,
                market.q, product.T, n_steps, sim.n_paths,
                antithetic=sim.antithetic, out_blocked=True,
            )
        else:
            paths = simulate_gbm(key, market, product.T, sim)
        phi = 1.0 if product.option_type == "call" else -1.0
        out = lsmc_price_megakernel(
            paths, product.K, market.r, product.T / n_steps, phi,
            basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
            american=product.is_american, barrier=product.barrier,
            barrier_type=product.barrier_type,
            itm_weights=spec.regress_on == "itm",
            mean_t=mean_t, inv_std_t=inv_std_t,
            return_stats=True, exercise_steps=exercise_steps,
            return_cf_tau=return_cf_tau, return_coeffs=return_coeffs,
            antithetic=sim.antithetic,
        )
        if return_cf_tau or return_coeffs:
            return LSMCResult(out.price, out.stderr, out.cashflows,
                              out.exercise_times, None, coeffs=out.coeffs)
        price, stderr = out
        return LSMCResult(price, stderr, None, None, None)
    if engine != "xla":
        raise ValueError(
            f"engine must be 'xla', 'fused', 'mega', or 'fusedpath', got {engine!r}"
        )
    dtype = sim.jnp_dtype
    barrier = None if product.barrier is None else jnp.asarray(product.barrier, dtype)
    return _price_option_impl(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        jnp.asarray(product.K, dtype),
        jnp.asarray(product.T, dtype),
        barrier,
        spec,
        sim,
        product.option_type,
        product.exercise,
        product.barrier_type,
        return_surface,
        exercise_steps=exercise_steps,
        return_coeffs=return_coeffs,
    )
