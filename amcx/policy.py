"""Out-of-sample policy replay: fit the exercise rule once, reprice fresh paths.

In-sample LSMC prices carry *foresight bias*: the regression coefficients
were fit on the same paths they price, so noise in the fitted continuation
leaks future information into the exercise decision (the reference prices
in-sample only, `american_monte_carlo.py:180-197`). The standard fix —
Longstaff-Schwartz's own recommendation — is the two-pass estimator:

  1. fit the per-step coefficients on one path set (any engine with
     ``return_coeffs=True``);
  2. **replay** the frozen policy on an independent path set: exercise at
     the first step where intrinsic exceeds the clamped fitted continuation.

The replayed estimator is a true LOWER bound (any suboptimal-but-adapted
stopping rule under-prices), and pairs with `amcx.dual.dual_upper_bound`
(same exported coefficients) into the Andersen-Broadie valuation sandwich
``[lower, upper]`` around the exact price.

A forward first-hit walk and a backward fixed-policy overwrite produce the
same cashflows (the backward pass's last write wins at the smallest
exercising t), so the flagship kernels replay by simply skipping their
regression pass — see ``lsmc_price_megakernel(replay_coeffs=...)`` and
``lsmc_price_fusedpath(replay_coeffs=...)``; this module is the XLA
reference implementation plus the convenience driver.

Coefficient frames: the coefficients are polynomial weights on the
*standardized* regressor ``x̂ = (S_t − mean_t)·inv_std_t``. Replay must use
the SAME frame the fit used — for the mega/fusedpath engines that is the
closed-form GBM frame (`amcx.paths.gbm_standardization`), recomputable
exactly from market parameters; for raw-frame fits pass zeros/ones.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .engine import LSMCResult
from .payoff import barrier_gate, exercise_allow_row
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = ["reprice_with_coeffs", "price_out_of_sample", "OOSResult",
           "valuation_interval", "ValuationInterval"]


@partial(jax.jit, static_argnames=("spec", "american", "schedule",
                                   "antithetic", "axis_name"))
def _replay_impl(paths_tm, knocked_tm, coeffs, mean_t, inv_std_t, r, dt, K,
                 phi, allowed, spec, american, schedule, antithetic,
                 axis_name):
    from .basis import design_matrix

    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dtype = paths_tm.dtype
    payoff = lambda S: jnp.maximum(phi * (S - K), 0.0)

    def step(carry, xs):
        cf, tau, alive = carry
        S_t, kn_t, coef_t, mu_t, isd_t, t, allow_t = xs
        ex = payoff(S_t)
        xhat = (S_t - mu_t) * isd_t
        A = design_matrix(xhat, spec.basis, spec.degree)
        # fitted evaluation as a fused broadcast-reduction (never an MXU
        # dot — see the regression note in amcx/regress.py)
        cont = jnp.maximum(jnp.sum(A * coef_t[None, :], axis=-1), 0.0)  # Q2
        hit = alive & kn_t & (ex > cont)  # ex > cont ⟹ ex > 0
        if schedule:
            hit = hit & allow_t
        cf = jnp.where(hit, ex, cf)
        tau = jnp.where(hit, t, tau)
        return (cf, tau, alive & ~hit), None

    cf0 = jnp.zeros((n_paths,), dtype)
    tau0 = jnp.full((n_paths,), float(n_steps), dtype)
    alive0 = jnp.ones((n_paths,), bool)
    if american:
        ts = jnp.arange(n_steps, dtype=dtype)
        (cf, tau, alive), _ = lax.scan(
            step, (cf0, tau0, alive0),
            (paths_tm[:n_steps], knocked_tm[:n_steps],
             coeffs.astype(dtype), mean_t[:n_steps].astype(dtype),
             inv_std_t[:n_steps].astype(dtype), ts, allowed),
        )
    else:
        cf, tau, alive = cf0, tau0, alive0
    # maturity leg: still-alive knocked paths pay intrinsic at T (Q4/Q7)
    pay_T = payoff(paths_tm[n_steps])
    cf = jnp.where(alive & knocked_tm[n_steps], pay_T, cf)

    discounted = cf * jnp.exp(-r * dt * tau)
    if antithetic:
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
    return price, stderr, cf, tau


def reprice_with_coeffs(
    paths_tm: jnp.ndarray,
    coeffs: jnp.ndarray,
    product: ProductSpec,
    r,
    mean_t: jnp.ndarray,
    inv_std_t: jnp.ndarray,
    spec: RegressionSpec = RegressionSpec(),
    exercise_steps=None,
    antithetic: bool = False,
    axis_name: Optional[str] = None,
) -> LSMCResult:
    """Replay a frozen exercise policy on (fresh) paths — no regression.

    Walks the paths forward and exercises at the first step where intrinsic
    beats the clamped fitted continuation ``max(Σ_a c_{t,a} B_a(x̂_t), 0)``
    (exactly the rule the in-sample engines apply, SURVEY Q1-Q7 semantics:
    knocked∧ITM gating, Q2 clamp, Q5 discounting, Q7 τ init). On the SAME
    paths and frame as the fit this reproduces the in-sample cashflows
    bit-for-bit; on an independent path set it is the out-of-sample lower
    bound.

    Args:
      paths_tm: ``(n_steps+1, n_paths)`` spot paths to reprice.
      coeffs: ``(n_steps, k)`` or ``(n_steps+1, k)`` per-step coefficients
        (any engine's ``return_coeffs=True`` export; a maturity row is
        ignored).
      mean_t / inv_std_t: the standardization frame the coefficients were
        fit in (length ``n_steps+1``; `amcx.paths.gbm_standardization` for
        the mega/fusedpath engines, zeros/ones for raw-frame fits).
      exercise_steps: optional Bermudan schedule (as in `price_option`).
      axis_name: mesh axis for sharded paths (psum'd price/stderr).
    """
    n_steps = paths_tm.shape[0] - 1
    dt = product.T / n_steps
    if coeffs.shape[0] == n_steps + 1:
        coeffs = coeffs[:n_steps]  # mega export carries a zero maturity row
    knocked = barrier_gate(paths_tm, product.barrier, product.barrier_type)
    if exercise_steps is not None:
        allowed = exercise_allow_row(exercise_steps, n_steps)[:n_steps]
    else:
        allowed = jnp.ones((n_steps,), bool)
    phi = 1.0 if product.option_type == "call" else -1.0
    dtype = paths_tm.dtype
    price, stderr, cf, tau = _replay_impl(
        paths_tm, knocked, coeffs,
        jnp.asarray(mean_t), jnp.asarray(inv_std_t),
        jnp.asarray(r, dtype), jnp.asarray(dt, dtype),
        jnp.asarray(product.K, dtype), phi, allowed, spec,
        product.is_american, exercise_steps is not None, antithetic,
        axis_name,
    )
    return LSMCResult(price, stderr, cf, tau, None)


class OOSResult(NamedTuple):
    """Fit + out-of-sample replay pair.

    ``fit`` is the in-sample engine run (with ``coeffs`` filled); ``oos``
    the policy replay on the independent path set. ``oos.price`` is the
    unbiased-below lower bound to quote; ``fit.price − oos.price`` estimates
    the foresight bias of the one-pass estimator.
    """

    fit: LSMCResult
    oos: LSMCResult


@partial(jax.jit, static_argnames=("S0", "K", "r", "sigma", "dt", "q",
                                   "n_steps", "n_paths", "phi", "basis",
                                   "degree", "rcond", "american",
                                   "antithetic", "replay_blocks"))
def _chained_fusedpath_replay(seed0, coeffs, exercise_steps, *, S0, K, r,
                              sigma, dt, q, n_steps, n_paths, phi,
                              basis, degree, rcond, american, antithetic,
                              replay_blocks):
    """B independent zero-path-HBM replay blocks inside one executable.
    Module-level so the compiled program is reused across calls (the
    frozen coefficients enter as an ARGUMENT, not a closure constant; the
    market scalars are static because the kernel wrapper builds its
    closed-form standardization frame host-side from concrete floats)."""
    from .ops.lsmc_fusedpath import lsmc_price_fusedpath

    def body(b, acc):
        s, sq = acc
        p, se = lsmc_price_fusedpath(
            seed0 + b, S0, K, r, sigma, dt, n_steps, n_paths, phi, q=q,
            basis=basis, degree=degree, rcond=rcond, american=american,
            antithetic=antithetic, return_stats=True,
            exercise_steps=exercise_steps, replay_coeffs=coeffs)
        # se is the stderr of a block mean over n_eff stats; se² is the
        # block-mean variance — iid blocks average exactly
        return (s + p, sq + se * se)

    return lax.fori_loop(0, replay_blocks, body, (0.0, 0.0))


def price_out_of_sample(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "mega",
    exercise_steps=None,
    n_fit_paths: Optional[int] = None,
    replay_engine: Optional[str] = None,
    replay_blocks: int = 1,
) -> OOSResult:
    """Two-pass Longstaff-Schwartz: fit on one key, reprice on another.

    Splits ``key`` into disjoint fit/pricing streams, fits the policy with
    the requested engine (``"mega"``, ``"fusedpath"``, or ``"xla"`` — the
    coefficient frame must be recomputable, which the closed-form GBM
    standardization guarantees for the kernel engines; the XLA engine is
    routed through the mega frame by fitting with ``engine="mega"``
    instead), then replays the frozen policy on an independent path set.

    ``n_fit_paths``: optionally fit on fewer paths than the pricing pass
    (the classic production split: small fit, huge replay — the replay has
    no regression and runs at streaming speed).

    ``replay_engine``: ``None``/"xla" → the XLA forward walk here;
    ``"mega"`` → `lsmc_price_megakernel(replay_coeffs=...)` (single kernel,
    no regression pass); ``"fusedpath"`` → zero-path-HBM replay that
    regenerates its own independent paths in-kernel.

    ``replay_blocks``: chain the pricing pass over this many independent
    ``sim.n_paths``-path blocks inside ONE jit (fusedpath replay only) —
    the replay has no cross-path coupling, so B blocks ARE exactly one
    B·n_paths-path replay of the same frozen policy. This is the
    long-axis scale route (SURVEY §5): path counts far beyond the
    single-kernel VMEM V-plane ceiling (~8M paths) price with zero extra
    memory — e.g. 16M×100 as 16 zero-HBM blocks.
    """
    from .engine import price_option, resolve_regression_spec
    from .paths import gbm_standardization, simulate_gbm

    # resolve "auto" here so the frozen-policy replay rebuilds its design
    # matrices with the SAME degree the fit solved (q=0 calls bump it)
    spec = resolve_regression_spec(spec, product, q=market.q)
    if engine not in ("mega", "fusedpath", "xla"):
        raise ValueError(f"unsupported fit engine {engine!r}")
    if engine == "xla":
        # the XLA engine's per-step empirical frame is not exported;
        # refit through the mega engine's closed-form frame instead
        engine = "mega"
    key_fit, key_price = jax.random.split(key)
    fit_sim = sim if n_fit_paths is None else dataclasses.replace(
        sim, n_paths=n_fit_paths)
    fit = price_option(key_fit, market, product, spec, fit_sim,
                       engine=engine, exercise_steps=exercise_steps,
                       return_coeffs=True)
    mean_t, inv_std_t = gbm_standardization(market, product.T, sim.n_steps)
    if replay_engine == "fusedpath":
        if product.has_barrier:
            raise ValueError("fusedpath replay does not support barriers")
        from .ops.gbm_pallas import _key_to_seed
        from .ops.lsmc_fusedpath import lsmc_price_fusedpath

        def one_block(seed):
            return lsmc_price_fusedpath(
                seed, market.S0, product.K, market.r,
                market.sigma, product.T / sim.n_steps, sim.n_steps,
                sim.n_paths,
                1.0 if product.option_type == "call" else -1.0, q=market.q,
                basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
                american=product.is_american, antithetic=sim.antithetic,
                return_stats=True, exercise_steps=exercise_steps,
                replay_coeffs=fit.coeffs,
            )

        if replay_blocks == 1:
            price, stderr = one_block(_key_to_seed(key_price))
        else:
            # independent seed per block, chained inside ONE module-level
            # jit (a per-call closure jit would retrace AND remote-compile
            # on every invocation — measured 1.5 s/call through the TPU
            # tunnel vs ~60 ms executed warm)
            s, sq = _chained_fusedpath_replay(
                _key_to_seed(key_price), fit.coeffs, exercise_steps,
                S0=float(market.S0), K=float(product.K),
                r=float(market.r), sigma=float(market.sigma),
                dt=float(product.T) / sim.n_steps, q=float(market.q),
                n_steps=sim.n_steps, n_paths=sim.n_paths,
                phi=1.0 if product.option_type == "call" else -1.0,
                basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
                american=product.is_american, antithetic=sim.antithetic,
                replay_blocks=replay_blocks)
            price = s / replay_blocks
            # blocks are iid: var(mean of B block-means) = mean(block
            # variances)/B (block-mean spread adds only O(1/B) correction)
            stderr = jnp.sqrt(sq) / replay_blocks
        return OOSResult(fit, LSMCResult(price, stderr, None, None, None))
    if replay_blocks != 1:
        raise ValueError("replay_blocks > 1 requires replay_engine="
                         "'fusedpath' (the zero-path-HBM block route)")
    if replay_engine == "mega":
        from .ops.lsmc_megakernel import lsmc_price_megakernel

        paths = simulate_gbm(key_price, market, product.T, sim)
        price, stderr = lsmc_price_megakernel(
            paths, product.K, market.r, product.T / sim.n_steps,
            1.0 if product.option_type == "call" else -1.0,
            basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
            american=product.is_american, barrier=product.barrier,
            barrier_type=product.barrier_type,
            mean_t=mean_t, inv_std_t=inv_std_t, return_stats=True,
            exercise_steps=exercise_steps, antithetic=sim.antithetic,
            replay_coeffs=fit.coeffs,
        )
        return OOSResult(fit, LSMCResult(price, stderr, None, None, None))
    if replay_engine not in (None, "xla"):
        raise ValueError(f"unsupported replay engine {replay_engine!r}")
    paths = simulate_gbm(key_price, market, product.T, sim)
    oos = reprice_with_coeffs(paths, fit.coeffs, product, market.r,
                              mean_t, inv_std_t, spec,
                              exercise_steps=exercise_steps,
                              antithetic=sim.antithetic)
    return OOSResult(fit, oos)


class ValuationInterval(NamedTuple):
    """Unbiased price sandwich from ONE fitted exercise policy.

    ``lower`` is the out-of-sample replay (a true lower bound: any adapted
    stopping rule under-prices), ``upper`` the Andersen-Broadie dual bound
    from the SAME coefficients on a third independent path set (a true
    upper bound up to inner-sample noise). The exact price lies in
    ``[lower.price − 2·lower.stderr, upper.upper + 2·upper.stderr]``
    with ~95% one-sided confidence each. ``fit`` is the in-sample run the
    policy came from (its price is NOT a bound — it carries foresight
    bias).
    """

    fit: LSMCResult
    lower: LSMCResult
    upper: object  # amcx.dual.DualResult


def valuation_interval(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "mega",
    n_fit_paths: Optional[int] = None,
    replay_engine: Optional[str] = None,
    n_dual_paths: int = 4096,
    n_inner: int = 32,
    nested: bool = True,
) -> ValuationInterval:
    """Fit → [OOS lower bound, AB dual upper bound] in one call.

    The production valuation certificate: three disjoint key streams (fit,
    replay, dual outer/inner), one regression pass, and two independent
    bounds that bracket the exact price — the Andersen-Broadie sandwich
    with BOTH sides out-of-sample (`amcx.dual` alone reuses whatever paths
    you hand it; here everything is key-disjoint by construction).

    ``n_dual_paths``: outer paths for the dual (the nested bound costs
    O(n_steps²·n_inner·N) path-steps, so the default is intentionally far
    smaller than ``sim.n_paths``). Vanilla products only (the dual has no
    barrier support).
    """
    from .dual import dual_upper_bound
    from .engine import price_option, resolve_regression_spec
    from .paths import gbm_standardization, simulate_gbm

    spec = resolve_regression_spec(spec, product, q=market.q)
    if product.has_barrier:
        raise ValueError("valuation_interval is vanilla-only: the dual "
                         "bound does not support barriers")
    key_two_pass, key_dual_paths, key_dual_inner = jax.random.split(key, 3)
    pair = price_out_of_sample(key_two_pass, market, product, spec, sim,
                               engine=engine, n_fit_paths=n_fit_paths,
                               replay_engine=replay_engine)
    mean_t, inv_std_t = gbm_standardization(market, product.T, sim.n_steps)
    outer = simulate_gbm(key_dual_paths, market, product.T,
                         dataclasses.replace(sim, n_paths=n_dual_paths,
                                             antithetic=False))
    upper = dual_upper_bound(key_dual_inner, outer, pair.fit, market,
                             product, spec, mean_t, inv_std_t,
                             n_inner=n_inner, nested=nested)
    return ValuationInterval(pair.fit, pair.oos, upper)
