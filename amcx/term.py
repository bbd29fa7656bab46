"""Deterministic term structures: piecewise-constant r(t), sigma(t), q(t).

The reference prices under flat scalar market parameters only
(`american_monte_carlo.py:57,72`). Production desks price off curves — a
discount curve, a forward-dividend curve, and a term volatility — and under
*deterministic* curves GBM stays an exactly simulable log-normal process:

    log S_t ~ N( log S0 + Σ_{s<t}(r_s − q_s − σ_s²/2)·dt ,  Σ_{s<t} σ_s²·dt )

so every amcx engine generalizes without approximation. The TPU design
makes this nearly free: the mega kernel never reads a rate scalar — ALL of
its discounting comes from the precomputed per-step ``c_t = e^{−∫_t^T r}``
stats rows — so the flagship path prices under any deterministic short-rate
curve by feeding generalized rows (`lsmc_price_megakernel(r=<(n_steps,)
vector>, ...)`), and the standardization frame has the closed form above.

This module holds the curve container, the exact curve path simulator, the
closed-form standardization frame, a curve-aware XLA reference engine
(time-T-units value carry — per-step rounding never compounds, see the
carry note in `amcx.ops.lsmc_megakernel._mega_kernel`), and two validation
oracles: the exact European closed form (effective-parameter Black-Scholes)
and a float64 binomial lattice with per-step rates/dividends (flat sigma —
a time-varying sigma does not recombine on a CRR tree).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .engine import LSMCResult
from .payoff import barrier_gate, exercise_allow_row
from .types import ProductSpec, RegressionSpec, SimConfig

__all__ = [
    "TermCurves",
    "curve_standardization",
    "simulate_gbm_curves",
    "european_price_curves",
    "crr_price_curves",
    "price_option_curves",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TermCurves:
    """Per-step market curves on the simulation grid.

    ``r_t``/``sigma_t``/``q_t`` are ``(n_steps,)`` piecewise-constant values
    over each step interval ``[t·dt, (t+1)·dt)`` — the natural discretized
    form of a bootstrapped discount/vol/dividend curve. Scalars broadcast.
    All leaves are dynamic, so curve Greeks (e.g. bucketed rho: one
    ``jax.grad`` w.r.t. ``r_t``) come for free.
    """

    S0: jax.Array | float
    r_t: jax.Array
    sigma_t: jax.Array
    q_t: jax.Array

    @classmethod
    def make(cls, S0, r, sigma, q=0.0, n_steps: int = None):
        """Broadcast scalar-or-vector inputs onto an ``n_steps`` grid."""
        if n_steps is None:
            raise ValueError("n_steps is required")

        def vec(x):
            return jnp.broadcast_to(jnp.asarray(x, jnp.float32), (n_steps,))

        return cls(S0, vec(r), vec(sigma), vec(q))

    @property
    def n_steps(self) -> int:
        return self.r_t.shape[0]


def curve_standardization(curves: TermCurves, dt, dtype=jnp.float32):
    """Closed-form ``(mean_t, 1/std_t)`` rows under deterministic curves.

    The curve generalization of `amcx.paths.gbm_standardization`:
    ``E[S_t] = S0·e^{Σ(r−q)dt}``, ``Var[S_t] = E[S_t]²·(e^{Σσ²dt} − 1)``
    with the sums running over steps before ``t``. Pure conditioning —
    fitted values are affine-invariant (SURVEY Q3).
    """
    dt = jnp.asarray(dt, dtype)
    zero = jnp.zeros((1,), dtype)
    cum_rq = jnp.concatenate(
        [zero, jnp.cumsum((curves.r_t - curves.q_t).astype(dtype) * dt)])
    cum_var = jnp.concatenate(
        [zero, jnp.cumsum(jnp.square(curves.sigma_t.astype(dtype)) * dt)])
    mean = curves.S0 * jnp.exp(cum_rq)
    var = jnp.square(mean) * jnp.expm1(cum_var)
    return mean, 1.0 / jnp.maximum(jnp.sqrt(var), 1e-6)


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "antithetic"))
def _simulate_curves_impl(key, S0, r_t, sigma_t, q_t, dt, n_steps, n_paths,
                          antithetic):
    from .paths import brownian_normals

    dtype = r_t.dtype
    Z = brownian_normals(key, n_steps, n_paths, dtype, antithetic)
    drift = (r_t - q_t - 0.5 * jnp.square(sigma_t)) * dt  # (n_steps,)
    log_inc = drift[:, None] + (sigma_t * jnp.sqrt(dt))[:, None] * Z
    log_rel = jnp.cumsum(log_inc, axis=0)
    log_rel = jnp.concatenate(
        [jnp.zeros((1, n_paths), dtype=dtype), log_rel], axis=0)
    return S0 * jnp.exp(log_rel)


def simulate_gbm_curves(key: jax.Array, curves: TermCurves, T,
                        sim: SimConfig) -> jnp.ndarray:
    """Exact log-normal paths under deterministic curves, time-major
    ``(n_steps+1, n_paths)``. Per-step drift/vol broadcast into the same
    cumulative-sum pipeline as `amcx.paths.simulate_gbm` (identical
    arithmetic when the curves are flat)."""
    if curves.n_steps != sim.n_steps:
        raise ValueError(
            f"curves are on a {curves.n_steps}-step grid; sim.n_steps="
            f"{sim.n_steps}")
    dtype = sim.jnp_dtype
    dt = jnp.asarray(T, dtype) / sim.n_steps
    return _simulate_curves_impl(
        key, jnp.asarray(curves.S0, dtype), curves.r_t.astype(dtype),
        curves.sigma_t.astype(dtype), curves.q_t.astype(dtype), dt,
        sim.n_steps, sim.n_paths, sim.antithetic)


def european_price_curves(curves: TermCurves, K, T, option_type: str = "put"):
    """EXACT European price under deterministic curves: Black-Scholes with
    the effective parameters ``σ̄² = (1/T)Σσ²dt``, ``r̄ = (1/T)Σr·dt``,
    ``q̄ = (1/T)Σq·dt`` (the terminal distribution only depends on the
    integrals). The curve engines' European validation oracle."""
    from .oracle import bs_price

    n = curves.n_steps
    dt = jnp.asarray(T, jnp.float32) / n
    r_eff = jnp.sum(curves.r_t * dt) / T
    q_eff = jnp.sum(curves.q_t * dt) / T
    sig_eff = jnp.sqrt(jnp.sum(jnp.square(curves.sigma_t) * dt) / T)
    return bs_price(curves.S0, K, T, r_eff, sig_eff, q=q_eff,
                    option_type=option_type)


def crr_price_curves(S0, K, T, r_t, sigma, q_t=0.0, n_sub: int = 20,
                     option_type: str = "put", american: bool = True) -> float:
    """float64 binomial oracle with per-step rates/dividends (flat sigma).

    A CRR lattice recombines only under constant ``u = e^{σ√Δ}``; with flat
    sigma the time dependence moves entirely into the per-step risk-neutral
    probability ``p_j = (e^{(r_j−q_j)Δ} − d)/(u − d)`` and discount
    ``e^{−r_j Δ}`` — still exact in the lattice limit. Each coarse curve
    step is subdivided into ``n_sub`` tree steps (total N = n_steps·n_sub).
    Host-side NumPy float64: this is a validation oracle, not a device
    path (same role as `amcx.oracle.crr_price`, reference
    `unit_test.py`-style truth)."""
    r_t = np.atleast_1d(np.asarray(r_t, np.float64))
    q_t = np.broadcast_to(np.asarray(q_t, np.float64), r_t.shape)
    n_steps = r_t.shape[0]
    N = n_steps * n_sub
    ddt = float(T) / N
    sigma = float(sigma)
    u = np.exp(sigma * np.sqrt(ddt))
    d = 1.0 / u
    phi = 1.0 if option_type == "call" else -1.0
    # terminal spots S0·u^j·d^(N−j), j = 0..N
    j = np.arange(N + 1, dtype=np.float64)
    S = float(S0) * np.exp((2.0 * j - N) * sigma * np.sqrt(ddt))
    V = np.maximum(phi * (S - float(K)), 0.0)
    for step in range(N - 1, -1, -1):
        rj = r_t[step // n_sub]
        qj = q_t[step // n_sub]
        p = (np.exp((rj - qj) * ddt) - d) / (u - d)
        if not (0.0 < p < 1.0):
            raise ValueError(
                f"lattice probability out of (0,1) at step {step}: p={p}; "
                f"raise n_sub or shrink the step rates")
        df = np.exp(-rj * ddt)
        V = df * (p * V[1: step + 2] + (1.0 - p) * V[: step + 1])
        if american:
            S = float(S0) * np.exp((2.0 * np.arange(step + 1) - step)
                                   * sigma * np.sqrt(ddt))
            V = np.maximum(V, phi * (S - float(K)))
    return float(V[0])


@partial(jax.jit, static_argnames=("spec", "american", "schedule",
                                  "antithetic", "itm", "return_coeffs"))
def _curve_engine_impl(paths_tm, knocked_tm, r_rem, K, phi, allowed, spec,
                       american, schedule, antithetic, itm, return_coeffs):
    """Curve-aware XLA backward induction (reference-engine role).

    Same Q1–Q7 semantics as `amcx.engine.backward_induction`, but the value
    rides in TIME-T UNITS (``Ṽ = cf·e^{+Rrem(τ)}``, written once at
    exercise): discounting to step t is one multiply by
    ``c_t = e^{−Rrem(t)}``, so an arbitrary short-rate curve needs no
    per-path gathers and per-step rounding never compounds into the carry.
    """
    from .regress import fit_continuation_with_coeffs

    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dtype = paths_tm.dtype
    payoff = lambda S: jnp.maximum(phi * (S - K), 0.0)
    c = jnp.exp(-r_rem)       # (n_steps+1,): discount T→t
    inv_c = jnp.exp(r_rem)

    pay_T = payoff(paths_tm[n_steps])
    cf0 = jnp.where(knocked_tm[n_steps], pay_T, jnp.zeros((n_paths,), dtype))
    tau0 = jnp.full((n_paths,), float(n_steps), dtype)
    vt0 = cf0  # Rrem(T) = 0: time-T units == cash at T

    def step(carry, xs):
        cf, tau, vt = carry
        S_t, kn_t, c_t, inv_c_t, t, allow_t = xs
        y = c_t * vt  # value at t of the carried stopping payoff
        ex = payoff(S_t)
        weights = (ex > 0).astype(dtype) * kn_t.astype(dtype) if itm else None
        cont, coefs = fit_continuation_with_coeffs(S_t, y, spec, weights)
        if american:
            hit = kn_t & (ex > 0) & (ex > cont)
            if schedule:
                hit = hit & allow_t
            cf = jnp.where(hit, ex, cf)
            tau = jnp.where(hit, t, tau)
            vt = jnp.where(hit, ex * inv_c_t, vt)
        return (cf, tau, vt), (coefs if return_coeffs else None)

    ts = jnp.arange(n_steps, dtype=dtype)
    (cf, tau, vt), coefs = lax.scan(
        step, (cf0, tau0, vt0),
        (paths_tm[:n_steps], knocked_tm[:n_steps], c[:n_steps],
         inv_c[:n_steps], ts, allowed),
        reverse=True,
    )
    discounted = c[0] * vt
    if antithetic:
        half = n_paths // 2
        stat = 0.5 * (discounted[:half] + discounted[half:])
        n_stat = float(half)
    else:
        stat = discounted
        n_stat = float(n_paths)
    price = jnp.mean(stat)
    var = jnp.mean(jnp.square(stat - price))
    stderr = jnp.sqrt(var) / jnp.sqrt(n_stat)
    return price, stderr, cf, tau, coefs


def price_option_curves(
    key: jax.Array,
    curves: TermCurves,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "mega",
    exercise_steps=None,
    return_coeffs: bool = False,
) -> LSMCResult:
    """Price under deterministic term-structure curves.

    The curve twin of `amcx.engine.price_option`. ``engine="mega"`` runs
    the flagship single-kernel backward induction (per-step discount rows,
    closed-form curve standardization frame — the kernel itself is
    unchanged); ``engine="fusedpath"`` runs the zero-path-HBM kernel (the
    time-changed-Brownian bridge regenerates curve paths in-kernel — no
    barrier support, TPU-only statistics); ``engine="xla"`` runs the
    curve-aware scan engine above (cf/τ outputs filled). Flat curves
    reproduce the flat-market engines.
    """
    from .engine import resolve_regression_spec

    spec = resolve_regression_spec(spec, product)
    if exercise_steps is not None:
        exercise_steps = tuple(int(i) for i in exercise_steps)
    n_steps = sim.n_steps
    dt = product.T / n_steps
    if curves.n_steps != n_steps:
        raise ValueError(
            f"curves are on a {curves.n_steps}-step grid; sim.n_steps="
            f"{n_steps}")
    if engine == "fusedpath":
        if product.has_barrier:
            raise ValueError(
                "engine='fusedpath' generates paths backward; the knock "
                "state needs forward history — use 'mega' for barriers")
        from .ops.gbm_pallas import _key_to_seed
        from .ops.lsmc_fusedpath import lsmc_price_fusedpath

        out = lsmc_price_fusedpath(
            _key_to_seed(key), curves.S0, product.K, curves.r_t,
            curves.sigma_t, dt, n_steps, sim.n_paths,
            1.0 if product.option_type == "call" else -1.0, q=curves.q_t,
            basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
            american=product.is_american,
            itm_weights=spec.regress_on == "itm",
            antithetic=sim.antithetic, return_stats=True,
            exercise_steps=exercise_steps, return_coeffs=return_coeffs,
        )
        if return_coeffs:
            return LSMCResult(out.price, out.stderr, None, None, None,
                              coeffs=out.coeffs)
        price, stderr = out
        return LSMCResult(price, stderr, None, None, None)
    phi = 1.0 if product.option_type == "call" else -1.0
    if engine == "mega" and sim.backend == "pallas":
        # fully-Pallas curve pipeline: blocked in-kernel curve pathgen
        # feeding the mega kernel with no relayout (same contract as the
        # flat flagship pipeline)
        from .ops.gbm_pallas import _key_to_seed, gbm_paths_pallas

        paths = gbm_paths_pallas(
            _key_to_seed(key), curves.S0, curves.r_t, curves.sigma_t,
            curves.q_t, product.T, n_steps, sim.n_paths,
            antithetic=sim.antithetic, out_blocked=True)
    else:
        paths = simulate_gbm_curves(key, curves, product.T, sim)
    if engine == "mega":
        from .ops.lsmc_megakernel import lsmc_price_megakernel

        mean_t, inv_std_t = curve_standardization(curves, dt)
        out = lsmc_price_megakernel(
            paths, product.K, curves.r_t, dt, phi,
            basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
            american=product.is_american, barrier=product.barrier,
            barrier_type=product.barrier_type,
            itm_weights=spec.regress_on == "itm",
            mean_t=mean_t, inv_std_t=inv_std_t, return_stats=True,
            exercise_steps=exercise_steps, antithetic=sim.antithetic,
            return_coeffs=return_coeffs,
        )
        if return_coeffs:
            return LSMCResult(out.price, out.stderr, out.cashflows,
                              out.exercise_times, None, coeffs=out.coeffs)
        price, stderr = out
        return LSMCResult(price, stderr, None, None, None)
    if engine != "xla":
        raise ValueError(f"engine must be 'mega' or 'xla', got {engine!r}")
    dtype = sim.jnp_dtype
    knocked = barrier_gate(paths, product.barrier, product.barrier_type)
    if exercise_steps is not None:
        allowed = exercise_allow_row(exercise_steps, n_steps)[:n_steps]
    else:
        allowed = jnp.ones((n_steps,), bool)
    r_rem = jnp.concatenate(
        [jnp.cumsum((curves.r_t.astype(dtype) * dt)[::-1])[::-1],
         jnp.zeros((1,), dtype)])
    price, stderr, cf, tau, coefs = _curve_engine_impl(
        paths, knocked, r_rem, jnp.asarray(product.K, dtype), phi, allowed,
        spec, product.is_american, exercise_steps is not None,
        sim.antithetic, spec.regress_on == "itm", return_coeffs)
    return LSMCResult(price, stderr, cf, tau, None,
                      coeffs=coefs if return_coeffs else None)
