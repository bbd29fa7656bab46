"""Equity / stochastic-short-rate hybrid: Hull-White 1F + GBM.

The reference prices under a constant rate only
(`/root/reference/american_monte_carlo.py:57`); long-dated equity
American/Bermudan desks price under a stochastic short rate, where early
exercise couples to the rate state. Model (risk-neutral, money-market
numeraire; initial discount curve flat at ``r0``):

    dr = κ(θ(t) − r)dt + σ_r dW_r          (Hull-White 1F, fitted: r_t =
                                            r0 + α_t + x_t, dx = −κx dt
                                            + σ_r dW_r, α_t = (σ_r²/2κ²)
                                            (1−e^{−κt})²)
    dS/S = r dt + σ_S dW_S,  d⟨W_S, W_r⟩ = ρ dt

**Exact joint simulation** — no Euler bias: per step the triple
(ΔW_S, Δx-noise η, ∫x du-noise ι) is jointly Gaussian with closed-form
covariance (Ornstein-Uhlenbeck integrals; Glasserman §3.3), so one
host-precomputed 3×3 Cholesky maps three iid normals to the exact joint
draw. The equity log-increment uses the *integrated* rate ∫r du (not the
frozen endpoint), and the per-step pathwise discount e^{−∫r du} comes from
the same integral — the simulated (S, money-market account) pair is
exactly distributed, so the European hybrid closed form must be matched to
pure MC noise (the validation gate `european_price_hw`).

LSMC under stochastic rates: the continuation value is a function of the
2-D Markov state (S_t, r_t) — an S-only regression is misspecified (the
exercise boundary moves with r) — so the engine regresses on the
total-degree cross basis (`amcx.models.maxcall.max_call_fit`, the same
machinery as Heston's (S, v) state, `amcx.dynamics.price_option_heston`).
Discounting is pathwise (per-step e^{−∫r du} planes): the deterministic
time-T-units carry of the flat engines does not exist here.

Validation: (1) σ_r → 0 collapses to the flat-rate engines; (2) European
calls/puts vs the closed form under any (κ, σ_r, ρ); (3) American
monotonicity in σ_r and ρ sign effects; on-chip statistical parity in
``tests_tpu``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .engine import LSMCResult
from .types import ProductSpec, RegressionSpec, SimConfig

__all__ = ["HullWhiteParams", "simulate_hybrid_hw", "european_price_hw",
           "price_option_hw"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HullWhiteParams:
    """Hull-White 1F short rate fitted to a flat initial curve ``r0``,
    plus the equity leg's lognormal vol and the equity-rate correlation."""

    S0: float
    r0: float
    sigma_S: float
    kappa: float = 0.5
    sigma_r: float = 0.01
    rho: float = 0.0
    q: float = 0.0


def _step_constants(hw: HullWhiteParams, dt: float):
    """Host-side float64 step constants: the 3×3 Cholesky of the
    (ΔW_S, η, ι) covariance and the OU decay — step-invariant on a uniform
    grid. η = x_{t+dt} − a·x_t, ι = ∫x du − B·x_t with a = e^{−κΔ},
    B = (1−a)/κ."""
    k, sr, rho = float(hw.kappa), float(hw.sigma_r), float(hw.rho)
    a = np.exp(-k * dt)
    B = (1.0 - a) / k
    V_eta = sr * sr * (1.0 - a * a) / (2.0 * k)
    V_iota = (sr * sr / (k * k)) * (dt - 2.0 * B + (1.0 - a * a) / (2.0 * k))
    C_ei = (sr * sr / (2.0 * k * k)) * (1.0 - a) ** 2
    C_we = rho * sr * B
    C_wi = rho * (sr / k) * (dt - B)
    cov = np.array([
        [dt, C_we, C_wi],
        [C_we, V_eta, C_ei],
        [C_wi, C_ei, V_iota],
    ])
    # σ_r = 0 (or ρ-degenerate) rows: keep the Cholesky defined
    L = np.linalg.cholesky(cov + 1e-30 * np.eye(3))
    return a, L


def _alpha_integral_row(hw: HullWhiteParams, dt: float, n_steps: int):
    """``A[t] = ∫_{tΔ}^{(t+1)Δ} α(u) du`` (f64 host row): the fitted-curve
    drift correction α(u) = (σ_r²/2κ²)(1−e^{−κu})², integrated exactly."""
    k, sr = float(hw.kappa), float(hw.sigma_r)
    c = sr * sr / (2.0 * k * k)

    def F(u):  # ∫ (1−e^{−κu})² du  = u + (2/κ)e^{−κu} − (1/2κ)e^{−2κu}
        return u + 2.0 / k * np.exp(-k * u) - 0.5 / k * np.exp(-2.0 * k * u)

    ts = dt * np.arange(n_steps + 1)
    return c * (F(ts[1:]) - F(ts[:-1]))


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "antithetic"))
def _simulate_hw_impl(key, S0, r0, sigma_S, q, a, B, L, A_row, alpha_row, dt,
                      n_steps, n_paths, antithetic):
    dtype = jnp.float32
    n_draw = n_paths // 2 if antithetic else n_paths
    Z = jax.random.normal(key, (n_steps, 3, n_draw), dtype)
    if antithetic:
        Z = jnp.concatenate([Z, -Z], axis=-1)
    # exact correlated triple per step: (ΔW_S, η, ι)
    W = jnp.einsum("ij,tjn->tin", jnp.asarray(L, dtype), Z)
    a_f = jnp.asarray(a, dtype)
    B_f = jnp.asarray(B, dtype)

    def step(carry, xs):
        x, lnS = carry
        w, eta, iota, A_t = xs
        int_r = r0 * dt + A_t + x * B_f + iota  # ∫ r du over the step
        lnS_next = lnS + int_r - (0.5 * sigma_S**2 + q) * dt + sigma_S * w
        x_next = a_f * x + eta
        return (x_next, lnS_next), (lnS_next, int_r, x)

    x0 = jnp.zeros((n_paths,), dtype)
    lnS0 = jnp.full((n_paths,), jnp.log(S0), dtype)
    (x_T, _), (lnS_path, int_r, x_pre) = lax.scan(
        step, (x0, lnS0), (W[:, 0], W[:, 1], W[:, 2], A_row.astype(dtype)))
    S = jnp.concatenate([jnp.exp(lnS0)[None], jnp.exp(lnS_path)], axis=0)
    x = jnp.concatenate([x_pre, x_T[None]], axis=0)  # (n_steps+1, n)
    r = r0 + alpha_row.astype(dtype)[:, None] + x
    df = jnp.exp(-int_r)  # (n_steps, n_paths) per-step pathwise discounts
    return S, r, df


def simulate_hybrid_hw(key, hw: HullWhiteParams, T, sim: SimConfig):
    """Exact hybrid paths: returns ``(S, r, df)`` — spots ``(n_steps+1,
    n_paths)``, short-rate paths ``(n_steps+1, n_paths)`` (``r_t = r0 +
    α_t + x_t``), and per-step pathwise discount factors ``df[t] =
    e^{−∫_{tΔ}^{(t+1)Δ} r du}`` of shape ``(n_steps, n_paths)`` — the
    exact joint draw (see module docstring). Antithetic mirrors all three
    driving normals (row j pairs with row j + n_paths/2)."""
    dt = float(T) / sim.n_steps
    k = float(hw.kappa)
    a, L = _step_constants(hw, dt)
    B = (1.0 - a) / k
    A_row = _alpha_integral_row(hw, dt, sim.n_steps)
    c = float(hw.sigma_r) ** 2 / (2.0 * k * k)
    alpha_row = c * (1.0 - np.exp(-k * dt * np.arange(sim.n_steps + 1))) ** 2
    return _simulate_hw_impl(
        key, float(hw.S0), float(hw.r0), float(hw.sigma_S), float(hw.q),
        a, B, jnp.asarray(L), jnp.asarray(A_row), jnp.asarray(alpha_row),
        jnp.asarray(dt, jnp.float32), sim.n_steps, sim.n_paths,
        sim.antithetic)


def european_price_hw(hw: HullWhiteParams, K, T, option_type: str = "put"):
    """EXACT European price under the hybrid: under the T-forward measure
    S_T is lognormal with total variance

        V = ∫₀ᵀ [σ_S² + 2ρ σ_S σ_B(u) + σ_B(u)²] du,
        σ_B(u) = (σ_r/κ)(1 − e^{−κ(T−u)})   (T-bond volatility),

    and forward F = S0·e^{−qT}/P(0,T), P(0,T) = e^{−r0·T} (flat fitted
    curve). Black-76 with (F, V) — the hybrid engines' European oracle."""
    from .oracle import norm_cdf as _norm_cdf

    k, sr, sS, rho = (float(hw.kappa), float(hw.sigma_r),
                      float(hw.sigma_S), float(hw.rho))
    T = float(T)
    B_T = (1.0 - np.exp(-k * T)) / k
    B2_T = (1.0 - np.exp(-2.0 * k * T)) / (2.0 * k)
    int_sigB2 = (sr * sr / (k * k)) * (T - 2.0 * B_T + B2_T)
    int_sigB = (sr / k) * (T - B_T)
    V = sS * sS * T + 2.0 * rho * sS * int_sigB + int_sigB2
    P0T = np.exp(-float(hw.r0) * T)
    F = float(hw.S0) * np.exp(-float(hw.q) * T) / P0T
    sv = np.sqrt(max(V, 1e-30))
    d1 = (np.log(F / float(K)) + 0.5 * V) / sv
    d2 = d1 - sv
    call = P0T * (F * float(_norm_cdf(d1)) - float(K) * float(_norm_cdf(d2)))
    if option_type == "call":
        return call
    return call - P0T * (F - float(K))  # put-call parity on the forward


@partial(jax.jit, static_argnames=("spec", "american", "itm", "antithetic",
                                  "return_surface"))
def _hw_engine_impl(S, r, df, K, phi, spec, american, itm, antithetic,
                    return_surface=False):
    """Backward induction with PATHWISE discounting on the (S, r) state.

    The carry is the value at the *current* step in current-dollar units;
    each step discounts it per-path with df[t]. Per-step rounding of the
    pathwise multiply is unavoidable under stochastic rates (there is no
    deterministic time-T-units re-anchoring) — f32 carry noise is ~1 ulp ·
    √n_steps, well under MC noise at any tested size."""
    from .models.maxcall import max_call_fit

    n_steps = S.shape[0] - 1
    n_paths = S.shape[1]
    dtype = S.dtype
    payoff = lambda s: jnp.maximum(phi * (s - K), 0.0)
    V_T = payoff(S[n_steps])

    def step(V, xs):
        S_t, r_t, df_t = xs
        y = df_t * V
        ex = payoff(S_t)
        if american:
            X = jnp.stack([S_t, r_t], axis=-1)
            weights = (ex > 0).astype(dtype) if itm else None
            cont, _ = max_call_fit(X, y, spec, weights, mode="total")
            hit = (ex > 0) & (ex > cont)
            y = jnp.where(hit, ex, y)
        else:
            cont = y
        return y, (cont if return_surface else None)

    V0, surf = lax.scan(step, V_T, (S[:n_steps], r[:n_steps], df),
                        reverse=True)
    if return_surface:
        # reference surface contract: continuation per (step, path) with
        # the maturity row = terminal payoff (engine.py / the reference's
        # (t, S_t, C_t) dump, american_monte_carlo.py:164-167) — feeds
        # amcx.exposures.compute_ccr_exposures: CCR under stochastic rates
        surf = jnp.concatenate([surf, V_T[None]], axis=0)
    if antithetic:
        half = n_paths // 2
        stat = 0.5 * (V0[:half] + V0[half:])
    else:
        stat = V0
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(stat.shape[0])
    return price, stderr, surf


@partial(jax.jit, static_argnames=("spec", "itm", "antithetic", "phi"))
def _hw_engine_fused_impl(S, r, df, K, phi, spec, itm, antithetic):
    """American (S, r) induction on the fused multi-asset Pallas kernels
    with PATHWISE discounting (``direct_y`` mode): per step the host
    computes y = df_t ⊙ V_{t+1} (one fused XLA elementwise), the moments
    kernel accumulates the cross-term Gram on (S_t, r_t) in-register, and
    the apply kernel runs the fitted-continuation exercise select — the
    (n_paths, m) design matrix never exists. Same estimator as
    `_hw_engine_impl` (matches to f32 regression noise on shared paths)."""
    from .models.maxcall import maxcall_standardization
    from .ops.lsmc_pallas import LANES, unpack_moments
    from .ops.maxcall_pallas import ma_step_apply, ma_step_moments
    from .basis import _multi_index_set
    from .regress import pinv_solve

    n_steps = S.shape[0] - 1
    n_paths = S.shape[1]
    rows = n_paths // LANES
    X = jnp.stack([S, r], axis=-1)  # (T+1, n, 2)
    planes_tm = jnp.moveaxis(X, -1, 1).reshape(n_steps + 1, 2, rows, LANES)
    df_b = df.reshape(n_steps, rows, LANES)
    mean_t, inv_std_t = maxcall_standardization(X, "total")
    m = len(_multi_index_set(2, spec.degree, "total"))
    payoff = lambda s: jnp.maximum(phi * (s - K), 0.0)
    V0 = payoff(S[n_steps]).reshape(rows, LANES)

    moments = partial(ma_step_moments, n_assets=2, basis=spec.basis,
                      degree=spec.degree, mode="total", sorted_basis=False,
                      itm_weights=itm, payoff_kind="first", phi=phi,
                      direct_y=True,
                      interpret=jax.default_backend() == "cpu")
    apply_ = partial(ma_step_apply, n_assets=2, basis=spec.basis,
                     degree=spec.degree, mode="total", sorted_basis=False,
                     payoff_kind="first", phi=phi,
                     interpret=jax.default_backend() == "cpu")

    def step(V, xs):
        planes, dfb, t, mean, inv_std = xs
        y = dfb * V
        scalars = jnp.concatenate([
            jnp.stack([t, jnp.float32(0.0), K]), mean, inv_std,
            jnp.ones((1,), jnp.float32),
        ]).astype(jnp.float32)
        packed = moments(scalars, planes, y, y)
        G, b = unpack_moments(packed, m)
        coeffs = pinv_solve(G, b, spec.rcond)
        V_next, _ = apply_(scalars, coeffs, planes, y, jnp.zeros_like(y))
        return V_next, None

    ts = jnp.arange(n_steps, dtype=jnp.float32)
    V, _ = lax.scan(
        step, V0,
        (planes_tm[:n_steps], df_b, ts, mean_t[:n_steps].astype(jnp.float32),
         inv_std_t[:n_steps].astype(jnp.float32)),
        reverse=True)
    flat = V.reshape(-1)
    if antithetic:
        half = n_paths // 2
        stat = 0.5 * (flat[:half] + flat[half:])
    else:
        stat = flat
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(stat.shape[0])
    return price, stderr


def price_option_hw(
    key: jax.Array,
    hw: HullWhiteParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    return_surface: bool = False,
    engine: str = "xla",
) -> LSMCResult:
    """American/European vanilla under the Hull-White + GBM hybrid.

    The American continuation is regressed on the 2-D state (S_t, r_t)
    with the total-degree cross basis (same machinery as Heston's (S, v),
    `amcx.dynamics.price_option_heston`); discounting is pathwise. The
    European route needs no regression (pure discounted payoff) and must
    match `european_price_hw` to MC tolerance — the standing validation
    gate for the exact simulation scheme.

    ``return_surface=True`` fills ``LSMCResult.continuation`` with the
    per-(step, path) continuation surface — `amcx.exposures
    .compute_ccr_exposures` on it gives EPE/PFE under stochastic rates
    (wrong-way risk via ρ).

    ``engine="fused"``: the (S, r) induction runs on the fused multi-asset
    Pallas kernels with the pathwise-discount ``direct_y`` mode (American
    only; no surface; n_paths divisible by 4096). ``engine="mega"``: the
    same induction in ONE kernel (`amcx.ops.lsmc_ma_mega` with per-path
    discount planes streamed alongside the state planes)."""
    from .engine import resolve_regression_spec

    if product.has_barrier:
        raise ValueError("hybrid barrier pricing is not implemented")
    spec = resolve_regression_spec(spec, product, for_surface=return_surface)
    S, r, df = simulate_hybrid_hw(key, hw, product.T, sim)
    phi = 1.0 if product.option_type == "call" else -1.0
    dtype = sim.jnp_dtype
    if engine in ("fused", "mega"):
        if not product.is_american or return_surface:
            raise ValueError(f"engine={engine!r} prices American only and "
                             "emits no surface (use engine='xla')")
        if sim.n_paths % 4096:
            raise ValueError(f"engine={engine!r} needs n_paths divisible "
                             f"by 4096, got {sim.n_paths}")
        if engine == "mega":
            from .ops.lsmc_ma_mega import lsmc_price_ma_mega

            price, stderr = lsmc_price_ma_mega(
                jnp.stack([S, r], axis=-1), product.K, 0.0,
                product.T / sim.n_steps, phi=float(phi),
                payoff_kind="first", basis=spec.basis, degree=spec.degree,
                mode="total", rcond=spec.rcond,
                itm_weights=spec.regress_on == "itm",
                discount_planes=df, exercise_from_step=0,
                antithetic=sim.antithetic)
            return LSMCResult(price, stderr, None, None, None)
        price, stderr = _hw_engine_fused_impl(
            S, r, df, jnp.asarray(product.K, dtype), float(phi), spec,
            spec.regress_on == "itm", sim.antithetic)
        return LSMCResult(price, stderr, None, None, None)
    if engine != "xla":
        raise ValueError(f"engine must be 'xla', 'fused', or 'mega', "
                         f"got {engine!r}")
    price, stderr, surf = _hw_engine_impl(
        S, r, df, jnp.asarray(product.K, dtype), phi, spec,
        product.is_american, spec.regress_on == "itm", sim.antithetic,
        return_surface)
    return LSMCResult(price, stderr, None, None, surf)
