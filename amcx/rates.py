"""Bermudan swaptions under Hull-White 1F — pure interest-rate LSMC.

The reference prices equity vanillas under a constant rate only
(`/root/reference/american_monte_carlo.py:57`); the classic *second*
application of Longstaff-Schwartz in production is the Bermudan swaption
book. This module prices payer/receiver Bermudan swaptions on the 1-D
Markov state of the fitted Hull-White short rate,

    r_t = r0 + alpha(t) + x_t,   dx = -kappa x dt + sigma_r dW,
    alpha(t) = (sigma_r^2 / 2 kappa^2) (1 - e^{-kappa t})^2,

reusing the EXACT Ornstein-Uhlenbeck machinery of `amcx.hybrid` (the
(eta, iota) joint draw gives bias-free per-step x transitions AND the
pathwise money-market discount e^{-int r du} from one 2x2 Cholesky).
Everything analytic is closed-form G1++ bond math (Brigo-Mercurio ch. 3):

    P(t,T; x) = exp(-r0 (T-t) + 0.5 [V(T-t) - V(T) + V(t)] - B(T-t) x),
    B(tau) = (1 - e^{-kappa tau})/kappa,
    V(tau) = (sigma_r/kappa)^2 [tau + (2/k) e^{-k tau}
             - (1/2k) e^{-2k tau} - 3/(2k)].

Engines (the amcx engine-matrix contract):
- ``xla``  — lax.scan backward induction with PATHWISE discounting; the
  continuation is regressed on the 2-plane state (forward-swap value,
  x) with the total-degree cross basis (same machinery as Heston (S, v)
  and the hybrid (S, r)).
- ``mega`` — the whole induction in ONE Pallas kernel
  (`amcx.ops.lsmc_ma_mega` with per-path discount planes and an explicit
  Bermudan ``exercise_steps`` schedule); the forward-swap-value plane is
  plane 0 (static payoff kind ``first`` with K = 0), x is plane 1.

Oracles (independent code paths, both f64 host-side):
- Jamshidian (1989) decomposition: the EXACT European swaption price as a
  sum of zero-coupon-bond options (`jamshidian_swaption_price`) — the
  sharp gate on the simulation scheme and on the single-date Bermudan.
- A Crank-Nicolson PDE solver on the x-grid (scipy banded solves, f64)
  with the Bermudan max applied at exercise dates
  (`pde_bermudan_swaption`) — the Bermudan-value anchor; at a single
  exercise date it must reproduce Jamshidian to grid accuracy.

Conventions: unit notional; ``pay_times`` tau_1 < ... < tau_N are the
fixed-leg payment dates, ``first_reset`` T0 < tau_1 starts the schedule,
accruals delta_i = tau_i - tau_{i-1} (tau_0 = T0). Exercising at a reset
date e in {T0, tau_1, ..., tau_{N-1}} enters the swap over the REMAINING
schedule {tau_i > e} with the original accruals (the standard Bermudan
exercise-into-the-tail contract). Payer = pay fixed K, receive float.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .engine import LSMCResult
from .types import RegressionSpec, SimConfig

__all__ = [
    "HW1FParams",
    "bond_price_hw",
    "simulate_hw_rates",
    "swap_schedule",
    "jamshidian_swaption_price",
    "bond_option_price_hw",
    "cap_floor_price_hw",
    "price_bermudan_swaption",
    "pde_bermudan_swaption",
    "swaption_dual_bound",
    "swaption_ccr_profile",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HW1FParams:
    """Hull-White 1F short rate fitted to a flat initial curve ``r0``."""

    r0: float
    kappa: float = 0.5
    sigma_r: float = 0.01

    def __post_init__(self):
        # validate concrete values only: as a registered pytree this class
        # is re-constructed with tracers during jit unflattening
        if isinstance(self.kappa, (int, float)) and self.kappa <= 0:
            raise ValueError(f"kappa must be > 0, got {self.kappa}")
        if isinstance(self.sigma_r, (int, float)) and self.sigma_r < 0:
            raise ValueError(f"sigma_r must be >= 0, got {self.sigma_r}")


# ---------------------------------------------------------------------------
# G1++ bond math (f64 host constants; x-dependence applied by the caller)
# ---------------------------------------------------------------------------


def _B_tau(hw: HW1FParams, tau):
    k = float(hw.kappa)
    return (1.0 - np.exp(-k * np.asarray(tau, np.float64))) / k


def _V_tau(hw: HW1FParams, tau):
    k, s = float(hw.kappa), float(hw.sigma_r)
    tau = np.asarray(tau, np.float64)
    return (s * s / (k * k)) * (
        tau + (2.0 / k) * np.exp(-k * tau)
        - (0.5 / k) * np.exp(-2.0 * k * tau) - 1.5 / k)


def _ln_bond_const(hw: HW1FParams, t, T):
    """ln P(t, T; x=0): the x-free part of the G1++ reconstitution formula
    (flat fitted curve, so P(0,T)/P(0,t) = e^{-r0 (T-t)})."""
    t = np.asarray(t, np.float64)
    T = np.asarray(T, np.float64)
    return (-float(hw.r0) * (T - t)
            + 0.5 * (_V_tau(hw, T - t) - _V_tau(hw, T) + _V_tau(hw, t)))


def bond_price_hw(hw: HW1FParams, t, T, x=0.0):
    """Zero-coupon bond ``P(t, T)`` given the OU factor ``x_t`` (f64 host
    math; vectorizes over any of the arguments)."""
    return np.exp(_ln_bond_const(hw, t, T)
                  - _B_tau(hw, np.asarray(T) - np.asarray(t)) * x)


def swap_schedule(first_reset: float, tenor: float, freq: int = 1):
    """Fixed-leg payment dates for a ``tenor``-year swap starting at
    ``first_reset`` with ``freq`` payments per year."""
    n = int(round(tenor * freq))
    if n < 1:
        raise ValueError("tenor * freq must be >= 1")
    return [first_reset + (i + 1) / freq for i in range(n)]


def _swap_coeffs(hw: HW1FParams, K, start, pay_times, first_reset):
    """Bond legs of the swap entered at reset date ``start``: returns
    ``(times, coeffs)`` with value = sum_i coeffs[i] * P(., times[i]) for a
    PAYER swap (float - fixed). Accruals follow the original schedule."""
    taus = [float(first_reset)] + [float(t) for t in pay_times]
    times, coeffs = [float(start)], [1.0]
    # 1e-7y tolerance: reset dates may be grid-snapped (<=1e-6*dt off the
    # exact payment date) — a payment AT the start date belongs to the
    # departing leg, never to the entered swap
    for prev, tau in zip(taus[:-1], taus[1:]):
        if tau > float(start) + 1e-7:
            times.append(tau)
            coeffs.append(-float(K) * (tau - prev))
    if len(times) == 1:
        raise ValueError(f"no payments after start date {start} "
                         f"(schedule {pay_times})")
    coeffs[-1] -= 1.0  # float leg: P(t, start) - P(t, tau_N)
    return np.asarray(times), np.asarray(coeffs)


# ---------------------------------------------------------------------------
# Jamshidian decomposition — exact European swaption under HW1F
# ---------------------------------------------------------------------------


def jamshidian_swaption_price(hw: HW1FParams, K, expiry, pay_times,
                              payer: bool = True,
                              first_reset: float | None = None):
    """EXACT European swaption by Jamshidian's decomposition: find x* where
    the coupon bond prices at par, then the payer (receiver) swaption is a
    sum of zero-coupon-bond puts (calls) struck at the x* bond prices —
    each priced with the closed-form HW bond-option formula. Unit notional;
    ``expiry`` must be a reset date (default: the swap's ``first_reset``).
    """
    from scipy.stats import norm

    pay_times = sorted(float(t) for t in pay_times)
    first_reset = float(expiry) if first_reset is None else float(first_reset)
    times, coeffs = _swap_coeffs(hw, K, expiry, pay_times, first_reset)
    times, c = times[1:], -coeffs[1:]  # c_i > 0: fixed coupons + notional
    if np.any(c <= 0.0):
        raise ValueError("Jamshidian needs positive coupons (K > 0)")
    consts = _ln_bond_const(hw, expiry, times)
    Bs = _B_tau(hw, times - float(expiry))

    def par_gap(x):
        return np.sum(c * np.exp(consts - Bs * x)) - 1.0

    lo, hi = -1.0, 1.0
    while par_gap(lo) < 0.0:
        lo *= 2.0
    while par_gap(hi) > 0.0:
        hi *= 2.0
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if par_gap(mid) > 0.0:
            lo = mid
        else:
            hi = mid
    x_star = 0.5 * (lo + hi)
    X = np.exp(consts - Bs * x_star)  # critical bond prices

    k, s = float(hw.kappa), float(hw.sigma_r)
    Te = float(expiry)
    P0e = np.exp(_ln_bond_const(hw, 0.0, Te))
    P0S = np.exp(_ln_bond_const(hw, 0.0, times))
    sig_p = s * np.sqrt((1.0 - np.exp(-2.0 * k * Te)) / (2.0 * k)) * Bs
    h = np.log(P0S / (P0e * X)) / sig_p + 0.5 * sig_p
    if payer:  # puts on the bonds
        opts = X * P0e * norm.cdf(-h + sig_p) - P0S * norm.cdf(-h)
    else:      # calls
        opts = P0S * norm.cdf(h) - X * P0e * norm.cdf(h - sig_p)
    return float(np.sum(c * opts))


def bond_option_price_hw(hw: HW1FParams, expiry, bond_maturity, strike,
                         call: bool = True):
    """Closed-form zero-coupon bond option under HW1F (the building block
    Jamshidian sums; exposed for caps/floors): lognormal bond-price Black
    formula with ``sigma_p = sigma_r sqrt((1-e^{-2kT})/(2k)) B(S-T)``."""
    from scipy.stats import norm

    Te, S, X = float(expiry), float(bond_maturity), float(strike)
    k, sr = float(hw.kappa), float(hw.sigma_r)
    P0T = np.exp(_ln_bond_const(hw, 0.0, Te))
    P0S = np.exp(_ln_bond_const(hw, 0.0, S))
    sig_p = sr * np.sqrt((1.0 - np.exp(-2.0 * k * Te)) / (2.0 * k)) \
        * _B_tau(hw, S - Te)
    h = np.log(P0S / (P0T * X)) / sig_p + 0.5 * sig_p
    if call:
        return float(P0S * norm.cdf(h) - X * P0T * norm.cdf(h - sig_p))
    return float(X * P0T * norm.cdf(-h + sig_p) - P0S * norm.cdf(-h))


def cap_floor_price_hw(hw: HW1FParams, K, pay_times,
                       first_reset: float | None = None, cap: bool = True):
    """Interest-rate cap (floor) on the simple forward rate over each
    period of the schedule: caplet over [t_{i-1}, t_i] with strike K =
    ``(1 + delta_i K)`` bond PUTS (calls for floorlets) struck at
    ``1/(1 + delta_i K)`` — exact under HW1F. Unit notional; the first
    period resets at ``first_reset`` (inferred from the schedule like
    `_normalize_schedule`)."""
    pay_times, first_reset, _ = _normalize_schedule(pay_times, [], first_reset)
    resets = [first_reset] + pay_times[:-1]
    total = 0.0
    for t0, t1 in zip(resets, pay_times):
        delta = t1 - t0
        kk = 1.0 + delta * float(K)
        total += kk * bond_option_price_hw(hw, t0, t1, 1.0 / kk,
                                           call=not cap)
    return float(total)


# ---------------------------------------------------------------------------
# Exact OU simulation with pathwise discounting (the hybrid's 2x2 block)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "antithetic"))
def _simulate_rates_impl(key, r0, a, B, L, A_row, dt, n_steps, n_paths,
                         antithetic):
    dtype = jnp.float32
    n_draw = n_paths // 2 if antithetic else n_paths
    Z = jax.random.normal(key, (n_steps, 2, n_draw), dtype)
    if antithetic:
        Z = jnp.concatenate([Z, -Z], axis=-1)
    W = jnp.einsum("ij,tjn->tin", jnp.asarray(L, dtype), Z)
    a_f = jnp.asarray(a, dtype)
    B_f = jnp.asarray(B, dtype)

    def step(x, xs):
        eta, iota, A_t = xs
        int_r = r0 * dt + A_t + x * B_f + iota  # int r du over the step
        x_next = a_f * x + eta
        return x_next, (x_next, int_r)

    x0 = jnp.zeros((n_paths,), dtype)
    _, (x_path, int_r) = lax.scan(
        step, x0, (W[:, 0], W[:, 1], A_row.astype(dtype)))
    x = jnp.concatenate([x0[None], x_path], axis=0)
    return x, jnp.exp(-int_r)


def _hw_step_constants(hw: HW1FParams, dt, n_steps):
    """(a, B, L, A_row) of the exact per-step OU/integral recursion —
    shared by the outer simulator and the dual bound's inner simulator."""
    from .hybrid import HullWhiteParams, _alpha_integral_row, _step_constants

    proxy = HullWhiteParams(S0=1.0, r0=float(hw.r0), sigma_S=0.0,
                            kappa=float(hw.kappa), sigma_r=float(hw.sigma_r),
                            rho=0.0)
    a, L3 = _step_constants(proxy, dt)
    # rows 1:3 of the 3x3 Cholesky ARE the (eta, iota) factor (the equity
    # row is orthogonal at rho = 0, sigma_S never enters the covariance)
    L = L3[1:, 1:]
    B = (1.0 - a) / float(hw.kappa)
    A_row = _alpha_integral_row(proxy, dt, n_steps)
    return a, B, L, A_row


def simulate_hw_rates(key, hw: HW1FParams, T, sim: SimConfig):
    """Exact HW factor paths: ``(x, df)`` — the OU factor ``(n_steps+1,
    n_paths)`` and per-step pathwise discounts ``df[t] = e^{-int r du}``
    of shape ``(n_steps, n_paths)``. Same joint (eta, iota) scheme as
    `amcx.hybrid.simulate_hybrid_hw` (its 2x2 sub-block — the equity row
    is dropped); antithetic mirrors both driving normals."""
    if sim.antithetic and sim.n_paths % 2:
        raise ValueError(f"antithetic pairing needs even n_paths, got "
                         f"{sim.n_paths}")
    dt = float(T) / sim.n_steps
    a, B, L, A_row = _hw_step_constants(hw, dt, sim.n_steps)
    return _simulate_rates_impl(
        key, float(hw.r0), a, B, jnp.asarray(L), jnp.asarray(A_row),
        jnp.asarray(dt, jnp.float32), sim.n_steps, sim.n_paths,
        sim.antithetic)


# ---------------------------------------------------------------------------
# Forward-swap-value planes (the regression state / exercise values)
# ---------------------------------------------------------------------------


def _plane_tables(hw, K, grid_times, exercise_times, pay_times, first_reset,
                  payer):
    """Per-grid-step bond tables: plane[t] = sum_m w[t, m] e^{-Bb[t, m] x}.

    The plane at step t is the PAYER value of the swap entered at the next
    exercise date >= t (the exercise value exactly at exercise dates, a
    smooth regression feature in between); sign-flipped for receivers."""
    ex = sorted(float(e) for e in exercise_times)
    M = len(pay_times) + 1
    w = np.zeros((len(grid_times), M))
    Bb = np.zeros((len(grid_times), M))
    sgn = 1.0 if payer else -1.0
    for ti, g in enumerate(grid_times):
        start = next((e for e in ex if e >= g - 1e-9), ex[-1])
        times, coeffs = _swap_coeffs(hw, K, start, pay_times, first_reset)
        consts = _ln_bond_const(hw, g, times)
        w[ti, :len(times)] = sgn * coeffs * np.exp(consts)
        Bb[ti, :len(times)] = _B_tau(hw, times - g)
    return w, Bb


def _swap_planes(x, w, Bb):
    """(T+1, n) forward-swap-value plane from the bond tables (fused XLA
    elementwise; M is static and small)."""
    plane = jnp.zeros_like(x)
    for m_i in range(w.shape[1]):
        plane = plane + w[:, m_i:m_i + 1] * jnp.exp(-Bb[:, m_i:m_i + 1] * x)
    return plane


def _normalize_schedule(pay_times, exercise_times, first_reset):
    """Shared schedule normalization (LSMC engines AND the PDE oracle —
    one rule, so the engine and its anchor always price the same
    contract): sorted payment dates, the inferred-or-given ``first_reset``
    (inference needs >= 2 payments to read the period; a single-payment
    swap must pass it explicitly), reset dates, and the validated sorted
    exercise dates (default: all resets)."""
    pay_times = sorted(float(t) for t in pay_times)
    if first_reset is None:
        if len(pay_times) < 2:
            raise ValueError("first_reset must be given for a "
                             "single-payment swap (no period to infer)")
        first_reset = pay_times[0] - (pay_times[1] - pay_times[0])
    first_reset = float(first_reset)
    resets = [first_reset] + pay_times[:-1]
    if exercise_times is None:
        exercise_times = resets
    exercise_times = sorted(float(e) for e in exercise_times)
    for e in exercise_times:
        if not any(abs(e - rd) < 1e-9 for rd in resets):
            raise ValueError(f"exercise time {e} is not a reset date "
                             f"{resets}")
    return pay_times, first_reset, exercise_times


def _swaption_setup(hw, K, pay_times, exercise_times, first_reset, payer,
                    n_steps):
    """Validate the schedule and build the grid/plane tables: returns
    ``(T, dt, sched_steps, w, Bb)`` — shared by the single-device engines
    and the shard_map collective route."""
    pay_times, first_reset, exercise_times = _normalize_schedule(
        pay_times, exercise_times, first_reset)
    T = exercise_times[-1]
    dt = T / n_steps
    sched_steps = []
    for e in exercise_times[:-1]:
        s = e / dt
        if abs(s - round(s)) > 1e-6:
            raise ValueError(f"exercise time {e} does not land on the "
                             f"{n_steps}-step grid over [0, {T}]")
        sched_steps.append(int(round(s)))
    # snap exercise dates onto the grid floats so _plane_tables' next-
    # exercise lookup is exact at the exercise steps themselves (a date
    # 1e-6*dt below its grid point must not fall through to the NEXT one)
    snapped = [dt * s for s in sched_steps] + [T]
    grid_times = dt * np.arange(n_steps + 1)
    w, Bb = _plane_tables(hw, K, grid_times, snapped, pay_times,
                          first_reset, payer)
    return T, dt, sched_steps, w, Bb


# ---------------------------------------------------------------------------
# LSMC Bermudan swaption
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("spec", "antithetic", "return_surface",
                                   "return_coeffs"))
def _swaption_engine_impl(plane, x, df, allow, spec, antithetic,
                          return_surface=False, return_coeffs=False):
    """Backward induction on the (swap value, x) state with pathwise
    discounting — the hybrid `_hw_engine_impl` estimator with a Bermudan
    allow row and the swap-value plane as the payoff.

    ``return_surface``: also emit the per-(step, path) COUNTERPARTY VALUE
    surface for CCR — the fitted option continuation before the path's
    exercise time and, from the exercise date on, the SIGNED mark-to-market
    of the remaining swap TAIL (the legs from the next reset onward, a
    function of x_t; the in-flight period's already-fixed net coupon — set
    at the previous reset, path-dependent on x there — is excluded, i.e.
    the standard clean tail exposure at reset-period granularity: exact ON
    reset/exercise dates, coupon-free in between); the terminal row is the
    exercise-or-lapse value. The reference's surface contract
    (`american_monte_carlo.py:164-167,400-414`) extended to a product
    whose exposure survives exercise."""
    from .models.maxcall import max_call_fit

    n_steps = x.shape[0] - 1
    n_paths = x.shape[1]
    V = jnp.maximum(plane[n_steps], 0.0)

    def step(V, xs):
        p_t, x_t, df_t, allow_t = xs
        y = df_t * V
        ex = jnp.maximum(p_t, 0.0)
        X = jnp.stack([p_t, x_t], axis=-1)
        w = ((ex > 0).astype(x.dtype)
             if spec.regress_on == "itm" else None)
        cont, coefs = max_call_fit(X, y, spec, w, mode="total")
        hit = (ex > cont) & (ex > 0) & (allow_t > 0)
        out = None
        if return_surface or return_coeffs:
            frame = None
            if return_coeffs:
                # the (mu, sd) frame max_call_fit standardized with
                # (_standardize_columns semantics) — the dual's rule
                # replays the fitted continuation in this exact frame
                if w is None:
                    mu = jnp.mean(X, axis=0)
                    var = jnp.mean(jnp.square(X - mu), axis=0)
                else:
                    ws = jnp.maximum(jnp.sum(w), 1e-6)
                    mu = jnp.sum(w[:, None] * X, axis=0) / ws
                    var = jnp.sum(w[:, None] * jnp.square(X - mu),
                                  axis=0) / ws
                frame = (coefs, mu, jnp.maximum(jnp.sqrt(var), 1e-6))
            out = ((cont, hit) if return_surface else None, frame)
        return jnp.where(hit, ex, y), out

    V0, ys = lax.scan(step, V, (plane[:n_steps], x[:n_steps], df,
                                allow[:n_steps]), reverse=True)
    surface = None
    coeff_export = None
    if return_surface or return_coeffs:
        surf_ys, frame_ys = ys
        if return_coeffs:
            coeff_export = frame_ys
    if return_surface:
        cont_t, hit_t = surf_ys
        # exercised at or before t (forward cumulative-OR of the policy)
        ex_by_t = lax.associative_scan(jnp.logical_or, hit_t, axis=0)
        surface = jnp.where(ex_by_t, plane[:n_steps], cont_t)
        last = jnp.where(ex_by_t[-1], plane[n_steps],
                         jnp.maximum(plane[n_steps], 0.0))
        surface = jnp.concatenate([surface, last[None]], axis=0)
    if antithetic:
        half = n_paths // 2
        stat = 0.5 * (V0[:half] + V0[half:])
    else:
        stat = V0
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(stat.shape[0])
    return price, stderr, surface, coeff_export


def price_bermudan_swaption(
    key: jax.Array,
    hw: HW1FParams,
    K,
    pay_times,
    exercise_times=None,
    first_reset: float | None = None,
    payer: bool = True,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
    return_surface: bool = False,
    return_coeffs: bool = False,
) -> LSMCResult:
    """Bermudan payer/receiver swaption by LSMC on the HW factor.

    ``exercise_times`` must be reset dates (``first_reset`` or payment
    dates before the last; default: ALL reset dates) and must land on the
    simulation grid, which spans [0, max(exercise_times)]. A single
    exercise date prices the European swaption (no regression decision —
    the gate against `jamshidian_swaption_price`). ``engine="mega"`` runs
    the one-kernel ma-mega route (plane 0 = swap value, plane 1 = x,
    pathwise discount planes, explicit Bermudan schedule in-kernel).

    ``return_surface=True`` (xla only) fills ``LSMCResult.continuation``
    with the counterparty-value surface — option continuation before
    exercise, SIGNED remaining-swap mark-to-market after — the input to
    `swaption_ccr_profile` / `amcx.exposures.bilateral_cva`.

    ``return_coeffs=True`` (xla only) fills ``LSMCResult.coeffs`` with the
    per-step policy export ``(coeffs (n_steps, m), mu (n_steps, 2),
    sd (n_steps, 2))`` — the cross-basis solution and the standardization
    frame of the (swap value, x) regressors, exactly what
    `swaption_dual_bound` replays (rows are time-major: row t is step t)."""
    T, dt, sched_steps, w, Bb = _swaption_setup(
        hw, K, pay_times, exercise_times, first_reset, payer, sim.n_steps)
    x, df = simulate_hw_rates(key, hw, T, sim)
    plane = _swap_planes(x, jnp.asarray(w, jnp.float32),
                         jnp.asarray(Bb, jnp.float32))

    if engine == "mega":
        from .ops.lsmc_ma_mega import lsmc_price_ma_mega

        if return_surface or return_coeffs:
            raise ValueError("return_surface/return_coeffs need engine='xla'")
        if sim.n_paths % 4096:
            raise ValueError("engine='mega' needs n_paths divisible by "
                             f"4096, got {sim.n_paths}")
        price, stderr = lsmc_price_ma_mega(
            jnp.stack([plane, x], axis=-1), 0.0, 0.0, dt, phi=1.0,
            payoff_kind="first", basis=spec.basis, degree=spec.degree,
            mode="total", rcond=spec.rcond,
            itm_weights=spec.regress_on == "itm",
            exercise_steps=tuple(sched_steps),
            discount_planes=df, antithetic=sim.antithetic)
        return LSMCResult(price, stderr, None, None, None)
    if engine != "xla":
        raise ValueError(f"engine must be 'xla' or 'mega', got {engine!r}")
    from .payoff import exercise_allow_row

    allow = (exercise_allow_row(sched_steps, sim.n_steps, jnp.float32)
             if sched_steps else jnp.zeros(sim.n_steps + 1, jnp.float32))
    price, stderr, surface, coeffs = _swaption_engine_impl(
        plane, x, df, allow, spec, sim.antithetic, return_surface,
        return_coeffs)
    return LSMCResult(price, stderr, None, None, surface, coeffs=coeffs)


@partial(jax.jit, static_argnames=("spec", "antithetic"))
def _swaption_replay_impl(x, df, coefs, mu_t, sd_t, alw_full, w, Bb, spec,
                          antithetic):
    """Forward first-hit walk of the frozen swaption policy on fresh
    (x, df) paths: exercise at the first allowed step where the replayed
    cross-basis rule fires, value = pathwise-discounted exercise value —
    the out-of-sample LOWER bound (the in-sample fit price is
    foresight-biased upward and certifies nothing)."""
    from .models.maxcall import multi_asset_design_matrix

    n_steps = x.shape[0] - 1
    n_paths = x.shape[1]
    dtype = x.dtype

    def plane_at(x_s, s_i):
        p = jnp.zeros_like(x_s)
        for m_i in range(w.shape[1]):
            p = p + w[s_i, m_i] * jnp.exp(-Bb[s_i, m_i] * x_s)
        return p

    def step(carry, xs):
        D, alive, val = carry
        x_s, df_prev, s = xs
        s_i = jnp.minimum(s, float(n_steps)).astype(jnp.int32)
        D = D * df_prev
        p = plane_at(x_s, s_i)
        h = jnp.maximum(p, 0.0)
        c_i = jnp.minimum(s_i, n_steps - 1)
        X = jnp.stack([p, x_s], axis=-1)
        Xs = (X - mu_t[c_i]) / sd_t[c_i]
        A = multi_asset_design_matrix(
            Xs.reshape(-1, 2), spec.basis, spec.degree, "total")
        cont = jnp.maximum((A @ coefs[c_i]).reshape(h.shape), 0.0)
        ex = (h > 0.0) & (h > cont) & (alw_full[s_i] > 0)
        ex = jnp.where(s_i >= n_steps, h > 0.0, ex)
        stop = alive & ex
        val = jnp.where(stop, D * h, val)
        alive = alive & ~stop
        return (D, alive, val), None

    ss = jnp.arange(1, n_steps + 1, dtype=dtype)
    (_, _, val), _ = lax.scan(
        step,
        (jnp.ones((n_paths,), dtype), jnp.ones((n_paths,), bool),
         jnp.zeros((n_paths,), dtype)),
        (x[1:], df, ss))
    if antithetic:
        half = n_paths // 2
        stat = 0.5 * (val[:half] + val[half:])
    else:
        stat = val
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(stat.shape[0])
    return price, stderr


@partial(jax.jit, static_argnames=("spec", "n_inner"))
def _swaption_dual_impl(key, x_o, plane_o, D_o, coefs, mu_t, sd_t, alw_full,
                        w, Bb, a, B, L, A_row, r0, dt, lower, spec, n_inner):
    """Nested Andersen-Broadie dual for the Bermudan swaption.

    The HW twin of `amcx.dual._dual_nested_impl` with STOCHASTIC
    discounting: all martingale terms are deflated to time 0 by the
    pathwise money-market deflator D_t = prod df (outer realization for
    the increments, inner compound discount inside the conditional-
    expectation estimates). The rule replays the exported cross-basis
    policy (coefs, mu, sd per step) on the (swap value, x) state; rmax
    only updates at allowed exercise steps (Bermudan schedule — the
    option-value-zero floor keeps the bound valid, maxcall convention).
    """
    from .models.maxcall import multi_asset_design_matrix

    n_steps = x_o.shape[0] - 1
    n_paths = x_o.shape[1]
    dtype = x_o.dtype
    r0 = jnp.asarray(r0, dtype)
    dt = jnp.asarray(dt, dtype)
    a_f = jnp.asarray(a, dtype)
    B_f = jnp.asarray(B, dtype)
    L_f = jnp.asarray(L, dtype)

    def plane_at(x, s_i):
        p = jnp.zeros_like(x)
        for m_i in range(w.shape[1]):
            p = p + w[s_i, m_i] * jnp.exp(-Bb[s_i, m_i] * x)
        return p

    def rule_exercise(x, s):
        s_i = jnp.clip(s, 0, n_steps).astype(jnp.int32)
        p = plane_at(x, s_i)
        h = jnp.maximum(p, 0.0)
        c_i = jnp.minimum(s_i, n_steps - 1)
        X = jnp.stack([p, x], axis=-1)
        Xs = (X - mu_t[c_i]) / sd_t[c_i]
        A = multi_asset_design_matrix(
            Xs.reshape(-1, 2), spec.basis, spec.degree, "total")
        cont = jnp.maximum((A @ coefs[c_i]).reshape(h.shape), 0.0)
        ex = (h > 0.0) & (h > cont) & (alw_full[s_i] > 0)
        return jnp.where(s_i >= n_steps, h > 0.0, ex), h

    def inner_rule_value(x_start, t1, key_t):
        """E-hat[ D(t1-1 -> sigma) * h_sigma | x at t1-1 ] in (t1-1)-dollars
        — the first participating step's df IS included (stochastic
        discounting: the conditional expectation is of the discounted rule
        value, not of the rule value times a deterministic factor)."""
        J = n_inner
        z0 = jax.random.normal(key_t, (n_steps, 2, J // 2, n_paths), dtype)
        z = jnp.concatenate([z0, -z0], axis=2)  # antithetic inner pairs

        def istep(carry, xs):
            x, D_in, alive, val = carry
            z_s, s = xs
            run = s >= t1
            s_prev = jnp.clip(s - 1.0, 0, n_steps - 1).astype(jnp.int32)
            eta = L_f[0, 0] * z_s[0]
            iota = L_f[1, 0] * z_s[0] + L_f[1, 1] * z_s[1]
            int_r = r0 * dt + A_row[s_prev] + x * B_f + iota
            D_in = jnp.where(run, D_in * jnp.exp(-int_r), D_in)
            x = jnp.where(run, a_f * x + eta, x)
            e, h = rule_exercise(x, s)
            stop = alive & e & run
            val = jnp.where(stop, D_in * h, val)
            alive = alive & ~stop
            return (x, D_in, alive, val), None

        x0 = jnp.broadcast_to(x_start[None, :], (J, n_paths))
        ss = jnp.arange(1, n_steps + 1, dtype=dtype)
        (_, _, _, val), _ = lax.scan(
            istep,
            (x0, jnp.ones((J, n_paths), dtype),
             jnp.ones((J, n_paths), bool), jnp.zeros((J, n_paths), dtype)),
            (z, ss))
        return jnp.mean(val, axis=0)

    keys = jax.random.split(key, n_steps + 1)
    ts = jnp.arange(n_steps, dtype=dtype)

    def step(carry, xs):
        M, rmax, cD_prev = carry  # cD_prev = E-hat[D(t->t1) h | x_t], t-dollars
        x_t1, D_t, D_t1, t, key_t = xs
        t1 = t + 1.0
        s_i = jnp.minimum(t1, float(n_steps)).astype(jnp.int32)
        e1, h1 = rule_exercise(x_t1, t1)
        cD_next = jnp.where(
            t1 < n_steps,
            inner_rule_value(x_t1, t1 + 1.0, key_t),
            jnp.zeros((n_paths,), dtype),
        )
        realized = jnp.where(e1, h1, cD_next)  # rule value at t1, t1-dollars
        M = M + D_t1 * realized - D_t * cD_prev
        rmax = jnp.where(alw_full[s_i] > 0,
                         jnp.maximum(rmax, D_t1 * h1 - M), rmax)
        return (M, rmax, cD_next), None

    M0 = jnp.zeros((n_paths,), dtype)
    r0max = jnp.zeros((n_paths,), dtype)  # value >= 0 floor (t=0 not a date)
    c0 = inner_rule_value(x_o[0], 1.0, keys[n_steps])
    (M, rmax, _), _ = lax.scan(
        step, (M0, r0max, c0),
        (x_o[1:], D_o[:n_steps], D_o[1:], ts, keys[:n_steps]))
    upper = jnp.mean(rmax)
    stderr = jnp.std(rmax) / jnp.sqrt(float(n_paths))
    return upper, stderr, upper - lower


def swaption_dual_bound(
    key: jax.Array,
    hw: HW1FParams,
    K,
    pay_times,
    exercise_times=None,
    first_reset: float | None = None,
    payer: bool = True,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    sim: SimConfig = SimConfig(),
    n_outer: int = 2_048,
    n_inner: int = 64,
):
    """Certified (LSMC lower, nested AB dual upper) Bermudan-swaption
    bracket (VERDICT r3 #3: the point estimate sat 2.5 sigma below the PDE
    anchor with nothing certifying how much was policy bias).

    Fits the cross-basis policy on ``sim`` paths (key stream 1), exports
    the per-step coefficients + standardization frames, then runs the
    nested Andersen-Broadie dual on ``n_outer`` fresh outer paths (key
    streams 2/3 for outer paths / inner normals) with exact HW inner
    transitions and pathwise inner discounting. Returns
    ``(lower_result, DualResult)``: the lower bound is the frozen
    rule's OUT-OF-SAMPLE replay on a fourth key-disjoint path set (an
    in-sample fit price is foresight-biased upward and certifies
    nothing); ``lower_result.coeffs`` carries the exported policy.
    Units as `price_bermudan_swaption` (x 1e4 for bp on unit notional).
    """
    from .dual import DualResult
    from .payoff import exercise_allow_row

    if n_inner < 2 or n_inner % 2:
        raise ValueError("n_inner must be even (antithetic inner pairs)")
    k_fit, k_replay, k_outer, k_inner = jax.random.split(key, 4)
    T, dt, sched_steps, w, Bb = _swaption_setup(
        hw, K, pay_times, exercise_times, first_reset, payer, sim.n_steps)
    res = price_bermudan_swaption(
        k_fit, hw, K, pay_times, exercise_times=exercise_times,
        first_reset=first_reset, payer=payer, spec=spec, sim=sim,
        return_coeffs=True)
    coefs, mu_t, sd_t = res.coeffs
    sim_outer = SimConfig(n_paths=n_outer, n_steps=sim.n_steps,
                          antithetic=False)
    x_o, df_o = simulate_hw_rates(k_outer, hw, T, sim_outer)
    D_o = jnp.concatenate([jnp.ones((1, n_outer), x_o.dtype),
                           jnp.cumprod(df_o, axis=0)], axis=0)
    plane_o = _swap_planes(x_o, jnp.asarray(w, jnp.float32),
                           jnp.asarray(Bb, jnp.float32))
    alw = exercise_allow_row(sched_steps, sim.n_steps, jnp.float32)
    alw_full = alw.at[sim.n_steps].set(1.0)  # expiry always decides
    # OOS lower bound: replay the frozen rule on an independent path set
    # (the in-sample fit price is foresight-biased upward)
    x_r, df_r = simulate_hw_rates(k_replay, hw, T, sim)
    wj = jnp.asarray(w, jnp.float32)
    Bbj = jnp.asarray(Bb, jnp.float32)
    lo_price, lo_stderr = _swaption_replay_impl(
        x_r, df_r, coefs, mu_t, sd_t, alw_full, wj, Bbj, spec,
        sim.antithetic)
    a, B, L, A_row = _hw_step_constants(hw, dt, sim.n_steps)
    upper, u_stderr, gap = _swaption_dual_impl(
        k_inner, x_o, plane_o, D_o, coefs, mu_t, sd_t, alw_full,
        wj, Bbj, a, B, jnp.asarray(L), jnp.asarray(A_row, jnp.float32),
        float(hw.r0), dt, lo_price, spec, n_inner)
    lower = LSMCResult(lo_price, lo_stderr, None, None, None,
                       coeffs=res.coeffs)
    return lower, DualResult(upper, u_stderr, gap)


def swaption_ccr_profile(surface_tm):
    """CCR profile from the swaption counterparty-value surface: the
    standard (EPE, PFE) of the POSITIVE part plus the per-step expected
    negative exposure ENE (magnitude owed by us once the exercised swap
    goes against us) — the (epe, ene) pair `amcx.exposures.bilateral_cva`
    consumes. Equity surfaces are nonnegative so the reference pipeline
    never needed the split; an exercised swap is signed."""
    from .exposures import compute_ccr_exposures

    ccr = compute_ccr_exposures(jnp.maximum(surface_tm, 0.0))
    # same non-finite masking as compute_ccr_exposures: one NaN step must
    # not wipe the whole ENE leg
    neg = jnp.maximum(-surface_tm, 0.0)
    ene = jnp.mean(jnp.where(jnp.isfinite(neg), neg, 0.0), axis=1)
    return ccr, ene


# ---------------------------------------------------------------------------
# Crank-Nicolson PDE oracle on the x-grid (f64, scipy banded solves)
# ---------------------------------------------------------------------------


def pde_bermudan_swaption(
    hw: HW1FParams,
    K,
    pay_times,
    exercise_times=None,
    first_reset: float | None = None,
    payer: bool = True,
    n_x: int = 801,
    n_t: int = 2000,
    n_std: float = 7.0,
):
    """Bermudan swaption by Crank-Nicolson on the OU factor —
    an INDEPENDENT f64 oracle (numpy/scipy, banded solves; no JAX).

    PDE: V_t - kappa x V_x + 0.5 sigma^2 V_xx - (r0 + alpha(t) + x) V = 0,
    with V(e_K, x) = max(swap, 0) at the last exercise date and the
    Bermudan max applied at each earlier date. A single exercise date
    reproduces `jamshidian_swaption_price` to grid accuracy (the
    convergence gate). Boundaries: zero curvature + upwinded drift at the
    +-``n_std``-stddev ends."""
    from scipy.linalg import solve_banded

    pay_times, first_reset, ex_dates = _normalize_schedule(
        pay_times, exercise_times, first_reset)
    T = ex_dates[-1]
    k, s, r0 = float(hw.kappa), float(hw.sigma_r), float(hw.r0)

    L = n_std * s * np.sqrt((1.0 - np.exp(-2.0 * k * T)) / (2.0 * k))
    xg = np.linspace(-L, L, n_x)
    h = xg[1] - xg[0]
    mu = -k * xg
    alpha = lambda t: (s * s / (2.0 * k * k)) * (1.0 - np.exp(-k * t)) ** 2

    def exercise_value(start, x):
        times, coeffs = _swap_coeffs(hw, K, start, pay_times, first_reset)
        sgn = 1.0 if payer else -1.0
        v = np.zeros_like(x)
        for tau, cc in zip(times, coeffs):
            v += cc * np.exp(_ln_bond_const(hw, start, tau)
                             - _B_tau(hw, tau - start) * x)
        return sgn * v

    # time-constant operator pieces (interior: central; ends: upwind, no
    # curvature — the n_std-wide grid makes the boundary error negligible)
    lo = 0.5 * s * s / (h * h) - mu / (2.0 * h)
    dg = np.full(n_x, -s * s / (h * h)) - (r0 + xg)
    up = 0.5 * s * s / (h * h) + mu / (2.0 * h)
    lo[0], up[0] = 0.0, mu[0] / h
    dg[0] = -mu[0] / h - (r0 + xg[0])
    lo[-1], up[-1] = -mu[-1] / h, 0.0
    dg[-1] = mu[-1] / h - (r0 + xg[-1])

    V = np.maximum(exercise_value(ex_dates[-1], xg), 0.0)
    events = [0.0] + ex_dates
    for j in range(len(events) - 1, 0, -1):
        t_hi, t_lo = events[j], events[j - 1]
        m = max(1, int(round(n_t * (t_hi - t_lo) / T)))
        ddt = (t_hi - t_lo) / m
        for i in range(m):
            t_mid = t_hi - (i + 0.5) * ddt
            a_t = alpha(t_mid)
            d_t = dg - a_t
            rhs = (V + 0.5 * ddt * (np.r_[0.0, lo[1:]] * np.r_[V[0], V[:-1]]
                                    + d_t * V
                                    + np.r_[up[:-1], 0.0] * np.r_[V[1:],
                                                                  V[-1]]))
            ab = np.zeros((3, n_x))
            ab[0, 1:] = -0.5 * ddt * up[:-1]
            ab[1, :] = 1.0 - 0.5 * ddt * d_t
            ab[2, :-1] = -0.5 * ddt * lo[1:]
            V = solve_banded((1, 1), ab, rhs)
        if j > 1:  # Bermudan max at the earlier exercise date
            V = np.maximum(V, exercise_value(events[j - 1], xg))
    return float(np.interp(0.0, xg, V))
