"""Bermudan swaptions under G2++ — the two-factor Gaussian short rate.

Capability beyond the reference (constant rate only,
`/root/reference/american_monte_carlo.py:57`) and beyond `amcx.rates`'s
HW1F: the production two-factor Gaussian model (Brigo-Mercurio ch. 4),

    r(t) = x(t) + y(t) + phi(t),
    dx = -a x dt + sigma dW1,   dy = -b y dt + eta dW2,
    dW1 dW2 = rho dt,

fitted to a flat initial curve ``r0`` (so ``P(0,T) = e^{-r0 T}``
EXACTLY).  One factor cannot decorrelate forward rates; the Bermudan
exercise decision compares swap tails of different lengths, which is
exactly where the second factor earns its keep.

Everything is exact-in-law, no discretization bias anywhere:

- **Simulation**: per step the innovation triple ``(eta_x, eta_y, iota)``
  (factor updates + the short-rate integral) is jointly Gaussian with
  closed-form 3x3 covariance (classic OU integrals); one host f64
  Cholesky feeds a `lax.scan` — the 2-factor generalization of
  `amcx.hybrid`'s (eta, iota) machinery, giving bias-free factor paths
  AND pathwise money-market discounts ``e^{-int r}``.
- **Bond math**: ``ln P(t,T;x,y) = -r0 (T-t) + 0.5 [V(T-t) - V(T) + V(t)]
  - B_a(T-t) x - B_b(T-t) y`` with the three-term B&M variance ``V``.
- **European oracle** (`g2_swaption_price`): under the T-forward measure
  the terminal factors stay Gaussian with the SAME covariance and
  exponential-tilt mean shifts ``E^T[x_T] = -Cov(x_T, int_0^T r)`` (no
  expansion, no root-find) — the swaption is a 2-D Gauss-Hermite
  quadrature of the positive part of the coupon-bond value, exact to
  quadrature accuracy. Certified WITHOUT trusting any one derivation:
  the step-scan MC European must land on it (two independent routes),
  payer-receiver parity is exact, and ``eta -> 0`` collapses to
  `amcx.rates.jamshidian_swaption_price`.
- **Bermudan engines**: LSMC on the THREE-plane state (forward-swap
  value, x, y) with total-degree cross basis and pathwise discounting —
  ``engine="xla"`` scan or ``engine="mega"`` (the whole induction in ONE
  `amcx.ops.lsmc_ma_mega` kernel: per-path discount planes + in-kernel
  Bermudan schedule). ``eta -> 0`` reduces the Bermudan to HW1F, gated
  on `amcx.rates.pde_bermudan_swaption` (f64 CN-PDE).

Schedule conventions are shared with `amcx.rates._normalize_schedule`
(one rule for engines and oracles alike).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .engine import LSMCResult
from .types import RegressionSpec, SimConfig
from .rates import _normalize_schedule, _swap_coeffs

__all__ = [
    "G2Params",
    "bond_price_g2",
    "simulate_g2_rates",
    "g2_swaption_price",
    "bond_option_price_g2",
    "cap_floor_price_g2",
    "price_bermudan_swaption_g2",
    "g2_swaption_oos_bound",
]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class G2Params:
    """G2++ fitted to a flat initial curve ``r0``. ``a``/``sigma`` drive
    the first factor, ``b``/``eta`` the second, ``rho`` their
    instantaneous correlation (typically strongly negative in fits)."""

    r0: float
    a: float = 0.8
    b: float = 0.1
    sigma: float = 0.01
    eta: float = 0.008
    rho: float = -0.7

    def __post_init__(self):
        for name in ("a", "b"):
            v = getattr(self, name)
            if isinstance(v, (int, float)) and v <= 0:
                raise ValueError(f"{name} must be > 0, got {v}")
        if isinstance(self.rho, (int, float)) and not -1.0 <= self.rho <= 1.0:
            raise ValueError(f"rho must be in [-1, 1], got {self.rho}")


# ---------------------------------------------------------------------------
# Closed-form OU covariances (f64 host math)
# ---------------------------------------------------------------------------


def _B(z, tau):
    return (1.0 - np.exp(-z * np.asarray(tau, np.float64))) / z


def _cov_block(g2: G2Params, tau):
    """All covariances of ``(eta_x, eta_y, iota_x, iota_y)`` over a
    horizon ``tau`` started from x=y=0 (iota_z = noise part of
    ``int z du``); returns a dict of scalars/arrays."""
    a, b = float(g2.a), float(g2.b)
    s, e, r = float(g2.sigma), float(g2.eta), float(g2.rho)
    tau = np.asarray(tau, np.float64)
    Ba, Bb = _B(a, tau), _B(b, tau)
    B2a, B2b = _B(2.0 * a, tau), _B(2.0 * b, tau)
    Bab = _B(a + b, tau)
    return {
        "var_x": s * s * B2a,
        "var_y": e * e * B2b,
        "cov_xy": r * s * e * Bab,
        "cov_x_ix": (s * s / a) * (Ba - B2a),
        "cov_y_iy": (e * e / b) * (Bb - B2b),
        "cov_x_iy": (r * s * e / b) * (Ba - Bab),
        "cov_y_ix": (r * s * e / a) * (Bb - Bab),
        "var_ix": (s * s / (a * a)) * (tau - 2.0 * Ba + B2a),
        "var_iy": (e * e / (b * b)) * (tau - 2.0 * Bb + B2b),
        "cov_ix_iy": (r * s * e / (a * b)) * (tau - Ba - Bb + Bab),
    }


def _V_tau_g2(g2: G2Params, tau):
    """B&M's ``V``: the variance of ``int_t^T (x + y) du`` given
    x_t = y_t = 0 (time-homogeneous, depends on T - t only)."""
    c = _cov_block(g2, tau)
    return c["var_ix"] + c["var_iy"] + 2.0 * c["cov_ix_iy"]


def _ln_bond_const_g2(g2: G2Params, t, T):
    """ln P(t, T; x=0, y=0) under the flat fitted curve."""
    t = np.asarray(t, np.float64)
    T = np.asarray(T, np.float64)
    return (-float(g2.r0) * (T - t)
            + 0.5 * (_V_tau_g2(g2, T - t) - _V_tau_g2(g2, T)
                     + _V_tau_g2(g2, t)))


def bond_price_g2(g2: G2Params, t, T, x=0.0, y=0.0):
    """Zero-coupon bond ``P(t, T)`` given the factors (f64 host math;
    vectorizes over any argument)."""
    tau = np.asarray(T) - np.asarray(t)
    return np.exp(_ln_bond_const_g2(g2, t, T)
                  - _B(float(g2.a), tau) * x - _B(float(g2.b), tau) * y)


def bond_option_price_g2(g2: G2Params, expiry, bond_maturity, strike,
                         call: bool = True):
    """Closed-form zero-coupon bond option under G2++: ``P(T,S)`` is
    lognormal under the T-forward measure with total variance
    ``B_a^2 var_x + B_b^2 var_y + 2 B_a B_b cov_xy`` (B&M 4.2.4's
    structure via the same `_cov_block` terms the simulator uses), priced
    by the bond-price Black formula."""
    from scipy.stats import norm

    Te, S, X = float(expiry), float(bond_maturity), float(strike)
    c = _cov_block(g2, Te)
    Ba = _B(float(g2.a), S - Te)
    Bb = _B(float(g2.b), S - Te)
    sig_p = np.sqrt(Ba * Ba * c["var_x"] + Bb * Bb * c["var_y"]
                    + 2.0 * Ba * Bb * c["cov_xy"])
    P0T = np.exp(_ln_bond_const_g2(g2, 0.0, Te))
    P0S = np.exp(_ln_bond_const_g2(g2, 0.0, S))
    h = np.log(P0S / (P0T * X)) / sig_p + 0.5 * sig_p
    if call:
        return float(P0S * norm.cdf(h) - X * P0T * norm.cdf(h - sig_p))
    return float(X * P0T * norm.cdf(-h + sig_p) - P0S * norm.cdf(-h))


def cap_floor_price_g2(g2: G2Params, K, pay_times,
                       first_reset: float | None = None, cap: bool = True):
    """Interest-rate cap (floor) under G2++ — exact, as ``(1 + delta K)``
    bond puts (calls) per period (`amcx.rates.cap_floor_price_hw`'s
    contract with the two-factor bond-option block)."""
    pay_times, first_reset, _ = _normalize_schedule(pay_times, [],
                                                    first_reset)
    resets = [first_reset] + pay_times[:-1]
    total = 0.0
    for t0, t1 in zip(resets, pay_times):
        delta = t1 - t0
        kk = 1.0 + delta * float(K)
        total += kk * bond_option_price_g2(g2, t0, t1, 1.0 / kk,
                                           call=not cap)
    return float(total)


# ---------------------------------------------------------------------------
# Exact simulation with pathwise discounting
# ---------------------------------------------------------------------------


@lru_cache(maxsize=64)
def _g2_step_constants(g2: G2Params, dt: float, n_steps: int):
    """(dec_a, dec_b, B_a, B_b, L, A_row): the per-step decay factors,
    integral loadings, the 3x3 Cholesky of cov(eta_x, eta_y, iota), and
    the deterministic phi-integral row ``A_k = 0.5 (V(t_{k+1}) - V(t_k))``
    (so that E[e^{-int r}] = e^{-r0 T} exactly)."""
    c = _cov_block(g2, dt)
    cov = np.array([
        [c["var_x"], c["cov_xy"], c["cov_x_ix"] + c["cov_x_iy"]],
        [c["cov_xy"], c["var_y"], c["cov_y_iy"] + c["cov_y_ix"]],
        [c["cov_x_ix"] + c["cov_x_iy"], c["cov_y_iy"] + c["cov_y_ix"],
         c["var_ix"] + c["var_iy"] + 2.0 * c["cov_ix_iy"]],
    ], np.float64)
    # guard eta -> 0 degenerate rows for the Cholesky
    L = np.linalg.cholesky(cov + 1e-30 * np.eye(3))
    grid = dt * np.arange(n_steps + 1)
    V = _V_tau_g2(g2, grid)
    A_row = 0.5 * (V[1:] - V[:-1])
    a, b = float(g2.a), float(g2.b)
    return (float(np.exp(-a * dt)), float(np.exp(-b * dt)),
            float(_B(a, dt)), float(_B(b, dt)), L, A_row)


@partial(jax.jit, static_argnames=("n_steps", "n_paths", "antithetic"))
def _simulate_g2_impl(key, r0, dec_a, dec_b, Ba, Bb, L, A_row, dt, n_steps,
                      n_paths, antithetic):
    dtype = jnp.float32
    n_draw = n_paths // 2 if antithetic else n_paths
    Z = jax.random.normal(key, (n_steps, 3, n_draw), dtype)
    if antithetic:
        Z = jnp.concatenate([Z, -Z], axis=-1)
    W = jnp.einsum("ij,tjn->tin", jnp.asarray(L, dtype), Z)

    def step(carry, xs):
        x, y = carry
        ex, ey, io, A_t = xs
        int_r = r0 * dt + A_t + x * Ba + y * Bb + io
        x1 = dec_a * x + ex
        y1 = dec_b * y + ey
        return (x1, y1), (x1, y1, int_r)

    z0 = jnp.zeros((n_paths,), dtype)
    _, (xp, yp, int_r) = lax.scan(
        step, (z0, z0), (W[:, 0], W[:, 1], W[:, 2], A_row.astype(dtype)))
    x = jnp.concatenate([z0[None], xp], axis=0)
    y = jnp.concatenate([z0[None], yp], axis=0)
    return x, y, jnp.exp(-int_r)


def simulate_g2_rates(key, g2: G2Params, T, sim: SimConfig):
    """Exact G2++ factor paths: ``(x, y, df)`` with ``x``/``y`` of shape
    ``(n_steps+1, n_paths)`` and per-step pathwise discounts
    ``df[t] = e^{-int_t^{t+dt} r du}`` of shape ``(n_steps, n_paths)``.
    Antithetic mirrors all three driving normals."""
    if sim.antithetic and sim.n_paths % 2:
        raise ValueError(f"antithetic pairing needs even n_paths, got "
                         f"{sim.n_paths}")
    dt = float(T) / sim.n_steps
    dec_a, dec_b, Ba, Bb, L, A_row = _g2_step_constants(g2, dt, sim.n_steps)
    return _simulate_g2_impl(
        key, float(g2.r0), dec_a, dec_b, Ba, Bb, jnp.asarray(L),
        jnp.asarray(A_row), jnp.asarray(dt, jnp.float32), sim.n_steps,
        sim.n_paths, sim.antithetic)


# ---------------------------------------------------------------------------
# European swaption — exact T-forward Gauss-Hermite quadrature
# ---------------------------------------------------------------------------


def g2_swaption_price(g2: G2Params, K, expiry, pay_times,
                      payer: bool = True, first_reset: float | None = None,
                      n_nodes: int = 96):
    """EXACT European swaption under G2++ (f64, deterministic).

    Under the T-forward measure the terminal factors ``(x_T, y_T)`` keep
    their Q-covariance and pick up the exponential-tilt mean shifts
    ``E^T[z_T] = -Cov(z_T, int_0^T r)`` (Gaussian tilting shifts means
    only). The payer swaption is

        P(0,T) * E^T[ max(1 - sum_i c_i P(T, tau_i; x, y), 0) ]

    with the INNER factor integrated ANALYTICALLY: conditional on the
    outer Gauss-Hermite variable the coupon-bond value is monotone in the
    inner one (all loadings share a sign), so a vectorized f64 bisection
    finds the exercise root and each bond contributes a closed-form
    ``e^{beta^2/2} Phi`` term — the exercise kink never meets the
    quadrature, so the outer integral converges exponentially (the B&M
    4.31 structure without the 1-factor Jamshidian restriction). The
    factor with the larger payoff-variance share is taken inner, which
    keeps the ``eta -> 0`` HW1F collapse exact to ~1e-12."""
    pay_times = sorted(float(t) for t in pay_times)
    Te = float(expiry)
    first_reset = Te if first_reset is None else float(first_reset)
    times, coeffs = _swap_coeffs(None, K, Te, pay_times, first_reset)
    # payer swap value at T: coeffs[0]*1 + sum_{i>=1} coeffs_i P(T, tau_i)
    consts = _ln_bond_const_g2(g2, Te, times[1:])
    Bas = _B(float(g2.a), times[1:] - Te)
    Bbs = _B(float(g2.b), times[1:] - Te)

    c = _cov_block(g2, Te)
    mx = -(c["cov_x_ix"] + c["cov_x_iy"])  # E^T[x_T]
    my = -(c["cov_y_iy"] + c["cov_y_ix"])  # E^T[y_T]

    # inner = the factor whose terminal noise moves the bonds more
    if (np.sqrt(c["var_x"]) * np.mean(Bas)
            >= np.sqrt(c["var_y"]) * np.mean(Bbs)):
        m_out, m_in, B_out, B_in = my, mx, Bbs, Bas
        cov2 = np.array([[c["var_y"], c["cov_xy"]],
                         [c["cov_xy"], c["var_x"]]], np.float64)
    else:
        m_out, m_in, B_out, B_in = mx, my, Bas, Bbs
        cov2 = np.array([[c["var_x"], c["cov_xy"]],
                         [c["cov_xy"], c["var_y"]]], np.float64)
    L2 = np.linalg.cholesky(cov2 + 1e-300 * np.eye(2))

    nodes, wts = np.polynomial.hermite.hermgauss(int(n_nodes))
    w1 = wts / np.sqrt(np.pi)
    out = m_out + np.sqrt(2.0) * L2[0, 0] * nodes          # (n,)
    in_mean = m_in + np.sqrt(2.0) * L2[1, 0] * nodes       # (n,)
    # the sqrt(2) converts HERMITE nodes to standard normals — it applies
    # to the outer variable only; the inner integral below is over a
    # STANDARD normal, so its loading is L2[1,1] itself
    s_in = L2[1, 1]

    # per node: val(z2) = c0 + sum_i c_i e^{alpha_i - beta_i z2},
    # c_i < 0, beta_i >= 0 -> monotone increasing in z2
    alpha = (consts[None, :] - B_out[None, :] * out[:, None]
             - B_in[None, :] * in_mean[:, None])           # (n, M)
    beta = s_in * B_in[None, :]                            # (1, M)
    ci = np.asarray(coeffs[1:], np.float64)[None, :]
    c0 = float(coeffs[0])

    def val(z):  # z: (n,) inner bisection iterate
        return c0 + np.sum(ci * np.exp(alpha - beta * z[:, None]), axis=1)

    lo = np.full(out.shape, -60.0)
    hi = np.full(out.shape, 60.0)
    for _ in range(120):
        mid = 0.5 * (lo + hi)
        pos = val(mid) > 0.0
        hi = np.where(pos, mid, hi)
        lo = np.where(pos, lo, mid)
    z_star = 0.5 * (lo + hi)

    from scipy.stats import norm

    # E[(val)^+ | outer]: payer collects z2 > z*, receiver z2 < z*
    terms = ci * np.exp(alpha + 0.5 * beta * beta)
    if payer:
        inner = (c0 * norm.cdf(-z_star)
                 + np.sum(terms * norm.cdf(-(z_star[:, None] + beta)),
                          axis=1))
    else:
        inner = -(c0 * norm.cdf(z_star)
                  + np.sum(terms * norm.cdf(z_star[:, None] + beta),
                           axis=1))
    P0T = np.exp(_ln_bond_const_g2(g2, 0.0, Te))
    return float(P0T * np.sum(w1 * inner))


# ---------------------------------------------------------------------------
# Bermudan LSMC on the (swap value, x, y) state
# ---------------------------------------------------------------------------


def _plane_tables_g2(g2, K, grid_times, exercise_times, pay_times,
                     first_reset, payer):
    """Per-grid-step bond tables for the forward-swap-value plane:
    plane[t] = sum_m w[t,m] e^{-Ba[t,m] x - Bb[t,m] y} (the swap entered
    at the next exercise date >= t; `amcx.rates._plane_tables` with the
    second factor loading)."""
    ex = sorted(float(e) for e in exercise_times)
    M = len(pay_times) + 1
    w = np.zeros((len(grid_times), M))
    Ba = np.zeros((len(grid_times), M))
    Bb = np.zeros((len(grid_times), M))
    sgn = 1.0 if payer else -1.0
    for ti, g in enumerate(grid_times):
        start = next((e for e in ex if e >= g - 1e-9), ex[-1])
        times, coeffs = _swap_coeffs(None, K, start, pay_times, first_reset)
        consts = _ln_bond_const_g2(g2, g, times)
        w[ti, :len(times)] = sgn * coeffs * np.exp(consts)
        Ba[ti, :len(times)] = _B(float(g2.a), times - g)
        Bb[ti, :len(times)] = _B(float(g2.b), times - g)
    return w, Ba, Bb


def _swap_planes_g2(x, y, w, Ba, Bb):
    plane = jnp.zeros_like(x)
    for m_i in range(w.shape[1]):
        plane = plane + w[:, m_i:m_i + 1] * jnp.exp(
            -Ba[:, m_i:m_i + 1] * x - Bb[:, m_i:m_i + 1] * y)
    return plane


def _g2_swaption_setup(g2, K, pay_times, exercise_times, first_reset, payer,
                       n_steps):
    """Validate the schedule and build the grid/plane tables — shared by
    the single-device engines and the shard_map collective route (the
    `amcx.rates._swaption_setup` contract with the second factor)."""
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
    snapped = [dt * s for s in sched_steps] + [T]
    grid_times = dt * np.arange(n_steps + 1)
    w, Ba, Bb = _plane_tables_g2(g2, K, grid_times, snapped, pay_times,
                                 first_reset, payer)
    return T, dt, sched_steps, w, Ba, Bb


@partial(jax.jit, static_argnames=("spec", "antithetic", "return_surface",
                                   "return_coeffs"))
def _g2_engine_impl(plane, x, y, df, allow, spec, antithetic,
                    return_surface=False, return_coeffs=False):
    """Backward induction on the (swap value, x, y) state with pathwise
    discounting — `amcx.rates._swaption_engine_impl` with the second
    factor as a third regression feature (total-degree cross basis).
    ``return_coeffs`` exports the per-step (coeffs, mu, sd) policy in the
    standardization frame `max_call_fit` used — what the OOS replay
    walks."""
    from .models.maxcall import max_call_fit

    n_steps = x.shape[0] - 1
    n_paths = x.shape[1]
    V = jnp.maximum(plane[n_steps], 0.0)

    def step(V, xs):
        p_t, x_t, y_t, df_t, allow_t = xs
        yv = df_t * V
        ex = jnp.maximum(p_t, 0.0)
        X = jnp.stack([p_t, x_t, y_t], axis=-1)
        wgt = ((ex > 0).astype(x.dtype)
               if spec.regress_on == "itm" else None)
        cont, coefs = max_call_fit(X, yv, spec, wgt, mode="total")
        hit = (ex > cont) & (ex > 0) & (allow_t > 0)
        out = None
        if return_surface or return_coeffs:
            frame = None
            if return_coeffs:
                if wgt is None:
                    mu = jnp.mean(X, axis=0)
                    var = jnp.mean(jnp.square(X - mu), axis=0)
                else:
                    ws = jnp.maximum(jnp.sum(wgt), 1e-6)
                    mu = jnp.sum(wgt[:, None] * X, axis=0) / ws
                    var = jnp.sum(wgt[:, None] * jnp.square(X - mu),
                                  axis=0) / ws
                frame = (coefs, mu, jnp.maximum(jnp.sqrt(var), 1e-6))
            out = ((cont, hit) if return_surface else None, frame)
        return jnp.where(hit, ex, yv), out

    V0, ys = lax.scan(step, V, (plane[:n_steps], x[:n_steps], y[:n_steps],
                                df, allow[:n_steps]), reverse=True)
    surface = None
    coeff_export = None
    if return_surface or return_coeffs:
        surf_ys, frame_ys = ys
        if return_coeffs:
            coeff_export = frame_ys
    if return_surface:
        cont_t, hit_t = surf_ys
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


@partial(jax.jit, static_argnames=("spec", "antithetic"))
def _g2_replay_impl(x, y, df, coefs, mu_t, sd_t, alw_full, w, Ba, Bb, spec,
                    antithetic):
    """Forward first-hit walk of the frozen G2 policy on fresh
    (x, y, df) paths — `amcx.rates._swaption_replay_impl` with the
    three-feature frame. Exercise at the first allowed step where the
    replayed rule fires; value = pathwise-discounted exercise value (the
    out-of-sample LOWER bound; the in-sample fit is foresight-biased)."""
    from .models.maxcall import multi_asset_design_matrix

    n_steps = x.shape[0] - 1
    n_paths = x.shape[1]
    dtype = x.dtype

    def plane_at(x_s, y_s, s_i):
        p = jnp.zeros_like(x_s)
        for m_i in range(w.shape[1]):
            p = p + w[s_i, m_i] * jnp.exp(-Ba[s_i, m_i] * x_s
                                          - Bb[s_i, m_i] * y_s)
        return p

    def step(carry, xs):
        D, alive, val = carry
        x_s, y_s, df_prev, s = xs
        s_i = jnp.minimum(s, float(n_steps)).astype(jnp.int32)
        D = D * df_prev
        p = plane_at(x_s, y_s, s_i)
        h = jnp.maximum(p, 0.0)
        c_i = jnp.minimum(s_i, n_steps - 1)
        X = jnp.stack([p, x_s, y_s], axis=-1)
        Xs = (X - mu_t[c_i]) / sd_t[c_i]
        A = multi_asset_design_matrix(
            Xs.reshape(-1, 3), spec.basis, spec.degree, "total")
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
        (x[1:], y[1:], df, ss))
    if antithetic:
        half = n_paths // 2
        stat = 0.5 * (val[:half] + val[half:])
    else:
        stat = val
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(stat.shape[0])
    return price, stderr


def g2_swaption_oos_bound(
    key: jax.Array,
    g2: G2Params,
    K,
    pay_times,
    exercise_times=None,
    first_reset: float | None = None,
    payer: bool = True,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    sim: SimConfig = SimConfig(),
    n_replay: int | None = None,
):
    """Two-pass G2 Bermudan: fit the policy on one key, replay the FROZEN
    rule on a key-disjoint path set — returns ``(fit, oos)`` LSMCResults
    where ``oos`` is a true lower bound (no foresight). ``n_replay``
    defaults to ``sim.n_paths``."""
    k_fit, k_replay = jax.random.split(key)
    fit = price_bermudan_swaption_g2(
        k_fit, g2, K, pay_times, exercise_times, first_reset, payer,
        spec, sim, return_coeffs=True)
    coefs, mu_t, sd_t = fit.coeffs
    T, dt, sched_steps, w, Ba, Bb = _g2_swaption_setup(
        g2, K, pay_times, exercise_times, first_reset, payer, sim.n_steps)
    from .payoff import exercise_allow_row

    alw = (exercise_allow_row(sched_steps, sim.n_steps, jnp.float32)
           if sched_steps else jnp.zeros(sim.n_steps + 1, jnp.float32))
    sim_r = (sim if n_replay is None else
             dataclasses.replace(sim, n_paths=int(n_replay)))
    x, y, df = simulate_g2_rates(k_replay, g2, T, sim_r)
    price, stderr = _g2_replay_impl(
        x, y, df, coefs, mu_t, sd_t, alw, jnp.asarray(w, jnp.float32),
        jnp.asarray(Ba, jnp.float32), jnp.asarray(Bb, jnp.float32), spec,
        sim_r.antithetic)
    return fit, LSMCResult(price, stderr, None, None, None)


def price_bermudan_swaption_g2(
    key: jax.Array,
    g2: G2Params,
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
    """Bermudan payer/receiver swaption by LSMC on the G2++ factors.

    Same contract as `amcx.rates.price_bermudan_swaption` (schedule
    normalization, grid snapping, single-date == European gate), with the
    (swap value, x, y) regression state. ``engine="mega"`` runs the whole
    induction in ONE `amcx.ops.lsmc_ma_mega` kernel (three planes,
    per-path discount planes, in-kernel Bermudan schedule).
    ``return_surface=True`` (xla only) emits the counterparty-value
    surface for `amcx.rates.swaption_ccr_profile`."""
    T, dt, sched_steps, w, Ba, Bb = _g2_swaption_setup(
        g2, K, pay_times, exercise_times, first_reset, payer, sim.n_steps)
    x, y, df = simulate_g2_rates(key, g2, T, sim)
    plane = _swap_planes_g2(x, y, jnp.asarray(w, jnp.float32),
                            jnp.asarray(Ba, jnp.float32),
                            jnp.asarray(Bb, jnp.float32))

    if engine == "mega":
        from .ops.lsmc_ma_mega import lsmc_price_ma_mega

        if return_surface or return_coeffs:
            raise ValueError("return_surface/return_coeffs need "
                             "engine='xla'")
        if sim.n_paths % 4096:
            raise ValueError("engine='mega' needs n_paths divisible by "
                             f"4096, got {sim.n_paths}")
        price, stderr = lsmc_price_ma_mega(
            jnp.stack([plane, x, y], axis=-1), 0.0, 0.0, dt, phi=1.0,
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
    price, stderr, surface, coeffs = _g2_engine_impl(
        plane, x, y, df, allow, spec, sim.antithetic, return_surface,
        return_coeffs)
    return LSMCResult(price, stderr, None, None, surface, coeffs=coeffs)
