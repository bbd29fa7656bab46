"""Market calibration: SVI vol surfaces, Dupire local vol, Heston fitting.

The reference ships only a *benchmark oracle* (QuantLib wrappers,
`american_monte_carlo.py:10-68`) — model parameters are hand-picked inputs.
A production pricing framework starts one step earlier: from market quotes.
This module closes that loop for the two non-GBM dynamics `amcx` already
prices (`amcx.dynamics`):

    quotes → :func:`fit_svi_surface` → :func:`dupire_local_vol`
           → `amcx.dynamics.simulate_local_vol` → any LSMC engine

    quotes → :func:`calibrate_heston` → `amcx.dynamics.price_option_heston`

Design choices (deliberate, documented):

- **Calibration runs host-side in numpy f64.** It is a tiny optimization
  (≤ a few hundred residuals, ≤ 6 parameters) that happens once per market
  snapshot — the TPU adds nothing, and f32 would throw away quote precision.
  Levenberg-Marquardt with a central-difference Jacobian
  (:func:`_levenberg_marquardt`) is shared by both calibrators.
- **The calibrated surface is JAX-traceable.** :meth:`SVISurface.total_variance`
  and the σ(t, S) callable returned by :func:`dupire_local_vol` are pure
  `jnp` functions of their (static numpy) parameters, so they trace into
  `simulate_local_vol`'s `lax.scan` and stay differentiable end-to-end for
  the fused-AD Greek route (`amcx.greeks.fused_price_diff`).
- **Dupire via autodiff, not finite differences.** The local variance is
  Gatheral's total-variance form

        σ²(T, y) = ∂_T w / g(y, w, ∂_y w, ∂²_y w),
        g = 1 − (y/w)∂_y w + ¼(−¼ − 1/w + y²/w²)(∂_y w)² + ½ ∂²_y w

  with y = log(K/F_T); the strike derivatives come from `jax.grad` of the
  analytic SVI slice — exact, no bump noise. Floors on w, g and σ² make the
  surface safe in the far wings where raw quotes would imply butterfly
  arbitrage.

Validation (tests/test_calibrate.py): SVI slice fit recovers synthetic
parameters through noise; a flat surface reproduces constant σ through the
whole Dupire pipeline exactly; a skewed surface repriced by local-vol MC
matches the input implied vols within MC tolerance; Heston calibration
recovers a synthetic quote grid to sub-basis-point prices from a perturbed
start.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .dynamics import HestonParams, heston_price_cf

__all__ = [
    "svi_total_variance",
    "fit_svi_slice",
    "SVISurface",
    "fit_svi_surface",
    "dupire_local_vol",
    "calibrate_heston",
    "implied_vol_np",
]


# ---------------------------------------------------------------------------
# Shared host-side optimizer
# ---------------------------------------------------------------------------

def _levenberg_marquardt(resid: Callable[[np.ndarray], np.ndarray],
                         x0: Sequence[float],
                         n_iter: int = 80,
                         lam0: float = 1e-3,
                         fd_rel: float = 1e-6,
                         xtol: float = 1e-12) -> np.ndarray:
    """Damped Gauss-Newton on unconstrained parameters, numpy f64.

    Central-difference Jacobian (the residual functions here are smooth and
    cheap — a Jacobian is 2·dim extra evaluations); multiplicative damping on
    the Gram diagonal (Marquardt scaling) with accept/reject step control.
    """
    x = np.asarray(x0, dtype=np.float64).copy()
    lam = lam0
    r = np.asarray(resid(x), dtype=np.float64)
    cost = float(r @ r)
    for _ in range(n_iter):
        J = np.empty((r.size, x.size))
        for j in range(x.size):
            h = fd_rel * max(1.0, abs(x[j]))
            xp = x.copy(); xp[j] += h
            xm = x.copy(); xm[j] -= h
            J[:, j] = (np.asarray(resid(xp)) - np.asarray(resid(xm))) / (2 * h)
        g = J.T @ r
        H = J.T @ J
        d = np.maximum(np.diag(H), 1e-12)
        accepted = False
        for _ in range(8):  # inner damping search
            try:
                dx = np.linalg.solve(H + lam * np.diag(d), -g)
            except np.linalg.LinAlgError:
                lam *= 10.0
                continue
            r_new = np.asarray(resid(x + dx), dtype=np.float64)
            cost_new = float(r_new @ r_new)
            if np.isfinite(cost_new) and cost_new < cost:
                x = x + dx
                r, cost = r_new, cost_new
                lam = max(lam / 3.0, 1e-12)
                accepted = True
                break
            lam *= 10.0
        if not accepted or float(np.linalg.norm(dx)) < xtol:
            break
    return x


def implied_vol_np(price, S0, K, T, r, q=0.0, option_type: str = "call",
                   n_iter: int = 60) -> np.ndarray:
    """Black-Scholes implied vol, host-side f64 (vectorized Newton with a
    bisection-safeguarded bracket). The on-device twin is
    `amcx.oracle.implied_vol`; this one keeps the calibration objectives in
    full double precision."""
    price = np.asarray(price, np.float64)
    S0, K, T, r, q = np.broadcast_arrays(
        *[np.asarray(a, np.float64) for a in (S0, K, T, r, q)])
    S0, K, T, r, q = [np.broadcast_to(a, price.shape) for a in (S0, K, T, r, q)]
    phi = 1.0 if option_type == "call" else -1.0

    from scipy.stats import norm

    def bs(sig):
        sq = np.maximum(sig * np.sqrt(T), 1e-12)
        d1 = (np.log(S0 / K) + (r - q + 0.5 * sig * sig) * T) / sq
        d2 = d1 - sq
        return phi * (S0 * np.exp(-q * T) * norm.cdf(phi * d1)
                      - K * np.exp(-r * T) * norm.cdf(phi * d2))

    lo = np.full(price.shape, 1e-6)
    hi = np.full(price.shape, 5.0)
    sig = np.full(price.shape, 0.2)
    for _ in range(n_iter):
        val = bs(sig)
        too_low = val < price
        lo = np.where(too_low, sig, lo)
        hi = np.where(too_low, hi, sig)
        sq = np.maximum(sig * np.sqrt(T), 1e-12)
        d1 = (np.log(S0 / K) + (r - q + 0.5 * sig * sig) * T) / sq
        vega = S0 * np.exp(-q * T) * norm.pdf(d1) * np.sqrt(T)
        step = np.where(vega > 1e-12, (price - val) / np.maximum(vega, 1e-12), 0.0)
        cand = sig + step
        inside = (cand > lo) & (cand < hi)
        sig = np.where(inside, cand, 0.5 * (lo + hi))
    return sig


# ---------------------------------------------------------------------------
# SVI surface
# ---------------------------------------------------------------------------

def svi_total_variance(k, a, b, rho, m, s):
    """Raw-SVI total implied variance
    ``w(k) = a + b (ρ(k−m) + sqrt((k−m)² + s²))`` (Gatheral 2004).
    Works on numpy or jnp inputs (pure arithmetic)."""
    km = k - m
    if isinstance(k, jax.Array) or isinstance(km, jax.Array):
        root = jnp.sqrt(km * km + s * s)
    else:
        root = np.sqrt(km * km + s * s)
    return a + b * (rho * km + root)


def _svi_from_z(z):
    """Unconstrained z → feasible raw-SVI (a, b, ρ, m, s):
    b ≥ 0 and s > 0 via softplus, |ρ| < 1 via tanh, a free (wing-positivity
    is enforced by a penalty in the fit, not a hard reparameterization)."""
    a = z[0]
    b = np.logaddexp(0.0, z[1])          # softplus
    rho = np.tanh(z[2])
    m = z[3]
    s = np.logaddexp(0.0, z[4]) + 1e-4
    return a, b, rho, m, s


def _svi_quasi_explicit_init(k, w, wt):
    """Zeliade-style quasi-explicit start: for each (m, s) on a small grid,
    SVI is LINEAR in (a, bρ, b) — solve weighted least squares, project onto
    the feasible cone, keep the best. Avoids the ρ→±1 / s→0 degenerate
    minima a cold Levenberg-Marquardt can fall into."""
    best = (np.inf, None)
    span = max(float(k.max() - k.min()), 0.2)
    for m in np.linspace(float(k.min()), float(k.max()), 9):
        for s in (0.05 * span, 0.1 * span, 0.2 * span, 0.4 * span):
            X = np.stack([np.ones_like(k), k - m,
                          np.sqrt((k - m) ** 2 + s * s)], axis=1)
            coef, *_ = np.linalg.lstsq(X * wt[:, None], w * wt, rcond=None)
            a, c1, b = coef
            b = max(float(b), 1e-6)
            rho = float(np.clip(c1 / b, -0.99, 0.99))
            r = wt * (svi_total_variance(k, a, b, rho, m, s) - w)
            cost = float(r @ r)
            if cost < best[0]:
                best = (cost, (float(a), b, rho, float(m), float(s)))
    a, b, rho, m, s = best[1]
    return np.array([a, np.log(np.expm1(max(b, 1e-6))), np.arctanh(rho), m,
                     np.log(np.expm1(max(s - 1e-4, 1e-6)))])


def fit_svi_slice(k, w, w_weight=None, n_iter: int = 120):
    """Fit one raw-SVI slice to total variances ``w`` at log-moneyness ``k``.

    Quasi-explicit (m, s)-grid + linear-solve initialization, then
    Levenberg-Marquardt refinement. Returns the tuple (a, b, ρ, m, s). A
    soft penalty keeps the minimum of the slice positive
    (min w = a + b·s·√(1−ρ²) at the vertex), so the Dupire transform
    downstream never sees w ≤ 0.
    """
    k = np.asarray(k, np.float64)
    w = np.asarray(w, np.float64)
    wt = np.ones_like(w) if w_weight is None else np.asarray(w_weight, np.float64)
    w_mean = float(np.mean(w))

    def resid(z):
        a, b, rho, m, s = _svi_from_z(z)
        model = svi_total_variance(k, a, b, rho, m, s)
        pen = 50.0 * max(0.0, 1e-6 + 0.05 * w_mean
                         - (a + b * s * np.sqrt(1 - rho * rho)))
        return np.concatenate([wt * (model - w), [pen]])

    z0 = _svi_quasi_explicit_init(k, w, wt)
    z = _levenberg_marquardt(resid, z0, n_iter=n_iter)
    return _svi_from_z(z)


@dataclasses.dataclass(frozen=True)
class SVISurface:
    """A calibrated total-variance surface: raw-SVI slices at ``maturities``
    (sorted ascending), total variance interpolated **linearly in T at fixed
    log-moneyness** (the standard arbitrage-friendly choice: calendar spreads
    stay nonneg whenever the slices are increasing), proportional-in-T
    extrapolation below the first and above the last maturity (keeps
    ∂w/∂T > 0 and w(·, 0) = 0).

    ``maturities`` and ``params`` are host numpy (static data baked into the
    trace); the evaluation methods are jnp-traceable.
    """

    maturities: np.ndarray          # (n_slices,)
    params: np.ndarray              # (n_slices, 5) rows (a, b, rho, m, s)

    def __post_init__(self):
        m = np.asarray(self.maturities, np.float64)
        p = np.asarray(self.params, np.float64)
        if m.ndim != 1 or p.shape != (m.size, 5):
            raise ValueError("maturities (n,) and params (n, 5) required")
        if m.size < 1 or np.any(np.diff(m) <= 0) or m[0] <= 0:
            raise ValueError("maturities must be positive and increasing")
        object.__setattr__(self, "maturities", m)
        object.__setattr__(self, "params", p)

    def _slice_w(self, i, k):
        a, b, rho, m, s = [jnp.asarray(self.params[:, j])[i] for j in range(5)]
        return svi_total_variance(k, a, b, rho, m, s)

    def total_variance(self, k, t):
        """w(k, t), traceable in both arguments; broadcasts k against scalar
        or matching-shape t. Also returns ∂w/∂t (piecewise constant in t)."""
        k = jnp.asarray(k)
        t = jnp.asarray(t)
        mats = jnp.asarray(self.maturities)
        n = self.maturities.size
        if n == 1:
            w1 = self._slice_w(jnp.asarray(0), k)
            w1 = jnp.maximum(w1, 1e-10)
            rate = w1 / mats[0]
            return rate * t, rate
        # interval index: t in [T_i, T_{i+1}) → i, clipped to [0, n-2]
        i = jnp.clip(jnp.searchsorted(mats, t, side="right") - 1, 0, n - 2)
        t_lo, t_hi = mats[i], mats[i + 1]
        w_lo = jnp.maximum(self._slice_w(i, k), 1e-10)
        w_hi = jnp.maximum(self._slice_w(i + 1, k), 1e-10)
        slope = (w_hi - w_lo) / (t_hi - t_lo)
        # proportional extrapolation BOTH beyond the quoted range: below
        # T_0 with slope w_0/T_0 (w(·, 0) = 0) and above T_last with slope
        # w_last/T_last — both strictly positive, so the returned (w, dwdt)
        # pair stays mutually consistent even when a noisy fit puts the
        # last interior interval in (floored) calendar arbitrage.
        below = t < mats[0]
        above = t > mats[-1]
        rate0 = w_lo / t_lo
        rate_hi = w_hi / t_hi
        w_in = w_lo + slope * (t - t_lo)
        w = jnp.where(below, rate0 * t,
                      jnp.where(above, rate_hi * t, w_in))
        dwdt = jnp.where(below, rate0,
                         jnp.where(above, rate_hi,
                                   jnp.maximum(slope, 1e-10)))
        return jnp.maximum(w, 1e-12), dwdt

    def implied_vol(self, K, T, forward):
        """Black-Scholes implied vol at strike K, maturity T given the
        forward F_T (traceable)."""
        k = jnp.log(jnp.asarray(K) / jnp.asarray(forward))
        w, _ = self.total_variance(k, T)
        return jnp.sqrt(w / jnp.asarray(T))


def fit_svi_surface(S0, r, q, maturities, strikes, ivs) -> SVISurface:
    """Fit an :class:`SVISurface` to an implied-vol grid.

    ``strikes``/``ivs`` are (n_mat, n_K) arrays (per-row strike grids are
    allowed — rows are fit independently); log-moneyness is measured against
    the forward F_T = S0·e^{(r−q)T} per slice.
    """
    maturities = np.asarray(maturities, np.float64)
    strikes = np.asarray(strikes, np.float64)
    ivs = np.asarray(ivs, np.float64)
    if strikes.shape != ivs.shape or strikes.shape[0] != maturities.size:
        raise ValueError("strikes and ivs must be (n_maturities, n_strikes)")
    rows = []
    for i, T in enumerate(maturities):
        F = S0 * np.exp((r - q) * T)
        k = np.log(strikes[i] / F)
        w = ivs[i] ** 2 * T
        rows.append(fit_svi_slice(k, w))
    return SVISurface(maturities, np.asarray(rows))


# ---------------------------------------------------------------------------
# Dupire local vol
# ---------------------------------------------------------------------------

def dupire_local_vol(surface: SVISurface, S0, r, q=0.0,
                     var_lo: float = 1e-4, var_hi: float = 4.0,
                     t_floor: float = 1e-4) -> Callable:
    """Local-vol callable ``σ(t, S)`` from a calibrated total-variance
    surface, via Gatheral's Dupire-in-total-variance formula with exact
    autodiff strike derivatives.

    Drops directly into `amcx.dynamics.simulate_local_vol` (and hence every
    LSMC engine and the fused-AD Greek route). Floors: w ≥ 1e-10 (wings),
    denominator g ≥ 0.05 (butterfly-arbitrage guard), σ² clipped to
    [var_lo, var_hi], t floored at ``t_floor`` (the t=0 slice is the
    short-time limit of the proportional extrapolation).
    """
    S0 = float(S0)
    r = float(r)
    q = float(q)

    def sigma_fn(t, S):
        t = jnp.maximum(jnp.asarray(t), t_floor)
        F = S0 * jnp.exp((r - q) * t)
        y = jnp.log(jnp.asarray(S) / F)

        def w_of_y(yy):
            w, dwdt = surface.total_variance(yy, t)
            return w, dwdt

        w_only = lambda yy: w_of_y(yy)[0]
        vag = jax.value_and_grad(w_of_y, has_aux=True)
        if y.ndim == 0:
            (w, dwdt), dwdy = vag(y)
            d2wdy2 = jax.grad(jax.grad(w_only))(y)
        else:
            (w, dwdt), dwdy = jax.vmap(vag)(y)
            d2wdy2 = jax.vmap(jax.grad(jax.grad(w_only)))(y)
        w = jnp.maximum(w, 1e-10)
        g = (1.0 - (y / w) * dwdy
             + 0.25 * (-0.25 - 1.0 / w + (y * y) / (w * w)) * dwdy * dwdy
             + 0.5 * d2wdy2)
        var = dwdt / jnp.maximum(g, 0.05)
        return jnp.sqrt(jnp.clip(var, var_lo, var_hi))

    return sigma_fn


# ---------------------------------------------------------------------------
# Heston calibration
# ---------------------------------------------------------------------------

def _heston_from_z(z, S0, r, q):
    v0, kappa, theta, xi = np.exp(z[:4])
    rho = float(np.tanh(z[4]))
    return HestonParams(S0=S0, r=r, q=q, v0=float(v0), kappa=float(kappa),
                        theta=float(theta), xi=float(xi), rho=rho)


def calibrate_heston(S0, r, q, maturities, strikes, prices,
                     option_type: str = "call",
                     hp0: HestonParams | None = None,
                     weight: str = "vega",
                     n_iter: int = 60) -> HestonParams:
    """Fit Heston (v0, κ, θ, ξ, ρ) to a European quote grid.

    ``maturities`` (n_mat,), ``strikes``/``prices`` (n_mat, n_K). Residuals
    are price differences, vega-weighted by default (≈ implied-vol space,
    the desk-standard objective, without inverting BS inside the loop).
    Positivity via log-parameterization, |ρ|<1 via tanh; the objective is
    the trusted host-side CF oracle (`amcx.dynamics.heston_price_cf`), so
    the calibration is f64 end-to-end.
    """
    maturities = np.asarray(maturities, np.float64)
    strikes = np.asarray(strikes, np.float64)
    prices = np.asarray(prices, np.float64)
    if strikes.shape != prices.shape or strikes.shape[0] != maturities.size:
        raise ValueError("strikes and prices must be (n_maturities, n_strikes)")
    if hp0 is None:
        hp0 = HestonParams(S0=S0, r=r, q=q, v0=0.04, kappa=1.5, theta=0.04,
                           xi=0.5, rho=-0.5)

    if weight == "vega":
        from scipy.stats import norm
        iv = implied_vol_np(prices, S0, strikes,
                            maturities[:, None], r, q, option_type)
        sq = np.maximum(iv, 1e-3) * np.sqrt(maturities[:, None])
        d1 = (np.log(S0 / strikes) + (r - q) * maturities[:, None]) / sq + 0.5 * sq
        wts = 1.0 / np.maximum(
            S0 * np.exp(-q * maturities[:, None]) * norm.pdf(d1)
            * np.sqrt(maturities[:, None]), 1e-3 * S0)
    elif weight == "price":
        wts = np.ones_like(prices)
    else:
        raise ValueError(f"weight must be 'vega' or 'price', got {weight!r}")

    def resid(z):
        hp = _heston_from_z(z, S0, r, q)
        model = np.array([
            [heston_price_cf(hp, K, T, option_type) for K in strikes[i]]
            for i, T in enumerate(maturities)])
        return (wts * (model - prices)).ravel()

    z0 = np.array([np.log(hp0.v0), np.log(hp0.kappa), np.log(hp0.theta),
                   np.log(max(hp0.xi, 1e-3)), np.arctanh(np.clip(hp0.rho, -0.999, 0.999))])
    z = _levenberg_marquardt(resid, z0, n_iter=n_iter, fd_rel=1e-5)
    return _heston_from_z(z, S0, r, q)
