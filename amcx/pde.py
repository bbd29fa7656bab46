"""Finite-difference (PDE) vanilla pricer — the lattice-free second engine
family.

The reference validates its LSMC against QuantLib's binomial engines
(`/root/reference/american_monte_carlo.py:10-68`); amcx already re-implements
those as scanned CRR trees (`amcx.oracle`) plus an independent f64 C++ twin.
This module adds a *third* independent methodology: Crank-Nicolson finite
differences on a uniform log-spot grid, designed TPU-first —

- **Parallel cyclic reduction (PCR)** for the tridiagonal solves: ceil(log2 N)
  full-grid-width vector rounds instead of a 2N-step sequential Thomas sweep.
  Every round is a handful of shifted elementwise ops, so the whole solve
  maps onto the VPU with no sequential scalar chain; batched right-hand
  sides (strike ladders) broadcast for free.
- **Ikonen-Toivanen operator splitting** for the American early-exercise
  constraint: one unconstrained tridiagonal solve plus one pointwise
  complementarity update per step — no PSOR iteration, no data-dependent
  loop, so the whole backward induction is a single `lax.scan`.
- **Rannacher startup** (implicit-Euler first steps) to damp the payoff-kink
  oscillation that plain CN injects into delta/gamma.
- **Term-structure aware**: `r/sigma/q` may each be scalars or per-step
  arrays (the same forward-interval convention as `amcx.term.TermCurves`),
  so the PDE prices under deterministic curves and cross-checks
  `amcx.term.price_option_curves`.
- **Differentiable end to end**: the solve is pure `jnp`, so vega/rho come
  from `jax.grad` through the time scan (grid held fixed — its endpoints
  only move the O(dx^2) truncation error).

Accuracy model: CN is O(dt^2 + dx^2); with the strike placed mid-cell the
dominant error is the quantization of the payoff kink. At the default
1024 x 256 grid the European f32 price sits within ~2e-4 of Black-Scholes
and the American put within ~1e-3 of CRR-2000 (see tests/test_pde.py and
the on-chip gates).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "PDEGrid",
    "PDEResult",
    "tridiag_solve",
    "pde_price",
    "pde_price_ladder",
    "pde_greeks",
]


@dataclasses.dataclass(frozen=True)
class PDEGrid:
    """Static finite-difference discretization.

    ``n_space`` is the number of log-spot nodes (lane-friendly powers of two
    keep the PCR rounds exact), ``n_steps`` the number of time steps,
    ``n_std`` the half-width of the grid in total-volatility units around
    spot and strike, ``rannacher`` the number of leading implicit-Euler
    steps, ``theta`` the scheme weight for the remaining steps (0.5 = CN).
    """

    n_space: int = 1024
    n_steps: int = 256
    n_std: float = 6.0
    rannacher: int = 2
    theta: float = 0.5

    def __post_init__(self):
        if self.n_space < 8:
            raise ValueError("n_space must be >= 8")
        if self.n_steps < 1:
            raise ValueError("n_steps must be >= 1")
        if not 0.0 <= self.theta <= 1.0:
            raise ValueError("theta must be in [0, 1]")


@dataclasses.dataclass(frozen=True)
class PDEResult:
    """Price and grid Greeks read off the time-0 value plane."""

    price: jax.Array
    delta: jax.Array
    gamma: jax.Array
    theta: jax.Array  # calendar theta dV/dt (per year, at t=0)
    x: jax.Array  # log-spot grid (n_space,)
    values: jax.Array  # time-0 value plane V(x) (n_space,)


def _shift(v, s, fill):
    """out[..., i] = v[..., i - s] (s may be negative), `fill` off the end."""
    pad = jnp.full(v.shape[:-1] + (abs(s),), jnp.asarray(fill, v.dtype),
                   v.dtype)
    if s > 0:
        return jnp.concatenate([pad, v[..., :-s]], axis=-1)
    return jnp.concatenate([v[..., -s:], pad], axis=-1)


def tridiag_solve(a, b, c, d):
    """Solve tridiagonal systems by parallel cyclic reduction.

    ``a``/``b``/``c`` are the sub/main/super diagonals and ``d`` the right
    hand side, all shaped ``(..., N)`` (``a[..., 0]`` and ``c[..., -1]`` are
    ignored — set them to zero). Batch dimensions broadcast. PCR runs
    ceil(log2 N) rounds of full-width shifted elementwise updates — each
    round halves the bandwidth-in-index-space — after which the system is
    diagonal. Stable for the diagonally dominant systems a theta-scheme
    produces; no pivoting.
    """
    d = jnp.asarray(d)
    n = d.shape[-1]
    a = jnp.broadcast_to(jnp.asarray(a, d.dtype), d.shape)
    b = jnp.broadcast_to(jnp.asarray(b, d.dtype), d.shape)
    c = jnp.broadcast_to(jnp.asarray(c, d.dtype), d.shape)
    one = jnp.ones((), d.dtype)
    zero = jnp.zeros((), d.dtype)

    shift = _shift
    # Boundary hygiene: the first sub- and last super-diagonal entries are
    # structurally absent.
    a = a.at[..., 0].set(zero)
    c = c.at[..., -1].set(zero)

    n_rounds = max(1, math.ceil(math.log2(n)))
    s = 1
    for _ in range(n_rounds):
        bm = shift(b, s, one)
        am = shift(a, s, zero)
        cm = shift(c, s, zero)
        dm = shift(d, s, zero)
        bp = shift(b, -s, one)
        ap = shift(a, -s, zero)
        cp = shift(c, -s, zero)
        dp = shift(d, -s, zero)
        alpha = -a / bm
        gamma = -c / bp
        b = b + alpha * cm + gamma * ap
        d = d + alpha * dm + gamma * dp
        a = alpha * am
        c = gamma * cp
        s *= 2
    return d / b


def _as_step_array(v, n_steps, dtype):
    arr = jnp.asarray(v, dtype)
    if arr.ndim == 0:
        return jnp.full((n_steps,), arr, dtype)
    if arr.shape != (n_steps,):
        raise ValueError(f"per-step coefficient must be scalar or ({n_steps},), got {arr.shape}")
    return arr


@partial(
    jax.jit,
    static_argnames=("n_steps", "option_type", "american", "rannacher",
                     "theta_w", "with_divs"),
)
def _pde_core(
    x,
    K,
    T,
    r_t,
    sigma_t,
    q_t,
    exercise_mask,
    *,
    n_steps,
    option_type,
    american,
    rannacher,
    theta_w,
    with_divs=False,
    div_t=None,
):
    """Backward induction on the log-spot grid; returns (V0, V_dt) planes.

    ``r_t``/``sigma_t``/``q_t`` are forward-interval arrays of length
    ``n_steps`` (``r_t[i]`` rules [t_i, t_{i+1}], as `amcx.term`);
    ``exercise_mask`` is a per-step 0/1 vector applied when ``american`` is
    False (Bermudan projection dates); Americans apply the Ikonen-Toivanen
    splitting every step.

    ``with_divs`` (static) enables discrete CASH dividends: ``div_t[i]`` is
    the amount dropping at grid boundary ``t_{i+1}`` (the `amcx.dividends`
    snap convention). Going backward, the jump condition
    ``V_cum(S, t⁻) = V_ex(S − D, t)`` is applied by linear interpolation in
    S BEFORE diffusing across [t_i, t_{i+1}] — including the maturity
    boundary, where it composes with the (ex-dividend) payoff plane.
    """
    dtype = x.dtype
    n = x.shape[-1]
    dx = x[1] - x[0]
    dt = jnp.asarray(T, dtype) / n_steps
    K = jnp.asarray(K, dtype)

    s_grid = jnp.exp(x)
    phi = 1.0 if option_type == "call" else -1.0
    psi = jnp.maximum(phi * (s_grid - K), 0.0)

    # tau-indexed coefficient arrays: step m advances tau from m*dt to
    # (m+1)*dt, i.e. forward interval n_steps-1-m.
    r_rev = r_t[::-1]
    q_rev = q_t[::-1]
    sig_rev = sigma_t[::-1]
    mask_rev = exercise_mask[::-1].astype(dtype)

    # Cumulative integrals over [T - tau, T] for the far-field boundary
    # asymptotics: int_r[m] = sum of r over the first m+1 tau-steps.
    int_r = jnp.cumsum(r_rev) * dt
    int_q = jnp.cumsum(q_rev) * dt

    s_lo = s_grid[0]
    s_hi = s_grid[-1]
    if with_divs:
        # far-field forward must shed the dividends remaining between the
        # boundary time and T: the spot term picks up Π(1−f_j) over the
        # remaining proportional drops, and each remaining cash D_j (at
        # τ = j·dt) is discounted over [τ_j, τ_{m+1}] and shed by the
        # proportional drops calendar-AFTER it (rev indices < j).
        cash_rev = div_t[::-1, 0].astype(dtype)
        frac_rev = div_t[::-1, 1].astype(dtype)
        fwd_f = jnp.cumprod(1.0 - frac_rev)
        shed_after = jnp.concatenate(
            [jnp.ones((1,), dtype), fwd_f[:-1]])
        cum_j = jnp.concatenate([jnp.zeros((1,), dtype), int_r[:-1]])
        rem = jnp.exp(-int_r) * jnp.cumsum(
            cash_rev * jnp.exp(cum_j) * shed_after)
    else:
        rem = jnp.zeros((n_steps,), dtype)
        fwd_f = jnp.ones((n_steps,), dtype)
    euro_lo = jnp.maximum(
        phi * (s_lo * jnp.exp(-int_q) * fwd_f - rem
               - K * jnp.exp(-int_r)), 0.0)
    euro_hi = jnp.maximum(
        phi * (s_hi * jnp.exp(-int_q) * fwd_f - rem
               - K * jnp.exp(-int_r)), 0.0)
    if american:
        bc_lo = jnp.maximum(euro_lo, psi[0])
        bc_hi = jnp.maximum(euro_hi, psi[-1])
    else:
        bc_lo = euro_lo
        bc_hi = euro_hi

    thetas = jnp.where(
        jnp.arange(n_steps) < rannacher,
        jnp.ones((), dtype),
        jnp.asarray(theta_w, dtype),
    )

    interior = (jnp.arange(n) > 0) & (jnp.arange(n) < n - 1)
    inv_dx2 = 1.0 / (dx * dx)
    inv_2dx = 0.5 / dx

    shift = _shift
    def body(carry, xs):
        v, lam = carry
        if with_divs:
            r_m, q_m, sig_m, th, bcl, bch, allow, d_m = xs
            # jump condition at the step's END boundary: the cum-dividend
            # value at S equals the ex-dividend value at S(1−f) − D
            # (linear interp on the uneven s-grid; flat extrapolation to
            # v[0] below the grid). d_m == (0, 0) reproduces v at grid
            # points.
            s_shift = jnp.maximum(s_grid * (1.0 - d_m[1]) - d_m[0],
                                  s_grid[0])
            v = jnp.interp(s_shift, s_grid, v)
            lam = jnp.interp(s_shift, s_grid, lam)
        else:
            r_m, q_m, sig_m, th, bcl, bch, allow = xs
        sig2 = sig_m * sig_m
        mu = r_m - q_m - 0.5 * sig2
        lo = 0.5 * sig2 * inv_dx2 - mu * inv_2dx
        di = -sig2 * inv_dx2 - r_m
        up = 0.5 * sig2 * inv_dx2 + mu * inv_2dx

        # f32 hygiene: (a) apply L difference-first — the second/first
        # differences cancel BEFORE the 1/dx^2 coefficients scale them up;
        # (b) solve for the step INCREMENT delta = v_tilde - v, which is
        # O(dt) small, instead of for v itself:
        #   (I - th dt L) delta = dt L v + dt lam.
        # Both moves keep the per-step roundoff at eps*|v| instead of
        # eps*|v|/dx^2 (measured: the direct form stopped converging past
        # 1024 nodes; this form converges to ~2e-4 at 2048x512 in f32).
        vp = shift(v, -1, 0.0)
        vm = shift(v, 1, 0.0)
        d2 = (vp - v) - (v - vm)
        d1 = vp - vm
        lv = 0.5 * sig2 * inv_dx2 * d2 + mu * inv_2dx * d1 - r_m * v
        lam_dt = dt * lam if american else jnp.zeros_like(v)
        rhs = dt * lv + lam_dt

        coef = -th * dt
        a = jnp.where(interior, coef * lo, 0.0)
        b = jnp.where(interior, 1.0 - th * dt * di, 1.0)
        c = jnp.where(interior, coef * up, 0.0)
        rhs = rhs.at[0].set(bcl - v[0]).at[-1].set(bch - v[-1])

        delta = tridiag_solve(a, b, c, rhs)
        v_tilde = v + delta

        if american:
            cand = v_tilde - dt * lam
            v_new = jnp.maximum(psi, cand)
            lam = jnp.maximum(0.0, lam + (psi - v_tilde) / dt)
        else:
            v_new = jnp.where(allow > 0, jnp.maximum(psi, v_tilde), v_tilde)
        v_new = v_new.at[0].set(bcl).at[-1].set(bch)
        return (v_new, lam), v_new[0] * 0.0

    init = (psi, jnp.zeros_like(psi))
    if with_divs:
        div_rev = div_t[::-1].astype(dtype)
        xs = (r_rev, q_rev, sig_rev, thetas, bc_lo, bc_hi, mask_rev,
              div_rev)
    else:
        xs = (r_rev, q_rev, sig_rev, thetas, bc_lo, bc_hi, mask_rev)

    # Run all but the last step, keep the dt-plane for calendar theta.
    xs_head = jax.tree_util.tree_map(lambda t: t[:-1], xs)
    xs_last = jax.tree_util.tree_map(lambda t: t[-1], xs)
    (v_dt, lam), _ = lax.scan(body, init, xs_head)
    (v0, _), _ = body((v_dt, lam), xs_last)
    return v0, v_dt


def _prep(market, product, grid, r=None, sigma=None, q=None, dtype=jnp.float32):
    """Concrete grid construction (host side; spot pinned on a node)."""
    S0 = float(market.S0)
    K = float(product.K)
    T = float(product.T)
    n = grid.n_space
    sig_arr = sigma if sigma is not None else market.sigma
    sig_bar = float(jnp.sqrt(jnp.mean(jnp.asarray(sig_arr, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) ** 2)))
    half = grid.n_std * sig_bar * math.sqrt(T) + 1e-6
    lo = min(math.log(S0), math.log(K)) - half
    hi = max(math.log(S0), math.log(K)) + half
    dx = (hi - lo) / (n - 1)
    i0 = int(round((math.log(S0) - lo) / dx))
    i0 = min(max(i0, 2), n - 3)
    lo = math.log(S0) - i0 * dx
    x = lo + dx * jnp.arange(n, dtype=dtype)
    return x, i0


def _result_from_planes(v0, v_dt, x, i0, S0, dt):
    dx = x[1] - x[0]
    price = v0[i0]
    dvdx = (v0[i0 + 1] - v0[i0 - 1]) / (2.0 * dx)
    d2vdx2 = (v0[i0 + 1] - 2.0 * v0[i0] + v0[i0 - 1]) / (dx * dx)
    delta = dvdx / S0
    gamma = (d2vdx2 - dvdx) / (S0 * S0)
    theta_cal = (v_dt[i0] - v0[i0]) / dt  # dV/dt = -dV/dtau
    return PDEResult(price=price, delta=delta, gamma=gamma, theta=theta_cal, x=x, values=v0)


def pde_price(
    market,
    product,
    grid: PDEGrid = PDEGrid(),
    *,
    r_t=None,
    sigma_t=None,
    q_t=None,
    exercise_steps=None,
    dividends=None,
    dtype=jnp.float32,
) -> PDEResult:
    """Price a vanilla option by Crank-Nicolson finite differences.

    ``market``/``product`` are the standard amcx configs; ``r_t``/``sigma_t``
    /``q_t`` optionally override the flat market scalars with per-step
    forward-interval curves of length ``grid.n_steps`` (the `amcx.term`
    convention). ``exercise_steps`` restricts early exercise to a subset of
    time steps (Bermudan projection); ``product.exercise`` picks
    European/American otherwise. ``dividends`` (an
    `amcx.dividends.DividendSchedule` or ``(times, amounts)`` pair) adds
    discrete cash dividends via the backward jump condition
    ``V(S, t⁻) = V(S − D, t)`` — the oracle leg of `amcx.dividends`.

    Role parity: the validation engines of the reference closure
    (`/root/reference/american_monte_carlo.py:30-68`) — here as an
    independent PDE methodology rather than a binomial tree.
    """
    n_steps = grid.n_steps
    r_arr = _as_step_array(market.r if r_t is None else r_t, n_steps, dtype)
    q_arr = _as_step_array(market.q if q_t is None else q_t, n_steps, dtype)
    sig_arr = _as_step_array(market.sigma if sigma_t is None else sigma_t, n_steps, dtype)

    american = product.is_american and exercise_steps is None
    mask = jnp.zeros((n_steps,), dtype)
    if exercise_steps is not None:
        mask = mask.at[jnp.asarray(exercise_steps)].set(1.0)

    div_t = None
    if dividends is not None:
        from .dividends import dividend_step_amounts

        div_t = jnp.asarray(
            dividend_step_amounts(dividends, product.T, n_steps), dtype)

    x, i0 = _prep(market, product, grid, sigma=sig_arr, dtype=dtype)
    v0, v_dt = _pde_core(
        x,
        product.K,
        product.T,
        r_arr,
        sig_arr,
        q_arr,
        mask,
        n_steps=n_steps,
        option_type=product.option_type,
        american=american,
        rannacher=grid.rannacher,
        theta_w=grid.theta,
        with_divs=dividends is not None,
        div_t=div_t,
    )
    dt = jnp.asarray(product.T, dtype) / n_steps
    return _result_from_planes(v0, v_dt, x, i0, float(market.S0), dt)


def pde_price_ladder(
    market,
    product,
    strikes,
    grid: PDEGrid = PDEGrid(),
    *,
    dtype=jnp.float32,
):
    """Price a strike ladder on one shared grid (vmapped solves).

    The operator depends only on the market, so the ladder shares the grid
    and the PCR reduction pattern; only the payoff/boundary planes differ.
    Returns prices shaped like ``strikes``.
    """
    strikes = jnp.asarray(strikes, dtype)
    n_steps = grid.n_steps
    r_arr = _as_step_array(market.r, n_steps, dtype)
    q_arr = _as_step_array(market.q, n_steps, dtype)
    sig_arr = _as_step_array(market.sigma, n_steps, dtype)
    mask = jnp.zeros((n_steps,), dtype)

    # Shared grid spanning spot and the whole ladder.
    S0 = float(market.S0)
    T = float(product.T)
    k_lo = float(jnp.min(strikes))
    k_hi = float(jnp.max(strikes))
    half = grid.n_std * float(market.sigma) * math.sqrt(T) + 1e-6
    lo = min(math.log(S0), math.log(k_lo)) - half
    hi = max(math.log(S0), math.log(k_hi)) + half
    n = grid.n_space
    dx = (hi - lo) / (n - 1)
    i0 = int(round((math.log(S0) - lo) / dx))
    i0 = min(max(i0, 2), n - 3)
    lo = math.log(S0) - i0 * dx
    x = lo + dx * jnp.arange(n, dtype=dtype)

    def one(k):
        v0, _ = _pde_core(
            x,
            k,
            product.T,
            r_arr,
            sig_arr,
            q_arr,
            mask,
            n_steps=n_steps,
            option_type=product.option_type,
            american=product.is_american,
            rannacher=grid.rannacher,
            theta_w=grid.theta,
        )
        return v0[i0]

    return jax.vmap(one)(strikes)


def pde_greeks(market, product, grid: PDEGrid = PDEGrid(), *,
               dividends=None, dtype=jnp.float32):
    """Delta/gamma/theta from the grid plus vega/rho by autodiff.

    The grid is held fixed while differentiating with respect to sigma and r
    (its endpoints only shift the O(dx^2) truncation error). Returns a dict
    with price, delta, gamma, theta, vega, rho. ``dividends`` adds the
    discrete-cash jump condition (rho correctly picks up the remaining-
    dividend discounting through autodiff)."""
    n_steps = grid.n_steps
    x, i0 = _prep(market, product, grid, dtype=dtype)
    q_arr = _as_step_array(market.q, n_steps, dtype)
    mask = jnp.zeros((n_steps,), dtype)
    american = product.is_american

    div_t = None
    if dividends is not None:
        from .dividends import dividend_step_amounts

        div_t = jnp.asarray(
            dividend_step_amounts(dividends, product.T, n_steps), dtype)

    def price_of(sig, r):
        v0, v_dt = _pde_core(
            x,
            product.K,
            product.T,
            jnp.full((n_steps,), jnp.asarray(r, dtype)),
            jnp.full((n_steps,), jnp.asarray(sig, dtype)),
            q_arr,
            mask,
            n_steps=n_steps,
            option_type=product.option_type,
            american=american,
            rannacher=grid.rannacher,
            theta_w=grid.theta,
            with_divs=dividends is not None,
            div_t=div_t,
        )
        return v0[i0], (v0, v_dt)

    # ONE forward solve: value_and_grad with the planes as aux feeds the
    # grid Greeks from the same pass the autodiff differentiates.
    (_, (v0, v_dt)), (vega, rho) = jax.value_and_grad(
        price_of, argnums=(0, 1), has_aux=True
    )(jnp.asarray(market.sigma, dtype), jnp.asarray(market.r, dtype))
    dt = jnp.asarray(product.T, dtype) / n_steps
    res = _result_from_planes(v0, v_dt, x, i0, float(market.S0), dt)
    return {
        "price": res.price,
        "delta": res.delta,
        "gamma": res.gamma,
        "theta": res.theta,
        "vega": vega,
        "rho": rho,
    }
