"""SABR stochastic volatility: Hagan oracle, MC simulator, American LSMC.

The SABR model (Hagan et al. 2002) on the T-forward F = S e^{(r−q)(T−t)}:

    dF = σ F^β dW,      dσ = ν σ dZ,      d⟨W, Z⟩ = ρ dt,

the desk-standard smile parameterization. The reference repo is GBM-only;
this module completes amcx's stochastic-vol family (Heston `amcx.dynamics`,
rough Bergomi `amcx.roughvol`) with the third canonical member, riding the
same engine matrix.

TPU-first structure:

- The vol factor is EXACTLY lognormal: σ_t = α exp(ν Z_t − ½ν²t) — one
  cumsum over increments, no discretization error in σ.
- For β = 1 the forward recursion is elementwise in (step, path) given the
  left-point vol, so F is a single cumsum (no scan) — the flagship path.
  For β ≠ 1 the CEV term needs F^β per step: a `lax.scan` with absorption
  at 0 (the CEV boundary is attainable for β < 1).
- American exercise regresses on the observable (S_t, σ_t) Markov state
  through the shared two-state tails (`amcx.dynamics.two_state_kernel_tail`)
  — xla / fused (2 kernels/step) / ma-mega (ONE kernel) all apply.

Oracle chain (tests/test_sabr.py): for β=1, ρ=0 the spot is conditionally
lognormal given the vol path with total variance Σ σ_i² dt — the mixing
estimator `sabr_mixing_price` shares that *exact discrete* law, so MC vs
mixing is a sharp 4σ gate; mixing vs `hagan_implied_vol` then isolates the
Hagan approximation error (O(ν²T) terms, documented); ν=0 collapses to
Black–Scholes exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .types import ProductSpec, RegressionSpec, SimConfig

__all__ = [
    "SABRParams",
    "hagan_implied_vol",
    "sabr_european_price",
    "sabr_mixing_price",
    "simulate_sabr",
    "price_option_sabr",
    "calibrate_sabr",
]


@dataclasses.dataclass(frozen=True)
class SABRParams:
    """SABR market + model parameters (``alpha`` = initial vol level σ₀,
    ``beta`` = CEV backbone exponent, ``nu`` = vol-of-vol)."""

    S0: float = 100.0
    r: float = 0.0
    q: float = 0.0
    alpha: float = 0.2
    beta: float = 1.0
    rho: float = 0.0
    nu: float = 0.4

    def __post_init__(self):
        if not 0.0 <= self.beta <= 1.0:
            raise ValueError(f"beta must be in [0, 1], got {self.beta}")
        if not -1.0 <= self.rho <= 1.0:
            raise ValueError(f"rho must be in [-1, 1], got {self.rho}")
        if self.alpha <= 0.0:
            raise ValueError(f"alpha must be positive, got {self.alpha}")
        if self.nu < 0.0:
            raise ValueError(f"nu must be >= 0, got {self.nu}")


def hagan_implied_vol(F, K, T, alpha, beta, rho, nu):
    """Hagan et al. (2002) lognormal implied-vol expansion (vectorized f64).

    The industry-standard smile formula; accurate to O(T) in the correction
    bracket. Validated in tests against the exact conditional-mixing price
    at β=1, ρ=0 (agreement ~a few bp of vol for moderate ν²T).
    """
    F = np.asarray(F, np.float64)
    K = np.asarray(K, np.float64)
    one_b = 1.0 - beta
    logFK = np.log(F / K)
    FKb = (F * K) ** (one_b / 2.0)  # (FK)^{(1−β)/2}
    # series denominator in ln(F/K)
    denom = 1.0 + one_b ** 2 / 24.0 * logFK ** 2 + one_b ** 4 / 1920.0 * logFK ** 4
    # O(T) correction bracket
    corr = 1.0 + (
        one_b ** 2 / 24.0 * alpha ** 2 / FKb ** 2
        + 0.25 * rho * beta * nu * alpha / FKb
        + (2.0 - 3.0 * rho ** 2) / 24.0 * nu ** 2
    ) * T
    if nu == 0.0:
        return alpha / (FKb * denom) * corr
    z = nu / alpha * FKb * logFK
    xz = np.log((np.sqrt(1.0 - 2.0 * rho * z + z * z) + z - rho) / (1.0 - rho))
    # z/x(z) → 1 as z → 0 (ATM); guard the 0/0
    zx = np.where(np.abs(z) < 1e-10, 1.0 - 0.5 * rho * z,
                  z / np.where(np.abs(xz) < 1e-300, 1.0, xz))
    return alpha / (FKb * denom) * zx * corr


def sabr_european_price(sp: SABRParams, K, T, option_type: str = "call"):
    """European price = Black–Scholes at the Hagan implied vol (the desk
    convention: SABR is a smile *parameterization* read through BS)."""
    from .oracle import bs_price

    F = sp.S0 * np.exp((sp.r - sp.q) * T)
    iv = hagan_implied_vol(F, K, T, sp.alpha, sp.beta, sp.rho, sp.nu)
    return bs_price(sp.S0, K, T, sp.r, float(iv), q=sp.q,
                    option_type=option_type)


def _sigma_grid(key, sp, T, sim):
    """Exact lognormal vol at grid times t_0..t_T and the Z increments that
    produced it: σ_{t_i} = α exp(ν Z_{t_i} − ½ν²t_i) (no scheme error)."""
    dtype = sim.jnp_dtype
    n, n_steps = sim.n_paths, sim.n_steps
    dt = float(T) / n_steps
    if sim.antithetic:
        h = jax.random.normal(key, (n_steps, n // 2), dtype)
        Zinc = jnp.concatenate([h, -h], axis=1)
    else:
        Zinc = jax.random.normal(key, (n_steps, n), dtype)
    Zpath = jnp.cumsum(Zinc, axis=0) * np.sqrt(dt)
    t = jnp.asarray(dt * np.arange(1, n_steps + 1), dtype)[:, None]
    sig = sp.alpha * jnp.exp(sp.nu * Zpath - 0.5 * sp.nu ** 2 * t)
    sig = jnp.concatenate(
        [jnp.full((1, n), sp.alpha, dtype), sig])  # t_0 row
    return sig, Zinc


def simulate_sabr(key, sp: SABRParams, T, sim: SimConfig,
                  return_vol: bool = False):
    """Time-major ``(n_steps+1, n_paths)`` SABR SPOT paths.

    The driftless forward F is simulated under SABR (left-point vol; exact
    lognormal σ) and mapped to spot S_t = F_t e^{−(r−q)(T−t)} — with
    deterministic rates the two are the same process up to that factor, and
    the spot is what exercise decisions and the engines' discounting see.
    β=1 is scan-free (one cumsum); β<1 runs a `lax.scan` with absorption
    at F=0 (the attainable CEV boundary).

    ``return_vol`` additionally returns the σ paths (the second LSMC
    regression state). Antithetic mirrors both drivers.
    """
    dtype = sim.jnp_dtype
    n, n_steps = sim.n_paths, sim.n_steps
    dt = float(T) / n_steps
    kz, kw = jax.random.split(jax.random.fold_in(key, 0x5AB2))
    sig, Zinc = _sigma_grid(kz, sp, T, sim)
    if sim.antithetic:
        h = jax.random.normal(kw, (n_steps, n // 2), dtype)
        Winc = jnp.concatenate([h, -h], axis=1)
    else:
        Winc = jax.random.normal(kw, (n_steps, n), dtype)
    rho = jnp.asarray(sp.rho, dtype)
    dW = (rho * Zinc + jnp.sqrt(1.0 - rho * rho) * Winc) * np.sqrt(dt)
    F0 = sp.S0 * np.exp((sp.r - sp.q) * T)
    sig_left = sig[:-1]
    if sp.beta == 1.0:
        inc = sig_left * dW - 0.5 * sig_left ** 2 * dt
        F = F0 * jnp.exp(jnp.concatenate(
            [jnp.zeros((1, n), dtype), jnp.cumsum(inc, axis=0)]))
    else:
        def step(f, sd):
            s_, d_ = sd
            f2 = jnp.maximum(f + s_ * f ** sp.beta * d_, 0.0)
            return f2, f2

        _, Fp = jax.lax.scan(step, jnp.full((n,), F0, dtype),
                             (sig_left, dW))
        F = jnp.concatenate([jnp.full((1, n), F0, dtype), Fp])
    # spot = forward deflated by the remaining carry
    t = jnp.asarray(dt * np.arange(n_steps + 1), dtype)[:, None]
    S = F * jnp.exp(-(sp.r - sp.q) * (float(T) - t))
    if return_vol:
        return S, sig
    return S


def sabr_mixing_price(key, sp: SABRParams, K, T, sim: SimConfig,
                      option_type: str = "call"):
    """Conditional-mixing European estimator for ρ=0: given the vol path,
    F_T is lognormal with variance Σ σ_{t_i}² dt (the SAME discrete law the
    left-point β=1 MC samples), so averaging BS over vol paths is an
    exact-in-discretization, low-variance oracle — the sharp twin for the
    full 2-factor MC in tests. Requires β=1 and ρ=0."""
    from .oracle import bs_price

    if sp.beta != 1.0 or sp.rho != 0.0:
        raise ValueError("mixing estimator requires beta=1, rho=0")
    dt = float(T) / sim.n_steps
    sig, _ = _sigma_grid(jax.random.fold_in(key, 0x5AB2), sp, T, sim)
    # _sigma_grid folds the same tweak as simulate_sabr's split parent; the
    # estimator is law-level, so any healthy stream works
    totvar = jnp.sum(sig[:-1] ** 2, axis=0) * dt
    sig_eff = jnp.sqrt(totvar / T)
    px = bs_price(sp.S0, K, T, sp.r, sig_eff, q=sp.q,
                  option_type=option_type)
    n_eff = sim.n_paths // 2 if sim.antithetic else sim.n_paths
    if sim.antithetic:
        px_pair = 0.5 * (px[:n_eff] + px[n_eff:])
    else:
        px_pair = px
    return (jnp.mean(px_pair),
            jnp.std(px_pair) / np.sqrt(n_eff))


@partial(jax.jit, static_argnames=("sp", "product", "spec", "sim", "engine"))
def _price_sabr_kernel_impl(key, sp, product, spec, sim, engine):
    from .dynamics import two_state_kernel_tail

    S, sig = simulate_sabr(key, sp, product.T, sim, return_vol=True)
    X = jnp.stack([S, sig], axis=-1)
    return two_state_kernel_tail(X, sp.r, product, spec, sim, engine)


def price_option_sabr(
    key,
    sp: SABRParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    return_surface: bool = False,
    engine: str = "xla",
):
    """American/European vanilla under SABR via LSMC on the (S, σ) state.

    (S_t, σ_t) IS the full Markov state here (unlike rough Bergomi), so the
    LSMC policy class is unrestricted. ``engine`` selects the shared
    two-state tails: "xla" scan, "fused" (2 Pallas kernels/step), "mega"
    (ONE ma-mega kernel; American only, n_paths divisible by 4096).
    European prices should prefer `sabr_european_price` (Hagan) — the MC
    route exists for scheme validation and surfaces.
    """
    if product.has_barrier and engine == "fused":
        raise ValueError("SABR barrier pricing runs on engine='xla' or "
                         "'mega' (the fused pair prices vanilla exercise)")
    if engine in ("fused", "mega"):
        if not product.is_american:
            raise ValueError(f"engine={engine!r} prices American only "
                             "(European: use sabr_european_price or "
                             "engine='xla')")
        if return_surface:
            raise ValueError(f"engine={engine!r} emits no continuation "
                             "surface")
        return _price_sabr_kernel_impl(key, sp, product, spec, sim, engine)
    if engine != "xla":
        raise ValueError(f"engine must be 'xla', 'fused', or 'mega', "
                         f"got {engine!r}")
    from .dynamics import two_state_xla_tail

    S, sig = simulate_sabr(key, sp, product.T, sim, return_vol=True)
    X = jnp.stack([S, sig], axis=-1)
    return two_state_xla_tail(X, sp.r, product, spec, return_surface)


def calibrate_sabr(F, T, strikes, ivs, beta: float = 1.0,
                   weights=None) -> SABRParams:
    """Fit (α, ρ, ν) to one smile slice of lognormal implied vols at fixed
    ``beta`` (the desk convention: β is chosen, not fitted) by f64
    least-squares on `hagan_implied_vol`. Returns a `SABRParams` carrying
    the fit with S0=F, r=q=0 (pure smile object)."""
    from scipy.optimize import least_squares

    strikes = np.asarray(strikes, np.float64)
    ivs = np.asarray(ivs, np.float64)
    w = np.ones_like(ivs) if weights is None else np.asarray(weights,
                                                             np.float64)
    atm = float(np.interp(F, strikes, ivs))

    def resid(p):
        a, rho_t, nu_ = p
        rho_ = np.tanh(rho_t)  # keep ρ in (−1, 1) unconstrained-ly
        return w * (hagan_implied_vol(F, strikes, T, a, beta, rho_,
                                      abs(nu_)) - ivs)

    x0 = np.array([atm * F ** (1.0 - beta), 0.0, 0.5])
    sol = least_squares(resid, x0, method="lm", xtol=1e-14, ftol=1e-14)
    a, rho_t, nu_ = sol.x
    return SABRParams(S0=float(F), r=0.0, q=0.0, alpha=float(abs(a)),
                      beta=beta, rho=float(np.tanh(rho_t)),
                      nu=float(abs(nu_)))
