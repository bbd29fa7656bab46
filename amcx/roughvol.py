"""Rough Bergomi stochastic volatility — exact-in-law Volterra simulation.

The rBergomi model (Bayer–Friz–Gatheral 2016) drives variance with a
Riemann–Liouville fractional Brownian motion

    Ṽ_t = √(2H) ∫₀ᵗ (t−s)^{H−1/2} dW_s,
    v_t = ξ₀(t) · exp(η Ṽ_t − ½ η² t^{2H}),
    dS/S = (r−q) dt + √v_t ( ρ dW + √(1−ρ²) dW⊥ ),

with Hurst index H ∈ (0, 1) (H < ½ is the empirically observed "rough"
regime; H = ½ recovers a lognormal-vol model and η = 0 collapses to
Black–Scholes exactly).

TPU-first design — the reference repo has no stochastic-vol machinery at
all (GBM only, `american_monte_carlo.py:72`); this module extends the
`amcx.dynamics` family (Heston/local-vol/Lévy) with the rough regime, and
it does so the way the hardware wants rather than via the per-step hybrid-
scheme convolutions common on CPU:

- The joint Gaussian vector (Ṽ_{t_1..t_T}, ΔW_{1..T}) has a closed-form
  covariance: the Volterra autocovariance reduces by Euler's integral to
  a Gauss hypergeometric,

      Cov(Ṽ_s, Ṽ_t) = 2H/(H+½) · s^{H+½} t^{H−½} ·
                       ₂F₁(½−H, 1; H+3/2; s/t)      (s ≤ t),

  and the Volterra/increment cross-covariance is elementary,

      Cov(Ṽ_{t_i}, ΔW_j) = √(2H)/(H+½) ·
          [ (t_i−t_{j−1})^{H+½} − (t_i−t_j)^{H+½} ]   (j ≤ i, else 0).

  The (2T × 2T) covariance is assembled host-side in f64
  (`scipy.special.hyp2f1`), Cholesky-factored once per (n_steps, T, H)
  and cached; simulation is then ONE MXU matmul `L @ Z` — the paths are
  exact in law at the grid times (no kernel-truncation bias), and the
  whole correlation structure costs a (2T)² × n_paths contraction that
  the systolic array eats for free.
- The spot recursion needs no scan: with left-point variance the log-S
  increments are elementwise in (step, path), so S is a single cumsum —
  the same layout trick as `amcx.paths.simulate_gbm`.

American exercise under rough volatility is genuinely path-dependent —
(S_t, v_t) is NOT a Markov state (that non-Markovianity is the model's
point). `price_option_rbergomi` regresses on (S_t, v_t) exactly like the
Heston route, which prices the best exercise policy *measurable w.r.t.
(S_t, v_t)*: a valid, slightly conservative lower bound whose gap to the
full-information value is small at these horizons (the standard practical
choice in the rough-vol LSMC literature). The docstring of the pricer
restates this so nobody mistakes the restriction for a bug.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .types import ProductSpec, RegressionSpec, SimConfig

__all__ = [
    "RBergomiParams",
    "volterra_covariance",
    "simulate_rbergomi",
    "price_option_rbergomi",
]


@dataclasses.dataclass(frozen=True)
class RBergomiParams:
    """rBergomi market + model parameters.

    ``xi0`` is the flat forward-variance level ξ₀ (a term-structure curve
    can be passed per-call to `simulate_rbergomi` via ``xi0_curve`` as
    values on the simulation grid). ``eta`` is the vol-of-vol, ``rho`` the
    spot/vol correlation, ``H`` the Hurst index.
    """

    S0: float = 100.0
    r: float = 0.0
    q: float = 0.0
    xi0: float = 0.04
    eta: float = 1.9
    rho: float = -0.7
    H: float = 0.1

    def __post_init__(self):
        if not 0.0 < self.H < 1.0:
            raise ValueError(f"H must be in (0, 1), got {self.H}")
        if not -1.0 <= self.rho <= 1.0:
            raise ValueError(f"rho must be in [-1, 1], got {self.rho}")
        if self.xi0 <= 0.0:
            raise ValueError(f"xi0 must be positive, got {self.xi0}")
        if self.eta < 0.0:
            raise ValueError(f"eta must be >= 0, got {self.eta}")


def volterra_covariance(t_grid: np.ndarray, H: float) -> np.ndarray:
    """Exact autocovariance matrix of the RL-Volterra process Ṽ (f64).

    ``t_grid`` are strictly positive times. Uses the ₂F₁ closed form above
    (validated against adaptive quadrature in tests/test_roughvol.py); the
    diagonal is Var Ṽ_t = t^{2H} exactly.
    """
    from scipy.special import hyp2f1

    t = np.asarray(t_grid, np.float64)
    if (t <= 0).any():
        raise ValueError("volterra_covariance needs strictly positive times")
    s_ = np.minimum(t[:, None], t[None, :])
    t_ = np.maximum(t[:, None], t[None, :])
    z = s_ / t_
    cov = (2.0 * H / (H + 0.5)) * s_ ** (H + 0.5) * t_ ** (H - 0.5) * hyp2f1(
        0.5 - H, 1.0, H + 1.5, z)
    np.fill_diagonal(cov, t ** (2.0 * H))
    return cov


@lru_cache(maxsize=32)
def _rbergomi_transform(n_steps: int, T: float, H: float) -> np.ndarray:
    """Cholesky factor L (f64, (2T, 2T)) of the joint (Ṽ, ΔW) covariance.

    Row block 0:T maps standard normals to Ṽ_{t_1..t_T}; block T:2T to the
    Brownian increments ΔW_{1..T} of the *same* W that drives Ṽ (the
    leverage channel). Cached per (n_steps, T, H): the factorization is a
    one-time host-side f64 cost, then every simulation is one matmul.
    """
    n_steps, T, H = int(n_steps), float(T), float(H)
    dt = T / n_steps
    t = dt * np.arange(1, n_steps + 1, dtype=np.float64)
    cov = np.zeros((2 * n_steps, 2 * n_steps), np.float64)
    cov[:n_steps, :n_steps] = volterra_covariance(t, H)
    # Cov(Ṽ_{t_i}, ΔW_j), j <= i (ΔW_j spans (t_{j-1}, t_j])
    a = t[:, None] - np.concatenate([[0.0], t[:-1]])[None, :]  # t_i - t_{j-1}
    b = t[:, None] - t[None, :]                                # t_i - t_j
    mask = b >= 0.0
    cvw = np.where(
        mask,
        (np.sqrt(2.0 * H) / (H + 0.5))
        * (np.maximum(a, 0.0) ** (H + 0.5) - np.maximum(b, 0.0) ** (H + 0.5)),
        0.0,
    )
    cov[:n_steps, n_steps:] = cvw
    cov[n_steps:, :n_steps] = cvw.T
    cov[n_steps:, n_steps:] = dt * np.eye(n_steps)
    try:
        return np.linalg.cholesky(cov)
    except np.linalg.LinAlgError:
        # strictly PD in exact arithmetic (Ṽ is not in the span of the
        # increments); tiny jitter covers f64 rounding at large T/H→0
        jit_ = 1e-12 * np.trace(cov) / (2 * n_steps)
        return np.linalg.cholesky(cov + jit_ * np.eye(2 * n_steps))


def _draw_normals(key, shape, antithetic, dtype):
    if antithetic:
        h = jax.random.normal(key, (*shape[:-1], shape[-1] // 2), dtype)
        return jnp.concatenate([h, -h], axis=-1)
    return jax.random.normal(key, shape, dtype)


def simulate_rbergomi(key, rp: RBergomiParams, T, sim: SimConfig,
                      return_variance: bool = False, xi0_curve=None):
    """Time-major ``(n_steps+1, n_paths)`` rBergomi spot paths.

    Exact in law at the grid times for the (Ṽ, ΔW) pair (joint-covariance
    Cholesky, see module docstring); spot uses the standard left-point
    log-Euler in v — the same scheme as the Heston/local-vol simulators
    (`amcx.dynamics`) so cross-engine comparisons are apples-to-apples.

    ``xi0_curve``: optional forward-variance values ξ₀(t_i) on the grid
    ``i = 0..n_steps`` (overrides the flat ``rp.xi0``). With
    ``return_variance`` also returns the spot-variance paths ``v`` at the
    grid times (the second LSMC regression state).

    Antithetic pairs mirror ALL drivers (joint normals and W⊥), so path j
    pairs with j + n_paths/2 — the layout every engine's pair-folded
    stderr assumes.
    """
    dtype = sim.jnp_dtype
    n, n_steps = sim.n_paths, sim.n_steps
    dt = float(T) / n_steps
    L = jnp.asarray(_rbergomi_transform(n_steps, float(T), float(rp.H)),
                    dtype)
    kj, kp = jax.random.split(jax.random.fold_in(key, 0x5BE6))
    Z = _draw_normals(kj, (2 * n_steps, n), sim.antithetic, dtype)
    X = L @ Z  # one MXU contraction: exact joint (Ṽ, ΔW) sample
    Vt, dW = X[:n_steps], X[n_steps:]

    t = jnp.asarray(dt * np.arange(1, n_steps + 1), dtype)[:, None]
    if xi0_curve is None:
        xi0_t = jnp.asarray(rp.xi0, dtype)
        xi00 = jnp.asarray(rp.xi0, dtype)
    else:
        xi0_curve = jnp.asarray(xi0_curve, dtype)
        if xi0_curve.shape != (n_steps + 1,):
            raise ValueError(
                f"xi0_curve must have shape ({n_steps + 1},), "
                f"got {xi0_curve.shape}")
        xi0_t, xi00 = xi0_curve[1:, None], xi0_curve[0]
    eta = jnp.asarray(rp.eta, dtype)
    v = xi0_t * jnp.exp(eta * Vt - 0.5 * eta * eta * t ** (2.0 * rp.H))
    v_left = jnp.concatenate([jnp.full((1, n), xi00, dtype), v[:-1]])

    Wp = _draw_normals(kp, (n_steps, n), sim.antithetic, dtype)
    rho = jnp.asarray(rp.rho, dtype)
    dB = rho * dW + jnp.sqrt(1.0 - rho * rho) * (np.sqrt(dt) * Wp)
    inc = (rp.r - rp.q - 0.5 * v_left) * dt + jnp.sqrt(v_left) * dB
    logS = jnp.cumsum(inc, axis=0)
    S = rp.S0 * jnp.exp(
        jnp.concatenate([jnp.zeros((1, n), dtype), logS]))
    if return_variance:
        v_full = jnp.concatenate([jnp.full((1, n), xi00, dtype), v])
        return S, v_full
    return S


@partial(jax.jit, static_argnames=("rp", "product", "spec", "sim", "engine"))
def _price_rbergomi_kernel_impl(key, rp, product, spec, sim, engine):
    """Whole fused/mega rBergomi pricing under ONE jit (simulate + stack +
    induction) — same dispatch-amortization lesson as the Heston route
    (`dynamics.two_state_kernel_tail`: eager glue pays one tunnel
    round-trip per op)."""
    from .dynamics import two_state_kernel_tail

    S, v = simulate_rbergomi(key, rp, product.T, sim, return_variance=True)
    X = jnp.stack([S, v], axis=-1)
    return two_state_kernel_tail(X, rp.r, product, spec, sim, engine)


def price_option_rbergomi(
    key,
    rp: RBergomiParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    return_surface: bool = False,
    engine: str = "xla",
):
    """American/European vanilla under rough Bergomi volatility.

    The continuation value is regressed on the observable pair (S_t, v_t)
    with the total-degree cross-term basis — the same machinery as
    `amcx.dynamics.price_option_heston`. Under rough volatility this pair
    is NOT a Markov state, so the fitted exercise rule is the best policy
    measurable w.r.t. (S_t, v_t): the price is a valid lower bound whose
    restriction gap is small in practice (see module docstring). The
    European price has no such caveat (no policy is involved).

    ``engine="fused"`` runs the two fused multi-asset Pallas kernels per
    step; ``engine="mega"`` runs the whole (S, v) induction in ONE kernel
    (`amcx.ops.lsmc_ma_mega`) — both American-only, mirroring the Heston
    route's constraints (n_paths divisible by 4096).
    """
    from .dynamics import two_state_xla_tail

    if product.has_barrier:
        raise ValueError("rBergomi barrier pricing is not implemented")
    if engine in ("fused", "mega"):
        if not product.is_american:
            raise ValueError(f"engine={engine!r} prices American only "
                             "(European needs no induction — use "
                             "engine='xla')")
        if return_surface:
            raise ValueError(f"engine={engine!r} emits no continuation "
                             "surface")
        return _price_rbergomi_kernel_impl(key, rp, product, spec, sim,
                                           engine)
    if engine != "xla":
        raise ValueError(f"engine must be 'xla', 'fused', or 'mega', "
                         f"got {engine!r}")
    S, v = simulate_rbergomi(key, rp, product.T, sim, return_variance=True)
    X = jnp.stack([S, v], axis=-1)
    return two_state_xla_tail(X, rp.r, product, spec, return_surface)
