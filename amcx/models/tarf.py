"""Target redemption forwards (TARF / TRF accumulators).

Structured-forward family beyond the reference
(`/root/reference/american_monte_carlo.py:85-86` covers vanilla options
only): a strip of leveraged forward fixings that KNOCKS OUT once the
buyer's accumulated gains reach a target — the flagship FX/equity
accumulator product.

Exact contract (pinned; the f64 twin and the analytic no-target limit
implement the same semantics):

- Fixing dates ``t_i = i·T/n_fix``, ``i = 1..n_fix``, on the simulation
  grid (``sim.n_steps % n_fix == 0``).
- Cashflow at fixing ``i`` (per unit notional): the buyer receives the
  gain ``G_i = max(S_i − K, 0)`` and pays the leveraged loss
  ``L·max(K − S_i, 0)`` (``leverage=1`` makes it a plain forward strip).
- Accumulator: ``A_i = Σ_{j<=i} G_j`` counts GAINS ONLY (market
  standard). The product terminates at the first fixing with
  ``A_i >= target``. Breach-date treatment (``knock``):
  * ``"full"``  — the breaching gain is paid in full, then the strip ends;
  * ``"capped"`` — only ``target − A_{i−1}`` of the breaching gain is paid
    (exact-target variant);
  * ``"none"``  — no knockout (``target`` ignored): the TARF degenerates
    to the analytic strip ``Σ_i df_i·(call_i − L·put_i)`` of undiscounted
    Black-Scholes forward values — the EXACT oracle gate.
- Losses never knock out and are paid in full on every live fixing
  (including the breaching one — the loss leg dies only after the breach).
- Discounting at the flat ``market.r``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..paths import simulate_gbm
from ..types import MarketParams, SimConfig

__all__ = ["TARFSpec", "price_tarf", "tarf_mc_anchor", "tarf_strip_value"]


@dataclasses.dataclass(frozen=True)
class TARFSpec:
    """TARF contract: strike ``K``, maturity ``T``, ``n_fix`` fixings,
    gain ``target``, loss ``leverage``, breach treatment ``knock``."""

    K: float
    T: float
    n_fix: int
    target: float = np.inf
    leverage: float = 2.0
    knock: str = "full"  # "full" | "capped" | "none"

    def __post_init__(self):
        if self.n_fix < 1:
            raise ValueError(f"n_fix must be >= 1, got {self.n_fix}")
        if self.knock not in ("full", "capped", "none"):
            raise ValueError(f"knock must be full|capped|none, got {self.knock!r}")


def _tarf_payout(S_fix, spec: TARFSpec, r, T):
    """Discounted-to-0 payout per path from the fixing-date spots
    ``(n_fix, n_paths)``. Shared by the JAX route (jnp arrays in) and the
    f64 twin (np arrays in) — both backends implement the ops used here."""
    xp = jnp if isinstance(S_fix, jnp.ndarray) else np
    dtype = S_fix.dtype
    t_fix = (xp.arange(1, spec.n_fix + 1, dtype=dtype)
             * (T / spec.n_fix))[:, None]
    df = xp.exp(xp.asarray(-r, dtype) * t_fix)
    gains = xp.maximum(S_fix - spec.K, 0.0)
    losses = xp.maximum(spec.K - S_fix, 0.0)
    if spec.knock == "none" or not np.isfinite(spec.target):
        return xp.sum(df * (gains - spec.leverage * losses), axis=0)
    A = xp.cumsum(gains, axis=0)
    A_prev = xp.concatenate(
        [xp.zeros((1,) + S_fix.shape[1:], dtype), A[:-1]], 0)
    live = A_prev < spec.target            # fixing i pays iff not yet knocked
    breach = live & (A >= spec.target)     # one-hot breaching fixing
    if spec.knock == "capped":
        paid_gain = xp.where(breach, spec.target - A_prev, gains)
    else:
        paid_gain = gains
    cf = xp.where(live, paid_gain - spec.leverage * losses, 0.0)
    return xp.sum(df * cf, axis=0)


@partial(jax.jit, static_argnames=("spec", "sim"))
def _price_tarf_impl(key, market_tuple, spec, sim):
    S0, r, sigma, q = market_tuple
    paths = simulate_gbm(key, MarketParams(S0, r, sigma, q), spec.T, sim)
    stride = (paths.shape[0] - 1) // spec.n_fix
    payout = _tarf_payout(paths[stride::stride], spec, r, spec.T)
    if sim.antithetic:
        half = sim.n_paths // 2
        stat = 0.5 * (payout[:half] + payout[half:])
    else:
        stat = payout
    return jnp.mean(stat), jnp.std(stat) / jnp.sqrt(float(stat.shape[0]))


def price_tarf(key, market: MarketParams, spec: TARFSpec, sim: SimConfig):
    """Monte-Carlo TARF value per unit notional ``(price, stderr)`` —
    decision-free, fused into the pathgen epilogue like the autocall."""
    if sim.n_steps % spec.n_fix:
        raise ValueError(
            f"sim.n_steps ({sim.n_steps}) must be a multiple of n_fix "
            f"({spec.n_fix})")
    from .autocall import NoteResult

    price, stderr = _price_tarf_impl(key, market.astuple(), spec, sim)
    return NoteResult(price, stderr)


def tarf_mc_anchor(market: MarketParams, spec: TARFSpec, n_paths: int = 1_000_000,
                   seed: int = 29):
    """Exact f64 NumPy twin (fixing-date GBM marginals drawn directly —
    the payout only reads fixings, so no sub-grid is needed)."""
    S0, r, sigma, q = (float(v) for v in market.astuple())
    dt = spec.T / spec.n_fix
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((spec.n_fix, n_paths))
    logS = np.log(S0) + np.cumsum(
        (r - q - 0.5 * sigma * sigma) * dt + sigma * np.sqrt(dt) * z, axis=0)
    payout = _tarf_payout(np.exp(logS), spec, r, spec.T)
    return float(payout.mean()), float(payout.std() / np.sqrt(n_paths))


def tarf_strip_value(market: MarketParams, spec: TARFSpec) -> float:
    """EXACT no-knockout value: ``Σ_i df_i·(C_i − L·P_i)`` with C/P the
    UNDISCOUNTED Black-Scholes call/put forward values at each fixing —
    the analytic oracle for ``knock='none'`` (and the upper envelope of
    the gain leg for finite targets)."""
    from ..oracle import bs_price

    S0, r, sigma, q = (float(v) for v in market.astuple())
    total = 0.0
    for i in range(1, spec.n_fix + 1):
        t = i * spec.T / spec.n_fix
        c = float(bs_price(S0, spec.K, t, r, sigma, q=q, option_type="call"))
        p = float(bs_price(S0, spec.K, t, r, sigma, q=q, option_type="put"))
        # bs_price returns t-0 discounted values already
        total += c - spec.leverage * p
    return total
