"""Batched pricing: a whole strike/maturity book in one compiled program.

Production-serving extension (no reference equivalent): price many options
on one shared simulated path set with a single ``jit`` — a ``lax.scan``
over the strike axis of the full backward induction (scan, not vmap: on
TPU, batched regression reductions lower to MXU dots whose noise costs
deep-ITM policy value — round-3 gap study). Path simulation (the expensive
HBM-writing part) is amortized across the book; each strike runs its own
exercise recursion, so American early-exercise boundaries are per-strike
exact. Greeks for the whole book come from :func:`amcx.greeks.fast_greeks`
applied per row.

:func:`price_strike_grid` shares the path grid's maturity across the book;
:func:`price_mixed_book` additionally takes per-option maturity step indices
(a real desk book has maturity structure): the mega engine masks each
option's induction to its own maturity inside the one kernel, the XLA
engine prices maturity buckets on sliced grids.

Two engines: ``engine="xla"`` (default) scans the full backward induction —
per-strike regressions, full cashflow/τ outputs; ``engine="mega"`` runs the
whole book in ONE strike-batched Pallas kernel
(:func:`amcx.ops.lsmc_megakernel.lsmc_book_megakernel`) that shares the
path reads, the Gram power sums, and the Cholesky factorization across
strikes — prices/stderrs only.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .engine import backward_induction
from .payoff import intrinsic_value
from .types import RegressionSpec

__all__ = ["BookResult", "price_strike_grid", "price_mixed_book",
           "book_ccr_exposures", "book_greeks"]


def _phi_vector(option_type, n_options, dtype=jnp.float32):
    """+1/−1 payoff-sign vector from a single type name or a per-option
    sequence (mixed put/call books)."""
    if isinstance(option_type, str):
        types = [option_type] * n_options
    else:
        types = list(option_type)
        if len(types) != n_options:
            raise ValueError(
                f"{len(types)} option types for {n_options} options"
            )
    types = [t.strip().lower() for t in types]
    if any(t not in ("put", "call") for t in types):
        raise ValueError(f"option types must be put|call, got {types}")
    return (jnp.asarray([1.0 if t == "call" else -1.0 for t in types], dtype),
            tuple(types))


class BookResult(NamedTuple):
    prices: jnp.ndarray   # (n_strikes,)
    stderrs: jnp.ndarray  # (n_strikes,)
    cashflows: jnp.ndarray       # (n_strikes, n_paths); None for engine="mega"
    exercise_times: jnp.ndarray  # (n_strikes, n_paths); None for engine="mega"


def price_strike_grid(
    paths_tm: jnp.ndarray,
    strikes: jnp.ndarray,
    r,
    T,
    option_type: str = "put",
    american: bool = True,
    spec: RegressionSpec = RegressionSpec(),
    engine: str = "xla",
    return_cf_tau: bool = False,
    barrier=None,
    barrier_type: str = "down-in",
) -> BookResult:
    """Price a strike grid of vanilla puts/calls on shared paths.

    ``option_type`` is a single name or a per-option sequence — MIXED
    put/call books run through one program on either engine (the mega
    kernel takes a per-option payoff-sign vector; the shared Gram never
    depends on the payoff). ``barrier``: optional knock level shared by
    the whole ladder (all four knock variants via ``barrier_type``); the
    mega kernel carries it in the spot sign bit — zero extra HBM traffic.

    ``engine="xla"``: one compiled program, the backward induction scanned
    over strikes (per-strike regressions and exercise boundaries, full
    cashflow/τ outputs). ``engine="mega"``: the strike-batched single
    Pallas kernel — fit-on-all-paths regression only; pass
    ``return_cf_tau=True`` to also emit the per-strike (cashflow, τ)
    planes (feeds :func:`book_greeks` at book-kernel speed; triples the
    kernel's per-strike VMEM state).
    """
    n_options = jnp.atleast_1d(jnp.asarray(strikes)).shape[0]
    if spec.regress_on == "auto":
        # the book kernel's shared-Gram design fits one moment set for the
        # whole ladder, which requires the all-paths frame — "auto"
        # resolves to the reference estimator here (per-strike ITM fits
        # are available on engine="xla" with an explicit regress_on="itm")
        import dataclasses as _dc

        spec = _dc.replace(spec, regress_on="all")
    phis, types = _phi_vector(option_type, n_options)
    if engine == "mega":
        if spec.regress_on == "itm":
            raise ValueError(
                "engine='mega' book shares the Gram across strikes, which "
                "requires fit-on-all-paths regression (itm_weights=False)"
            )
        from .ops.lsmc_megakernel import lsmc_book_megakernel

        n_steps = paths_tm.shape[0] - 1
        out = lsmc_book_megakernel(
            paths_tm, strikes, r, T / n_steps, phis,
            basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
            american=american, return_cf_tau=return_cf_tau,
            barrier=barrier, barrier_type=barrier_type,
        )
        if return_cf_tau:
            return BookResult(*out)
        return BookResult(out[0], out[1], None, None)
    if engine != "xla":
        raise ValueError(f"unknown book engine {engine!r} (use 'xla' or 'mega')")
    return _price_strike_grid_xla(paths_tm, strikes, phis, r, T,
                                  american, spec, barrier, barrier_type)


@partial(jax.jit, static_argnames=("american", "spec", "barrier_type"))
def _price_strike_grid_xla(
    paths_tm: jnp.ndarray,
    strikes: jnp.ndarray,
    phis: jnp.ndarray,
    r,
    T,
    american: bool = True,
    spec: RegressionSpec = RegressionSpec(),
    barrier=None,
    barrier_type: str = "down-in",
) -> BookResult:
    from .payoff import barrier_gate

    n_steps = paths_tm.shape[0] - 1
    dt = T / n_steps
    knocked = barrier_gate(paths_tm, barrier, barrier_type)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, paths_tm.dtype))
    phis = jnp.asarray(phis, paths_tm.dtype)

    def one(_, Kphi):
        K, phi = Kphi
        payoff = lambda S: jnp.maximum(phi * (S - K), 0.0)
        res = backward_induction(
            paths_tm, knocked, r, dt, payoff, spec,
            american=american, return_surface=False,
        )
        return 0, (res.price, res.stderr, res.cashflows, res.exercise_times)

    # lax.scan (NOT vmap) over strikes: on TPU, vmapping the regression
    # turns its fused Gram/rhs reductions into batched MXU dots whose f32
    # noise — amplified by the Gram's conditioning — perturbed per-step
    # coefficients by ~0.2 and cost 0.066 of deep-ITM policy value
    # (round-3 gap study; bitwise reproduced across fit implementations).
    # Scanning keeps every strike on the accurate single-option program;
    # this is the accuracy-reference book (the mega book kernel is the
    # fast path).
    _, (prices, stderrs, cfs, taus) = jax.lax.scan(one, 0, (strikes, phis))
    return BookResult(prices, stderrs, cfs, taus)


def price_mixed_book(
    paths_tm: jnp.ndarray,
    strikes,
    maturity_steps,
    r,
    T,
    option_type: str = "put",
    american: bool = True,
    spec: RegressionSpec = RegressionSpec(),
    engine: str = "xla",
    return_cf_tau: bool = False,
) -> BookResult:
    """Price a mixed-maturity vanilla book on one shared path grid.

    ``maturity_steps[i]`` is option i's maturity as a step index on the
    grid (1..n_steps); its maturity in years is ``maturity_steps[i]·T/n_steps``.

    ``engine="mega"`` runs the whole book in ONE strike-batched Pallas
    kernel with per-option maturity masking (``return_cf_tau=True`` also
    emits per-option cashflow/τ planes, with τ initialized at each
    option's OWN maturity step); ``engine="xla"`` groups options into
    maturity buckets and prices each bucket with the scanned induction on
    a sliced grid (exact per-bucket reference; one compile per distinct
    maturity; prices/stderrs only).
    """
    import numpy as np

    if spec.regress_on == "auto":
        # shared-Gram book design: "auto" resolves to the all-paths frame
        # (see price_strike_grid)
        import dataclasses as _dc

        spec = _dc.replace(spec, regress_on="all")
    n_steps = paths_tm.shape[0] - 1
    strikes = jnp.atleast_1d(jnp.asarray(strikes, jnp.float32))
    mats = [int(m) for m in maturity_steps]
    if len(mats) != strikes.shape[0]:
        raise ValueError(
            f"{len(mats)} maturity_steps for {strikes.shape[0]} strikes"
        )
    if engine == "mega":
        if spec.regress_on == "itm":
            raise ValueError(
                "engine='mega' book shares the Gram across options, which "
                "requires fit-on-all-paths regression (itm_weights=False)"
            )
        from .ops.lsmc_megakernel import lsmc_book_megakernel

        phis, _ = _phi_vector(option_type, len(mats))
        out = lsmc_book_megakernel(
            paths_tm, strikes, r, T / n_steps, phis,
            basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
            american=american, maturity_steps=tuple(mats),
            return_cf_tau=return_cf_tau,
        )
        if return_cf_tau:
            return BookResult(*out)
        return BookResult(out[0], out[1], None, None)
    if engine != "xla":
        raise ValueError(f"unknown book engine {engine!r} (use 'xla' or 'mega')")

    # XLA reference: per-maturity buckets on sliced grids. Blocked paths
    # are flattened (the XLA engine consumes (T+1, n_paths)).
    if paths_tm.ndim == 3:
        paths_tm = paths_tm.reshape(paths_tm.shape[0], -1)
    dt = T / n_steps
    n_opts = len(mats)
    prices = np.zeros(n_opts, np.float32)
    stderrs = np.zeros(n_opts, np.float32)
    _, types_all = _phi_vector(option_type, len(mats))
    for m in sorted(set(mats)):
        idx = [i for i, mi in enumerate(mats) if mi == m]
        sub = price_strike_grid(
            paths_tm[: m + 1], strikes[jnp.asarray(idx)], r, m * dt,
            option_type=[types_all[i] for i in idx], american=american,
            spec=spec,
        )
        prices[idx] = np.asarray(sub.prices)
        stderrs[idx] = np.asarray(sub.stderrs)
    return BookResult(jnp.asarray(prices), jnp.asarray(stderrs), None, None)


@partial(jax.jit, static_argnames=("option_type", "american", "spec",
                                   "return_ene"))
def book_ccr_exposures(
    paths_tm: jnp.ndarray,
    strikes: jnp.ndarray,
    weights: jnp.ndarray,
    r,
    T,
    option_type: str = "put",
    american: bool = True,
    spec: RegressionSpec = RegressionSpec(),
    return_ene: bool = False,
):
    """Netting-set CCR profile of a vanilla book on shared paths.

    Counterparty exposure nets across positions: the portfolio's per-path
    value is ``Σ_i w_i · Ĉ_i(t, path)`` (signed weights — short positions
    offset long ones), the per-path EXPOSURE is its positive part
    ``max(Σ w_i Ĉ_i, 0)`` (a counterparty owes nothing where the netted
    value is negative), and EPE/PFE quantiles are taken of that — which is
    NOT the weighted sum of per-option profiles (neither quantiles nor the
    positive-part operator distribute over positions). The continuation
    surfaces are accumulated one option at a time in a ``lax.scan`` so only
    one ``(n_steps+1, n_paths)`` surface is ever materialized alongside the
    accumulator.

    Returns ``(portfolio_ccr: CCRExposures, prices: (n_options,))``; with
    ``return_ene=True`` also the per-step expected NEGATIVE exposure
    ``ENE(t) = E[max(−Σ w_i Ĉ_i, 0)]`` (the magnitude owed BY us — the
    DVA leg of `amcx.exposures.bilateral_cva`), as
    ``(ccr, ene, prices)``.
    """
    from .exposures import compute_ccr_exposures

    n_steps = paths_tm.shape[0] - 1
    dt = T / n_steps
    knocked = jnp.ones(paths_tm.shape, dtype=bool)
    strikes = jnp.atleast_1d(jnp.asarray(strikes, paths_tm.dtype))
    weights = jnp.broadcast_to(
        jnp.asarray(weights, paths_tm.dtype), strikes.shape
    )

    def body(acc, kw):
        K, w = kw
        payoff = lambda S: intrinsic_value(S, K, option_type)
        res = backward_induction(
            paths_tm, knocked, r, dt, payoff, spec,
            american=american, return_surface=True,
        )
        return acc + w * res.continuation, res.price

    acc0 = jnp.zeros(paths_tm.shape, paths_tm.dtype)
    netted, prices = jax.lax.scan(body, acc0, (strikes, weights))
    exposure = jnp.maximum(netted, 0.0)  # positive part: owed-to-us only
    ccr = compute_ccr_exposures(exposure)
    if return_ene:
        ene = jnp.mean(jnp.maximum(-netted, 0.0), axis=1)
        return ccr, ene, prices
    return ccr, prices


def book_greeks(
    book: BookResult,
    market,
    strikes,
    T,
    n_steps: int,
    option_type: str = "put",
):
    """Per-option pathwise Greeks for a priced book — the delta/vega/rho
    ladder desks quote alongside the price grid.

    Applies the closed-form fixed-boundary estimator
    (:func:`amcx.greeks.fast_greeks`) to each option's ``(cashflows,
    exercise_times)`` rows, so the whole ladder costs one cheap reduction
    per option on the already-finished book run — no re-pricing, no
    autodiff. Works with the ``engine="xla"`` book and with the mega book
    priced with ``return_cf_tau=True``.

    Returns a dict of ``(n_options,)`` arrays keyed like ``fast_greeks``.
    """
    from .engine import LSMCResult
    from .greeks import fast_greeks
    from .types import ProductSpec

    if book.cashflows is None:
        raise ValueError(
            "book_greeks needs per-option cashflow/τ outputs — price the "
            "book with engine='xla', or engine='mega' + return_cf_tau=True"
        )
    strikes = jnp.atleast_1d(jnp.asarray(strikes))
    _, types = _phi_vector(option_type, strikes.shape[0])
    rows = []
    for i in range(strikes.shape[0]):
        res_i = LSMCResult(book.prices[i], book.stderrs[i],
                           book.cashflows[i], book.exercise_times[i], None)
        prod_i = ProductSpec(K=float(strikes[i]), T=float(T),
                             option_type=types[i], exercise="american")
        rows.append(fast_greeks(res_i, market, prod_i, n_steps))
    return {k: jnp.stack([r[k] for r in rows]) for k in rows[0]}
