"""Discrete-monitoring barrier PDE oracle (f64, numpy/scipy — no JAX).

Exact anchor for the LSMC engines' barrier semantics (SURVEY Q4 +
`amcx/engine.py:backward_induction`): the barrier is monitored ONLY at
the n_monitor+1 simulation grid dates (inclusive of t=0 and T; touch
counts — ``S <= B`` for down, ``S >= B`` for up), early exercise happens
only at those same dates (Bermudan-on-the-grid, incl. t=0 — SURVEY Q3),
a knock-IN path may exercise from its knock date onward (the knock state
updates BEFORE the exercise decision at a date), knock-OUT value dies at
the touch (rebate 0, the knock kills before exercise), and maturity pays
intrinsic only on knocked (knock-in) / never-knocked (knock-out) paths.

Method: coupled Crank-Nicolson solves in ``x = ln S`` on a grid with
nodes aligned to BOTH ``ln barrier`` and ``ln S0`` (so the knock mask and
the final read-off are node-exact), with Rannacher implicit-Euler damping
after every discontinuous event (maturity and each monitoring date). For
knock-in products two state values evolve together — the knocked state
``V_in`` (a grid-date Bermudan vanilla) and the not-yet-knocked state
``V_out`` with the ``V_out := V_in`` switch applied on the knocked side
of the barrier at each monitoring date. Everything is float64.

This replaces the CRR-tree barrier anchor in the product matrix
(`scripts/make_results.py`): trees monitor at every tree level (not the
MC grid) and suffer Boyle-Lau barrier/node misalignment — at 100 steps
the tree's American down-in put (5.2421) prices BELOW its own European
analytic value (5.2584), an internally inconsistent anchor. This PDE is
semantics-exact for the MC grid; reference barrier contract:
`/root/reference/american_monte_carlo.py:37-49,171-176`.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pde_discrete_barrier_price"]


def _grid_and_operator(S0, K, T, r, sigma, q, n_x, n_std, barrier=None):
    """Log-spot grid (S0 on-node, barrier mid-cell) + banded CN operator
    rows ``(lo, dg, up)``. Returns ``(xg, S, i0, lo, dg, up)`` — shared by
    the barrier pricer below and the structured-note oracles
    (`amcx.models.autocall`)."""
    x0 = np.log(S0)
    width = n_std * sigma * np.sqrt(T) + abs(r - q) * T
    marks = [x0, np.log(K)]
    if barrier is not None:
        marks.append(np.log(float(barrier)))
    x_lo = min(marks) - width
    x_hi = max(marks) + width
    h0 = (x_hi - x_lo) / (n_x - 1)
    if barrier is not None and abs(x0 - np.log(float(barrier))) > 1e-14:
        # tune h so (x0 - lnB)/h = m + 1/2 for integer m >= 0
        d = abs(x0 - np.log(float(barrier)))
        m = max(0, int(round(d / h0 - 0.5)))
        h = d / (m + 0.5)
    else:
        h = h0
    n_lo = int(np.ceil((x0 - x_lo) / h))
    n_hi = int(np.ceil((x_hi - x0) / h))
    xg = x0 + h * np.arange(-n_lo, n_hi + 1)
    S = np.exp(xg)
    i0 = n_lo
    assert abs(xg[i0] - x0) < 1e-9 * max(1.0, abs(x0))

    a = 0.5 * sigma * sigma
    mu = r - q - a
    nx = xg.shape[0]
    lo = np.full(nx, a / (h * h) - mu / (2.0 * h))
    dg = np.full(nx, -2.0 * a / (h * h) - r)
    up = np.full(nx, a / (h * h) + mu / (2.0 * h))
    lo[0], up[0] = 0.0, max(mu, 0.0) / h  # only outflow-safe first order
    dg[0] = -up[0] - r
    up[-1], lo[-1] = 0.0, max(-mu, 0.0) / h
    dg[-1] = -lo[-1] - r
    return xg, S, i0, lo, dg, up


def _cn_interval(V_list, lo, dg, up, dt_iv, n_sub, rannacher):
    """Advance each value array in ``V_list`` backward over one
    inter-monitoring interval: ``rannacher`` fully implicit substeps first
    (damps the discontinuity injected at the event we just left), then
    Crank-Nicolson for the rest. The spatial operator L has the banded
    rows (lo, dg, up); all arrays f64."""
    from scipy.linalg import solve_banded

    n_x = dg.shape[0]
    ddt = dt_iv / n_sub
    out = list(V_list)
    # banded LHS templates for theta=1 and theta=0.5
    for s in range(n_sub):
        theta = 1.0 if s < rannacher else 0.5
        ab = np.zeros((3, n_x))
        ab[0, 1:] = -theta * ddt * up[:-1]
        ab[1, :] = 1.0 - theta * ddt * dg
        ab[2, :-1] = -theta * ddt * lo[1:]
        w = (1.0 - theta) * ddt
        for i, V in enumerate(out):
            rhs = V + w * (
                np.r_[0.0, lo[1:]] * np.r_[V[0], V[:-1]]
                + dg * V
                + np.r_[up[:-1], 0.0] * np.r_[V[1:], V[-1]]
            )
            out[i] = solve_banded((1, 1), ab, rhs)
    return out


def pde_discrete_barrier_price(
    S0,
    K,
    T,
    r,
    sigma,
    n_monitor: int,
    q=0.0,
    option_type: str = "put",
    exercise: str = "european",
    barrier=None,
    barrier_type: str = "down-in",
    n_x: int = 2001,
    n_sub: int = 8,
    n_std: float = 7.5,
    rannacher: int = 2,
) -> float:
    """Price under the EXACT discrete semantics of the LSMC simulation grid.

    ``n_monitor`` is the number of simulation steps (monitoring/exercise
    dates are ``t_i = i*T/n_monitor`` for ``i = 0..n_monitor``, matching
    ``SimConfig.n_steps``). ``barrier=None`` prices the grid-date Bermudan
    vanilla (the exact target of the American LSMC estimator).

    Grid: ``n_x``-target log-spot nodes over ±``n_std``·σ√T around
    ln S0/ln K/ln B (barrier- and S0-aligned), ``n_sub`` time substeps per
    monitoring interval, ``rannacher`` implicit substeps after each event.
    """
    S0, K, T, r, sigma, q = (float(v) for v in (S0, K, T, r, sigma, q))
    if option_type not in ("call", "put"):
        raise ValueError(f"option_type must be call|put, got {option_type!r}")
    if exercise not in ("european", "american"):
        raise ValueError(f"exercise must be european|american, got {exercise!r}")
    american = exercise == "american"
    phi = 1.0 if option_type == "call" else -1.0
    x0 = np.log(S0)

    # --- grid: wide span covering S0, K and the barrier. ln(S0) sits ON a
    # node (exact read-off); ln(barrier) sits exactly MID-CELL (nodes at
    # lnB ± h/2): the grid projection of the knock indicator then splits
    # cleanly between knocked/unknocked nodes, restoring second-order
    # convergence (an on-node barrier smears the switch by h/2 → O(h)).
    # --- spatial operator in x = ln S (interior central; ends upwinded,
    # zero curvature — the wide grid makes the boundary error negligible)
    xg, S, i0, lo, dg, up = _grid_and_operator(S0, K, T, r, sigma, q, n_x,
                                               n_std, barrier)
    payoff = np.maximum(phi * (S - K), 0.0)

    dt_iv = T / n_monitor

    if barrier is None:
        V = payoff.copy()
        for _ in range(n_monitor):
            (V,) = _cn_interval((V,), lo, dg, up, dt_iv, n_sub, rannacher)
            if american:
                V = np.maximum(V, payoff)
        return float(V[i0])

    bt = barrier_type.strip().lower()
    if bt not in ("down-in", "up-in", "down-out", "up-out"):
        raise ValueError(f"barrier_type must be down/up-in/out, got {barrier_type!r}")
    lnB = np.log(float(barrier))
    hit = xg <= lnB + 1e-12 if bt.startswith("down") else xg >= lnB - 1e-12
    s0_hit = (x0 <= lnB + 1e-12) if bt.startswith("down") else (x0 >= lnB - 1e-12)

    if bt.endswith("out"):
        # single state: alive value; knock kills BEFORE exercise at a date
        V = np.where(hit, 0.0, payoff)
        for _ in range(n_monitor):
            (V,) = _cn_interval((V,), lo, dg, up, dt_iv, n_sub, rannacher)
            if american:
                V = np.maximum(V, payoff)
            V = np.where(hit, 0.0, V)
        return 0.0 if s0_hit else float(V[i0])

    # knock-IN: V_in = knocked state (grid-date Bermudan vanilla),
    # V_out = not-yet-knocked (no exercise until knock; state switch at
    # each monitoring date AFTER V_in's exercise update — a path knocking
    # at t_i may exercise at t_i, matching knocked-inclusive LSMC gating).
    V_in = payoff.copy()
    V_out = np.where(hit, payoff, 0.0)
    for _ in range(n_monitor):
        V_in, V_out = _cn_interval((V_in, V_out), lo, dg, up, dt_iv, n_sub,
                                   rannacher)
        if american:
            V_in = np.maximum(V_in, payoff)
        V_out = np.where(hit, V_in, V_out)
    return float(V_in[i0]) if s0_hit else float(V_out[i0])
