"""Swing options: LSMC with multiple exercise rights.

A swing (multi-exercise) option grants ``n_rights`` exercises of the same
vanilla payoff, at most one per exercise date. The reference engine prices
single-exercise American/European products only
(`/root/reference/american_monte_carlo.py:139-167`); the multiple-stopping
extension is the standard desk generalization (energy/commodity swing
contracts, Meinshausen-Hambly / Carmona-Touzi multiple-stopping LSMC).

Dynamic program over the rights dimension: with ``V^k`` the value holding
``k`` rights,

    exercise at t:  payoff_t + C^{k-1}_t  >  C^k_t,
    C^k_t = E[V^k_{t+1} | S_t]   (regressed, one fit per k ≥ 1, C^0 ≡ 0)

— at k = 1 this collapses to the American exercise rule, so the whole
engine is the `amcx.engine` backward induction with a (n_rights+1)-row
value carry and n_rights regressions per step.

TPU design notes: the rights axis is tiny and static, so the per-``k``
regressions unroll inside one `lax.scan` step — XLA fuses the shared basis
construction across them (the Gram moments differ only in the y-vector, so
pass-1 work is shared by construction in `amcx.regress`'s fused-reduction
path). Values ride in TIME-T UNITS (one scalar multiply per step, the same
carry discipline as every amcx kernel — see
`amcx.ops.lsmc_megakernel._mega_kernel`); an exercised right re-anchors its
payoff with ``e^{+r·dt·(n_steps−t)}`` and the remaining-rights value rolls
down from the ``k−1`` carry.

Validation: an exact float64 lattice oracle with a rights dimension
(`crr_swing_price`) whose exercise opportunities sit EXACTLY on the LSMC
date grid (``n_sub`` tree steps per LSMC step, rights usable at multiples
of ``n_sub``) — a sharp oracle with no exercise-grid mismatch, same
methodology as `amcx.term.crr_price_curves`.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .engine import LSMCResult
from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = ["price_swing_option", "price_swing_option_curves",
           "crr_swing_price", "price_swing_contract", "SwingContractResult"]


def crr_swing_price(S0, K, T, r, sigma, n_rights: int, q=0.0,
                    n_steps: int = 100, n_sub: int = 20,
                    option_type: str = "put",
                    payoff_kind: str = "option",
                    n_min: int = 0) -> float:
    """float64 binomial oracle for a swing option with ``n_rights`` rights.

    The tree has ``n_steps·n_sub`` CRR steps; exercise (one right) is
    allowed only at multiples of ``n_sub`` — i.e. exactly the ``n_steps+1``
    LSMC grid dates (t = 0 included, as in the amcx engines) — so LSMC
    prices converge to this value with NO exercise-grid bias. ``V^k``
    arrays (k = 0..n_rights) are rolled back jointly; at an exercise date
    ``V^k = max(V^k, payoff + V^{k-1})``.

    ``payoff_kind="forward"`` makes each take pay the SIGNED φ(S−K)
    (commodity-swing take, can be negative); ``n_min`` is a take-or-pay
    minimum exercise count — when the remaining exercise dates equal the
    outstanding obligations, exercise is FORCED at every remaining date.
    With ``payoff_kind="option"`` and ``n_min=0`` this reduces to the
    unconstrained multiple-stopping oracle.

    ``r``/``q`` may be ``(n_steps,)`` piecewise-constant curves on the
    LSMC grid (the `amcx.term` convention; flat sigma — the per-step
    risk-neutral probability and discount absorb the time dependence, as
    in `amcx.term.crr_price_curves`).
    """
    if n_rights < 1:
        raise ValueError("n_rights must be >= 1")
    if not 0 <= n_min <= n_rights:
        raise ValueError("need 0 <= n_min <= n_rights")
    if n_min > n_steps + 1:
        raise ValueError("n_min exceeds the number of exercise dates")
    if payoff_kind not in ("option", "forward"):
        raise ValueError(f"unknown payoff_kind {payoff_kind!r}")
    r_t = np.broadcast_to(np.asarray(r, np.float64), (n_steps,))
    q_t = np.broadcast_to(np.asarray(q, np.float64), (n_steps,))
    N = n_steps * n_sub
    ddt = float(T) / N
    u = np.exp(float(sigma) * np.sqrt(ddt))
    d = 1.0 / u
    p_t = (np.exp((r_t - q_t) * ddt) - d) / (u - d)
    if not np.all((0.0 < p_t) & (p_t < 1.0)):
        raise ValueError("lattice probability out of (0,1); raise n_sub")
    df_t = np.exp(-r_t * ddt)
    phi = 1.0 if option_type == "call" else -1.0

    def spots(step):
        j = np.arange(step + 1, dtype=np.float64)
        return float(S0) * np.exp((2.0 * j - step) * float(sigma)
                                  * np.sqrt(ddt))

    def take(step):
        signed = phi * (spots(step) - float(K))
        return signed if payoff_kind == "forward" else np.maximum(signed, 0.0)

    def obligations(k):
        # k rights remaining ⇒ n_rights − k already exercised
        return max(0, n_min - (n_rights - k))

    ex_T = take(N)
    # maturity is an exercise date: exactly ONE take, the rest expire; an
    # outstanding obligation forces the (possibly negative) single take.
    # NOT ex + V[k-1]: that would stack a second maturity take from the
    # k-1 ladder onto the same date (review finding: +0.44 on a 2-rights/
    # min-1 forward call where the phantom double-take branch wins).
    V = [np.zeros(N + 1)]
    for k in range(1, n_rights + 1):
        V.append(ex_T.copy() if obligations(k) >= 1
                 else np.maximum(ex_T, 0.0).copy())
    for step in range(N - 1, -1, -1):
        p = p_t[step // n_sub]
        df = df_t[step // n_sub]
        V = [df * (p * Vk[1: step + 2] + (1.0 - p) * Vk[: step + 1])
             for Vk in V]
        if step % n_sub == 0:
            ex = take(step)
            dates_remaining = n_steps - step // n_sub + 1
            # one right per date: after exercising, the remaining k−1
            # rights are worth their CONTINUATION value at this date (no
            # second exercise now) — update descending so V[k-1] is still
            # pre-update when V[k] reads it.
            for k in range(n_rights, 0, -1):
                if obligations(k) >= dates_remaining:
                    V[k] = ex + V[k - 1]          # take-or-pay: forced
                else:
                    V[k] = np.maximum(V[k], ex + V[k - 1])
    return float(V[n_rights][0])


@partial(jax.jit, static_argnames=("spec", "n_rights", "itm", "antithetic",
                                   "payoff_kind", "n_min"))
def _swing_engine_impl(paths_tm, rdt, K, phi, spec, n_rights, itm,
                       antithetic, payoff_kind="option", n_min=0):
    """Backward induction with an (n_rights+1)-deep value carry.

    ``Y[k]`` is the pathwise REALIZED value of following the estimated
    policy with k rights, in time-T units (lower-bound estimator, exactly
    as the single-exercise engine's cashflow carry). Decisions use the
    regressed continuations; all k update simultaneously from the t+1
    carries (exercising one right hands the path to the k−1 policy).

    ``payoff_kind="forward"`` pays the SIGNED φ(S−K) per take and drops
    the ITM gate from the exercise rule; ``n_min`` outstanding obligations
    force exercise once the remaining dates run out (take-or-pay). Both
    rights-axis quantities are static, so the forced region is resolved at
    trace time per (k, t) — no dynamic control flow enters the scan.
    """
    from .regress import fit_continuation_with_coeffs

    n_steps = paths_tm.shape[0] - 1
    n_paths = paths_tm.shape[1]
    dtype = paths_tm.dtype
    signed = lambda S: phi * (S - K)
    if payoff_kind == "forward":
        payoff = signed
    else:
        payoff = lambda S: jnp.maximum(signed(S), 0.0)

    def obligations(k):
        return max(0, n_min - (n_rights - k))

    ex_T = payoff(paths_tm[n_steps])
    rows = [jnp.zeros((n_paths,), dtype)]
    for k in range(1, n_rights + 1):
        # one take per date, even when forced (see crr_swing_price)
        rows.append(ex_T if obligations(k) >= 1
                    else jnp.maximum(ex_T, 0.0))
    Y0 = jnp.stack(rows)

    def step(Y, xs):
        S_t, t = xs
        rem = (n_steps - t).astype(dtype)
        c_t = jnp.exp(-rdt * rem)
        inv_c_t = jnp.exp(rdt * rem)
        ex = payoff(S_t)
        # ITM-localized fits are meaningless for SIGNED takes: obligations
        # force exercise OTM, so the continuation must be estimated on the
        # full support (an itm-gated fit mispriced the CLI's 3-rights/min-2
        # config by 2.2) — ignore the itm flag for forward payoffs
        weights = ((ex > 0).astype(dtype)
                   if itm and payoff_kind == "option" else None)
        conts = [jnp.zeros((n_paths,), dtype)]  # C^0 ≡ 0
        for k in range(1, n_rights + 1):
            # Q2's zero-floor is only valid for nonnegative cashflows;
            # forward-kind values are signed (forced OTM takes)
            cont, _ = fit_continuation_with_coeffs(
                S_t, c_t * Y[k], spec, weights,
                clamp=payoff_kind == "option")
            conts.append(cont)
        newY = [Y[0]]
        # dates t..n_steps inclusive remain when the scan sits at t
        dates_remaining = n_steps - t + 1
        for k in range(1, n_rights + 1):
            want = ex + conts[k - 1] > conts[k]
            if payoff_kind == "option":
                want = (ex > 0) & want
            if obligations(k) > 0:
                hit = want | (dates_remaining <= obligations(k))
            else:
                hit = want
            newY.append(jnp.where(hit, ex * inv_c_t + Y[k - 1], Y[k]))
        return jnp.stack(newY), None

    ts = jnp.arange(n_steps, dtype=jnp.int32)
    Y, _ = lax.scan(step, Y0, (paths_tm[:n_steps], ts), reverse=True)
    discounted = jnp.exp(-rdt * n_steps) * Y[n_rights]
    if antithetic:
        # honest stderr: row j pairs with row j + n_paths/2 in every
        # generator layout — fold pairs before the moment reductions
        half = n_paths // 2
        stat = 0.5 * (discounted[:half] + discounted[half:])
    else:
        stat = discounted
    price = jnp.mean(stat)
    stderr = jnp.std(stat) / jnp.sqrt(stat.shape[0])
    return price, stderr


def price_swing_option(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    n_rights: int,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
    payoff_kind: str = "option",
    n_min: int = 0,
) -> LSMCResult:
    """Price a swing option with ``n_rights`` exercise rights (≤ 1 per
    date) on the ``product`` vanilla payoff. ``n_rights=1`` reproduces the
    single-exercise American engine's estimator (same exercise rule, same
    regression frame). Barriers are not supported (vanilla
    multiple-stopping only).

    ``engine="mega"`` runs the whole rights ladder in ONE Pallas kernel
    (`amcx.ops.lsmc_swing`): one shared Gram + n_rights-RHS solve per
    step, (n_rights+1) VMEM value planes — flagship-speed swing pricing
    (with ``sim.backend="pallas"`` the paths come blocked from the
    in-kernel generator, relayout-free)."""
    if n_rights < 1:
        raise ValueError("n_rights must be >= 1")
    if product.has_barrier:
        raise ValueError("swing pricing is vanilla-only")
    if not product.is_american:
        raise ValueError("a European swing is n_rights * european price; "
                         "use exercise='american'")
    if payoff_kind not in ("option", "forward"):
        raise ValueError(f"unknown payoff_kind {payoff_kind!r}")
    if not 0 <= n_min <= n_rights:
        raise ValueError("need 0 <= n_min <= n_rights")
    if n_min > sim.n_steps + 1:
        raise ValueError("n_min exceeds the number of exercise dates")
    # resolve the "auto" estimator: ITM localization for the nonnegative
    # option kind (consistent with price_option, so the 1-right swing
    # reproduces the American engine); forward-kind fits are signed and
    # must stay global (round-3 estimator trap: ITM localization silently
    # disables should-exercise-while-OTM decisions on obligations)
    if spec.regress_on == "auto":
        import dataclasses as _dc

        spec = _dc.replace(
            spec, regress_on="itm" if payoff_kind == "option" else "all")
    phi = 1.0 if product.option_type == "call" else -1.0
    dtype = sim.jnp_dtype
    if engine == "mega":
        from .ops.lsmc_swing import lsmc_price_swing
        from .paths import gbm_standardization

        if sim.backend == "pallas":
            from .ops.gbm_pallas import _key_to_seed, gbm_paths_pallas

            paths = gbm_paths_pallas(
                _key_to_seed(key), market.S0, market.r, market.sigma,
                market.q, product.T, sim.n_steps, sim.n_paths,
                antithetic=sim.antithetic, out_blocked=True)
        else:
            from .paths import simulate_gbm

            paths = simulate_gbm(key, market, product.T, sim)
        mean_t, inv_std_t = gbm_standardization(market, product.T,
                                                sim.n_steps)
        price, stderr = lsmc_price_swing(
            paths, product.K, market.r, product.T / sim.n_steps, phi,
            int(n_rights), basis=spec.basis, degree=spec.degree,
            rcond=spec.rcond, itm_weights=spec.regress_on == "itm",
            mean_t=mean_t, inv_std_t=inv_std_t, antithetic=sim.antithetic,
            payoff_kind=payoff_kind, n_min=int(n_min))
        return LSMCResult(price, stderr, None, None, None)
    if engine != "xla":
        raise ValueError(f"engine must be 'xla' or 'mega', got {engine!r}")
    from .paths import simulate_gbm

    paths = simulate_gbm(key, market, product.T, sim)
    price, stderr = _swing_engine_impl(
        paths, jnp.asarray(market.r * product.T / sim.n_steps, dtype),
        jnp.asarray(product.K, dtype), phi, spec, int(n_rights),
        spec.regress_on == "itm", sim.antithetic,
        payoff_kind=payoff_kind, n_min=int(n_min))
    return LSMCResult(price, stderr, None, None, None)


def price_swing_option_curves(
    key: jax.Array,
    curves,
    product: ProductSpec,
    n_rights: int,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    payoff_kind: str = "option",
    n_min: int = 0,
) -> LSMCResult:
    """Swing pricing under deterministic r(t)/σ(t)/q(t) term structures
    (`amcx.term.TermCurves`), through the one-kernel mega swing engine —
    the kernel's discounting already rides per-step rows, so curve support
    is pure host plumbing (curve paths + curve standardization + the
    ``(n_steps,)`` short-rate vector). Validate with
    `crr_swing_price(r=<(n_steps,) vector>, ...)` (flat sigma)."""
    from .ops.lsmc_swing import lsmc_price_swing
    from .term import TermCurves, curve_standardization, simulate_gbm_curves

    assert isinstance(curves, TermCurves)
    if n_rights < 1:
        raise ValueError("n_rights must be >= 1")
    if product.has_barrier:
        raise ValueError("swing pricing is vanilla-only")
    if not product.is_american:
        raise ValueError("use exercise='american'")
    if payoff_kind not in ("option", "forward"):
        raise ValueError(f"unknown payoff_kind {payoff_kind!r}")
    if not 0 <= n_min <= n_rights:
        raise ValueError("need 0 <= n_min <= n_rights")
    dt = product.T / sim.n_steps
    if sim.backend == "pallas":
        from .ops.gbm_pallas import _key_to_seed, gbm_paths_pallas

        paths = gbm_paths_pallas(
            _key_to_seed(key), curves.S0, curves.r_t, curves.sigma_t,
            curves.q_t, product.T, sim.n_steps, sim.n_paths,
            antithetic=sim.antithetic, out_blocked=True)
    else:
        paths = simulate_gbm_curves(key, curves, product.T, sim)
    mean_t, inv_std_t = curve_standardization(curves, dt)
    phi = 1.0 if product.option_type == "call" else -1.0
    price, stderr = lsmc_price_swing(
        paths, product.K, curves.r_t, dt, phi, int(n_rights),
        basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
        itm_weights=spec.regress_on == "itm", mean_t=mean_t,
        inv_std_t=inv_std_t, antithetic=sim.antithetic,
        payoff_kind=payoff_kind, n_min=int(n_min))
    return LSMCResult(price, stderr, None, None, None)


@dataclasses.dataclass(frozen=True)
class SwingContractResult:
    """Decomposed value of a volume-constrained swing contract:
    ``price = q_take_min·strip_value + (q_take_max−q_take_min)·upswing_value``.
    ``m_min``/``m_max`` are the up-swing exercise-count bounds implied by
    the global volume constraints (rounded INWARD when not integral — a
    conservative lower bound, exact when the volume bounds sit on the
    take grid, the usual contract convention)."""

    price: float
    stderr: float
    strip_value: float
    upswing_value: float
    upswing_stderr: float
    m_min: int
    m_max: int


def price_swing_contract(
    key: jax.Array,
    market: MarketParams,
    K: float,
    T: float,
    q_take_min: float,
    q_take_max: float,
    Q_min: float,
    Q_max: float,
    option_type: str = "call",
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    engine: str = "xla",
) -> SwingContractResult:
    """Volume-constrained swing (Jaillet-Ronn-Tompaidis): at each of the
    ``sim.n_steps+1`` grid dates the holder takes a volume
    ``u ∈ [q_take_min, q_take_max]`` paying the SIGNED ``φ(S_t − K)`` per
    unit, subject to ``Q_min ≤ Σu ≤ Q_max`` over the contract.

    Because the date payoff is linear in the take and the value function is
    concave in cumulative volume, the optimal policy is bang-bang
    (take q_min or q_max — JRT 2004), so the contract decomposes EXACTLY
    into

    - an obligatory base strip ``q_take_min · Σ_t e^{−r t}E[φ(S_t − K)]``
      (closed form under GBM: ``Σ_t φ(S0 e^{−q t} − K e^{−r t})``), plus
    - ``(q_take_max − q_take_min)`` units of an up-swing: a forward-kind
      multiple-stopping option with at most ``m_max`` and at least
      ``m_min`` exercises (`price_swing_option(payoff_kind="forward",
      n_min=m_min)`).

    Validate against ``q_take_min·strip + Δq·crr_swing_price(
    n_rights=m_max, n_min=m_min, payoff_kind="forward")``.
    """
    n_dates = sim.n_steps + 1
    if not 0.0 <= q_take_min <= q_take_max:
        raise ValueError("need 0 <= q_take_min <= q_take_max")
    if Q_min > Q_max:
        raise ValueError("need Q_min <= Q_max")
    if Q_min > n_dates * q_take_max + 1e-12:
        raise ValueError("Q_min unreachable even taking q_take_max always")
    if Q_max < n_dates * q_take_min - 1e-12:
        raise ValueError("Q_max below the obligatory base volume")
    phi = 1.0 if option_type == "call" else -1.0
    dt = T / sim.n_steps
    t = np.arange(n_dates, dtype=np.float64) * dt
    strip = float(np.sum(phi * (float(market.S0) * np.exp(-float(market.q) * t)
                                - float(K) * np.exp(-float(market.r) * t))))
    dq = q_take_max - q_take_min
    if dq <= 1e-14:
        return SwingContractResult(q_take_min * strip, 0.0, strip, 0.0, 0.0,
                                   0, 0)
    m_min = int(np.ceil((Q_min - n_dates * q_take_min) / dq - 1e-9))
    m_max = int(np.floor((Q_max - n_dates * q_take_min) / dq + 1e-9))
    m_min = max(m_min, 0)
    m_max = min(m_max, n_dates)
    if m_max < m_min:
        raise ValueError("volume constraints admit no feasible take counts "
                         "on the bang-bang grid")
    if m_max == 0:
        return SwingContractResult(q_take_min * strip, 0.0, strip, 0.0, 0.0,
                                   0, 0)
    res = price_swing_option(
        key, market,
        ProductSpec(K=K, T=T, option_type=option_type, exercise="american"),
        n_rights=m_max, spec=spec, sim=sim, engine=engine,
        payoff_kind="forward", n_min=m_min)
    up, up_se = float(res.price), float(res.stderr)
    return SwingContractResult(q_take_min * strip + dq * up, dq * up_se,
                               strip, up, up_se, m_min, m_max)
