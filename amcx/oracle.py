"""Self-hosted benchmark oracle (replaces QuantLib).

The reference validates its LSMC prices against QuantLib's C++ engines via
SWIG (`/root/reference/american_monte_carlo.py:10-68`): analytic
Black-Scholes for European vanillas, CRR binomial for American vanillas,
analytic (Reiner-Rubinstein) and CRR binomial engines for down-and-in
barriers. Those are the *only* native components in the reference's closure
(SURVEY §2 native table). This module re-implements every engine in JAX so
the whole validation suite runs hermetically on TPU/CPU:

- :func:`bs_price` — closed-form Black-Scholes-Merton (continuous dividend
  yield), the `AnalyticEuropeanEngine` equivalent.
- :func:`down_in_price` — Reiner-Rubinstein closed forms for down-and-in
  calls/puts (rebate 0), the `AnalyticBarrierEngine` equivalent, with an
  optional Broadie-Glasserman-Kou discrete-monitoring barrier shift.
- :func:`crr_price` — Cox-Ross-Rubinstein binomial tree as a ``lax.scan``
  over tree levels with fixed-size padded node arrays (TPU-friendly, no
  dynamic shapes), the `BinomialVanillaEngine` equivalent. Handles
  European/American exercise.
- :func:`crr_down_in_price` — binomial down-and-in via a *joint* backward
  scan of the vanilla and knock-in value vectors (`BinomialBarrierEngine`
  equivalent). At knocked nodes the DI value collapses to the vanilla value;
  above the barrier it is pure continuation (no exercise before knock-in —
  the same semantics the LSMC engine enforces, SURVEY Q4).

A second, independent C++ implementation of the same engines (role parity
with QuantLib's native code) lives in ``native/`` and is loaded via
`amcx.native_oracle`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "norm_cdf",
    "bs_price",
    "bs_greeks",
    "down_in_price",
    "discrete_barrier_shift",
    "crr_price",
    "crr_down_in_price",
    "oracle_price",
    "implied_vol",
    "american_implied_vol",
]


def norm_cdf(x):
    return 0.5 * (1.0 + lax.erf(x / jnp.sqrt(2.0).astype(jnp.result_type(x, 1.0))))


def _expm1_acc(z):
    """Accurate ``exp(z) - 1`` for the small arguments of tree constants.

    XLA's f32 ``exp``/``expm1`` are fast polynomial approximations (~5e-6 /
    ~1e-4 relative error on CPU); that error lands directly in the
    risk-neutral probability ``p = (a-d)/(u-d)`` (a ratio of ~1e-3-sized
    differences of numbers near 1) and compounds over thousands of tree
    levels into O(0.1) price errors. For |z| <= 0.125 an 8-term Taylor series
    is exact to f32 rounding; larger arguments fall back to ``expm1``.
    """
    t = z / 8.0  # bring typical args well inside the series' sweet spot
    # Horner: t(1 + t/2(1 + t/3(1 + t/4(1 + t/5(1 + t/6(1 + t/7(1 + t/8)))))))
    s = t * (1.0 + t / 2.0 * (1.0 + t / 3.0 * (1.0 + t / 4.0 * (
        1.0 + t / 5.0 * (1.0 + t / 6.0 * (1.0 + t / 7.0 * (1.0 + t / 8.0)))))))
    # (1+s)^8 - 1 via repeated squaring of (1+s): em <- em*(em+2) maps
    # exp(t)-1 -> exp(2t)-1 exactly in terms of expm1 composition.
    em = s
    for _ in range(3):
        em = em * (em + 2.0)
    return jnp.where(jnp.abs(z) <= 1.0, em, jnp.expm1(z))


def _phi(option_type: str) -> float:
    return -1.0 if option_type.strip().lower() == "put" else 1.0


def _tree_constants(r, q, sigma, dt):
    """CRR constants ``u, d, p, disc`` built from :func:`_expm1_acc` so the
    cancellation-heavy ``p = (a-d)/(u-d)`` keeps full f32 accuracy."""
    x = sigma * jnp.sqrt(dt)
    em_x = _expm1_acc(x)      # e^x  - 1
    em_mx = _expm1_acc(-x)    # e^-x - 1
    em_a = _expm1_acc((r - q) * dt)
    u = 1.0 + em_x
    d = 1.0 + em_mx
    p = (em_a - em_mx) / (em_x - em_mx)
    disc = 1.0 + _expm1_acc(-r * dt)
    return u, d, p, disc


def bs_price(S0, K, T, r, sigma, q=0.0, option_type: str = "call"):
    """Black-Scholes-Merton European price (analytic).

    Equivalent of QuantLib's `AnalyticEuropeanEngine`
    (`american_monte_carlo.py:28`).
    """
    S0, K, T, r, sigma, q = map(jnp.asarray, (S0, K, T, r, sigma, q))
    phi = _phi(option_type)
    sqT = jnp.sqrt(T)
    sig = jnp.maximum(sigma * sqT, 1e-12)
    d1 = (jnp.log(S0 / K) + (r - q + 0.5 * sigma**2) * T) / sig
    d2 = d1 - sig
    return phi * (
        S0 * jnp.exp(-q * T) * norm_cdf(phi * d1)
        - K * jnp.exp(-r * T) * norm_cdf(phi * d2)
    )


def bs_greeks(S0, K, T, r, sigma, q=0.0, option_type: str = "call"):
    """Closed-form delta/vega/rho via autodiff of :func:`bs_price` (used as
    the ground truth for the pathwise-Greeks tests, SURVEY §4)."""
    f = lambda s, v, rr: bs_price(s, K, T, rr, v, q, option_type)
    delta = jax.grad(f, argnums=0)(S0, sigma, r)
    vega = jax.grad(f, argnums=1)(S0, sigma, r)
    rho = jax.grad(f, argnums=2)(S0, sigma, r)
    return {"delta": delta, "vega": vega, "rho": rho}


def discrete_barrier_shift(barrier, sigma, dt, down: bool = True):
    """Broadie-Glasserman-Kou continuity correction: the continuous-monitoring
    barrier equivalent to a discretely monitored one at spacing ``dt`` is
    shifted by ``exp(∓0.5826 σ √dt)`` (minus for down barriers)."""
    beta = 0.5826
    sign = -1.0 if down else 1.0
    return barrier * jnp.exp(sign * beta * sigma * jnp.sqrt(dt))


def _rr_terms(S0, K, T, r, sigma, H, q, phi, eta):
    """Reiner-Rubinstein/Haug building blocks A, B, C, D (rebate 0)."""
    b = r - q  # cost of carry
    sqT = jnp.sqrt(T)
    sig = jnp.maximum(sigma * sqT, 1e-12)
    mu = (b - 0.5 * sigma**2) / jnp.maximum(sigma**2, 1e-12)

    x1 = jnp.log(S0 / K) / sig + (1.0 + mu) * sig
    x2 = jnp.log(S0 / H) / sig + (1.0 + mu) * sig
    y1 = jnp.log(H * H / (S0 * K)) / sig + (1.0 + mu) * sig
    y2 = jnp.log(H / S0) / sig + (1.0 + mu) * sig

    ebrt = jnp.exp((b - r) * T)
    ert = jnp.exp(-r * T)
    hs = H / S0
    pow1 = hs ** (2.0 * (mu + 1.0))
    pow2 = hs ** (2.0 * mu)

    def plain(z):
        return phi * (
            S0 * ebrt * norm_cdf(phi * z) - K * ert * norm_cdf(phi * z - phi * sig)
        )

    def reflected(z):
        return phi * (
            S0 * ebrt * pow1 * norm_cdf(eta * z)
            - K * ert * pow2 * norm_cdf(eta * z - eta * sig)
        )

    return plain(x1), plain(x2), reflected(y1), reflected(y2)


def barrier_price(S0, K, T, r, sigma, barrier, q=0.0, option_type: str = "call",
                  barrier_type: str = "down-in"):
    """Reiner-Rubinstein European barrier price, all four knock variants
    (rebate 0, continuous monitoring).

    Generalizes the reference's QuantLib ``Barrier.DownIn`` engine
    (`american_monte_carlo.py:63`) to ``down-in | up-in | down-out |
    up-out``. Knock-outs use in-out parity (in + out = vanilla, rebate 0);
    a spot starting beyond the barrier means already-knocked (in → vanilla,
    out → 0).
    """
    S0, K, T, r, sigma, H, q = map(jnp.asarray, (S0, K, T, r, sigma, barrier, q))
    bt = barrier_type.strip().lower()
    if bt not in ("down-in", "up-in", "down-out", "up-out"):
        raise ValueError(f"barrier_type must be down/up-in/out, got {barrier_type!r}")
    down = bt.startswith("down")
    knock_in = bt.endswith("in")
    phi = _phi(option_type)
    eta = 1.0 if down else -1.0
    is_call = option_type.strip().lower() == "call"

    A, B, C, D = _rr_terms(S0, K, T, r, sigma, H, q, phi, eta)
    if down:
        ins = jnp.where(K >= H, C, A - B + D) if is_call else jnp.where(K >= H, B - C + D, A)
    else:
        # up-and-in (Haug): call: K>=H → A ; K<H → B - C + D
        #                   put:  K>=H → A - B + D ; K<H → C
        ins = jnp.where(K >= H, A, B - C + D) if is_call else jnp.where(K >= H, A - B + D, C)
    ins = jnp.maximum(ins, 0.0)
    vanilla = bs_price(S0, K, T, r, sigma, q, option_type)
    already = (S0 <= H) if down else (S0 >= H)
    if knock_in:
        return jnp.where(already, vanilla, ins)
    out = jnp.maximum(vanilla - ins, 0.0)
    return jnp.where(already, 0.0, out)


def down_in_price(S0, K, T, r, sigma, barrier, q=0.0, option_type: str = "call"):
    """Reiner-Rubinstein down-and-in European barrier price (rebate 0,
    continuous monitoring, barrier below spot).

    Equivalent of QuantLib's `AnalyticBarrierEngine` with
    ``ql.Barrier.DownIn`` (`american_monte_carlo.py:40,63`).
    """
    return barrier_price(S0, K, T, r, sigma, barrier, q, option_type, "down-in")


@partial(jax.jit, static_argnames=("n_steps", "option_type", "american"))
def _crr_impl(S0, K, T, r, sigma, q, n_steps, option_type, american):
    dtype = jnp.result_type(S0, K, T, r, sigma, jnp.float32)
    S0, K, T, r, sigma, q = (jnp.asarray(v, dtype) for v in (S0, K, T, r, sigma, q))
    dt = T / n_steps
    u, d, p, disc = _tree_constants(r, q, sigma, dt)
    phi = _phi(option_type)

    j = jnp.arange(n_steps + 1, dtype=dtype)  # number of up-moves

    def node_spots(level):
        # S at level i, node j = S0 * u^j * d^(i-j); padded beyond j > i
        # (padding nodes are never read by the final V[0]).
        return S0 * jnp.exp((2.0 * j - level) * sigma * jnp.sqrt(dt))

    V = jnp.maximum(phi * (node_spots(jnp.asarray(n_steps, dtype)) - K), 0.0)

    def step(V, level):
        Vup = jnp.concatenate([V[1:], V[-1:]])
        V = disc * (p * Vup + (1.0 - p) * V)
        if american:
            intrinsic = jnp.maximum(phi * (node_spots(level) - K), 0.0)
            V = jnp.maximum(V, intrinsic)
        return V, None

    levels = jnp.arange(n_steps, dtype=dtype)
    V, _ = lax.scan(step, V, levels, reverse=True)
    return V[0]


def crr_price(S0, K, T, r, sigma, n_steps: int = 1000, q=0.0,
              option_type: str = "call", american: bool = False):
    """Cox-Ross-Rubinstein binomial price.

    Equivalent of QuantLib's ``BinomialVanillaEngine(process, "crr",
    n_steps)`` (`american_monte_carlo.py:33`), as a ``lax.scan`` over tree
    levels with a fixed-size padded node vector (SURVEY §7.6).
    """
    return _crr_impl(S0, K, T, r, sigma, q, int(n_steps), option_type, american)


@partial(jax.jit, static_argnames=("n_steps", "option_type", "american", "down",
                                   "knock_in"))
def _crr_barrier_impl(S0, K, T, r, sigma, q, barrier, n_steps, option_type,
                      american, down, knock_in):
    dtype = jnp.result_type(S0, K, T, r, sigma, jnp.float32)
    S0, K, T, r, sigma, q, H = (
        jnp.asarray(v, dtype) for v in (S0, K, T, r, sigma, q, barrier)
    )
    dt = T / n_steps
    u, d, p, disc = _tree_constants(r, q, sigma, dt)
    phi = _phi(option_type)
    j = jnp.arange(n_steps + 1, dtype=dtype)

    def node_spots(level):
        return S0 * jnp.exp((2.0 * j - level) * sigma * jnp.sqrt(dt))

    def hit(S):
        return S <= H if down else S >= H

    S_T = node_spots(jnp.asarray(n_steps, dtype))
    payoff_T = jnp.maximum(phi * (S_T - K), 0.0)

    if knock_in:
        # joint vanilla/knock-in recursion: touching the barrier converts
        # the claim into the vanilla; no early exercise before knock-in
        # (SURVEY Q4 semantics). A barrier touch at maturity counts, like
        # the LSMC engine (`american_monte_carlo.py:147-148`).
        V_van = payoff_T
        V_bar = jnp.where(hit(S_T), payoff_T, 0.0)

        def step(carry, level):
            V_van, V_bar = carry
            S = node_spots(level)
            van_up = jnp.concatenate([V_van[1:], V_van[-1:]])
            bar_up = jnp.concatenate([V_bar[1:], V_bar[-1:]])
            V_van = disc * (p * van_up + (1.0 - p) * V_van)
            V_bar = disc * (p * bar_up + (1.0 - p) * V_bar)
            if american:
                V_van = jnp.maximum(V_van, jnp.maximum(phi * (S - K), 0.0))
            V_bar = jnp.where(hit(S), V_van, V_bar)
            return (V_van, V_bar), None

        levels = jnp.arange(n_steps, dtype=dtype)
        (V_van, V_bar), _ = lax.scan(step, (V_van, V_bar), levels, reverse=True)
        return V_bar[0]

    # knock-out: value dies at the barrier (rebate 0); exercise while alive
    V = jnp.where(hit(S_T), 0.0, payoff_T)

    def step(V, level):
        S = node_spots(level)
        V_up = jnp.concatenate([V[1:], V[-1:]])
        V = disc * (p * V_up + (1.0 - p) * V)
        if american:
            V = jnp.maximum(V, jnp.maximum(phi * (S - K), 0.0))
        V = jnp.where(hit(S), 0.0, V)
        return V, None

    levels = jnp.arange(n_steps, dtype=dtype)
    V, _ = lax.scan(step, V, levels, reverse=True)
    return V[0]


def crr_barrier_price(S0, K, T, r, sigma, barrier, n_steps: int = 1000, q=0.0,
                      option_type: str = "call", american: bool = False,
                      barrier_type: str = "down-in"):
    """CRR binomial barrier price, all four knock variants (rebate 0,
    tree-level monitoring). Generalizes QuantLib's `BinomialBarrierEngine`
    (`american_monte_carlo.py:43`)."""
    bt = barrier_type.strip().lower()
    if bt not in ("down-in", "up-in", "down-out", "up-out"):
        raise ValueError(f"barrier_type must be down/up-in/out, got {barrier_type!r}")
    return _crr_barrier_impl(
        S0, K, T, r, sigma, q, barrier, int(n_steps), option_type, american,
        bt.startswith("down"), bt.endswith("in"),
    )


def crr_down_in_price(S0, K, T, r, sigma, barrier, n_steps: int = 1000, q=0.0,
                      option_type: str = "call", american: bool = False):
    """CRR binomial down-and-in barrier price (rebate 0).

    Equivalent of QuantLib's ``BinomialBarrierEngine(process, "crr",
    n_steps)`` (`american_monte_carlo.py:43`), via a joint vanilla/knock-in
    backward scan.
    """
    return _crr_barrier_impl(
        S0, K, T, r, sigma, q, barrier, int(n_steps), option_type, american,
        True, True,
    )


def implied_vol(price, S0, K, T, r, q=0.0, option_type: str = "call",
                n_iter: int = 32, sigma0: float = 0.2):
    """Black-Scholes implied volatility by vectorized Newton iterations
    (fixed iteration count — jit/vmap friendly; converges quadratically, 32
    steps is far past f32 saturation). Broadcasts over any argument shape.
    Returns NaN where the price is outside the no-arbitrage band."""
    price, S0, K, T, r, q = map(jnp.asarray, (price, S0, K, T, r, q))
    dtype = jnp.result_type(price, S0, jnp.float32)
    phi = _phi(option_type)
    lo = jnp.maximum(phi * (S0 * jnp.exp(-q * T) - K * jnp.exp(-r * T)), 0.0)
    hi = jnp.where(phi > 0, S0 * jnp.exp(-q * T), K * jnp.exp(-r * T))
    valid = (price > lo + 1e-12) & (price < hi - 1e-12)

    def body(sigma, _):
        p = bs_price(S0, K, T, r, sigma, q, option_type)
        sqT = jnp.sqrt(T)
        d1 = (jnp.log(S0 / K) + (r - q + 0.5 * sigma**2) * T) / jnp.maximum(sigma * sqT, 1e-12)
        vega = S0 * jnp.exp(-q * T) * sqT * jnp.exp(-0.5 * d1 * d1) / jnp.sqrt(2 * jnp.pi)
        step = (p - price) / jnp.maximum(vega, 1e-8)
        sigma = jnp.clip(sigma - step, 1e-4, 5.0)
        return sigma, None

    sigma, _ = lax.scan(body, jnp.full(jnp.broadcast_shapes(price.shape, S0.shape, K.shape),
                                       sigma0, dtype), None, length=n_iter)
    return jnp.where(valid, sigma, jnp.nan)


def oracle_price(S0, K, T, r, sigma, n_steps: int = 1000, q=0.0,
                 option_type: str = "call", exercise: str = "european",
                 barrier=None, barrier_type: str = "down-in"):
    """Dispatch to the right engine, mirroring `setup_exercise_and_engine`
    (`american_monte_carlo.py:10-53`):

    ==============  ==========  =================================
    exercise        barrier     engine
    ==============  ==========  =================================
    european        None        analytic Black-Scholes
    american        None        CRR binomial (``n_steps``)
    european        H           Reiner-Rubinstein down-and-in
    american        H           CRR binomial down-and-in
    ==============  ==========  =================================
    """
    exercise = exercise.strip().lower()
    if barrier is None:
        if exercise == "european":
            return bs_price(S0, K, T, r, sigma, q, option_type)
        return crr_price(S0, K, T, r, sigma, n_steps, q, option_type, american=True)
    if exercise == "european":
        return barrier_price(S0, K, T, r, sigma, barrier, q, option_type, barrier_type)
    return crr_barrier_price(
        S0, K, T, r, sigma, barrier, n_steps, q, option_type, american=True,
        barrier_type=barrier_type,
    )


@partial(jax.jit, static_argnames=("option_type", "n_steps", "n_iter"))
def _american_iv_impl(price, S0, K, T, r, q, option_type, n_steps, n_iter):
    shape = jnp.broadcast_shapes(*(jnp.shape(a) for a in
                                   (price, S0, K, T, r, q)))
    price, S0, K, T, r, q = (
        jnp.broadcast_to(jnp.asarray(a, jnp.float32), shape).reshape(-1)
        for a in (price, S0, K, T, r, q))
    phi = _phi(option_type)
    intrinsic = jnp.maximum(phi * (S0 - K), 0.0)

    crr_v = jax.vmap(
        lambda s0, k, t, rr, sig, qq: _crr_impl(
            s0, k, t, rr, sig, qq, n_steps, option_type, True))

    hi0 = jnp.full(price.shape, 4.0)
    lo0 = jnp.full(price.shape, 1e-4)
    p_hi = crr_v(S0, K, T, r, hi0, q)
    valid = (price > intrinsic + 1e-7) & (price < p_hi - 1e-7)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        below = crr_v(S0, K, T, r, mid, q) < price
        return jnp.where(below, mid, lo), jnp.where(below, hi, mid)

    lo, hi = lax.fori_loop(0, n_iter, body, (lo0, hi0))
    out = jnp.where(valid, 0.5 * (lo + hi), jnp.nan)
    return out.reshape(shape)


def american_implied_vol(price, S0, K, T, r, q=0.0,
                         option_type: str = "put", n_steps: int = 500,
                         n_iter: int = 30):
    """Implied volatility from AMERICAN prices (de-Americanization).

    Vectorized bisection on the CRR lattice (`crr_price` semantics, one
    vmapped tree rollback per iteration, all inside a single jit):
    American prices are strictly increasing in σ, so 30 halvings of
    [1e-4, 4] resolve σ far below the f32 lattice noise (~1e-4 in price
    ≈ 3e-6 in vol at ATM vega). Broadcasts over any argument shape;
    returns NaN where the quote sits outside (intrinsic, price at σ=4) —
    the American analogue of `implied_vol`'s no-arbitrage band.

    The reference has no inverse problem at all; this is the standard
    desk tool for quoting American options (equity singles) in vol terms.
    """
    return _american_iv_impl(price, S0, K, T, r, q, option_type,
                             int(n_steps), int(n_iter))
