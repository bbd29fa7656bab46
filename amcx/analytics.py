"""Error analytics between LSMC continuation surfaces and oracle prices.

Equivalent of `compute_differences`
(`/root/reference/american_monte_carlo.py:229-250`), vectorized over the
whole ``(n_steps+1, n_paths)`` grid:

- ``absolute``:   ``|cont − oracle|``
- ``difference``: ``cont − oracle``
- ``relative``:   ``(cont − oracle) / oracle`` with the reference's quirks
  (SURVEY Q9): a 1e-4 deadband where the two agree, and a
  ``(cont − 1e-4)/1e-4`` fallback where the oracle price is exactly zero.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compute_differences", "oracle_grid_values"]


def compute_differences(continuation, oracle_values, difference_type: str = "difference"):
    cont = jnp.asarray(continuation)
    orac = jnp.asarray(oracle_values)
    if difference_type == "absolute":
        return jnp.abs(cont - orac)
    if difference_type == "difference":
        return cont - orac
    if difference_type == "relative":
        dead = jnp.abs(orac - cont) < 1e-4
        safe = jnp.where(orac != 0, orac, 1.0)
        rel = jnp.where(orac != 0, (cont - orac) / safe, (cont - 1e-4) / 1e-4)
        return jnp.where(dead, 0.0, rel)
    raise ValueError(
        f"Invalid difference_type {difference_type!r}. "
        "Must be 'absolute', 'difference', or 'relative'."
    )


def oracle_grid_values(paths_tm, K, r, T, sigma, q=0.0, option_type="put",
                       exercise="european", barrier=None, crr_steps=100):
    """Oracle price at every (t, path) grid point.

    Equivalent of `compute_quantlib_values`
    (`american_monte_carlo.py:385-396`), which builds ~n_paths·n_steps
    QuantLib engines in a double Python loop — by far the slowest part of the
    reference's `main`. Here the analytic engines evaluate the whole grid in
    one vectorized call; for American (binomial) grids we vmap the scan-based
    tree over grid points.

    Barrier grid points fall back to the vanilla price once the *remaining*
    option can no longer knock (the reference handles this as a RuntimeError
    fallback, `american_monte_carlo.py:219-225`; here: a knocked path holds
    the vanilla, so we price vanilla where S <= barrier and barrier-in
    otherwise — for the grid product we price the *unknocked* claim, matching
    the reference's per-point fresh option of maturity T - t·dt).
    """
    import jax

    from .oracle import bs_price, crr_price, down_in_price, crr_down_in_price

    n_steps = paths_tm.shape[0] - 1
    dt = T / n_steps
    # Remaining maturity per step; clamp the t=T row to a tiny positive
    # maturity (the reference prices a 0-maturity QuantLib option there).
    tau = jnp.maximum(T - jnp.arange(n_steps + 1) * dt, 1e-9)[:, None]
    S = paths_tm
    ex = exercise.strip().lower()

    if barrier is None:
        if ex == "european":
            return bs_price(S, K, tau, r, sigma, q, option_type)
        f = lambda s, t_: crr_price(s, K, t_, r, sigma, crr_steps, q, option_type, american=True)
        return jax.vmap(jax.vmap(f))(S, jnp.broadcast_to(tau, S.shape))
    if ex == "european":
        di = down_in_price(S, K, tau, r, sigma, barrier, q, option_type)
        vanilla = bs_price(S, K, tau, r, sigma, q, option_type)
        return jnp.where(S <= barrier, vanilla, di)
    f = lambda s, t_: crr_down_in_price(s, K, t_, r, sigma, barrier, crr_steps, q, option_type, american=True)
    fv = lambda s, t_: crr_price(s, K, t_, r, sigma, crr_steps, q, option_type, american=True)
    di = jax.vmap(jax.vmap(f))(S, jnp.broadcast_to(tau, S.shape))
    vanilla = jax.vmap(jax.vmap(fv))(S, jnp.broadcast_to(tau, S.shape))
    return jnp.where(S <= barrier, vanilla, di)
