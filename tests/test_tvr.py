"""Tsitsiklis–van Roy fitted value iteration vs Longstaff-Schwartz.

Pins the textbook estimator-family facts the docstring of
`backward_induction_tvr` claims (probed at 131k paths before the gates
were set): TvR carries the fitted surface through the recursion, so its
projection error COMPOUNDS — upward (per-step max of a fitted kink) and
growing with the number of exercise dates — while LS uses the fit only
for the exercise decision and stays near the CRR anchor. The bias is
path-count independent (approximation, not statistical error), so richer
bases — not more paths — shrink it.
"""

import jax
import jax.numpy as jnp
import numpy as np

from amcx.engine import backward_induction, backward_induction_tvr
from amcx.oracle import crr_price
from amcx.paths import simulate_gbm
from amcx.types import MarketParams, RegressionSpec, SimConfig

M = MarketParams(100.0, 0.05, 0.2)
PAYOFF = lambda st: jnp.maximum(100.0 - st, 0.0)


def _pair(n_steps, n_paths=65_536, degree=4, key=0):
    sim = SimConfig(n_paths=n_paths, n_steps=n_steps, antithetic=True)
    S = simulate_gbm(jax.random.key(key), M, 1.0, sim)
    spec = RegressionSpec(degree=degree, regress_on="all")
    dt = 1.0 / n_steps
    ls = backward_induction(S, jnp.ones(S.shape, bool), M.r, dt, PAYOFF,
                            spec, american=True, return_surface=False,
                            antithetic=True)
    tvr = backward_induction_tvr(S, M.r, dt, PAYOFF, spec, antithetic=True)
    return float(ls.price), float(tvr.price), float(tvr.stderr)


def test_tvr_upward_of_ls_and_converges_at_few_dates():
    crr = crr_price(100.0, 100.0, 1.0, 0.05, 0.2, 2000,
                    option_type="put", american=True)
    ls5, tvr5, se5 = _pair(n_steps=5)
    # few dates: both estimators near the (Bermudan-5 ≤ American) anchor
    assert tvr5 >= ls5 - 2e-3          # upward of LS even here
    assert abs(tvr5 - crr) < 0.35      # measured gap ~0.15
    ls50, tvr50, _ = _pair(n_steps=50)
    assert tvr50 > ls50 + 0.3          # measured gap ~0.9 at 50 dates
    assert tvr50 > tvr5 + 0.3          # bias GROWS with exercise dates
    assert abs(ls50 - crr) < 0.1       # LS stays anchored


def test_tvr_bias_shrinks_with_basis_not_paths():
    _, tvr_d2, _ = _pair(n_steps=25, degree=2)
    _, tvr_d6, _ = _pair(n_steps=25, degree=6)
    assert tvr_d6 < tvr_d2 - 0.1       # richer basis → smaller projection
    _, tvr_small, _ = _pair(n_steps=25, n_paths=16_384)
    _, tvr_big, _ = _pair(n_steps=25, n_paths=131_072)
    # path-count barely moves it (approximation error, not noise):
    # measured drift < 0.02 over 8× paths
    assert abs(tvr_big - tvr_small) < 0.15


def test_tvr_stderr_and_degenerate_t0():
    # honest error bar: t=0 leg is an explicit cross-path mean
    _, tvr, se = _pair(n_steps=10)
    assert 1e-4 < se < 0.1
    # single-step product: TvR == plain discounted-European mean
    sim = SimConfig(n_paths=32_768, n_steps=1, antithetic=True)
    S = simulate_gbm(jax.random.key(3), M, 1.0, sim)
    res = backward_induction_tvr(S, M.r, 1.0, PAYOFF,
                                 RegressionSpec(degree=3), antithetic=True)
    pay = PAYOFF(S[-1]) * np.exp(-M.r)
    half = sim.n_paths // 2
    want = float(jnp.mean(0.5 * (pay[:half] + pay[half:])))
    np.testing.assert_allclose(float(res.price), want, rtol=1e-6)
