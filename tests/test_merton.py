"""Merton jump-diffusion gates.

Dynamics beyond the reference (GBM-only,
`/root/reference/american_monte_carlo.py:71-95`): exact-in-distribution
compound-Poisson simulation feeding the SAME LSMC engines, validated
against the Merton (1976) series oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

from amcx import (
    MarketParams,
    MertonJumps,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    bs_price,
    merton_price,
    price_option_merton,
    simulate_merton,
)

M = MarketParams(100.0, 0.05, 0.2)
JP = MertonJumps(lam=0.75, mu_j=-0.12, sigma_j=0.18)
SIM = SimConfig(n_paths=65_536, n_steps=50)


def test_series_oracle_collapses_to_bs_at_zero_intensity():
    p = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, 0.0, -0.1, 0.15, option_type="put")
    ref = bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 0.0, "put")
    assert abs(float(p) - float(ref)) < 1e-5


def test_series_oracle_put_call_parity():
    c = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, JP.lam, JP.mu_j, JP.sigma_j,
                     option_type="call")
    p = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, JP.lam, JP.mu_j, JP.sigma_j,
                     option_type="put")
    parity = 100.0 - 100.0 * np.exp(-0.05)
    assert abs(float(c) - float(p) - parity) < 1e-4


def test_discounted_spot_is_martingale():
    S = simulate_merton(jax.random.key(1), M, JP, 1.0, SIM)
    tail = np.asarray(S[-1], np.float64)
    mean = tail.mean()
    target = 100.0 * np.exp(0.05)
    stderr = tail.std() / np.sqrt(tail.size)
    assert abs(mean - target) < 4.0 * stderr


def test_european_mc_matches_series_oracle():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    res = price_option_merton(jax.random.key(2), M, JP, prod,
                              RegressionSpec(degree=4), SIM)
    ref = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, JP.lam, JP.mu_j, JP.sigma_j,
                       option_type="put")
    assert abs(float(res.price) - float(ref)) < 4.0 * float(res.stderr)


def test_american_put_above_european():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    res = price_option_merton(jax.random.key(2), M, JP, prod,
                              RegressionSpec(degree=4), SIM)
    euro = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, JP.lam, JP.mu_j, JP.sigma_j,
                        option_type="put")
    # Early-exercise premium must be positive and material for a jumpy put.
    assert float(res.price) > float(euro) + 0.1


def test_american_call_q0_near_european():
    # Never exercised early without dividends regardless of jumps; the gap
    # is the documented all-paths LSMC policy bias (low side only).
    prod = ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american")
    res = price_option_merton(jax.random.key(3), M, JP, prod,
                              RegressionSpec(degree=4, regress_on="itm"), SIM)
    euro = merton_price(100.0, 100.0, 1.0, 0.05, 0.2, JP.lam, JP.mu_j, JP.sigma_j,
                        option_type="call")
    assert float(res.price) <= float(euro) + 3.0 * float(res.stderr)
    assert float(res.price) > float(euro) - 0.15


def test_mega_engine_matches_xla_on_shared_paths():
    sim = SimConfig(n_paths=16_384, n_steps=50)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=4)
    r_x = price_option_merton(jax.random.key(4), M, JP, prod, spec, sim)
    r_m = price_option_merton(jax.random.key(4), M, JP, prod, spec, sim,
                              engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 2.5e-3


def test_antithetic_pairs_mirror_diffusion():
    sim = SimConfig(n_paths=4_096, n_steps=16, antithetic=True)
    S = simulate_merton(jax.random.key(5), M, JP, 1.0, sim)
    # Shared jump counts + mirrored gaussians: the pair PRODUCT of gross
    # returns is a deterministic function of the count plane only — check
    # the pairing by verifying log S_1 + log S_1' has variance far below
    # 2*Var(log S_1) (perfect negative diffusion correlation).
    logs = np.asarray(jnp.log(S[1] / 100.0), np.float64)
    a, b = logs[: sim.n_paths // 2], logs[sim.n_paths // 2:]
    var_sum = (a + b).var()
    var_ind = 2.0 * logs.var()
    assert var_sum < 0.5 * var_ind
