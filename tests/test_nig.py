"""Normal Inverse Gaussian (IG-subordinated Levy) gates.

Dynamics beyond the reference (GBM-only,
`/root/reference/american_monte_carlo.py:71-95`): exact-in-distribution
IG-time-change simulation (Michael-Schucany-Haas sampler, no rejection
loop) validated against the Barndorff-Nielsen CF through the shared
Gil-Pelaez oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    NIGParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    bs_price,
    nig_price_cf,
    price_option_nig,
    simulate_nig,
)

M = MarketParams(100.0, 0.05, 0.2)
NIG = NIGParams(alpha=8.0, beta=-3.0, delta=0.3)
SIM = SimConfig(n_paths=65_536, n_steps=50)


def test_cf_oracle_gaussian_limit():
    # alpha -> inf with beta = 0, delta = sigma^2 alpha: variance
    # delta/gamma0 -> sigma^2 and excess kurtosis -> 0 — plain BS.
    a = 500.0
    nig = NIGParams(alpha=a, beta=0.0, delta=0.04 * a)
    p = nig_price_cf(100.0, 100.0, 1.0, 0.05, nig, option_type="put")
    ref = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 0.0, "put"))
    assert abs(p - ref) < 5e-3


def test_cf_oracle_put_call_parity():
    c = nig_price_cf(100.0, 105.0, 1.0, 0.05, NIG, option_type="call")
    p = nig_price_cf(100.0, 105.0, 1.0, 0.05, NIG, option_type="put")
    parity = 100.0 - 105.0 * np.exp(-0.05)
    assert abs(c - p - parity) < 1e-6


def test_param_feasibility_raises():
    with pytest.raises(ValueError):
        NIGParams(alpha=2.0, beta=2.5, delta=0.3)       # |beta| >= alpha
    with pytest.raises(ValueError):
        NIGParams(alpha=2.0, beta=1.5, delta=0.3)       # |beta+1| >= alpha


def test_ig_sampler_moments():
    # IG(mean m, shape lam): E = m, Var = m^3/lam — check the MSH sampler.
    from amcx.dynamics import _sample_ig

    m, lam = 0.7, 2.0
    x = np.asarray(_sample_ig(jax.random.key(3), m, lam, (200_000,),
                              jnp.float32), np.float64)
    assert abs(x.mean() - m) < 0.01
    assert abs(x.var() - m**3 / lam) < 0.02


def test_discounted_spot_is_martingale():
    S = simulate_nig(jax.random.key(1), M, NIG, 1.0, SIM)
    tail = np.asarray(S[-1], np.float64)
    stderr = tail.std() / np.sqrt(tail.size)
    assert abs(tail.mean() - 100.0 * np.exp(0.05)) < 4.0 * stderr


def test_european_mc_matches_cf_oracle():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    res = price_option_nig(jax.random.key(2), M, NIG, prod,
                           RegressionSpec(degree=4), SIM)
    ref = nig_price_cf(100.0, 100.0, 1.0, 0.05, NIG, option_type="put")
    assert abs(float(res.price) - ref) < 4.0 * float(res.stderr)


def test_american_put_above_european():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    res = price_option_nig(jax.random.key(2), M, NIG, prod,
                           RegressionSpec(degree=4), SIM)
    euro = nig_price_cf(100.0, 100.0, 1.0, 0.05, NIG, option_type="put")
    assert float(res.price) > euro + 0.1


def test_mega_engine_matches_xla_on_shared_paths():
    sim = SimConfig(n_paths=16_384, n_steps=50)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=4)
    r_x = price_option_nig(jax.random.key(4), M, NIG, prod, spec, sim)
    r_m = price_option_nig(jax.random.key(4), M, NIG, prod, spec, sim,
                           engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 2.5e-3
