"""Variance Gamma (pure-jump Levy) gates.

Dynamics beyond the reference (GBM-only,
`/root/reference/american_monte_carlo.py:71-95`): exact-in-distribution
gamma-time-change simulation feeding the SAME LSMC engines, validated
against the Madan-Carr-Chang characteristic-function oracle
(Gil-Pelaez inversion, host f64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    VGParams,
    bs_price,
    price_option_vg,
    simulate_vg,
    vg_price_cf,
)

M = MarketParams(100.0, 0.05, 0.2)
VG = VGParams(theta=-0.14, sigma=0.2, nu=0.2)
SIM = SimConfig(n_paths=65_536, n_steps=50)


def test_cf_oracle_collapses_to_bs_at_small_nu():
    # nu -> 0 freezes the gamma clock at dG = dt: plain Black-Scholes.
    vg = VGParams(theta=0.0, sigma=0.2, nu=1e-4)
    p = vg_price_cf(100.0, 100.0, 1.0, 0.05, vg, option_type="put")
    ref = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.2, 0.0, "put"))
    assert abs(p - ref) < 5e-4


def test_cf_oracle_put_call_parity():
    c = vg_price_cf(100.0, 105.0, 1.0, 0.05, VG, option_type="call")
    p = vg_price_cf(100.0, 105.0, 1.0, 0.05, VG, option_type="put")
    parity = 100.0 - 105.0 * np.exp(-0.05)
    assert abs(c - p - parity) < 1e-6


def test_infeasible_compensation_raises():
    with pytest.raises(ValueError):
        VGParams(theta=2.0, sigma=1.0, nu=1.0)


def test_discounted_spot_is_martingale():
    S = simulate_vg(jax.random.key(1), M, VG, 1.0, SIM)
    tail = np.asarray(S[-1], np.float64)
    stderr = tail.std() / np.sqrt(tail.size)
    assert abs(tail.mean() - 100.0 * np.exp(0.05)) < 4.0 * stderr


def test_european_mc_matches_cf_oracle():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european")
    res = price_option_vg(jax.random.key(2), M, VG, prod,
                          RegressionSpec(degree=4), SIM)
    ref = vg_price_cf(100.0, 100.0, 1.0, 0.05, VG, option_type="put")
    assert abs(float(res.price) - ref) < 4.0 * float(res.stderr)


def test_american_put_above_european():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    res = price_option_vg(jax.random.key(2), M, VG, prod,
                          RegressionSpec(degree=4), SIM)
    euro = vg_price_cf(100.0, 100.0, 1.0, 0.05, VG, option_type="put")
    assert float(res.price) > euro + 0.1


def test_mega_engine_matches_xla_on_shared_paths():
    sim = SimConfig(n_paths=16_384, n_steps=50)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(degree=4)
    r_x = price_option_vg(jax.random.key(4), M, VG, prod, spec, sim)
    r_m = price_option_vg(jax.random.key(4), M, VG, prod, spec, sim,
                          engine="mega")
    assert abs(float(r_x.price) - float(r_m.price)) < 2.5e-3


def test_antithetic_pairs_share_the_gamma_clock():
    sim = SimConfig(n_paths=4_096, n_steps=16, antithetic=True)
    S = simulate_vg(jax.random.key(5), M, VG, 1.0, sim)
    # Shared dG + mirrored gaussian: log-return pair sums collapse to the
    # deterministic-in-dG part, so Var(a+b) << 2 Var(a).
    logs = np.asarray(jnp.log(S[1] / 100.0), np.float64)
    a, b = logs[: sim.n_paths // 2], logs[sim.n_paths // 2:]
    assert (a + b).var() < 0.5 * (2.0 * logs.var())
