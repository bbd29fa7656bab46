"""Two-asset spread option gates (max(S1 − S2 − K, 0)).

Product family beyond the reference (single-asset only,
`/root/reference/american_monte_carlo.py:85-86`): generalizes the
Margrabe exchange (K = 0, exact oracle) to a struck spread validated
against Kirk's approximation.
"""

import jax
import numpy as np

from amcx import (
    RegressionSpec,
    SimConfig,
    kirk_price,
    margrabe_price,
    price_spread_option,
)

SIM = SimConfig(n_paths=32_768, n_steps=50, antithetic=True)
SPEC = RegressionSpec(degree=4, regress_on="itm")
ARGS = dict(T=1.0, r=0.05, sigma1=0.25, sigma2=0.2, rho=0.3)


def test_kirk_collapses_to_margrabe_at_zero_strike():
    k0 = kirk_price(100.0, 95.0, 0.0, 1.0, 0.05, 0.25, 0.2, rho=0.3)
    mg = margrabe_price(100.0, 95.0, 1.0, 0.25, 0.2, rho=0.3)
    assert abs(k0 - mg) < 1e-10


def test_european_spread_matches_kirk():
    res = price_spread_option(jax.random.key(0), 100.0, 95.0, 5.0,
                              exercise="european", spec=SPEC, sim=SIM,
                              **ARGS)
    kirk = kirk_price(100.0, 95.0, 5.0, 1.0, 0.05, 0.25, 0.2, rho=0.3)
    # Kirk is bp-accurate at K/S2 ~ 5%; MC tolerance absorbs both errors.
    assert abs(float(res.price) - kirk) < 4.0 * float(res.stderr) + 0.03


def test_american_spread_at_least_european():
    re_ = price_spread_option(jax.random.key(1), 100.0, 95.0, 5.0,
                              exercise="european", spec=SPEC, sim=SIM,
                              **ARGS)
    ra = price_spread_option(jax.random.key(1), 100.0, 95.0, 5.0,
                             exercise="american", spec=SPEC, sim=SIM,
                             **ARGS)
    # q1=q2=0: early exercise never optimal; American == European up to
    # (low-side) policy bias on shared paths.
    assert float(ra.price) > float(re_.price) - 3.0 * float(ra.stderr)
    assert float(ra.price) < float(re_.price) + 3.0 * float(ra.stderr)


def test_mega_engine_matches_xla_on_shared_paths():
    # xla (cross-basis scan) vs the ONE-kernel ma-mega on shared paths:
    # different regression arithmetics, so the bound is in-sample boundary
    # noise at this path count, not kernel parity (cf. the 5e-3 fused-vs-
    # mega exchange gate in test_basket.py, same kernel family).
    sim = SimConfig(n_paths=16_384, n_steps=25, antithetic=True)
    r_x = price_spread_option(jax.random.key(2), 100.0, 95.0, 5.0,
                              exercise="american", spec=SPEC, sim=sim,
                              **ARGS)
    r_m = price_spread_option(jax.random.key(2), 100.0, 95.0, 5.0,
                              exercise="american", spec=SPEC, sim=sim,
                              engine="mega", **ARGS)
    assert abs(float(r_x.price) - float(r_m.price)) < 0.05


def test_exchange_is_spread_at_zero_strike():
    r_s = price_spread_option(jax.random.key(3), 100.0, 95.0, 0.0,
                              exercise="american", spec=SPEC, sim=SIM,
                              **ARGS)
    mg = margrabe_price(100.0, 95.0, 1.0, 0.25, 0.2, rho=0.3)
    assert abs(float(r_s.price) - mg) < 4.0 * float(r_s.stderr) + 0.05
