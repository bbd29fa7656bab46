"""Bates (SVJ = Heston + lognormal jumps) gates.

Dynamics beyond the reference (GBM-only,
`/root/reference/american_monte_carlo.py:71-95`): the stochastic-vol +
jump composition feeding the SAME (S, v) engine matrix as Heston,
validated against the factorized characteristic-function oracle whose
two limits collapse exactly onto the already-gated Heston CF (λ=0) and
Merton series (ξ→0, v0=θ) oracles.
"""

import jax
import jax.numpy as jnp
import numpy as np

from amcx import (
    HestonParams,
    MertonJumps,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    bates_price_cf,
    heston_price_cf,
    merton_price,
    price_option_bates,
    simulate_bates,
)

HP = HestonParams(S0=100.0, r=0.05, q=0.0, v0=0.04, kappa=1.5, theta=0.04,
                  xi=0.5, rho=-0.6)
JP = MertonJumps(lam=0.6, mu_j=-0.10, sigma_j=0.15)
SIM = SimConfig(n_paths=65_536, n_steps=50)


def test_cf_collapses_to_heston_at_zero_intensity():
    j0 = MertonJumps(lam=0.0, mu_j=-0.1, sigma_j=0.15)
    for ot in ("call", "put"):
        b = bates_price_cf(HP, j0, 100.0, 1.0, ot)
        h = heston_price_cf(HP, 100.0, 1.0, ot)
        assert abs(b - h) < 1e-10, (ot, b, h)


def test_cf_collapses_to_merton_at_zero_vol_of_vol():
    # xi=1e-5, not smaller: below that the a/xi^2 terms in the shared
    # Heston CF lose precision (heston_price_cf itself drifts 0.013 from
    # BS at xi=1e-8; at 1e-5 both CFs are ~2e-6 from their limits).
    hp = HestonParams(S0=100.0, r=0.05, q=0.0, v0=0.04, kappa=1.5,
                      theta=0.04, xi=1e-5, rho=0.0)
    b = bates_price_cf(hp, JP, 105.0, 1.0, "put")
    m = merton_price(100.0, 105.0, 1.0, 0.05, 0.2, JP.lam, JP.mu_j,
                     JP.sigma_j, option_type="put")
    assert abs(b - float(m)) < 5e-5, (b, float(m))


def test_cf_put_call_parity():
    c = bates_price_cf(HP, JP, 100.0, 1.0, "call")
    p = bates_price_cf(HP, JP, 100.0, 1.0, "put")
    parity = 100.0 - 100.0 * np.exp(-0.05)
    assert abs(c - p - parity) < 1e-8


def test_jumps_raise_otm_put_value():
    # downward-jump overlay fattens the left tail: OTM put strictly dearer
    j0 = MertonJumps(lam=0.0, mu_j=-0.1, sigma_j=0.15)
    assert bates_price_cf(HP, JP, 80.0, 1.0, "put") > \
        bates_price_cf(HP, j0, 80.0, 1.0, "put") + 0.1


def test_discounted_spot_is_martingale():
    S = simulate_bates(jax.random.key(1), HP, JP, 1.0, SIM)
    tail = np.asarray(S[-1], np.float64)
    stderr = tail.std() / np.sqrt(tail.size)
    assert abs(tail.mean() - 100.0 * np.exp(0.05)) < 4.0 * stderr


def test_european_mc_matches_cf_oracle():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="european")
    res = price_option_bates(jax.random.key(2), HP, JP, prod,
                             RegressionSpec(degree=4), SIM)
    ref = bates_price_cf(HP, JP, 100.0, 1.0, "put")
    # Euler variance discretization bias at 50 steps is ~sub-stderr here
    assert abs(float(res.price) - ref) < 4.0 * float(res.stderr), (
        float(res.price), ref)


def test_american_put_above_european():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    res = price_option_bates(jax.random.key(2), HP, JP, prod,
                             RegressionSpec(degree=4), SIM)
    euro = bates_price_cf(HP, JP, 100.0, 1.0, "put")
    assert float(res.price) > euro + 0.05


def test_antithetic_pairs_mirror_diffusion():
    sim = SimConfig(n_paths=4_096, n_steps=16, antithetic=True)
    S = simulate_bates(jax.random.key(5), HP, JP, 1.0, sim)
    logs = np.asarray(jnp.log(S[1] / 100.0), np.float64)
    a, b = logs[: sim.n_paths // 2], logs[sim.n_paths // 2:]
    # mirrored gaussians + shared jump counts: pair-sum variance collapses
    assert (a + b).var() < 0.5 * (2.0 * logs.var())


def test_engine_matrix_parity_on_shared_paths():
    # xla / fused / mega consume the SAME simulated (S, v) state
    sim = SimConfig(n_paths=8_192, n_steps=20)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    spec = RegressionSpec(basis="chebyshev", degree=2)
    key = jax.random.key(4)
    r_x = price_option_bates(key, HP, JP, prod, spec, sim)
    r_f = price_option_bates(key, HP, JP, prod, spec, sim, engine="fused")
    r_m = price_option_bates(key, HP, JP, prod, spec, sim, engine="mega")
    assert abs(float(r_x.price) - float(r_f.price)) < 2.5e-3, (
        float(r_x.price), float(r_f.price))
    assert abs(float(r_x.price) - float(r_m.price)) < 2.5e-3, (
        float(r_x.price), float(r_m.price))


def test_validation_errors():
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="european")
    import pytest

    with pytest.raises(ValueError, match="American only"):
        price_option_bates(jax.random.key(0), HP, JP, prod,
                           sim=SimConfig(n_paths=4096, n_steps=8),
                           engine="mega")
    with pytest.raises(ValueError, match="engine"):
        price_option_bates(jax.random.key(0), HP, JP,
                           ProductSpec(K=100.0, T=1.0, option_type="put",
                                       exercise="american"),
                           sim=SimConfig(n_paths=4096, n_steps=8),
                           engine="nope")


def test_qe_scheme_coarse_steps_match_cf():
    """Andersen QE-M diffusion leg + exact jump overlay: at 8 steps on a
    Feller-violating config the European lands on the CF oracle while the
    Euler leg carries a visible positive truncation bias."""
    hp = HestonParams(S0=100.0, r=0.03, q=0.0, v0=0.04, kappa=1.0,
                      theta=0.04, xi=1.0, rho=-0.9)
    sim = SimConfig(n_paths=131_072, n_steps=8, antithetic=True)
    prod = ProductSpec(K=100.0, T=1.0, option_type="call",
                       exercise="european")
    ref = bates_price_cf(hp, JP, 100.0, 1.0, "call")
    qe = price_option_bates(jax.random.key(9), hp, JP, prod,
                            RegressionSpec(degree=2), sim, scheme="qe")
    assert abs(float(qe.price) - ref) < 4.0 * float(qe.stderr) + 0.02, (
        float(qe.price), ref, float(qe.stderr))
    eu = price_option_bates(jax.random.key(9), hp, JP, prod,
                            RegressionSpec(degree=2), sim, scheme="euler")
    assert float(eu.price) - ref > 0.5  # the bias QE removes
