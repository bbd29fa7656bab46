"""Hull-White + GBM hybrid (stochastic short rate) — amcx.hybrid.

Validation strategy: the simulation scheme is EXACT (OU integrals, 3×3
Cholesky of the per-step joint), so the gates are sharp: (1) the money
market account must reprice the flat fitted curve E[e^{−∫r}] = e^{−r0·T}
and the discounted spot must be a martingale; (2) Europeans must match the
hybrid closed form (T-forward-measure Black) to MC tolerance at ANY
(κ, σ_r, ρ); (3) σ_r → 0 collapses everything to the flat-rate engines;
(4) American structure (≥ European, rho sensitivity sign).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, bs_price, price_option
from amcx.hybrid import (HullWhiteParams, european_price_hw, price_option_hw,
                         simulate_hybrid_hw)

HW = HullWhiteParams(100.0, 0.04, 0.2, kappa=0.8, sigma_r=0.015, rho=-0.4)
SIM = SimConfig(n_paths=131_072, n_steps=50, antithetic=True)
PUT_E = ProductSpec(K=105.0, T=1.0, option_type="put", exercise="european")
PUT_A = ProductSpec(K=105.0, T=1.0, option_type="put", exercise="american")


def test_closed_form_collapses_to_bs():
    hw0 = HullWhiteParams(100.0, 0.05, 0.25, kappa=0.5, sigma_r=1e-9,
                          rho=0.3)
    for ot, k in (("put", 105.0), ("call", 95.0)):
        a = european_price_hw(hw0, k, 1.0, ot)
        b = float(bs_price(100.0, k, 1.0, 0.05, 0.25, option_type=ot))
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_numeraire_and_martingale():
    """Exactness gates on the simulation itself: E[e^{−∫r}] = P(0,T) and
    E[e^{−∫r}·S_T] = S0 (antithetic kills the odd error terms)."""
    S, r, df = simulate_hybrid_hw(jax.random.key(0), HW, 1.0, SIM)
    D = jnp.prod(df, axis=0)
    np.testing.assert_allclose(float(jnp.mean(D)), np.exp(-HW.r0), atol=3e-4)
    assert abs(float(jnp.mean(D * S[-1])) - HW.S0) < 0.15
    # short-rate marginals: E[r_T] = r0 + α_T, Var r_T = σ_r²·B2(T)
    k, sr = HW.kappa, HW.sigma_r
    alpha_T = sr**2 / (2 * k**2) * (1 - np.exp(-k)) ** 2
    var_T = sr**2 * (1 - np.exp(-2 * k)) / (2 * k)
    assert abs(float(jnp.mean(r[-1])) - (HW.r0 + alpha_T)) < 3e-4
    np.testing.assert_allclose(float(jnp.var(r[-1])), var_T, rtol=0.05)


@pytest.mark.parametrize("rho", [-0.4, 0.0, 0.5])
def test_european_matches_closed_form(rho):
    hw = HullWhiteParams(100.0, 0.04, 0.2, kappa=0.8, sigma_r=0.02, rho=rho)
    res = price_option_hw(jax.random.key(1), hw, PUT_E,
                          RegressionSpec(degree=3), SIM)
    cf = european_price_hw(hw, 105.0, 1.0, "put")
    assert abs(float(res.price) - cf) < 4.0 * float(res.stderr), (
        float(res.price), cf, rho)


def test_sigma_r_zero_matches_flat_american():
    hw0 = HullWhiteParams(100.0, 0.05, 0.25, kappa=0.5, sigma_r=1e-7,
                          rho=0.0)
    spec = RegressionSpec(degree=4, regress_on="itm")
    a = price_option_hw(jax.random.key(2), hw0, PUT_A, spec, SIM)
    b = price_option(jax.random.key(2), MarketParams(100.0, 0.05, 0.25),
                     PUT_A, spec, SIM, engine="xla")
    # different path draws AND a different (2-D vs 1-D) policy basis:
    # MC + small policy gap tolerance
    assert abs(float(a.price) - float(b.price)) < 4.0 * (
        float(a.stderr) + float(b.stderr)) + 5e-3


def test_american_structure():
    spec = RegressionSpec(degree=3, regress_on="itm")
    am = price_option_hw(jax.random.key(3), HW, PUT_A, spec, SIM)
    eu = price_option_hw(jax.random.key(3), HW, PUT_E, spec, SIM)
    assert float(am.price) > float(eu.price)
    # total forward variance V = σ_S²T + 2ρσ_S∫σ_B + ∫σ_B²: for ρ ≥ 0
    # rate vol strictly raises V and hence the European price (for ρ < 0
    # the cross term can dominate and LOWER it — sign verified too)
    def eu_at(sr, rho):
        return european_price_hw(
            HullWhiteParams(100.0, 0.04, 0.2, kappa=0.8, sigma_r=sr,
                            rho=rho), 105.0, 1.0, "put")

    assert eu_at(0.03, 0.0) > eu_at(0.015, 0.0) > eu_at(1e-9, 0.0)
    assert eu_at(0.03, -0.4) < eu_at(1e-9, -0.4)  # vol-damping regime


def test_validation_errors():
    with pytest.raises(ValueError, match="barrier"):
        price_option_hw(
            jax.random.key(0), HW,
            ProductSpec(K=105.0, T=1.0, barrier=80.0, option_type="put",
                        exercise="american", barrier_type="down-in"),
            RegressionSpec(), SIM)


def test_ccr_exposures_under_stochastic_rates():
    """return_surface feeds compute_ccr_exposures: EPE/PFE under
    stochastic rates (the reference's surface -> CCR pipeline, now with a
    rate-coupled exercise boundary)."""
    from amcx.exposures import compute_ccr_exposures

    res = price_option_hw(jax.random.key(4), HW, PUT_A,
                          RegressionSpec(degree=3, regress_on="itm"),
                          SimConfig(n_paths=16_384, n_steps=20),
                          return_surface=True)
    assert res.continuation.shape == (21, 16_384)
    ccr = compute_ccr_exposures(res.continuation)
    assert ccr.epe.shape == (21,)
    assert float(ccr.epe[0]) == pytest.approx(float(res.price), rel=0.02)
    assert np.all(np.asarray(ccr.pfe95) >= np.asarray(ccr.epe) - 1e-5)


def test_fused_hybrid_matches_xla_on_shared_paths():
    """engine='fused': the (S, r) induction on the fused multi-asset
    kernels (pathwise-discount direct_y mode) vs the XLA engine on the
    SAME paths — gap is f32 regression noise only (measured ~1e-3)."""
    sim = SimConfig(n_paths=65_536, n_steps=30)
    spec = RegressionSpec(degree=3, regress_on="itm")
    a = price_option_hw(jax.random.key(3), HW, PUT_A, spec, sim,
                        engine="xla")
    b = price_option_hw(jax.random.key(3), HW, PUT_A, spec, sim,
                        engine="fused")
    assert abs(float(a.price) - float(b.price)) < 5e-3
    with pytest.raises(ValueError, match="fused"):
        price_option_hw(jax.random.key(3), HW, PUT_E, spec, sim,
                        engine="fused")
