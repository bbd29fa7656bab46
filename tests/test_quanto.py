"""Quanto/compo cross-currency options (`amcx.quanto`).

The decisive gate is adjustment-free: `quanto_two_factor_european`
simulates (X, Y=S·X) jointly under the domestic measure using ONLY
tradable drifts and must land on the closed form that embeds the
ρσ_Sσ_X quanto adjustment. Everything else certifies the effective-market
mapping through the engine matrix.
"""

import jax
import numpy as np
import pytest

from amcx.oracle import bs_price
from amcx.quanto import (QuantoParams, compo_european_price, compo_market,
                         price_compo_option, price_quanto_option,
                         quanto_crr_price, quanto_effective_market,
                         quanto_european_price, quanto_two_factor_european)
from amcx.types import ProductSpec, RegressionSpec, SimConfig

QP = QuantoParams(S0=100.0, r_d=0.05, r_f=0.01, sigma=0.25, fx_sigma=0.12,
                  rho=-0.4, q=0.02, fx_rate=1.3)
SPEC = RegressionSpec(degree=4, regress_on="all")
SIM = SimConfig(n_paths=65_536, n_steps=50, antithetic=True)


def _prod(exercise="european", option_type="put", barrier=None,
          barrier_type="down-in", K=100.0):
    return ProductSpec(K=K, T=1.0, option_type=option_type,
                       exercise=exercise, barrier=barrier,
                       barrier_type=barrier_type)


@pytest.mark.parametrize("option_type", ["put", "call"])
def test_two_factor_mc_lands_on_quanto_closed_form(option_type):
    """The adjustment-free (X, Y) simulation reproduces the q_eff closed
    form — certifies the measure change without assuming it."""
    price, se = quanto_two_factor_european(jax.random.key(0), QP, 100.0,
                                           1.0, option_type)
    cf = quanto_european_price(QP, 100.0, 1.0, option_type)
    assert abs(float(price) - cf) < 4.0 * float(se) + 1e-3, (
        float(price), cf, float(se))


def test_quanto_forward_parity():
    """C − P = fx_rate·e^{−r_d T}(F − K) with the quanto forward
    F = S0·e^{(r_f − q − ρσ_Sσ_X)T} — exact in the closed forms."""
    K, T = 95.0, 2.0
    c = quanto_european_price(QP, K, T, "call")
    p = quanto_european_price(QP, K, T, "put")
    F = QP.S0 * np.exp((QP.r_f - QP.q - QP.drift_adjustment) * T)
    rhs = QP.fx_rate * np.exp(-QP.r_d * T) * (F - K)
    np.testing.assert_allclose(c - p, rhs, rtol=2e-5)  # f32 Φ/exp chain


def test_zero_correlation_same_rates_collapses_to_vanilla():
    qp0 = QuantoParams(S0=100.0, r_d=0.05, r_f=0.05, sigma=0.25,
                       fx_sigma=0.12, rho=0.0, q=0.02, fx_rate=1.0)
    assert qp0.q_eff == pytest.approx(qp0.q)
    cf = quanto_european_price(qp0, 100.0, 1.0, "put")
    van = float(bs_price(100.0, 100.0, 1.0, 0.05, 0.25, q=0.02,
                         option_type="put"))
    np.testing.assert_allclose(cf, van, rtol=1e-12)


def test_lsmc_european_quanto_matches_closed_form():
    res = price_quanto_option(jax.random.key(1), QP, _prod(), SPEC, SIM)
    cf = quanto_european_price(QP, 100.0, 1.0, "put")
    assert abs(float(res.price) - cf) < 4.0 * float(res.stderr) + 5e-3, (
        float(res.price), cf)


def test_american_quanto_vs_crr_and_engine_identity():
    prod = _prod(exercise="american")
    rx = price_quanto_option(jax.random.key(2), QP, prod, SPEC, SIM)
    rm = price_quanto_option(jax.random.key(2), QP, prod, SPEC, SIM,
                             engine="mega")
    # shared paths, two engines; fx_rate scales both identically
    assert abs(float(rx.price) - float(rm.price)) < 1.3e-3
    crr = quanto_crr_price(QP, 100.0, 1.0, "put", american=True)
    # the auto spec (ITM-localized) carries the repo's documented ~0.03
    # one-sided policy bias at high-carry configs; the all-paths fit above
    # sits ~0.18 below CRR (expected — it exists for kernel parity only)
    ra = price_quanto_option(jax.random.key(2), QP, prod,
                             RegressionSpec(degree=4), SIM)
    gap = float(ra.price) - crr
    assert -(4.0 * float(ra.stderr) + 0.05) < gap < 2.0 * float(ra.stderr), (
        float(ra.price), crr)
    eur = quanto_european_price(QP, 100.0, 1.0, "put")
    assert float(ra.price) > eur - 2.0 * float(ra.stderr)


def test_quanto_barrier_in_out_parity_pathwise():
    key = jax.random.key(3)
    van = price_quanto_option(key, QP, _prod(), SPEC, SIM)
    din = price_quanto_option(key, QP, _prod(barrier=85.0), SPEC, SIM)
    dout = price_quanto_option(key, QP, _prod(barrier=85.0,
                                              barrier_type="down-out"),
                               SPEC, SIM)
    np.testing.assert_allclose(float(din.price) + float(dout.price),
                               float(van.price), atol=3e-3)


def test_compo_closed_form_and_lsmc():
    X0 = 1.3
    cf = compo_european_price(QP, X0, 130.0, 1.0, "put")
    res = price_compo_option(jax.random.key(4), QP, X0,
                             _prod(K=130.0), SPEC, SIM)
    assert abs(float(res.price) - cf) < 4.0 * float(res.stderr) + 5e-3

    # σ_X → 0, r_f arbitrary: compo degenerates to a vanilla on S·X0
    qp0 = QuantoParams(S0=100.0, r_d=0.05, r_f=0.01, sigma=0.25,
                       fx_sigma=0.0, rho=-0.4, q=0.02)
    m = compo_market(qp0, X0)
    assert m.sigma == pytest.approx(qp0.sigma)
    np.testing.assert_allclose(
        compo_european_price(qp0, X0, 130.0, 1.0, "call"),
        float(bs_price(100.0 * X0, 130.0, 1.0, 0.05, 0.25, q=0.02,
                       option_type="call")), rtol=1e-12)


def test_compo_vol_identity_negative_rho_cheapens():
    """σ_Y² = σ_S² + 2ρσ_Sσ_X + σ_X² — ρ<0 LOWERS compo vol (the FX
    hedge embedded in the conversion), a sanity direction check."""
    m_neg = compo_market(QP, 1.0)
    qp_pos = dataclasses_replace(QP, rho=+0.4)
    m_pos = compo_market(qp_pos, 1.0)
    assert m_neg.sigma < m_pos.sigma


def dataclasses_replace(qp, **kw):
    import dataclasses

    return dataclasses.replace(qp, **kw)
