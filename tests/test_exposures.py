"""CCR exposures vs the reference's numpy semantics
(`/root/reference/american_monte_carlo.py:400-414`)."""

import jax
import jax.numpy as jnp
import numpy as np

from amcx import (MarketParams, RegressionSpec, SimConfig,
                  compute_ccr_exposures, simulate_gbm)


def _np_reference(surface):
    out = []
    for row in surface:
        valid = row[np.isfinite(row)]
        if len(valid) == 0:
            out.append((np.nan, np.nan, np.nan))
        else:
            out.append(
                (np.percentile(valid, 5), np.percentile(valid, 95), valid.mean())
            )
    return np.array(out)


def test_matches_numpy_percentiles():
    rng = np.random.default_rng(0)
    surface = rng.exponential(5.0, size=(11, 997)).astype(np.float32)
    got = compute_ccr_exposures(jnp.asarray(surface))
    want = _np_reference(surface)
    np.testing.assert_allclose(np.asarray(got.pfe5), want[:, 0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.pfe95), want[:, 1], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.epe), want[:, 2], rtol=1e-5)


def test_nan_masking():
    surface = np.array(
        [
            [1.0, 2.0, 3.0, 4.0],
            [np.nan, np.inf, 5.0, 7.0],
            [np.nan, np.nan, np.nan, np.nan],
        ],
        dtype=np.float32,
    )
    got = compute_ccr_exposures(jnp.asarray(surface))
    want = _np_reference(surface)
    np.testing.assert_allclose(np.asarray(got.epe)[:2], want[:2, 2], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got.pfe5)[:2], want[:2, 0], rtol=1e-5)
    assert np.isnan(np.asarray(got.epe)[2])
    assert np.isnan(np.asarray(got.pfe5)[2])
    assert np.isnan(np.asarray(got.pfe95)[2])


def test_cva_from_epe_flat_hazard_closed_form():
    """Constant EPE + flat hazard has a closed-form CVA:
    (1-R)·E·Σ df_i·(e^{-λt_{i-1}} − e^{-λt_i}) — validate against an
    independent mpmath-free numpy evaluation, plus sanity limits."""
    import numpy as np

    from amcx.exposures import cva_from_epe

    n, T, r, lam, R, E = 50, 2.0, 0.03, 0.02, 0.4, 7.5
    epe = np.full(n + 1, E, dtype=np.float32)
    got = float(cva_from_epe(epe, T, r, lam, R))
    t = np.linspace(0, T, n + 1)
    dpd = np.exp(-lam * t[:-1]) - np.exp(-lam * t[1:])
    want = (1 - R) * np.sum(np.exp(-r * t[1:]) * E * dpd)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # limits: zero hazard -> zero CVA; recovery=1 -> zero CVA
    assert float(cva_from_epe(epe, T, r, 0.0, R)) == 0.0
    assert abs(float(cva_from_epe(epe, T, r, lam, 1.0))) < 1e-12
    # monotone in hazard
    assert float(cva_from_epe(epe, T, r, 0.05, R)) > got


def test_cva_composes_with_engine_exposures():
    """End-to-end: price -> exposures (mega-speed coeff route) -> CVA."""
    import jax
    import numpy as np

    from amcx import (MarketParams, ProductSpec, RegressionSpec, SimConfig,
                      cva_from_epe, price_option)
    from amcx.exposures import exposures_from_coeffs
    from amcx.paths import gbm_standardization, simulate_gbm

    m = MarketParams(100.0, 0.03, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    sim = SimConfig(n_paths=8192, n_steps=10)
    key = jax.random.key(2)
    res = price_option(key, m, prod, RegressionSpec(degree=4), sim,
                       engine="mega", return_coeffs=True)
    paths = simulate_gbm(key, m, 1.0, sim)
    mt, ist = gbm_standardization(m, 1.0, 10)
    e = exposures_from_coeffs(paths, res.coeffs, mt, ist, degree=4)
    cva = float(cva_from_epe(e.epe, 1.0, m.r, hazard=0.02))
    # EPE ~ price scale; CVA ~ LGD * EPE * PD(1y) ~ 0.6 * 6 * 0.02 ~ 0.07
    assert 0.0 < cva < float(res.price)
    assert np.isfinite(cva)


def test_bilateral_cva_reduces_to_unilateral():
    from amcx.exposures import bilateral_cva, cva_from_epe

    epe = jnp.linspace(0.0, 5.0, 21)
    ene = jnp.linspace(0.0, 2.0, 21)
    uni = float(cva_from_epe(epe, 1.0, 0.03, 0.02, recovery=0.4))
    bcva, cva_leg, dva_leg = bilateral_cva(epe, ene, 1.0, 0.03, 0.02, 0.0,
                                           recovery_cpty=0.4)
    assert float(dva_leg) == 0.0
    np.testing.assert_allclose(float(cva_leg), uni, rtol=1e-6)
    np.testing.assert_allclose(float(bcva), uni, rtol=1e-6)
    # own default risk reduces the bilateral adjustment
    bcva2, _, dva2 = bilateral_cva(epe, ene, 1.0, 0.03, 0.02, 0.05)
    assert float(dva2) > 0.0 and float(bcva2) < float(bcva)


def test_netting_set_ene_and_sign_symmetry():
    from amcx.book import book_ccr_exposures

    m = MarketParams(100.0, 0.05, 0.2)
    sim = SimConfig(n_paths=16_384, n_steps=10)
    paths = simulate_gbm(jax.random.key(0), m, 1.0, sim)
    strikes = jnp.array([95.0, 105.0])
    w = jnp.array([1.0, -1.0])
    ccr_p, ene_p, _ = book_ccr_exposures(paths, strikes, w, m.r, 1.0,
                                         spec=RegressionSpec(degree=3),
                                         return_ene=True)
    ccr_m, ene_m, _ = book_ccr_exposures(paths, strikes, -w, m.r, 1.0,
                                         spec=RegressionSpec(degree=3),
                                         return_ene=True)
    # flipping every position swaps EPE and ENE exactly
    np.testing.assert_allclose(np.asarray(ccr_p.epe), np.asarray(ene_m),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ene_p), np.asarray(ccr_m.epe),
                               rtol=1e-5, atol=1e-6)
    # two-return form unchanged
    ccr2, _ = book_ccr_exposures(paths, strikes, w, m.r, 1.0,
                                 spec=RegressionSpec(degree=3))
    np.testing.assert_allclose(np.asarray(ccr2.epe), np.asarray(ccr_p.epe))
