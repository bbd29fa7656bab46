"""Rough Bergomi: Volterra covariance, exact-in-law simulator, LSMC pricer.

Oracle strategy (no closed form exists for rBergomi prices): the
construction is gated deterministically (₂F₁ covariance vs adaptive
quadrature, H=½ degeneracy to standard BM, L Lᵀ = Σ) and the simulator
statistically against the EXACT lognormal law of v_t and the exact
η=0 → Black–Scholes collapse — the same anchor style the reference's own
unit_test.py uses (MC vs closed form, `unit_test.py:21`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx.oracle import bs_price, crr_price
from amcx.roughvol import (
    RBergomiParams,
    _rbergomi_transform,
    price_option_rbergomi,
    simulate_rbergomi,
    volterra_covariance,
)
from amcx.types import ProductSpec, RegressionSpec, SimConfig

RP = RBergomiParams(S0=100.0, r=0.03, q=0.0, xi0=0.04, eta=1.5, rho=-0.7,
                    H=0.1)


def _cov_quad(s, t, H):
    from scipy.integrate import quad

    # substitute x = s−u: ∫₀ˢ x^{H−½}(t−s+x)^{H−½} dx with the algebraic
    # endpoint singularity handled by quad's 'alg' weight (the naive quad
    # on the raw integrand is 1e-5 off here and its error estimate lies)
    val, _ = quad(lambda x: (t - s + x) ** (H - 0.5), 0.0, s,
                  weight="alg", wvar=(H - 0.5, 0.0), limit=200)
    return 2.0 * H * val


@pytest.mark.parametrize("H", [0.07, 0.3, 0.45])
def test_volterra_covariance_matches_quadrature(H):
    """The ₂F₁ closed form equals the defining integral (f64 quadrature)."""
    t = np.array([0.08, 0.35, 0.5, 1.0])
    cov = volterra_covariance(t, H)
    np.testing.assert_allclose(np.diag(cov), t ** (2 * H), rtol=1e-12)
    for i in range(len(t)):
        for j in range(i):
            want = _cov_quad(t[j], t[i], H)
            np.testing.assert_allclose(cov[i, j], want, rtol=1e-9)
            np.testing.assert_allclose(cov[i, j], cov[j, i], rtol=1e-14)


def test_h_half_volterra_is_brownian():
    """H=½ ⇒ Ṽ = W exactly: Var(Ṽ_{t_i} − Σ_{j≤i} ΔW_j) = 0 from the joint
    covariance algebra (deterministic — no sampling involved)."""
    n, T = 16, 1.0
    L = _rbergomi_transform(n, T, 0.5)
    cov = L @ L.T
    dt = T / n
    t = dt * np.arange(1, n + 1)
    for i in range(n):
        sel = np.zeros(2 * n)
        sel[i] = 1.0                       # Ṽ_{t_i}
        sel[n:n + i + 1] -= 1.0            # − Σ_{j≤i} ΔW_j
        assert abs(sel @ cov @ sel) < 1e-10, i
    np.testing.assert_allclose(cov[:n, :n], np.minimum(t[:, None], t[None, :]),
                               atol=1e-12)


def test_transform_reproduces_covariance():
    """L Lᵀ = Σ to f64 roundoff, and Σ_WW = dt·I (the increments block)."""
    n, T, H = 24, 2.0, 0.07
    L = _rbergomi_transform(n, T, H)
    cov = L @ L.T
    t = (T / n) * np.arange(1, n + 1)
    np.testing.assert_allclose(np.diag(cov)[:n], t ** (2 * H), rtol=1e-10)
    np.testing.assert_allclose(cov[n:, n:], (T / n) * np.eye(n), atol=1e-12)


def test_logv_exact_lognormal_law():
    """log v_t ~ N(log ξ₀ − ½η²t^{2H}, η²t^{2H}) EXACTLY under the joint-
    covariance construction — the sharp statistical gate on the sampler."""
    sim = SimConfig(n_paths=131_072, n_steps=25, antithetic=False)
    _, v = simulate_rbergomi(jax.random.key(1), RP, 1.0, sim,
                             return_variance=True)
    lv = np.log(np.asarray(v[-1], np.float64))
    n = lv.size
    var_want = RP.eta ** 2 * 1.0 ** (2 * RP.H)
    mean_want = np.log(RP.xi0) - 0.5 * var_want
    assert abs(lv.mean() - mean_want) < 4.5 * np.sqrt(var_want / n)
    # 4.5σ gate on the sample variance (kurtosis of a normal = 3)
    assert abs(lv.var() - var_want) < 4.5 * var_want * np.sqrt(2.0 / n)


def test_martingale_and_shapes():
    sim = SimConfig(n_paths=262_144, n_steps=50, antithetic=True)
    S = simulate_rbergomi(jax.random.key(2), RP, 1.0, sim)
    assert S.shape == (51, 262_144)
    disc = np.asarray(S[-1], np.float64) * np.exp(-(RP.r - RP.q) * 1.0)
    half = disc.reshape(2, -1).mean(axis=0)  # antithetic pair fold
    se = half.std() / np.sqrt(half.size)
    assert abs(half.mean() - RP.S0) < 4.0 * se


def test_eta_zero_is_black_scholes():
    """η=0 collapses v ≡ ξ₀: European == BS(σ=√ξ₀) within MC noise and the
    American put sits within policy-bias tolerance of CRR-2000."""
    rp = RBergomiParams(S0=95.0, r=0.05, q=0.0, xi0=0.04, eta=0.0, rho=-0.5,
                        H=0.1)
    sim = SimConfig(n_paths=131_072, n_steps=50, antithetic=True)
    prod_e = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="european")
    res = price_option_rbergomi(jax.random.key(3), rp, prod_e,
                                RegressionSpec(degree=3), sim)
    bs = float(bs_price(95.0, 100.0, 1.0, 0.05, 0.2, option_type="put"))
    assert abs(float(res.price) - bs) < 4.0 * float(res.stderr)

    prod_a = ProductSpec(K=100.0, T=1.0, option_type="put",
                         exercise="american")
    ra = price_option_rbergomi(jax.random.key(4), rp, prod_a,
                               RegressionSpec(degree=3, regress_on="itm"),
                               sim)
    crr = crr_price(95.0, 100.0, 1.0, 0.05, 0.2, 2000, option_type="put",
                    american=True)
    assert abs(float(ra.price) - float(crr)) < max(
        4.0 * float(ra.stderr), 0.06)
    assert float(ra.price) > float(res.price) - 2.0 * float(res.stderr)


def test_american_geq_european_rough():
    sim = SimConfig(n_paths=65_536, n_steps=25, antithetic=True)
    prod_a = ProductSpec(K=105.0, T=1.0, option_type="put",
                         exercise="american")
    prod_e = ProductSpec(K=105.0, T=1.0, option_type="put",
                         exercise="european")
    spec = RegressionSpec(degree=3)
    ra = price_option_rbergomi(jax.random.key(5), RP, prod_a, spec, sim)
    re = price_option_rbergomi(jax.random.key(5), RP, prod_e, spec, sim)
    assert float(ra.price) >= float(re.price) - 2.0 * float(re.stderr)
    # rough-vol put must exceed intrinsic
    assert float(ra.price) > 5.0


def test_mega_and_fused_match_xla():
    """Kernel engines price the same (S, v) induction as the XLA scan —
    raw-kernel identity, so the XLA twin pins regress_on='all'
    (the kernels run the all-paths estimator; CLAUDE round-4 note)."""
    sim = SimConfig(n_paths=8_192, n_steps=9)
    prod = ProductSpec(K=100.0, T=0.75, option_type="put",
                       exercise="american")
    spec = RegressionSpec(degree=2, regress_on="all")
    x = price_option_rbergomi(jax.random.key(6), RP, prod, spec, sim)
    for eng in ("mega", "fused"):
        k = price_option_rbergomi(jax.random.key(6), RP, prod, spec, sim,
                                  engine=eng)
        assert abs(float(k.price) - float(x.price)) < max(
            2e-2, 0.5 * float(x.stderr)), eng
    with pytest.raises(ValueError, match="American only"):
        price_option_rbergomi(
            jax.random.key(0), RP,
            ProductSpec(K=100.0, T=1.0, option_type="put",
                        exercise="european"),
            spec, sim, engine="mega")


def test_xi0_curve_and_validation():
    sim = SimConfig(n_paths=4_096, n_steps=10)
    curve = np.full(11, 0.04)
    S1 = simulate_rbergomi(jax.random.key(7), RP, 1.0, sim)
    S2 = simulate_rbergomi(jax.random.key(7), RP, 1.0, sim, xi0_curve=curve)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S2), rtol=1e-6)
    with pytest.raises(ValueError, match="xi0_curve"):
        simulate_rbergomi(jax.random.key(7), RP, 1.0, sim,
                          xi0_curve=np.full(10, 0.04))
    with pytest.raises(ValueError, match="H must be"):
        RBergomiParams(H=1.5)
    with pytest.raises(ValueError, match="rho"):
        RBergomiParams(rho=-1.2)


def test_interleaved_transform_matches_permuted_covariance():
    """The interleaved Cholesky (the dual's conditional-resampling engine)
    factorizes the SAME Σ in (Ṽ₁, ΔW₁, Ṽ₂, ΔW₂, …) order — deterministic."""
    from amcx.roughvol import (_joint_covariance,
                               _rbergomi_transform_interleaved)

    T_, H_ = 12, 0.1
    Li = _rbergomi_transform_interleaved(T_, 1.0, H_)
    cov = _joint_covariance(T_, 1.0, H_)
    perm = np.ravel(np.column_stack([np.arange(T_), T_ + np.arange(T_)]))
    assert np.abs(Li @ Li.T - cov[np.ix_(perm, perm)]).max() < 1e-12
    # lower-triangular: history really is a prefix of the normals
    assert np.abs(np.triu(Li, 1)).max() == 0.0


def test_dual_bound_brackets_pde_at_eta_zero():
    """η=0 collapse: the [OOS lower, AB-dual upper] bracket must contain
    the Bermudan-6 CN-PDE truth (the dual's inner resampler degenerates to
    plain GBM resimulation — conditioning on history is a no-op there, so
    this also regression-tests the conditional machinery end to end)."""
    from amcx.pde_barrier import pde_discrete_barrier_price
    from amcx.roughvol import rbergomi_dual_bound

    rp0 = RBergomiParams(S0=95.0, r=0.05, xi0=0.04, eta=0.0, rho=-0.5,
                         H=0.1)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    lo, lo_se, up, up_se = rbergomi_dual_bound(
        jax.random.key(0), rp0, prod,
        RegressionSpec(degree=3, regress_on="all"),
        SimConfig(n_paths=16_384, n_steps=6), n_outer=1_024, n_inner=32,
        n_replay=32_768)
    pde = pde_discrete_barrier_price(95.0, 100.0, 1.0, 0.05, 0.2, 6,
                                     option_type="put",
                                     exercise="american")
    assert float(lo) - 4.0 * float(lo_se) <= pde, (float(lo), pde)
    assert pde <= float(up) + 4.0 * float(up_se), (float(up), pde)
    assert float(up) - float(lo) < 0.25  # J=32 inner-noise bias included


def test_dual_bound_rough_bracket_is_tight():
    """Rough case (the point of the machinery): the bracket certifies the
    restricted-information (S, v) policy loses little — width bounds the
    information gap + MC noise."""
    from amcx.roughvol import rbergomi_dual_bound

    prod = ProductSpec(K=100.0, T=1.0, option_type="put",
                       exercise="american")
    lo, lo_se, up, up_se = rbergomi_dual_bound(
        jax.random.key(1), RP, prod,
        RegressionSpec(degree=3, regress_on="all"),
        SimConfig(n_paths=16_384, n_steps=6), n_outer=1_024, n_inner=32,
        n_replay=32_768)
    assert float(up) >= float(lo) - 2.0 * np.hypot(float(lo_se),
                                                   float(up_se))
    assert float(up) - float(lo) < 0.3, (float(lo), float(up))
    with pytest.raises(ValueError, match="regress_on"):
        rbergomi_dual_bound(jax.random.key(0), RP, prod,
                            RegressionSpec(degree=3, regress_on="itm"))
    with pytest.raises(ValueError, match="even"):
        rbergomi_dual_bound(jax.random.key(0), RP, prod, n_inner=7)
