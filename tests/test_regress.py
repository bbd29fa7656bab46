"""Regression layer vs closed-form / f64 LAPACK ground truth (SURVEY §4)."""

import numpy as np
import jax.numpy as jnp

from amcx.regress import pinv_solve, regression_fitted_values, fit_continuation
from amcx.types import RegressionSpec


def _np_fit(x, y, degree, w=None):
    """f64 weighted polynomial LS fitted values on standardized x."""
    import numpy.polynomial.chebyshev as C

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    if w is None:
        w = np.ones_like(x)
    ws = w.sum()
    mean = (w * x).sum() / ws
    std = max(np.sqrt((w * (x - mean) ** 2).sum() / ws), 1e-6)
    xs = (x - mean) / std
    A = np.column_stack([C.chebval(xs, [0] * i + [1]) for i in range(degree + 1)])
    sw = np.sqrt(w)
    coef = np.linalg.lstsq(A * sw[:, None], y * sw, rcond=None)[0]
    return A @ coef


def test_fitted_values_match_f64_lstsq():
    rng = np.random.default_rng(0)
    x = (100 * np.exp(0.2 * rng.standard_normal(50_000))).astype(np.float32)
    y = (np.maximum(100 - x, 0) + rng.standard_normal(50_000)).astype(np.float32)
    spec = RegressionSpec(basis="chebyshev", degree=4)
    got = np.asarray(regression_fitted_values(jnp.asarray(x), jnp.asarray(y), spec))
    want = _np_fit(x, y, 4)
    # f32 moments vs f64 LAPACK: agreement to ~1e-2 absolute on y-scale ~100
    np.testing.assert_allclose(got, want, atol=5e-2)


def test_weighted_fit_matches_masked_f64_lstsq():
    rng = np.random.default_rng(1)
    x = (100 * np.exp(0.2 * rng.standard_normal(20_000))).astype(np.float32)
    y = (np.maximum(100 - x, 0) + rng.standard_normal(20_000)).astype(np.float32)
    w = (x < 100).astype(np.float32)
    spec = RegressionSpec(basis="chebyshev", degree=3)
    got = np.asarray(
        regression_fitted_values(jnp.asarray(x), jnp.asarray(y), spec, jnp.asarray(w))
    )
    want = _np_fit(x, y, 3, w)
    mask = w > 0  # fitted values compared on the weighted set
    np.testing.assert_allclose(got[mask], want[mask], atol=5e-2)


def test_degenerate_constant_regressor():
    """The t=0 step: all regressors equal (rank-1 design, SURVEY Q3).

    lstsq's pseudo-inverse returns the mean of y; the eigh pinv must too.
    """
    x = jnp.full((1000,), 95.0)
    y = jnp.linspace(0.0, 2.0, 1000)
    spec = RegressionSpec(basis="chebyshev", degree=4)
    got = np.asarray(regression_fitted_values(x, y, spec))
    np.testing.assert_allclose(got, np.full(1000, 1.0), atol=1e-4)


def test_pinv_solve_minimum_norm():
    # Singular G: solution must match np.linalg.pinv
    A = np.array([[1.0, 1.0], [1.0, 1.0]])
    b = np.array([2.0, 2.0])
    got = np.asarray(pinv_solve(jnp.asarray(A), jnp.asarray(b)))
    want = np.linalg.pinv(A) @ b
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_continuation_clamped_at_zero():
    """SURVEY Q2: fitted continuation is clamped at 0 before comparison."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal(5000).astype(np.float32)
    y = (x - 5.0).astype(np.float32)  # fit goes deeply negative
    cont = np.asarray(fit_continuation(jnp.asarray(x), jnp.asarray(y), RegressionSpec(degree=1)))
    assert (cont >= 0).all()
    assert (cont == 0).any()
