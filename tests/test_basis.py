"""Basis families vs numpy.polynomial ground truth.

Mirrors the reference's column-by-column construction
(`/root/reference/american_monte_carlo.py:98-106`) as the oracle for the
recurrence-based implementation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from amcx.basis import design_matrix, multi_asset_design_matrix, n_multi_terms


def _np_reference(x, family, degree):
    import numpy.polynomial.chebyshev as C
    import numpy.polynomial.legendre as L
    import numpy.polynomial.laguerre as G
    import numpy.polynomial.hermite as H

    fmap = {
        "power": lambda x, i: x**i,
        "monomial": lambda x, i: x**i,
        "chebyshev": lambda x, i: C.chebval(x, [0] * i + [1]),
        "legendre": lambda x, i: L.legval(x, [0] * i + [1]),
        "laguerre": lambda x, i: G.lagval(x, [0] * i + [1]),
        "hermite": lambda x, i: H.hermval(x, [0] * i + [1]),
    }
    return np.column_stack([fmap[family](x, i) for i in range(degree + 1)])


@pytest.mark.parametrize("family", ["power", "monomial", "chebyshev", "legendre", "laguerre", "hermite"])
@pytest.mark.parametrize("degree", [0, 1, 4, 10])
def test_matches_numpy_polynomial(family, degree):
    x = np.linspace(-1.5, 1.5, 101)
    got = np.asarray(design_matrix(jnp.asarray(x, jnp.float64 if jnp.float64 == jnp.zeros(1).dtype else jnp.float32), family, degree))
    want = _np_reference(x, family, degree)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unknown_basis_raises():
    with pytest.raises(ValueError, match="Unknown basis"):
        design_matrix(jnp.zeros(4), "fourier", 3)


def test_shape_appends_axis():
    x = jnp.zeros((7, 3))
    assert design_matrix(x, "chebyshev", 5).shape == (7, 3, 6)


def test_multi_asset_total_degree_terms():
    # 2 assets, degree 2: multi-indices with |alpha| <= 2 -> 6 terms
    assert n_multi_terms(2, 2, "total") == 6
    assert n_multi_terms(5, 2, "total") == 21
    # separable: constant + n_assets*degree
    assert n_multi_terms(5, 3, "separable") == 16


def test_multi_asset_values_power_basis():
    X = np.array([[2.0, 3.0], [1.0, -1.0]])
    A = np.asarray(multi_asset_design_matrix(jnp.asarray(X), "power", 2, "total"))
    # columns are x^i * y^j for i+j<=2, sorted multi-index order:
    # (0,0),(0,1),(0,2),(1,0),(1,1),(2,0)
    want = np.column_stack([
        np.ones(2), X[:, 1], X[:, 1] ** 2, X[:, 0], X[:, 0] * X[:, 1], X[:, 0] ** 2,
    ])
    np.testing.assert_allclose(A, want, rtol=1e-6)
