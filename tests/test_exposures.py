"""CCR exposures vs the reference's numpy semantics
(`/root/reference/american_monte_carlo.py:400-414`)."""

import jax.numpy as jnp
import numpy as np

from amcx import compute_ccr_exposures


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
