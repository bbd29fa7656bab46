"""Error analytics vs reference semantics
(`/root/reference/american_monte_carlo.py:229-250`, SURVEY Q9)."""

import jax.numpy as jnp
import numpy as np
import pytest

from amcx import compute_differences


def _np_reference(cont, ql, kind):
    out = np.zeros_like(cont)
    for i in np.ndindex(cont.shape):
        c, q = cont[i], ql[i]
        if kind == "absolute":
            out[i] = abs(c - q)
        elif kind == "difference":
            out[i] = c - q
        else:
            if abs(q - c) < 1e-4:
                out[i] = 0
            elif q != 0:
                out[i] = (c - q) / q
            else:
                out[i] = (c - 1e-4) / 1e-4
    return out


@pytest.mark.parametrize("kind", ["absolute", "difference", "relative"])
def test_matches_reference_semantics(kind):
    rng = np.random.default_rng(1)
    cont = rng.uniform(0, 10, (5, 20)).astype(np.float64)
    ql = cont + rng.normal(0, 0.5, (5, 20))
    ql[0, 0] = 0.0  # division-by-zero branch
    cont[1, 1] = ql[1, 1] + 5e-5  # deadband branch
    got = np.asarray(compute_differences(jnp.asarray(cont), jnp.asarray(ql), kind))
    want = _np_reference(cont, ql, kind)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_invalid_type_raises():
    with pytest.raises(ValueError, match="Invalid difference_type"):
        compute_differences(jnp.zeros(3), jnp.zeros(3), "squared")
