"""Native C++ oracle vs the JAX oracle: independent f64 cross-check.

The C++ library plays QuantLib's role in the reference's validation
methodology (`unit_test.py` compares LSMC against the native engine); here
the two self-hosted implementations must agree with each other, which guards
both against a common-mode bug.
"""

import numpy as np
import pytest

from amcx import oracle as jx
from amcx import native_oracle as nt

pytestmark = pytest.mark.skipif(
    not nt.available(), reason="native toolchain unavailable"
)

P = dict(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)


@pytest.mark.parametrize("ot", ["call", "put"])
def test_bs_matches_jax(ot):
    a = nt.bs_price(**P, option_type=ot)
    b = float(jx.bs_price(**P, option_type=ot))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-5)


@pytest.mark.parametrize("ot", ["call", "put"])
@pytest.mark.parametrize("H", [80.0, 95.0])
def test_down_in_matches_jax(ot, H):
    a = nt.down_in_price(**P, barrier=H, option_type=ot)
    b = float(jx.down_in_price(**P, barrier=H, option_type=ot))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=2e-5)


@pytest.mark.parametrize("american", [False, True])
def test_crr_matches_jax(american):
    a = nt.crr_price(**P, n_steps=500, option_type="put", american=american)
    b = float(jx.crr_price(**P, n_steps=500, option_type="put", american=american))
    np.testing.assert_allclose(a, b, rtol=1e-4)


def test_crr_down_in_matches_jax():
    a = nt.crr_down_in_price(**P, barrier=85.0, n_steps=400, option_type="put", american=True)
    b = float(jx.crr_down_in_price(**P, barrier=85.0, n_steps=400, option_type="put", american=True))
    np.testing.assert_allclose(a, b, rtol=2e-4)


def test_native_f64_confirms_f32_tree_constants():
    """The f64 tree at high step count agrees with the analytic limit —
    confirming the _expm1_acc fix in the f32 JAX tree wasn't paper over a
    modelling bug."""
    euro_tree = nt.crr_price(**P, n_steps=4000, option_type="call", american=False)
    analytic = nt.bs_price(**P, option_type="call")
    np.testing.assert_allclose(euro_tree, analytic, atol=2e-3)


def test_batch_grid_matches_scalar():
    rng = np.random.default_rng(0)
    S = rng.uniform(60, 140, (5, 7))
    tau = np.linspace(1.0, 0.01, 5)[:, None]
    out = nt.bs_price_batch(S, tau, 100.0, 0.05, 0.2, option_type="put")
    want = nt.bs_price(S[2, 3], 100.0, float(tau[2, 0]), 0.05, 0.2, option_type="put")
    np.testing.assert_allclose(out[2, 3], want, rtol=1e-12)
    out_crr = nt.crr_price_batch(S[:2], tau[:2], 100.0, 0.05, 0.2, n_steps=50,
                                 option_type="put", american=True)
    assert out_crr.shape == (2, 7) and np.isfinite(out_crr).all()


def test_native_swing_lattice_matches_numpy():
    from amcx.native_oracle import available, swing_price
    from amcx.swing import crr_swing_price

    if not available():
        pytest.skip("native toolchain unavailable")
    for nr, nm, pk in [(3, 0, "option"), (3, 2, "forward"),
                       (5, 5, "forward"), (1, 1, "forward")]:
        cpp = swing_price(100.0, 100.0, 1.0, 0.05, 0.25, nr, n_steps=10,
                          n_sub=25, option_type="put", payoff_kind=pk,
                          n_min=nm)
        ref = crr_swing_price(100.0, 100.0, 1.0, 0.05, 0.25, nr,
                              n_steps=10, n_sub=25, option_type="put",
                              payoff_kind=pk, n_min=nm)
        # two independent f64 implementations of the same recursion
        assert abs(cpp - ref) < 1e-9, (nr, nm, pk, cpp, ref)


def test_native_swing_option_type_normalization():
    from amcx.native_oracle import available, swing_price
    from amcx.swing import crr_swing_price

    if not available():
        pytest.skip("native toolchain unavailable")
    a = swing_price(100.0, 100.0, 1.0, 0.05, 0.25, 2, n_steps=8, n_sub=25,
                    option_type="Put")
    b = crr_swing_price(100.0, 100.0, 1.0, 0.05, 0.25, 2, n_steps=8,
                        n_sub=25, option_type="put")
    assert abs(a - b) < 1e-9
