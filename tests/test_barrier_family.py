"""Full barrier family (up/down x in/out) - beyond the reference's
down-and-in: analytic identities, binomial convergence, engine pricing."""

import itertools

import jax
import numpy as np
import pytest

from amcx import (
    MarketParams, ProductSpec, RegressionSpec, SimConfig,
    bs_price, lsmc_option_pricing, simulate_gbm,
)
from amcx.engine_pallas import lsmc_option_pricing_fused
from amcx.oracle import barrier_price, crr_barrier_price, discrete_barrier_shift

P = dict(S0=100.0, K=100.0, T=1.0, r=0.05, sigma=0.2)
TYPES = ["down-in", "down-out", "up-in", "up-out"]


@pytest.mark.parametrize("ot", ["call", "put"])
@pytest.mark.parametrize("H,kinds", [(85.0, ("down-in", "down-out")),
                                     (120.0, ("up-in", "up-out"))])
def test_in_out_parity(ot, H, kinds):
    """in + out = vanilla (rebate 0), both directions."""
    v = float(bs_price(**P, option_type=ot))
    tot = sum(float(barrier_price(**P, barrier=H, option_type=ot, barrier_type=k))
              for k in kinds)
    np.testing.assert_allclose(tot, v, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("bt,H", [("up-in", 120.0), ("up-out", 120.0), ("down-out", 85.0)])
def test_crr_converges_to_analytic(bt, H):
    n = 4000
    down = bt.startswith("down")
    Hs = float(discrete_barrier_shift(H, P["sigma"], P["T"] / n, down=down))
    tree = float(crr_barrier_price(**P, barrier=H, n_steps=n, option_type="call",
                                   american=False, barrier_type=bt))
    cont = float(barrier_price(**P, barrier=Hs, option_type="call", barrier_type=bt))
    np.testing.assert_allclose(tree, cont, atol=0.05)


def test_already_knocked_limits():
    # up-in with barrier below spot = vanilla; up-out = 0
    v = float(bs_price(**P, option_type="call"))
    assert float(barrier_price(**P, barrier=90.0, option_type="call",
                               barrier_type="up-in")) == pytest.approx(v, abs=1e-5)
    assert float(barrier_price(**P, barrier=90.0, option_type="call",
                               barrier_type="up-out")) == 0.0


@pytest.fixture(scope="module")
def paths():
    return simulate_gbm(jax.random.key(42), MarketParams(100.0, 0.05, 0.2), 1.0,
                        SimConfig(n_paths=65_536, n_steps=50))


@pytest.mark.parametrize("bt,H", [("up-out", 130.0), ("up-in", 130.0), ("down-out", 80.0)])
def test_lsmc_engines_match_oracle(paths, bt, H):
    """European barrier pricing through both engines vs the BGK-corrected
    analytic oracle."""
    prod = ProductSpec(K=100.0, T=1.0, barrier=H, option_type="call",
                       exercise="european", barrier_type=bt)
    spec = RegressionSpec(degree=4)
    res = lsmc_option_pricing(paths, prod, 0.05, spec, return_surface=False)
    fused = lsmc_option_pricing_fused(paths, prod, 0.05, spec)
    np.testing.assert_allclose(float(fused.price), float(res.price), rtol=1e-4)
    down = bt.startswith("down")
    Hs = float(discrete_barrier_shift(H, 0.2, 1.0 / 50, down=down))
    orc = float(barrier_price(100.0, 100.0, 1.0, 0.05, 0.2, Hs, option_type="call",
                              barrier_type=bt))
    assert abs(float(res.price) - orc) < max(0.2, 5 * float(res.stderr))


def test_lsmc_up_out_bounded(paths):
    prod = ProductSpec(K=100.0, T=1.0, barrier=130.0, option_type="call",
                       exercise="american", barrier_type="up-out")
    res = lsmc_option_pricing(paths, prod, 0.05, RegressionSpec(degree=4), return_surface=False)
    vanilla = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="call", exercise="american"),
        0.05, RegressionSpec(degree=4), return_surface=False)
    assert 0.0 <= float(res.price) <= float(vanilla.price)


def test_megakernel_barrier_types(paths):
    from amcx.ops.lsmc_megakernel import lsmc_price_megakernel

    prod = ProductSpec(K=100.0, T=1.0, barrier=130.0, option_type="call",
                       exercise="american", barrier_type="up-out")
    # regress_on="all": the raw kernel call fits on all paths (identity test)
    ref = lsmc_option_pricing(paths, prod, 0.05,
                              RegressionSpec(degree=4, regress_on="all"),
                              return_surface=False)
    p = lsmc_price_megakernel(paths, 100.0, 0.05, 1.0 / 50, 1.0, degree=4,
                              barrier=130.0, barrier_type="up-out")
    assert abs(float(p) - float(ref.price)) < 2.5e-3


def test_bad_barrier_type_rejected():
    with pytest.raises(ValueError, match="barrier_type"):
        ProductSpec(K=100.0, T=1.0, barrier=80.0, barrier_type="sideways-in")
    with pytest.raises(ValueError, match="barrier_type"):
        barrier_price(**P, barrier=80.0, barrier_type="inside-out")


def test_up_in_american_call_itm_fit_recovers_european(paths):
    """A no-dividend American call is never exercised early, so the up-in
    American value equals the European one. The knocked∧ITM-conditioned fit
    (regress_on='itm') recovers this; the reference's fit-on-all-paths mode
    (SURVEY Q1) exercises spuriously here and lower-bounds ~0.7 too low —
    documented in docs/PARITY.md as a basis-conditioning caveat."""
    prod_am = ProductSpec(K=100.0, T=1.0, barrier=120.0, option_type="call",
                          exercise="american", barrier_type="up-in")
    prod_eu = ProductSpec(K=100.0, T=1.0, barrier=120.0, option_type="call",
                          exercise="european", barrier_type="up-in")
    spec = RegressionSpec(degree=4, regress_on="itm")
    am = lsmc_option_pricing(paths, prod_am, 0.05, spec, return_surface=False)
    eu = lsmc_option_pricing(paths, prod_eu, 0.05, spec, return_surface=False)
    assert abs(float(am.price) - float(eu.price)) < 3 * float(eu.stderr)
