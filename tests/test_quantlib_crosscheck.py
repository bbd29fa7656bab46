"""Optional QuantLib cross-validation of the self-hosted oracles.

The reference's oracle IS QuantLib (`/root/reference/american_monte_carlo.py:
10-68`: AnalyticEuropeanEngine, BinomialVanillaEngine("crr"),
AnalyticBarrierEngine, BinomialBarrierEngine). This repo consciously
replaced it with self-hosted JAX + f64 C++ oracles (docs/PARITY.md);
SURVEY §2's native table suggests validating those once against QuantLib
when it is importable. This module closes that provenance gap: it pins
`amcx.oracle` to QuantLib on the reference's 12-case product grid and
skips cleanly where QuantLib is not installed (it is not baked into the
build image — the gate is for environments that have it).
"""

import numpy as np
import pytest

ql = pytest.importorskip("QuantLib")

from amcx.oracle import bs_price, crr_price, crr_down_in_price, down_in_price

S0, K, T, R, SIG = 100.0, 100.0, 1.0, 0.01, 0.2
CRR_STEPS = 1000


def _ql_setup(option_type):
    today = ql.Date(1, 1, 2024)
    ql.Settings.instance().evaluationDate = today
    dc = ql.Actual365Fixed()
    cal = ql.NullCalendar()
    spot = ql.QuoteHandle(ql.SimpleQuote(S0))
    rts = ql.YieldTermStructureHandle(ql.FlatForward(today, R, dc))
    qts = ql.YieldTermStructureHandle(ql.FlatForward(today, 0.0, dc))
    vts = ql.BlackVolTermStructureHandle(
        ql.BlackConstantVol(today, cal, SIG, dc))
    process = ql.BlackScholesMertonProcess(spot, qts, rts, vts)
    payoff = ql.PlainVanillaPayoff(
        ql.Option.Call if option_type == "call" else ql.Option.Put, K)
    maturity = today + ql.Period(365, ql.Days)
    return process, payoff, maturity


def _ql_vanilla(option_type, american):
    process, payoff, maturity = _ql_setup(option_type)
    if american:
        exercise = ql.AmericanExercise(
            ql.Settings.instance().evaluationDate, maturity)
        engine = ql.BinomialVanillaEngine(process, "crr", CRR_STEPS)
    else:
        exercise = ql.EuropeanExercise(maturity)
        engine = ql.AnalyticEuropeanEngine(process)
    opt = ql.VanillaOption(payoff, exercise)
    opt.setPricingEngine(engine)
    return float(opt.NPV())


def _ql_down_in(option_type, barrier, american):
    process, payoff, maturity = _ql_setup(option_type)
    if american:
        exercise = ql.AmericanExercise(
            ql.Settings.instance().evaluationDate, maturity)
        engine = ql.BinomialBarrierEngine(process, "crr", CRR_STEPS)
    else:
        exercise = ql.EuropeanExercise(maturity)
        engine = ql.AnalyticBarrierEngine(process)
    opt = ql.BarrierOption(ql.Barrier.DownIn, barrier, 0.0, payoff, exercise)
    opt.setPricingEngine(engine)
    return float(opt.NPV())


@pytest.mark.parametrize("option_type", ["put", "call"])
def test_european_vanilla_matches_quantlib(option_type):
    ours = float(bs_price(S0, K, T, R, SIG, option_type=option_type))
    theirs = _ql_vanilla(option_type, american=False)
    assert abs(ours - theirs) < 1e-6, (ours, theirs)


@pytest.mark.parametrize("option_type", ["put", "call"])
def test_american_vanilla_matches_quantlib(option_type):
    ours = float(crr_price(S0, K, T, R, SIG, CRR_STEPS,
                           option_type=option_type, american=True))
    theirs = _ql_vanilla(option_type, american=True)
    # identical method (CRR, same step count); tolerance covers day-count
    # T vs 365-day QuantLib maturity plus f64 tree rounding
    assert abs(ours - theirs) < 5e-4, (ours, theirs)


@pytest.mark.parametrize("option_type", ["put", "call"])
@pytest.mark.parametrize("barrier", [80.0, 60.0])
def test_european_down_in_matches_quantlib(option_type, barrier):
    ours = float(down_in_price(S0, K, T, R, SIG, barrier,
                               option_type=option_type))
    theirs = _ql_down_in(option_type, barrier, american=False)
    assert abs(ours - theirs) < 1e-6, (ours, theirs)


@pytest.mark.parametrize("option_type", ["put", "call"])
@pytest.mark.parametrize("barrier", [80.0, 60.0])
def test_american_down_in_matches_quantlib(option_type, barrier):
    ours = float(crr_down_in_price(S0, K, T, R, SIG, barrier, CRR_STEPS,
                                   option_type=option_type, american=True))
    theirs = _ql_down_in(option_type, barrier, american=True)
    # in-out parity construction vs QuantLib's direct barrier tree: both
    # are O(1/n) lattice schemes with different boundary handling
    assert abs(ours - theirs) < 5e-3, (ours, theirs)
