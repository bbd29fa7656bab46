"""TARF (target redemption forward) gates: exact analytic strip in the
no-knockout limit, hand-computed accumulator/breach logic, f64 twin for
the knocked contract, and the pathwise capped<=full dominance."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from amcx import MarketParams, SimConfig
from amcx.models.tarf import (TARFSpec, price_tarf, tarf_mc_anchor,
                              tarf_strip_value)
from amcx.models.tarf import _tarf_payout

M = MarketParams(100.0, 0.03, 0.15)


def test_payout_hand_computed():
    # 3 fixings, r=0, K=100, target=8, leverage=2
    spec_full = TARFSpec(K=100.0, T=1.0, n_fix=3, target=8.0, leverage=2.0,
                         knock="full")
    spec_cap = TARFSpec(K=100.0, T=1.0, n_fix=3, target=8.0, leverage=2.0,
                        knock="capped")
    S_fix = np.array([
        [105.0, 95.0, 103.0],   # fixing 1: p0 +5, p1 -2*5, p2 +3
        [104.0, 90.0, 110.0],   # fixing 2: p0 +4 (A=9, breach), p1 -2*10,
                                #           p2 +10 (A=13, breach)
        [120.0, 95.0, 104.0],   # fixing 3: dead for p0/p2; p1 -2*5
    ])
    full = np.asarray(_tarf_payout(S_fix, spec_full, 0.0, 1.0))
    cap = np.asarray(_tarf_payout(S_fix, spec_cap, 0.0, 1.0))
    np.testing.assert_allclose(full, [9.0, -40.0, 13.0], atol=1e-12)
    # capped: p0 pays 8-5=3 at breach; p2 pays 8-3=5 at breach
    np.testing.assert_allclose(cap, [8.0, -40.0, 8.0], atol=1e-12)


def test_no_knock_matches_analytic_strip():
    spec = TARFSpec(K=100.0, T=1.0, n_fix=12, knock="none")
    want = tarf_strip_value(M, spec)
    res = price_tarf(jax.random.key(1), M, spec,
                     SimConfig(n_paths=400_000, n_steps=48, antithetic=True))
    assert abs(float(res.price) - want) < 4.0 * float(res.stderr) + 2e-4, (
        float(res.price), want, float(res.stderr))
    ref, se = tarf_mc_anchor(M, spec, n_paths=400_000)
    assert abs(ref - want) < 4.0 * se


def test_knocked_vs_f64_twin():
    spec = TARFSpec(K=100.0, T=1.0, n_fix=12, target=0.15 * 100.0,
                    leverage=2.0, knock="capped")
    res = price_tarf(jax.random.key(2), M, spec,
                     SimConfig(n_paths=262_144, n_steps=48, antithetic=True))
    ref, se = tarf_mc_anchor(M, spec, n_paths=500_000)
    tol = 4.0 * np.hypot(float(res.stderr), se) + 2e-4
    assert abs(float(res.price) - ref) < tol, (float(res.price), ref, tol)


def test_capped_below_full():
    kw = dict(K=100.0, T=1.0, n_fix=12, target=10.0, leverage=2.0)
    sim = SimConfig(n_paths=131_072, n_steps=48, antithetic=True)
    cap = price_tarf(jax.random.key(3), M, TARFSpec(knock="capped", **kw), sim)
    full = price_tarf(jax.random.key(3), M, TARFSpec(knock="full", **kw), sim)
    assert float(cap.price) <= float(full.price) + 1e-7


def test_validation():
    with pytest.raises(ValueError):
        TARFSpec(K=100.0, T=1.0, n_fix=0)
    with pytest.raises(ValueError):
        TARFSpec(K=100.0, T=1.0, n_fix=4, knock="soft")
    with pytest.raises(ValueError):
        price_tarf(jax.random.key(0), M, TARFSpec(K=100.0, T=1.0, n_fix=5),
                   SimConfig(n_paths=64, n_steps=8))
