"""Batched strike-grid pricing (one jit over the book)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    lsmc_option_pricing,
    simulate_gbm,
)
from amcx.book import price_strike_grid

M = MarketParams(100.0, 0.03, 0.2)
# book "auto" resolves to the all-paths shared-Gram frame; pin it so the
# vs-individual identity tests compare the same estimator on both routes
SPEC = RegressionSpec(degree=4, regress_on="all")


@pytest.fixture(scope="module")
def paths():
    return simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=32_768, n_steps=20))


def test_matches_individual_pricing(paths):
    strikes = [90.0, 100.0, 110.0]
    book = price_strike_grid(paths, jnp.asarray(strikes), M.r, 1.0,
                             option_type="put", american=True, spec=SPEC)
    for i, K in enumerate(strikes):
        prod = ProductSpec(K=K, T=1.0, option_type="put", exercise="american")
        single = lsmc_option_pricing(paths, prod, M.r, SPEC, return_surface=False)
        np.testing.assert_allclose(float(book.prices[i]), float(single.price), rtol=1e-4)


def test_monotone_in_strike(paths):
    strikes = jnp.linspace(80.0, 120.0, 9)
    put_book = price_strike_grid(paths, strikes, M.r, 1.0, option_type="put",
                                 american=True, spec=SPEC)
    call_book = price_strike_grid(paths, strikes, M.r, 1.0, option_type="call",
                                  american=True, spec=SPEC)
    p = np.asarray(put_book.prices)
    c = np.asarray(call_book.prices)
    assert (np.diff(p) > -1e-4).all()   # puts increase in K
    assert (np.diff(c) < 1e-4).all()    # calls decrease in K
    # convexity in strike (no-arbitrage) up to MC noise
    assert (np.diff(p, 2) > -0.05).all()


def test_mega_book_matches_xla(paths):
    """The strike-batched mega-kernel shares Gram/Cholesky across strikes;
    prices must agree with the vmapped XLA induction to the round-3
    characterized floor (time-T-units carry + pairs layout: rms ~1e-3,
    docs/PARITY.md accuracy section; the old 8e-3 bound pre-dated the
    carry fix and would hide a regression of the fixed components)."""
    strikes = jnp.asarray([85.0, 95.0, 100.0, 115.0])
    xla = price_strike_grid(paths, strikes, M.r, 1.0, option_type="put",
                            american=True, spec=SPEC)
    mega = price_strike_grid(paths, strikes, M.r, 1.0, option_type="put",
                             american=True, spec=SPEC, engine="mega")
    np.testing.assert_allclose(np.asarray(mega.prices), np.asarray(xla.prices),
                               atol=3e-3)
    np.testing.assert_allclose(np.asarray(mega.stderrs), np.asarray(xla.stderrs),
                               rtol=0.03)
    assert mega.cashflows is None and mega.exercise_times is None


def test_mega_book_cf_tau(paths):
    """return_cf_tau=True: per-strike (cf, τ) planes reproduce each
    strike's own price exactly and feed book_greeks at kernel speed."""
    from amcx.book import book_greeks

    strikes = jnp.asarray([90.0, 100.0, 110.0])
    mega = price_strike_grid(paths, strikes, M.r, 1.0, option_type="put",
                             american=True, spec=SPEC, engine="mega",
                             return_cf_tau=True)
    dt = 1.0 / 20
    for i in range(3):
        d = mega.cashflows[i] * jnp.exp(-M.r * dt * mega.exercise_times[i])
        np.testing.assert_allclose(float(jnp.mean(d)), float(mega.prices[i]),
                                   atol=2e-5)
    xla = price_strike_grid(paths, strikes, M.r, 1.0, option_type="put",
                            american=True, spec=SPEC)
    gm = book_greeks(mega, M, strikes, 1.0, 20)
    gx = book_greeks(xla, M, strikes, 1.0, 20)
    np.testing.assert_allclose(np.asarray(gm["delta"]), np.asarray(gx["delta"]),
                               atol=1e-2)


def test_mega_book_european_exact(paths):
    """European book: no exercise decisions, so mega and XLA agree to f32
    accumulation noise."""
    strikes = jnp.asarray([90.0, 110.0])
    xla = price_strike_grid(paths, strikes, M.r, 1.0, option_type="call",
                            american=False, spec=SPEC)
    mega = price_strike_grid(paths, strikes, M.r, 1.0, option_type="call",
                             american=False, spec=SPEC, engine="mega")
    np.testing.assert_allclose(np.asarray(mega.prices), np.asarray(xla.prices),
                               atol=2e-4)


def test_mega_book_rejects_itm_weights(paths):
    with pytest.raises(ValueError, match="itm_weights"):
        price_strike_grid(paths, jnp.asarray([100.0]), M.r, 1.0,
                          spec=RegressionSpec(degree=4, regress_on="itm"),
                          engine="mega")


def test_book_shapes(paths):
    book = price_strike_grid(paths, jnp.asarray([95.0, 105.0]), M.r, 1.0, spec=SPEC)
    assert book.prices.shape == (2,)
    assert book.cashflows.shape == (2, 32_768)
    assert book.exercise_times.shape == (2, 32_768)


def test_mixed_book_mega_matches_bucketed_xla(paths):
    """Mixed maturities in one mega-kernel: option s's induction is masked
    to its own maturity step; must match pricing each maturity bucket on a
    sliced grid with the XLA engine."""
    from amcx.book import price_mixed_book

    strikes = jnp.asarray([90.0, 100.0, 100.0, 110.0])
    mats = [20, 20, 10, 5]
    xla = price_mixed_book(paths, strikes, mats, M.r, 1.0, option_type="put",
                           american=True, spec=SPEC)
    mega = price_mixed_book(paths, strikes, mats, M.r, 1.0, option_type="put",
                            american=True, spec=SPEC, engine="mega")
    np.testing.assert_allclose(np.asarray(mega.prices), np.asarray(xla.prices),
                               atol=8e-3)
    np.testing.assert_allclose(np.asarray(mega.stderrs), np.asarray(xla.stderrs),
                               rtol=0.05)


def test_mixed_book_shorter_maturity_cheaper(paths):
    """American put value is nondecreasing in maturity (same paths)."""
    from amcx.book import price_mixed_book

    strikes = jnp.asarray([100.0, 100.0, 100.0])
    mats = [5, 10, 20]
    res = price_mixed_book(paths, strikes, mats, M.r, 1.0, option_type="put",
                           american=True, spec=SPEC, engine="mega")
    p = np.asarray(res.prices)
    assert p[0] < p[1] < p[2]


def test_mixed_book_validates(paths):
    from amcx.book import price_mixed_book

    with pytest.raises(ValueError, match="maturity_steps"):
        price_mixed_book(paths, jnp.asarray([100.0, 90.0]), [20], M.r, 1.0)
    with pytest.raises(ValueError, match="1[.][.]20"):
        price_mixed_book(paths, jnp.asarray([100.0]), [25], M.r, 1.0,
                         engine="mega")


def test_book_ccr_netting(paths):
    """Netting-set CCR: a long+short pair nets to a tighter profile than
    either leg alone; single-option case reduces to compute_ccr_exposures."""
    from amcx.book import book_ccr_exposures
    from amcx.engine import lsmc_option_pricing

    strikes = jnp.asarray([95.0, 105.0])
    # long the 95 put, short the 105 put
    ccr_net, prices = book_ccr_exposures(
        paths, strikes, jnp.asarray([1.0, -1.0]), M.r, 1.0, "put", True, SPEC)
    ccr_long, _ = book_ccr_exposures(
        paths, strikes, jnp.asarray([1.0, 1.0]), M.r, 1.0, "put", True, SPEC)
    # netting reduces expected exposure vs the gross (long-only) book
    epe_net = np.asarray(ccr_net.epe)[1:-1]
    epe_long = np.asarray(ccr_long.epe)[1:-1]
    assert (epe_net <= epe_long + 1e-6).all()
    # prices agree with the single-option engine
    res = lsmc_option_pricing(
        paths, ProductSpec(K=95.0, T=1.0, option_type="put",
                           exercise="american"), M.r, SPEC,
        return_surface=False)
    np.testing.assert_allclose(float(prices[0]), float(res.price), rtol=1e-5)

    # single option with weight 1 == compute_ccr_exposures of its surface
    from amcx.exposures import compute_ccr_exposures

    one, _ = book_ccr_exposures(paths, jnp.asarray([100.0]),
                                jnp.asarray([1.0]), M.r, 1.0, "put", True, SPEC)
    full = lsmc_option_pricing(
        paths, ProductSpec(K=100.0, T=1.0, option_type="put",
                           exercise="american"), M.r, SPEC,
        return_surface=True)
    want = compute_ccr_exposures(full.continuation)
    np.testing.assert_allclose(np.asarray(one.epe)[:-1],
                               np.asarray(want.epe)[:-1], rtol=1e-5)


def test_book_ccr_exposure_nonnegative(paths):
    """A net-short book has zero (not negative) counterparty exposure: the
    per-path exposure is the positive part of the netted value."""
    from amcx.book import book_ccr_exposures

    ccr, _ = book_ccr_exposures(paths, jnp.asarray([100.0]),
                                jnp.asarray([-1.0]), M.r, 1.0, "put", True,
                                SPEC)
    epe = np.asarray(ccr.epe)[:-1]
    assert (epe >= 0.0).all()
    np.testing.assert_allclose(epe, 0.0, atol=1e-6)


def test_book_greeks_ladder(paths):
    """The delta ladder from the finished book matches per-option
    fast_greeks, is monotone in strike, and needs no re-pricing."""
    from amcx.book import book_greeks
    from amcx.greeks import fast_greeks

    strikes = jnp.asarray([90.0, 100.0, 110.0])
    book = price_strike_grid(paths, strikes, M.r, 1.0, "put", True, SPEC)
    g = book_greeks(book, M, strikes, 1.0, 20, "put")
    assert g["delta"].shape == (3,)
    d = np.asarray(g["delta"])
    # put deltas: negative, decreasing (more negative) in strike
    assert (d < 0).all() and (np.diff(d) < 0).all(), d
    # row 1 must equal single-option fast_greeks on the same outputs
    from amcx import ProductSpec
    from amcx.engine import LSMCResult

    res1 = LSMCResult(book.prices[1], book.stderrs[1], book.cashflows[1],
                      book.exercise_times[1], None)
    want = fast_greeks(res1, M,
                       ProductSpec(K=100.0, T=1.0, option_type="put",
                                   exercise="american"), 20)
    np.testing.assert_allclose(float(g["vega"][1]), float(want["vega"]))

    mega = price_strike_grid(paths, strikes, M.r, 1.0, "put", True, SPEC,
                             engine="mega")
    with pytest.raises(ValueError, match="cashflow"):
        book_greeks(mega, M, strikes, 1.0, 20, "put")


def test_mixed_put_call_book(paths):
    """MIXED put/call books (per-option payoff sign) price through both
    engines; rows match the corresponding single-type books exactly."""
    from amcx.book import book_greeks

    strikes = jnp.asarray([90.0, 100.0, 110.0, 100.0])
    types = ["put", "put", "call", "call"]
    bx = price_strike_grid(paths, strikes, M.r, 1.0, types, True, SPEC)
    bm = price_strike_grid(paths, strikes, M.r, 1.0, types, True, SPEC,
                           engine="mega", return_cf_tau=True)
    np.testing.assert_allclose(np.asarray(bx.prices), np.asarray(bm.prices),
                               atol=3e-3)
    bp = price_strike_grid(paths, strikes[:2], M.r, 1.0, "put", True, SPEC)
    bc = price_strike_grid(paths, strikes[2:], M.r, 1.0, "call", True, SPEC)
    np.testing.assert_allclose(np.asarray(bx.prices[:2]), np.asarray(bp.prices),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(bx.prices[2:]), np.asarray(bc.prices),
                               rtol=1e-6)
    g = book_greeks(bm, M, strikes, 1.0, 20, types)
    d = np.asarray(g["delta"])
    assert (d[:2] < 0).all() and (d[2:] > 0).all()


def test_barrier_book(paths):
    """Shared-barrier ladders: the book (both engines) matches per-strike
    single-option pricing for knock-in AND knock-out variants — the knock
    state rides the spot sign bit in the mega kernel (zero extra traffic)."""
    strikes = jnp.asarray([95.0, 100.0, 105.0])
    for bt, H in [("down-in", 80.0), ("down-out", 80.0)]:
        bx = price_strike_grid(paths, strikes, M.r, 1.0, "put", True, SPEC,
                               barrier=H, barrier_type=bt)
        bm = price_strike_grid(paths, strikes, M.r, 1.0, "put", True, SPEC,
                               engine="mega", barrier=H, barrier_type=bt)
        for i, K in enumerate([95.0, 100.0, 105.0]):
            prod = ProductSpec(K=K, T=1.0, option_type="put",
                               exercise="american", barrier=H, barrier_type=bt)
            single = float(lsmc_option_pricing(paths, prod, M.r, SPEC,
                                               return_surface=False).price)
            np.testing.assert_allclose(float(bx.prices[i]), single, rtol=1e-5)
            assert abs(float(bm.prices[i]) - single) < 3e-3, (bt, K)
        # in + out = vanilla (in/out parity) for European; for American it
        # holds as an inequality-free sanity only in expectation — check
        # the knock-in book is bounded by the vanilla book
        bv = price_strike_grid(paths, strikes, M.r, 1.0, "put", True, SPEC,
                               engine="mega")
        if bt == "down-in":
            assert (np.asarray(bm.prices) <= np.asarray(bv.prices) + 1e-5).all()
