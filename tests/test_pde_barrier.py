"""Gates for the f64 discrete-monitoring barrier CN-PDE oracle
(`amcx.pde_barrier`) — the exact-semantics anchor for the product-matrix
barrier rows (reference barrier contract:
`/root/reference/american_monte_carlo.py:37-49,171-176`) — and for the
max-call frozen-rule OOS replay (the dual bracket's lower edge).
"""

import numpy as np
import pytest

from amcx.pde_barrier import pde_discrete_barrier_price


S0, K, T, R, SIG = 100.0, 100.0, 1.0, 0.05, 0.2


def test_vanilla_european_matches_black_scholes():
    from amcx.oracle import bs_price

    for ot in ("put", "call"):
        pde = pde_discrete_barrier_price(S0, K, T, R, SIG, 100,
                                         option_type=ot, exercise="european")
        assert abs(pde - float(bs_price(S0, K, T, R, SIG, option_type=ot))) < 1e-3


def test_in_out_parity_european():
    # knock-in + knock-out = vanilla, exactly (same monitoring dates)
    van = pde_discrete_barrier_price(S0, K, T, R, SIG, 100,
                                     option_type="put", exercise="european")
    di = pde_discrete_barrier_price(S0, K, T, R, SIG, 100, option_type="put",
                                    exercise="european", barrier=80.0,
                                    barrier_type="down-in")
    do = pde_discrete_barrier_price(S0, K, T, R, SIG, 100, option_type="put",
                                    exercise="european", barrier=80.0,
                                    barrier_type="down-out")
    assert abs(di + do - van) < 5e-5


def test_q0_american_call_equals_european():
    # with q=0 early exercise of a call is never optimal — also post-knock
    for bar in (None, 80.0):
        eu = pde_discrete_barrier_price(S0, K, T, 0.01, SIG, 100, q=0.0,
                                        option_type="call",
                                        exercise="european", barrier=bar,
                                        barrier_type="down-in")
        am = pde_discrete_barrier_price(S0, K, T, 0.01, SIG, 100, q=0.0,
                                        option_type="call",
                                        exercise="american", barrier=bar,
                                        barrier_type="down-in")
        assert abs(am - eu) < 2e-5


def test_bermudan_grid_convergence_and_ordering():
    # more exercise dates → higher value; Bermudan below continuous American
    from amcx.oracle import crr_price

    b25 = pde_discrete_barrier_price(S0, K, T, R, SIG, 25,
                                     option_type="put", exercise="american")
    b50 = pde_discrete_barrier_price(S0, K, T, R, SIG, 50,
                                     option_type="put", exercise="american")
    crr = float(crr_price(S0, K, T, R, SIG, 2000, option_type="put",
                          american=True))
    eu = pde_discrete_barrier_price(S0, K, T, R, SIG, 50,
                                    option_type="put", exercise="european")
    assert eu < b25 < b50 < crr


def test_spatial_convergence_second_order():
    # mid-cell barrier placement: halving h changes the knock-in value by
    # O(h^2) — the on-node variant regressed to O(h)
    args = dict(option_type="put", exercise="american", barrier=80.0,
                barrier_type="down-in")
    v1 = pde_discrete_barrier_price(95.0, K, T, 0.06, 0.25, 50, n_x=1001,
                                    n_sub=4, **args)
    v2 = pde_discrete_barrier_price(95.0, K, T, 0.06, 0.25, 50, n_x=2001,
                                    n_sub=4, **args)
    v3 = pde_discrete_barrier_price(95.0, K, T, 0.06, 0.25, 50, n_x=4001,
                                    n_sub=4, **args)
    assert abs(v3 - v2) < 0.5 * abs(v2 - v1)
    assert abs(v3 - v2) < 2e-3


def test_matches_exact_discrete_mc_twin():
    # European down-in/down-out vs a 1M-path f64 numpy twin with the
    # identical monitoring semantics (S <= B at grid dates incl. t=0, T)
    rng = np.random.default_rng(987654)
    s0, k, t_, r_, sig, bar, n = 95.0, 100.0, 1.0, 0.06, 0.25, 80.0, 50
    dt = t_ / n
    n_paths = 1_000_000
    z = rng.standard_normal((n_paths // 2, n))
    z = np.concatenate([z, -z], 0)
    logS = np.log(s0) + np.cumsum(
        (r_ - 0.5 * sig * sig) * dt + sig * np.sqrt(dt) * z, axis=1)
    S = np.exp(logS)
    knocked = (S <= bar).any(axis=1) | (s0 <= bar)
    pay = np.maximum(k - S[:, -1], 0.0)
    for bt, mask in (("down-in", knocked), ("down-out", ~knocked)):
        mc = np.exp(-r_ * t_) * (pay * mask).mean()
        se = np.exp(-r_ * t_) * (pay * mask).std() / np.sqrt(n_paths)
        pde = pde_discrete_barrier_price(s0, k, t_, r_, sig, n,
                                         option_type="put",
                                         exercise="european", barrier=bar,
                                         barrier_type=bt, n_x=2001, n_sub=4)
        assert abs(mc - pde) < 4.0 * se, (bt, mc, pde, se)


def test_knocked_at_inception():
    # S0 on the knocked side: down-in == vanilla, down-out == 0
    van = pde_discrete_barrier_price(75.0, K, T, R, SIG, 50,
                                     option_type="put", exercise="american")
    di = pde_discrete_barrier_price(75.0, K, T, R, SIG, 50,
                                    option_type="put", exercise="american",
                                    barrier=80.0, barrier_type="down-in")
    do = pde_discrete_barrier_price(75.0, K, T, R, SIG, 50,
                                    option_type="put", exercise="american",
                                    barrier=80.0, barrier_type="down-out")
    assert abs(di - van) < 1e-12
    assert do == 0.0


def test_validation_rejects_bad_args():
    with pytest.raises(ValueError):
        pde_discrete_barrier_price(S0, K, T, R, SIG, 50, option_type="x")
    with pytest.raises(ValueError):
        pde_discrete_barrier_price(S0, K, T, R, SIG, 50, exercise="x")
    with pytest.raises(ValueError):
        pde_discrete_barrier_price(S0, K, T, R, SIG, 50, barrier=80.0,
                                   barrier_type="sideways-in")


def test_lsmc_american_down_in_within_mc_noise_of_pde():
    # end-to-end: the LSMC American down-in put lands on the PDE anchor
    # within MC noise (the old CRR anchor sat ~0.09 away by construction)
    import jax

    from amcx import (MarketParams, ProductSpec, RegressionSpec, SimConfig,
                      lsmc_option_pricing, simulate_gbm)

    m = MarketParams(100.0, 0.01, 0.2)
    paths = simulate_gbm(jax.random.key(42), m, 1.0,
                         SimConfig(n_paths=131_072, n_steps=50))
    prod = ProductSpec(K=100.0, T=1.0, barrier=80.0, option_type="put",
                       exercise="american", barrier_type="down-in")
    res = lsmc_option_pricing(paths, prod, m.r, RegressionSpec(degree=4),
                              return_surface=False)
    pde = pde_discrete_barrier_price(100.0, 100.0, 1.0, 0.01, 0.2, 50,
                                     option_type="put", exercise="american",
                                     barrier=80.0, barrier_type="down-in",
                                     n_x=2001, n_sub=4)
    assert abs(float(res.price) - pde) < 4.0 * float(res.stderr)


def test_maxcall_oos_replay_is_consistent_lower_edge():
    # frozen-rule OOS replay: a true lower bound consistent with the dual
    # upper bound of the SAME rule, and within noise of the in-sample fit
    import jax

    from amcx import (RegressionSpec, SimConfig, dual_upper_bound_max_call,
                      price_max_call, reprice_max_call_with_coeffs)
    from amcx.models.maxcall import maxcall_standardization
    from amcx.paths import simulate_gbm_multi

    spec = RegressionSpec(degree=4)
    B = dict(K=100.0, T=3.0, r=0.05, sigma=0.2, q=0.10, n_exercise_dates=9)
    res, fp = price_max_call(jax.random.key(42), [100.0] * 2,
                             n_paths=20_000, spec=spec, return_coeffs=True,
                             return_paths=True, **B)
    stats = maxcall_standardization(fp, "sorted")
    po = simulate_gbm_multi(jax.random.key(778), [100.0] * 2, 0.05, 0.2, 3.0,
                            SimConfig(n_paths=40_000, n_steps=9), q=0.10)
    oos = reprice_max_call_with_coeffs(po, res, stats, 100.0, 3.0, 0.05, spec)
    pd_ = simulate_gbm_multi(jax.random.key(777), [100.0] * 2, 0.05, 0.2, 3.0,
                             SimConfig(n_paths=1_024, n_steps=9), q=0.10)
    d = dual_upper_bound_max_call(jax.random.key(5), pd_, res, 100.0, 3.0,
                                  0.05, 0.2, stats, spec, q=0.10, n_inner=16)
    lo = float(oos.price)
    assert abs(lo - float(res.price)) < 4.0 * (float(oos.stderr)
                                               + float(res.stderr))
    assert lo - 3.0 * float(oos.stderr) < float(d.upper) + 3.0 * float(d.stderr)
    # the bracket must contain the Andersen-Broadie 2-asset truth ~13.90
    assert lo - 3.0 * float(oos.stderr) < 13.93
    assert float(d.upper) + 3.0 * float(d.stderr) > 13.90
