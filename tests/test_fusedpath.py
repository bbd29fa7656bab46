"""Fused-path kernel (backward in-kernel path generation): CPU-side checks.

The TPU interpreter stubs the hardware PRNG with zero bits, so statistical
assertions live in tests_tpu/test_lsmc_kernels_tpu.py; here we verify the
bridge math, the kernel's control flow (interpret mode), and the engine
selector plumbing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
from amcx.engine import price_option
from amcx.ops.lsmc_fusedpath import lsmc_price_fusedpath


def test_backward_bridge_law():
    """The backward recursion W_t = t/(t+1)·W_{t+1} + √(dt·t/(t+1))·ξ must
    reproduce the Brownian law: Var(W_t) = t·dt and Cov(W_s, W_t) = s·dt."""
    rng = np.random.default_rng(0)
    n_steps, n, dt = 8, 200_000, 0.125
    W = np.sqrt(n_steps * dt) * rng.standard_normal(n)
    Ws = {n_steps: W.copy()}
    for t in range(n_steps - 1, 0, -1):
        a = t / (t + 1)
        W = a * W + np.sqrt(dt * a) * rng.standard_normal(n)
        Ws[t] = W.copy()
    for t in (1, 4, 8):
        np.testing.assert_allclose(Ws[t].var(), t * dt, rtol=2e-2)
    # covariance of W_2 with W_6 is min(2,6)·dt
    cov = np.mean(Ws[2] * Ws[6])
    np.testing.assert_allclose(cov, 2 * dt, rtol=5e-2)


def test_interpret_smoke():
    """Zero-bit PRNG (interpreter stub) → the deterministic forward curve;
    the kernel must still run the full induction and emit finite stats."""
    p, se = lsmc_price_fusedpath(0, 100.0, 100.0, 0.05, 0.2, 0.02, 50, 8192,
                                 -1.0, return_stats=True)
    assert np.isfinite(float(p)) and np.isfinite(float(se))
    assert float(p) >= 0.0


def test_validation():
    with pytest.raises(ValueError, match="divisible"):
        lsmc_price_fusedpath(0, 100.0, 100.0, 0.05, 0.2, 0.02, 50, 1000, -1.0)


def test_engine_selector():
    m = MarketParams(100.0, 0.05, 0.2)
    sim = SimConfig(n_paths=8192, n_steps=20)
    with pytest.raises(ValueError, match="no dense surface"):
        price_option(jax.random.key(0), m,
                     ProductSpec(K=100.0, T=1.0, option_type="put",
                                 exercise="american"),
                     RegressionSpec(), sim, return_surface=True,
                     engine="fusedpath")
    res_b = price_option(jax.random.key(0), m,
                         ProductSpec(K=100.0, T=1.0, option_type="put",
                                     exercise="american", barrier=80.0),
                         RegressionSpec(), sim, engine="fusedpath")
    assert np.isfinite(float(res_b.price))
    with pytest.raises(NotImplementedError, match="curves"):
        lsmc_price_fusedpath(0, 100.0, 100.0,
                             jnp.full((20,), 0.05), 0.2, 0.05, 20, 8192,
                             -1.0, barrier=80.0)
    with pytest.raises(ValueError, match="barrier_type"):
        lsmc_price_fusedpath(0, 100.0, 100.0, 0.05, 0.2, 0.05, 20, 8192,
                             -1.0, barrier=80.0, barrier_type="sideways")
    res = price_option(jax.random.key(0), m,
                       ProductSpec(K=100.0, T=1.0, option_type="put",
                                   exercise="american"),
                       RegressionSpec(), sim, engine="fusedpath")
    assert np.isfinite(float(res.price))


def test_cf_tau_price_identity():
    """The exported (cf, τ) planes must reproduce the kernel's own price:
    price == mean(cf·e^{−r·dt·τ}) (Q5 discounting), for ANY PRNG stream —
    including the interpreter's zero-bit stub."""
    r, dt, n_steps, n_paths = 0.05, 0.02, 50, 8192
    out = lsmc_price_fusedpath(3, 100.0, 100.0, r, 0.2, dt, n_steps, n_paths,
                               -1.0, return_cf_tau=True)
    cf = np.asarray(out.cashflows)
    tau = np.asarray(out.exercise_times)
    assert cf.shape == tau.shape == (n_paths,)
    assert (cf >= 0).all()
    assert ((tau >= 0) & (tau <= n_steps)).all()
    # never-exercised paths keep τ = n_steps (Q7) and cf = 0 or intrinsic
    recon = float(np.mean(cf * np.exp(-r * dt * tau)))
    np.testing.assert_allclose(recon, float(out.price), rtol=1e-5, atol=1e-6)


def test_coeffs_export_shape():
    """Per-step coefficient export: (n_steps+1, k), zero maturity row,
    finite everywhere — the same contract as the mega kernel's export."""
    n_steps, degree = 20, 4
    out = lsmc_price_fusedpath(7, 100.0, 100.0, 0.05, 0.2, 0.05, n_steps,
                               8192, -1.0, degree=degree, return_coeffs=True)
    coefs = np.asarray(out.coeffs)
    assert coefs.shape == (n_steps + 1, degree + 1)
    assert np.isfinite(coefs).all()
    np.testing.assert_array_equal(coefs[n_steps], 0.0)


def test_price_option_fusedpath_feeds_fast_greeks():
    """engine='fusedpath' with return_cf_tau fills LSMCResult and feeds
    fast_greeks (order-independent reductions over cf/τ)."""
    from amcx.greeks import fast_greeks

    m = MarketParams(100.0, 0.05, 0.2)
    prod = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    sim = SimConfig(n_paths=8192, n_steps=20)
    res = price_option(jax.random.key(1), m, prod, RegressionSpec(), sim,
                       engine="fusedpath", return_cf_tau=True,
                       return_coeffs=True)
    assert res.cashflows is not None and res.exercise_times is not None
    assert res.coeffs is not None and res.coeffs.shape == (21, 5)
    g = fast_greeks(res, m, prod, sim.n_steps)
    for v in g.values():
        assert np.isfinite(float(v))


def test_barrier_gate_identities_zero_noise():
    """Barrier mode exercises the forward-prepass + τ_B-plane path; under
    the interpreter's zero-bit PRNG every path IS the deterministic forward
    curve, so the gate identities are exact:

    - a barrier the curve never touches ⟹ knock-out == vanilla (gate all
      open), knock-in == 0 (gate never opens);
    - a barrier crossed at t = 0 ⟹ knock-in == vanilla, knock-out == 0;
    - a barrier crossed mid-grid (r=0, σ=0.3 ⟹ S_t = 100·e^{−0.045·t·dt},
      first ≤ 97 at step 34) ⟹ the down-out policy exercises at step 33
      (S = 97.07, intrinsic 2.93) — the exact deterministic optimum.
    """
    args = (0, 100.0, 100.0, 0.0, 0.3, 0.02, 50, 8192, -1.0)
    van = float(lsmc_price_fusedpath(*args))
    assert van > 4.0  # declining deterministic curve: put is ITM at T
    # never-touched barriers
    assert float(lsmc_price_fusedpath(*args, barrier=1e-6,
                                      barrier_type="down-out")) == van
    assert float(lsmc_price_fusedpath(*args, barrier=1e-6,
                                      barrier_type="down-in")) == 0.0
    assert float(lsmc_price_fusedpath(*args, barrier=101.0,
                                      barrier_type="up-out")) == van
    assert float(lsmc_price_fusedpath(*args, barrier=101.0,
                                      barrier_type="up-in")) == 0.0
    # knocked at t = 0 (S_0 itself crosses)
    assert float(lsmc_price_fusedpath(*args, barrier=150.0,
                                      barrier_type="down-in")) == van
    assert float(lsmc_price_fusedpath(*args, barrier=150.0,
                                      barrier_type="down-out")) == 0.0
    assert float(lsmc_price_fusedpath(*args, barrier=100.0,
                                      barrier_type="up-in")) == van
    # mid-grid crossing: down-out exercises just above the barrier
    out_mid = float(lsmc_price_fusedpath(*args, barrier=97.0,
                                         barrier_type="down-out"))
    s33 = 100.0 * np.exp(-0.045 * 33 * 0.02)
    np.testing.assert_allclose(out_mid, 100.0 - s33, atol=1e-3)
    # down-in with the same barrier: knock precedes the vanilla's optimal
    # late exercise on this curve, so the gated price equals the vanilla
    in_mid = float(lsmc_price_fusedpath(*args, barrier=97.0,
                                        barrier_type="down-in"))
    assert in_mid == van


def test_barrier_cf_tau_and_replay_compose():
    """Barrier mode composes with the (cf, τ) export (price identity) and
    with frozen-policy replay (same seed + own coeffs ⟹ same price)."""
    r, dt, n_steps, n_paths = 0.0, 0.02, 50, 8192
    out = lsmc_price_fusedpath(3, 100.0, 100.0, r, 0.3, dt, n_steps, n_paths,
                               -1.0, barrier=97.0, barrier_type="down-out",
                               return_cf_tau=True, return_coeffs=True)
    cf = np.asarray(out.cashflows)
    tau = np.asarray(out.exercise_times)
    recon = float(np.mean(cf * np.exp(-r * dt * tau)))
    np.testing.assert_allclose(recon, float(out.price), rtol=1e-5, atol=1e-6)
    replayed = lsmc_price_fusedpath(3, 100.0, 100.0, r, 0.3, dt, n_steps,
                                    n_paths, -1.0, barrier=97.0,
                                    barrier_type="down-out",
                                    replay_coeffs=out.coeffs)
    np.testing.assert_allclose(float(replayed), float(out.price), rtol=1e-6)
