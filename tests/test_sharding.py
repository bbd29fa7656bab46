"""Multi-chip path sharding on a virtual 8-device CPU mesh (SURVEY §4/§5).

The jit-sharded pipeline must produce bit-identical prices to the
single-device run (partitionable threefry: path i's normals don't depend on
the mesh), and the explicit shard_map/psum pipeline must agree statistically
and be internally consistent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, price_option
from amcx.parallel.sharding import (
    make_mesh,
    path_sharding,
    price_option_sharded,
    price_option_shardmap,
    shard_paths,
)

M = MarketParams(100.0, 0.01, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SPEC = RegressionSpec(degree=4)
SIM = SimConfig(n_paths=16_000, n_steps=50)


@pytest.fixture(scope="module")
def mesh(request):
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(devs[:8])


def test_mesh_has_eight_devices(mesh):
    assert mesh.devices.size == 8


def test_jit_sharded_matches_single_device(mesh):
    """Same threefry key → same paths on any mesh (partitionable RNG). The
    price differs only by f32 reduction order in the regression moments
    (which can flip near-boundary exercise decisions), so the tolerance is
    tight in MC terms but not bit-exact."""
    key = jax.random.key(42)
    single = price_option(key, M, PROD, SPEC, SIM)
    sharded = price_option_sharded(key, M, PROD, SPEC, SIM, mesh)
    assert abs(float(sharded.price) - float(single.price)) < 0.5 * float(single.stderr)
    # 2e-2: the auto-resolved ITM fit lets a few near-boundary exercise
    # decisions flip with shard-local reduction order, moving stderr ~1%
    np.testing.assert_allclose(float(sharded.stderr), float(single.stderr), rtol=2e-2)


def test_sharded_outputs_live_on_mesh(mesh):
    key = jax.random.key(0)
    res = price_option_sharded(key, M, PROD, SPEC, SIM, mesh)
    assert len(res.cashflows.sharding.device_set) == 8


def test_shardmap_explicit_psum_consistent(mesh):
    """shard_map price must match a hand-computed global mean of its own
    sharded cashflow outputs, and agree with the single-device price to MC
    tolerance (different per-rank keys → statistical equivalence, SURVEY Q8)."""
    key = jax.random.key(42)
    res = price_option_shardmap(key, M, PROD, SPEC, SIM, mesh)
    dt = PROD.T / SIM.n_steps
    manual = float(
        jnp.mean(res.cashflows * jnp.exp(-M.r * dt * res.exercise_times))
    )
    np.testing.assert_allclose(float(res.price), manual, rtol=1e-5)
    single = price_option(key, M, PROD, SPEC, SIM)
    assert abs(float(res.price) - float(single.price)) < 5 * float(single.stderr)


def test_shard_paths_placement(mesh):
    from amcx import simulate_gbm

    paths = simulate_gbm(jax.random.key(1), M, 1.0, SimConfig(n_paths=8000, n_steps=10))
    sharded = shard_paths(paths, mesh)
    assert sharded.sharding == path_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(paths))


def test_book_shardmap_matches_single_device():
    """Distributed book: sharded paths + vmapped strikes, psum'd moments.
    Each rank folds its own key, so agreement is statistical (5 stderr)."""
    from amcx.book import price_strike_grid
    from amcx.parallel.sharding import make_mesh, price_book_shardmap
    from amcx.paths import simulate_gbm

    m = MarketParams(100.0, 0.03, 0.2)
    sim = SimConfig(n_paths=32_768, n_steps=20)
    strikes = jnp.asarray([90.0, 100.0, 110.0])
    spec = RegressionSpec(degree=4)
    prices, stderrs = price_book_shardmap(
        jax.random.key(0), m, strikes, 1.0, "put", True, spec, sim,
        mesh=make_mesh(),
    )
    paths = simulate_gbm(jax.random.key(1), m, 1.0, sim)
    ref = price_strike_grid(paths, strikes, m.r, 1.0, "put", True, spec)
    for i in range(3):
        se = max(float(stderrs[i]), float(ref.stderrs[i]))
        assert abs(float(prices[i]) - float(ref.prices[i])) < 5 * se
    # monotone in strike (puts)
    p = np.asarray(prices)
    assert (np.diff(p) > 0).all()


def test_autocall_shardmap_matches_single_device(mesh):
    from amcx.models.autocall import AutocallSpec, price_autocall
    from amcx.parallel.sharding import price_autocall_shardmap

    spec = AutocallSpec(T=2.0, n_obs=8, autocall_barrier=100.0, coupon=0.02,
                        coupon_barrier=70.0, memory=True, ki_barrier=60.0,
                        put_strike=100.0)
    sim = SimConfig(n_paths=32_768, n_steps=32, antithetic=True)
    sharded = price_autocall_shardmap(jax.random.key(5), M, spec, sim,
                                      mesh=mesh)
    single = price_autocall(jax.random.key(5), M, spec, sim)
    # folded per-rank keys => a different valid sample: MC-tolerance gate
    tol = 6.0 * np.hypot(float(sharded.stderr), float(single.stderr))
    assert abs(float(sharded.price) - float(single.price)) < tol
    assert 0 < float(sharded.stderr) < 0.01
