"""Deviceless AOT compile gates for the 8-device collective programs.

VERDICT r3 #5: the CPU interpret machinery cannot see Mosaic collective
lowering at all, and its 1-core livelock ceiling leaves whole configs
(the 8-wide book ring, deep ma-mega schedules) validated nowhere. These
gates compile the real multi-chip programs against the real TPU backend's
8-device v5e topology via `jax.experimental.topologies` — no execution,
no extra chips needed: `jax.jit(...).lower(...).compile()` drives the
full Mosaic pipeline (collective_id allocation, RDMA ring lowering,
semaphore checks) exactly as an 8-chip launch would.

This gate class has already caught one real multi-chip bug the CPU
interpreter provably could not: ring kernels compiled with
``collective_id`` but no barrier-semaphore use failed Mosaic's collective
verification — a device could RDMA into a neighbor's comm buffer before
that neighbor entered the kernel. Fix: `amcx.ops.lsmc_pallas.
ring_entry_barrier` at every collective kernel's first grid step.

Reference analog: SURVEY §5 distributed (the psum-moment design being
certified); the reference itself is single-process NumPy
(`american_monte_carlo.py`) and has no multi-device story.
"""

import numpy as np
import jax
import pytest

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
from amcx.parallel import sharding as sh
from amcx.rates import HW1FParams

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="real-TPU suite")

N_DEV = 8
M = MarketParams(100.0, 0.01, 0.2)
PUT_A = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SIM = SimConfig(n_paths=N_DEV * 4096, n_steps=8, backend="pallas")


@pytest.fixture(scope="module")
def mesh8():
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    devs = np.array(topo.devices)
    assert devs.size == N_DEV
    return Mesh(devs.reshape(-1), ("paths",))


def _aot(fn):
    """Compile-only: lower over a key arg and run the backend compiler."""
    kds = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
    compiled = jax.jit(fn).lower(kds).compile()
    assert compiled is not None


def test_mega_ring_compiles(mesh8):
    _aot(lambda k: sh.price_option_shardmap_mega(
        k, M, PUT_A, RegressionSpec(degree=4), SIM, mesh=mesh8))


def test_book_ring_8wide_compiles(mesh8):
    """The 8-wide book ring never completes under the 1-core CPU
    interpreter (documented livelock ceiling) — this is its only gate."""
    strikes = np.linspace(80.0, 120.0, 16, dtype=np.float32)
    _aot(lambda k: sh.price_book_shardmap_mega(
        k, M, strikes, 1.0, spec=RegressionSpec(degree=4, regress_on="all"),
        sim=SIM, mesh=mesh8))


def test_fusedpath_ring_compiles(mesh8):
    _aot(lambda k: sh.price_option_shardmap_fusedpath(
        k, M, PUT_A, RegressionSpec(degree=4), SIM, mesh=mesh8))


def test_fusedpath_barrier_ring_compiles(mesh8):
    """Zero-HBM barrier mode (forward knock prepass + τ_B plane) composed
    with the in-kernel RDMA moment ring: the prepass fori_loop + the
    collective schedule is exactly the combination only a real-backend AOT
    compile can vet (Mosaic collective lowering; the CPU interpreter cannot
    see this bug class)."""
    import dataclasses

    prod_b = dataclasses.replace(PUT_A, barrier=85.0,
                                 barrier_type="down-in")
    _aot(lambda k: sh.price_option_shardmap_fusedpath(
        k, M, prod_b, RegressionSpec(degree=4), SIM, mesh=mesh8))


def test_ma_mega_maxcall_ring_compiles(mesh8):
    """Deep ma-mega collective schedule: only ≤2-step 2-dev configs ever
    complete under the interpreter — this compiles the real 9-date 8-dev
    program."""
    _aot(lambda k: sh.price_max_call_shardmap_mega(
        k, [100.0, 100.0], 100.0, 3.0, 0.05, 0.2, q=0.10,
        n_exercise_dates=9, n_paths=N_DEV * 4096, mesh=mesh8))


def test_swaption_ring_compiles(mesh8):
    _aot(lambda k: sh.price_bermudan_swaption_shardmap(
        k, HW1FParams(r0=0.02, kappa=0.1, sigma_r=0.01), 0.02,
        [1.0, 2.0, 3.0], n_paths=N_DEV * 4096, n_steps=12, mesh=mesh8))


def test_xla_shardmap_compiles(mesh8):
    """The XLA-collective (psum) engine variant on the same topology."""
    _aot(lambda k: sh.price_option_shardmap(
        k, M, PUT_A, RegressionSpec(degree=4), SIM, mesh=mesh8))


def test_g2_swaption_ring_compiles(mesh8):
    """G2++ Bermudan swaption ring (THREE-plane ma-mega + pathwise df):
    the 1-core interpret host livelocks on the A=3 collective schedule
    (probed >9 min at 2-dev 2-step), so this AOT topology compile is the
    only multichip validation of the G2 collective program."""
    from amcx.rates_g2 import G2Params

    _aot(lambda k: sh.price_bermudan_swaption_g2_shardmap(
        k, G2Params(r0=0.02, a=0.8, b=0.1, sigma=0.01, eta=0.008,
                    rho=-0.7), 0.02, [1.0, 2.0, 3.0],
        n_paths=N_DEV * 4096, n_steps=12, mesh=mesh8))
