"""Fused Pallas engine under shard_map on the virtual 8-device mesh.

Composition check: the packed-moment psum (`engine_pallas`, axis_name) must
produce a globally-consistent fit when each rank runs the fused kernels on
its local path shard (the production multi-chip execution style).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig, simulate_gbm
from amcx.engine_pallas import lsmc_option_pricing_fused
from amcx.parallel.sharding import make_mesh

M = MarketParams(100.0, 0.01, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SPEC = RegressionSpec(degree=3)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(devs[:8])


def test_fused_engine_shardmap_psum(mesh):
    paths = simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=65536, n_steps=10))
    from jax import shard_map

    @jax.jit
    def sharded(paths):
        def local(p):
            res = lsmc_option_pricing_fused(p, PROD, M.r, SPEC, axis_name="paths")
            return res.price, res.stderr

        return shard_map(
            local, mesh=mesh, in_specs=P(None, "paths"), out_specs=(P(), P()),
            check_vma=False,
        )(paths)

    price8, stderr8 = map(float, sharded(paths))
    single = lsmc_option_pricing_fused(paths, PROD, M.r, SPEC)
    # Same paths; only f32 reduction order (psum of shard-local moments)
    # differs, amplified through near-boundary exercise flips.
    assert abs(price8 - float(single.price)) < 0.5 * float(single.stderr)
    np.testing.assert_allclose(stderr8, float(single.stderr), rtol=5e-2)
