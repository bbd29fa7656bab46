"""Streaming exposure stats + coefficient export from the engine scan."""

import jax
import numpy as np
import pytest

from amcx import (
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    compute_ccr_exposures,
    lsmc_option_pricing,
    simulate_gbm,
)

M = MarketParams(100.0, 0.01, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
SPEC = RegressionSpec(degree=4)


@pytest.fixture(scope="module")
def paths():
    return simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=8192, n_steps=15))


def test_streaming_stats_match_full_surface(paths):
    full = lsmc_option_pricing(paths, PROD, M.r, SPEC, return_surface=True)
    want = compute_ccr_exposures(full.continuation)
    stream = lsmc_option_pricing(
        paths, PROD, M.r, SPEC, return_surface=False, surface_stats=True
    )
    got = stream.exposures
    assert stream.continuation is None
    np.testing.assert_allclose(np.asarray(got.epe), np.asarray(want.epe), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.pfe5), np.asarray(want.pfe5), atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.pfe95), np.asarray(want.pfe95), atol=5e-3)
    # maturity row zeros (reference parity)
    assert float(got.epe[-1]) == 0.0


def test_coefficient_export_shape_and_reproduction(paths):
    res = lsmc_option_pricing(paths, PROD, M.r, SPEC, return_surface=True, return_coeffs=True)
    assert res.coeffs.shape == (15, 5)
    # reproduce one step's continuation from the exported coefficients
    from amcx.basis import design_matrix
    from amcx.regress import weighted_standardize

    t = 7
    xs = weighted_standardize(paths[t], None, 1.0)
    A = design_matrix(xs, SPEC.basis, SPEC.degree)
    cont = np.maximum(np.asarray(A @ res.coeffs[t]), 0.0)
    np.testing.assert_allclose(cont, np.asarray(res.continuation[t]), atol=1e-3)


def test_coeffs_rejected_with_custom_fitter(paths):
    from amcx.engine import backward_induction
    from amcx.payoff import payoff_fn_for

    with pytest.raises(ValueError, match="default univariate fitter"):
        backward_induction(
            paths, (paths > 0), M.r, 1.0 / 15, payoff_fn_for(PROD), SPEC,
            fit_fn=lambda *a: a[0], return_coeffs=True,
        )


def test_distributed_surface_stats_match_single_device(paths, eight_devices):
    """surface_stats under shard_map: EPE is an exact psum; PFE quantiles
    come from the psum'd 2048-bin histogram and must match the single-device
    sort-based values to a bin width of the per-step range (VERDICT r1 #8)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from amcx.parallel.sharding import make_mesh

    mesh = make_mesh(eight_devices)
    single = lsmc_option_pricing(paths, PROD, M.r, SPEC, return_surface=True,
                                 surface_stats=True)

    @jax.jit
    def sharded(paths):
        def local(p):
            res = lsmc_option_pricing(p, PROD, M.r, SPEC, return_surface=False,
                                      surface_stats=True, axis_name="paths")
            return res.exposures

        return shard_map(local, mesh=mesh, in_specs=P(None, "paths"),
                         out_specs=P(), check_vma=False)(paths)

    got = sharded(paths)
    want = single.exposures
    np.testing.assert_allclose(np.asarray(got.epe), np.asarray(want.epe),
                               rtol=1e-5, atol=1e-5)
    # histogram quantile: within one 2048-bin width of the per-step range
    surf = np.asarray(single.continuation)
    binw = (surf.max(axis=1) - surf.min(axis=1)) / 2048 + 1e-6
    assert np.all(np.abs(np.asarray(got.pfe5) - np.asarray(want.pfe5)) < 2 * binw)
    assert np.all(np.abs(np.asarray(got.pfe95) - np.asarray(want.pfe95)) < 2 * binw)
