#!/usr/bin/env python
"""Demo: reproduces the reference notebook's published price comparisons.

The reference documents its capabilities through `AmericanMonteCarlo.ipynb`
(cells 10-18 print LSMC-vs-QuantLib prices for five configurations; values
recorded in BASELINE.md). This script runs the same five configurations
through amcx against the self-hosted oracle, then shows the capabilities the
reference doesn't have: Greeks, variance reduction, multi-asset Bermudans,
and the fused TPU engines.

Run:  python examples/demo.py  [--plots outdir]
"""

import argparse
import pathlib
import sys

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from amcx import (  # noqa: E402
    MarketParams,
    ProductSpec,
    RegressionSpec,
    SimConfig,
    compute_ccr_exposures,
    control_variate_price,
    fast_greeks,
    lsmc_option_pricing,
    oracle_price,
    price_max_call,
    simulate_gbm,
)

# The notebook's common market (BASELINE.md): S0=95, K=100, T=1, r=1%, σ=20%
MARKET = MarketParams(95.0, 0.01, 0.2)
SPEC10 = RegressionSpec(basis="chebyshev", degree=10, scaling=True, scaling_factor=1.0)

# (label, product, n_paths, n_steps, spec, reference-printed LSMC vs QL)
NOTEBOOK_CELLS = [
    ("cell 10: European put, 1k×100",
     ProductSpec(K=100.0, T=1.0, option_type="put", exercise="european"),
     1_000, 100, SPEC10, (9.9485, 9.8928)),
    ("cell 12: American put, 1k×100",
     ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
     1_000, 100, SPEC10, (10.3838, 10.0198)),
    ("cell 14: Euro DI put B=70, 1k×100",
     ProductSpec(K=100.0, T=1.0, barrier=70.0, option_type="put", exercise="european"),
     1_000, 100, SPEC10, (4.0108, 4.0316)),
    ("cell 16: Euro DI put B=70, 10k×200",
     ProductSpec(K=100.0, T=1.0, barrier=70.0, option_type="put", exercise="european"),
     10_000, 200, SPEC10, (3.7835, 4.0316)),
    ("cell 18: Euro DI put B=70, no scaling",
     ProductSpec(K=100.0, T=1.0, barrier=70.0, option_type="put", exercise="european"),
     1_000, 100, RegressionSpec(basis="chebyshev", degree=10), (4.0108, 4.0316)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plots", default=None, help="directory for figures")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    key = jax.random.key(args.seed)

    print("=" * 78)
    print("Reference notebook comparisons (amcx LSMC vs self-hosted oracle;")
    print("'ref' columns are the notebook's printed LSMC vs QuantLib values)")
    print("=" * 78)
    for label, prod, n_paths, n_steps, spec, (ref_lsmc, ref_ql) in NOTEBOOK_CELLS:
        sim = SimConfig(n_paths=n_paths, n_steps=n_steps)
        paths = simulate_gbm(key, MARKET, prod.T, sim)
        res = lsmc_option_pricing(paths, prod, MARKET.r, spec, return_surface=False)
        orc = float(
            oracle_price(MARKET.S0, prod.K, prod.T, MARKET.r, MARKET.sigma,
                         n_steps=n_steps, option_type=prod.option_type,
                         exercise=prod.exercise, barrier=prod.barrier)
        )
        print(f"{label:38s} amcx={float(res.price):7.4f}±{float(res.stderr):.4f} "
              f"oracle={orc:7.4f} | ref: {ref_lsmc:.4f} vs {ref_ql:.4f}")

    print()
    print("Beyond the reference:")
    sim = SimConfig(n_paths=100_000, n_steps=100)
    prod_am = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    paths = simulate_gbm(key, MARKET, 1.0, sim)
    res = lsmc_option_pricing(paths, prod_am, MARKET.r, RegressionSpec(degree=4),
                              return_surface=True, surface_stats=True)
    g = fast_greeks(res, MARKET, prod_am, sim.n_steps)
    print(f"  pathwise Greeks (100k paths): delta={float(g['delta']):.4f} "
          f"vega={float(g['vega']):.2f} rho={float(g['rho']):.2f}")
    cv = control_variate_price(paths, MARKET, prod_am, RegressionSpec(degree=4))
    print(f"  control variate: stderr {float(cv.raw_stderr):.4f} -> "
          f"{float(cv.stderr):.4f} ({float(cv.variance_ratio):.1f}x variance reduction)")
    mc = price_max_call(key, [100.0] * 5, 100.0, 3.0, 0.05, 0.2, q=0.10,
                        n_paths=100_000, spec=RegressionSpec(degree=3))
    print(f"  5-asset Bermudan max-call: {float(mc.price):.4f}±{float(mc.stderr):.4f} "
          f"(literature 26.12-26.17)")
    ccr = res.exposures
    print(f"  streaming CCR profile: EPE(0)={float(ccr.epe[0]):.3f} "
          f"PFE95(T/2)={float(ccr.pfe95[sim.n_steps // 2]):.3f}")

    # two-sided price: nested Andersen-Broadie dual bound
    from amcx.dual import dual_upper_bound
    from amcx.engine_pallas import precompute_standardization

    spec6 = RegressionSpec(degree=6)
    res6 = lsmc_option_pricing(paths, prod_am, MARKET.r, spec6,
                               return_surface=False, return_coeffs=True)
    mt, ist = precompute_standardization(paths, None, spec6)
    paths_d = simulate_gbm(jax.random.key(1234), MARKET, 1.0,
                           SimConfig(n_paths=8_192, n_steps=sim.n_steps))
    d = dual_upper_bound(jax.random.key(9), paths_d, res6, MARKET, prod_am,
                         spec6, mt, ist, n_inner=128, nested=True)
    print(f"  dual bracket (nested AB): [{float(res6.price):.4f}, "
          f"{float(d.upper):.4f}] ± {float(d.stderr):.4f}")

    if args.plots:
        out = pathlib.Path(args.plots)
        out.mkdir(parents=True, exist_ok=True)
        from amcx import oracle_grid_values
        from amcx.plots import plot_asset_paths, plot_lsmc_results

        plot_asset_paths(paths[:, :100], 1.0, save=out / "paths.png")
        grid = oracle_grid_values(paths[:, :256], 100.0, MARKET.r, 1.0, MARKET.sigma,
                                  option_type="put", exercise="american", crr_steps=50)
        import numpy as np

        plot_lsmc_results(paths, res.continuation, np.asarray(grid), 1.0 / sim.n_steps,
                          ccr, compute_ccr_exposures(grid),
                          key_S_lines=[95.0, 100.0], S0=95.0, K=100.0,
                          n_plotted_paths=10, save=out / "results.png")
        print(f"  wrote figures to {out}/")


if __name__ == "__main__":
    main()
