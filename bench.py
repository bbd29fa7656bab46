#!/usr/bin/env python
"""amcx benchmark harness (driver contract: prints ONE JSON line).

North-star metric (BASELINE.json): path-steps/sec on the 1M-path × 100-step
American put, Chebyshev degree 4 — full pipeline (Pallas RNG path generation
+ fused-kernel Longstaff-Schwartz backward induction), on whatever
accelerator is attached. ``vs_baseline`` is the ratio to the 1e9
path-steps/sec target (set for a v5e-8; we exceed it on a single chip).

Method: K pipeline iterations are chained inside one jitted fori_loop and
timed around a single host sync — the axon TPU tunnel costs ~30 ms per
host↔device round trip, which would otherwise dominate. Accuracy is reported
alongside: |LSMC − CRR-2000| on the same config must stay inside MC noise.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from amcx import MarketParams, ProductSpec, RegressionSpec, SimConfig
from amcx.engine import lsmc_option_pricing
from amcx.ops.lsmc_megakernel import lsmc_price_megakernel
from amcx.oracle import crr_price
from amcx.paths import gbm_standardization, simulate_gbm

N_PATHS = 1_048_576
N_STEPS = 100
TARGET = 1e9  # BASELINE.json north-star: >=1e9 path-steps/sec (v5e-8)


def main():
    on_tpu = jax.default_backend() != "cpu"
    market = MarketParams(100.0, 0.01, 0.2)
    product = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")
    spec = RegressionSpec(basis="chebyshev", degree=4)
    sim = SimConfig(
        n_paths=N_PATHS, n_steps=N_STEPS, backend="pallas" if on_tpu else "xla"
    )
    # Closed-form GBM standardization stats (conditioning-equivalent to the
    # data statistics; saves several XLA sweeps over the 400 MB path array).
    mean_t, inv_std_t = gbm_standardization(market, 1.0, N_STEPS)

    @jax.jit
    def chained(key, n):
        def body(i, acc):
            if on_tpu:
                # flagship path: blocked-layout pallas path generation
                # (no relayout at the kernel boundary) + single-kernel
                # backward induction; ITM-restricted fit per the BASELINE
                # north star ("polynomial basis on in-the-money paths")
                from amcx.ops.gbm_pallas import _key_to_seed, gbm_paths_pallas

                paths = gbm_paths_pallas(
                    _key_to_seed(jax.random.fold_in(key, i)), market.S0,
                    market.r, market.sigma, market.q, 1.0, N_STEPS, N_PATHS,
                    out_blocked=True,
                )
                price = lsmc_price_megakernel(
                    paths, 100.0, 0.01, 1.0 / N_STEPS, -1.0, degree=4,
                    itm_weights=True, mean_t=mean_t, inv_std_t=inv_std_t,
                )
            else:
                paths = simulate_gbm(jax.random.fold_in(key, i), market, 1.0, sim)
                price = lsmc_option_pricing(
                    paths, product, market.r, spec, return_surface=False
                ).price
            return acc + price

        return lax.fori_loop(0, n, body, 0.0)

    # Warm up / compile, and grab a price for the accuracy gate.
    price1 = float(chained(jax.random.key(0), 1))

    # Median of 3 chained batches: the host<->device tunnel adds ~32 ms
    # per sync — at 50 chained pricings that is <3% of the batch.
    iters = 50 if on_tpu else 2
    times, total = [], 0.0
    for rep in range(3 if on_tpu else 1):
        t0 = time.time()
        total = float(chained(jax.random.key(1 + rep), iters))
        times.append((time.time() - t0) / iters)
    dt = sorted(times)[len(times) // 2]
    throughput = N_PATHS * N_STEPS / dt

    crr = float(
        crr_price(100.0, 100.0, 1.0, 0.01, 0.2, 2000, option_type="put", american=True)
    )
    # Two estimators reported explicitly so the fields cross-check: the
    # single warmup pricing (one seed) and the mean over the final timed
    # batch of `iters` independent pricings (lower-variance).
    price_mean = total / iters
    err_single = abs(price1 - crr)
    err_mean = abs(price_mean - crr)

    print(
        json.dumps(
            {
                "metric": "path-steps/sec (1M x 100-step American put, full pipeline)",
                "value": round(throughput / 1e9, 4) * 1e9,
                "unit": "path-steps/sec",
                "vs_baseline": round(throughput / TARGET, 4),
                "extra": {
                    "ms_per_pricing": round(dt * 1e3, 2),
                    "price_single": round(price1, 4),
                    "err_single": round(err_single, 4),
                    "price_mean%d" % iters: round(price_mean, 4),
                    "err_mean%d" % iters: round(err_mean, 4),
                    "crr2000_ref": round(crr, 4),
                    "abs_err_vs_crr": round(err_mean, 4),
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    "n_paths": N_PATHS,
                    "n_steps": N_STEPS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
