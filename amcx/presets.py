"""Named run configurations.

The five BASELINE.json benchmark configs plus the reference's own demo
parameter dict (`/root/reference/american_monte_carlo.py:507-530`, the flat
17-key dict), expressed as amcx spec objects.
"""

from __future__ import annotations

from typing import Any, Dict

from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = ["PRESETS", "get_preset"]


PRESETS: Dict[str, Dict[str, Any]] = {
    # BASELINE.json configs[0]: "American put on GBM, degree-2 polynomial
    # basis, 100k paths x 50 steps (repo default, CPU-runnable)"
    "american-put-default": dict(
        kind="price",
        market=MarketParams(100.0, 0.05, 0.2),
        product=ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        spec=RegressionSpec(basis="power", degree=2),
        sim=SimConfig(n_paths=100_000, n_steps=50),
    ),
    # configs[1]: basis-family/degree sweep
    "basis-sweep": dict(
        kind="degree-sweep",
        market=MarketParams(100.0, 0.05, 0.2),
        product=ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        bases=("monomial", "laguerre", "chebyshev"),
        max_degree=6,
        n_paths=50_000,
        n_steps=50,
    ),
    # configs[2]: antithetic + European control variate convergence
    "variance-reduction": dict(
        kind="variance-reduction",
        market=MarketParams(100.0, 0.05, 0.2),
        product=ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        spec=RegressionSpec(basis="chebyshev", degree=4),
        path_range=(1_000, 4_000, 16_000, 64_000, 256_000),
        n_steps=50,
    ),
    # configs[3]: pathwise Greeks
    "greeks": dict(
        kind="greeks",
        market=MarketParams(100.0, 0.05, 0.2),
        product=ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american"),
        spec=RegressionSpec(basis="chebyshev", degree=4),
        sim=SimConfig(n_paths=200_000, n_steps=50),
    ),
    # configs[4]: 5-asset Bermudan max-call
    "max-call-5": dict(
        kind="max-call",
        S0=[100.0] * 5,
        K=100.0,
        T=3.0,
        r=0.05,
        sigma=0.2,
        q=0.10,
        n_exercise_dates=9,
        n_paths=200_000,
        spec=RegressionSpec(basis="chebyshev", degree=2),
    ),
    # The reference's __main__ demo (american_monte_carlo.py:507-530):
    # S0=95 European put, barrier 70, Chebyshev degree 10, scaled.
    "reference-demo": dict(
        kind="price",
        market=MarketParams(95.0, 0.01, 0.2),
        product=ProductSpec(K=100.0, T=1.0, barrier=70.0, option_type="put",
                            exercise="european"),
        spec=RegressionSpec(basis="chebyshev", degree=10, scaling=True, scaling_factor=1.0),
        sim=SimConfig(n_paths=1_000, n_steps=80),
    ),
}


def get_preset(name: str) -> Dict[str, Any]:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"Unknown preset {name!r}. Available: {sorted(PRESETS)}") from None
