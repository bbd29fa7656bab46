"""Configuration dataclasses for the amcx engine.

The reference (`/root/reference/american_monte_carlo.py:443-461,507-530`)
configures everything through a flat 17-key Python dict unpacked by hand in
``main``. Here the same information is split into frozen dataclasses that are
friendly to ``jax.jit``: numeric market/product fields are pytree *leaves*
(differentiable, no recompilation when they change), while structural choices
(option type, basis family, degree, path counts) are static metadata that
select the compiled program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = [
    "MarketParams",
    "ProductSpec",
    "RegressionSpec",
    "SimConfig",
    "OptionType",
    "ExerciseType",
]

# String enums kept as plain strings for ergonomic parity with the reference
# ("Put"/"Call", "European"/"American" at american_monte_carlo.py:85,154).
OptionType = str  # "put" | "call"
ExerciseType = str  # "european" | "american"


def _norm(s: str) -> str:
    return s.strip().lower()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MarketParams:
    """Black-Scholes market: spot, rate, vol, continuous dividend yield.

    Mirrors the scalar market inputs threaded through the reference
    (`american_monte_carlo.py:72,57`). All fields are dynamic pytree leaves so
    Greeks can be taken with ``jax.grad`` with respect to any of them.
    """

    S0: jax.Array | float
    r: jax.Array | float
    sigma: jax.Array | float
    q: jax.Array | float = 0.0

    def astuple(self):
        return (self.S0, self.r, self.sigma, self.q)


@dataclasses.dataclass(frozen=True)
class ProductSpec:
    """Option product identity.

    In the reference the product is the parameter tuple
    ``(option_type, exercise_type, barrier_level)`` plus strike/maturity
    (`american_monte_carlo.py:180-182`). Barrier semantics are down-and-in
    only, ``barrier < S0`` (SURVEY Q4). ``K`` and ``T`` are dynamic leaves;
    ``barrier`` is a dynamic leaf when present and ``None`` for vanilla.
    ``option_type``/``exercise`` are static metadata.
    """

    K: jax.Array | float
    T: jax.Array | float
    barrier: Optional[jax.Array | float] = None
    option_type: str = dataclasses.field(default="put", metadata={"static": True})
    exercise: str = dataclasses.field(default="european", metadata={"static": True})
    barrier_type: str = dataclasses.field(default="down-in", metadata={"static": True})

    def __post_init__(self):
        object.__setattr__(self, "option_type", _norm(self.option_type))
        object.__setattr__(self, "exercise", _norm(self.exercise))
        object.__setattr__(self, "barrier_type", _norm(self.barrier_type))
        if self.option_type not in ("put", "call"):
            raise ValueError(f"option_type must be 'put' or 'call', got {self.option_type!r}")
        if self.exercise not in ("european", "american"):
            raise ValueError(f"exercise must be 'european' or 'american', got {self.exercise!r}")
        if self.barrier_type not in ("down-in", "up-in", "down-out", "up-out"):
            raise ValueError(
                f"barrier_type must be one of down-in/up-in/down-out/up-out, "
                f"got {self.barrier_type!r}"
            )

    @property
    def is_american(self) -> bool:
        return self.exercise == "american"

    @property
    def has_barrier(self) -> bool:
        return self.barrier is not None


# Tell the pytree registry which ProductSpec fields are static.
jax.tree_util.register_dataclass(
    ProductSpec,
    data_fields=["K", "T", "barrier"],
    meta_fields=["option_type", "exercise", "barrier_type"],
)


@dataclasses.dataclass(frozen=True)
class RegressionSpec:
    """Continuation-value regression configuration.

    Mirrors `regression_estimate` kwargs (`american_monte_carlo.py:110`):
    basis family, degree, optional standardization with a scaling factor.

    Extensions over the reference (SURVEY Q1 and §7.4):

    - ``regress_on``: ``"auto"`` (default — the public pricing entry points
      resolve it per product via `amcx.engine.resolve_regression_spec`:
      the bias-reduced ITM-localized estimator for early-exercisable
      vanilla products, all-paths for Europeans), ``"all"`` (the explicit
      reference-parity opt-out — fit on every path,
      `american_monte_carlo.py:127`, SURVEY Q1; carries a documented
      −0.06…−0.22 policy bias at 1M paths for ITM American configs, see
      docs/PARITY.md), or ``"itm"`` (canonical Longstaff-Schwartz: weight
      the fit by the in-the-money indicator). Layers below the public
      entry points treat an unresolved ``"auto"`` as ``"all"``
      (reference behaviour).
    - ``internal_standardize``: even when the user-facing ``scaling`` flag is
      off, the design matrix is built on an internally standardized regressor.
      Fitted values of an OLS fit are invariant under affine reparametrization
      of the regressor (the polynomial span is identical), so this changes
      nothing in exact arithmetic — the reference's own notebook cells 14/18
      show scaling on/off producing the same price — but it is required for
      float32 conditioning on TPU (raw Chebyshev degree 10 at S≈100 squares
      to ~1e40 in the normal equations). Set to False only for low-degree
      bit-parity experiments.
    - ``rcond``: relative eigenvalue cutoff of the pseudo-inverse solve,
      matching ``np.linalg.lstsq``'s pinv behaviour on rank-deficient designs
      (the t=0 step has a rank-1 design matrix, SURVEY Q3).

    All fields are static: they select the compiled program.
    """

    basis: str = "chebyshev"
    degree: int = 4
    scaling: bool = False
    scaling_factor: float = 2.0
    regress_on: str = "auto"
    internal_standardize: bool = True
    rcond: float = 1e-6

    def __post_init__(self):
        object.__setattr__(self, "basis", _norm(self.basis))
        object.__setattr__(self, "regress_on", _norm(self.regress_on))
        if self.regress_on not in ("auto", "all", "itm"):
            raise ValueError(
                f"regress_on must be 'auto', 'all' or 'itm', got {self.regress_on!r}")
        if self.degree < 0:
            raise ValueError("degree must be >= 0")

    @property
    def n_basis(self) -> int:
        return self.degree + 1


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Path simulation configuration (static).

    ``n_paths``/``n_steps`` mirror `generate_asset_paths`
    (`american_monte_carlo.py:72`). ``antithetic`` pairs each path with its
    mirrored Brownian increments (variance reduction; BASELINE config 3).
    ``backend`` selects the plain-XLA simulator or the Pallas TPU kernel.
    """

    n_paths: int = 100_000
    n_steps: int = 50
    dtype: str = "float32"
    antithetic: bool = False
    backend: str = "xla"  # "xla" | "pallas"

    def __post_init__(self):
        if self.n_paths < 1 or self.n_steps < 1:
            raise ValueError(
                f"n_paths and n_steps must be >= 1, got {self.n_paths}, {self.n_steps}"
            )
        if self.antithetic and self.n_paths % 2 != 0:
            raise ValueError("antithetic sampling requires an even n_paths")
        if self.backend not in ("xla", "pallas"):
            raise ValueError(f"backend must be 'xla' or 'pallas', got {self.backend!r}")

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)
