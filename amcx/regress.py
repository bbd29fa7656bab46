"""On-device weighted least squares via normal equations.

Replaces `regression_estimate` (`/root/reference/american_monte_carlo.py:
110-122`), which calls LAPACK ``np.linalg.lstsq`` on the tall
``(n_paths, degree+1)`` design matrix every time step. On TPU we instead:

1. form the tiny Gram system ``G = AᵀWA`` (``(k, k)``, k = degree+1 ≤ ~30)
   and moment vector ``b = AᵀWy`` with a single large matmul over paths —
   this is the only O(n_paths) work and it maps straight onto the MXU;
2. solve ``G c = b`` with an eigendecomposition-based pseudo-inverse, which
   reproduces ``lstsq``'s minimum-norm behaviour on rank-deficient designs
   (the t=0 step has all regressors equal → rank-1 Gram, SURVEY Q3);
3. return fitted values ``A @ c`` (the reference returns fitted values, not
   coefficients — `american_monte_carlo.py:118,122`).

Under ``jit`` with the path axis sharded over a mesh, XLA turns step 1 into a
shard-local matmul plus an all-reduce of the (k, k) moments over ICI — the
exact "psum tiny moments, solve replicated" plan of SURVEY §5. No explicit
collective is needed here; `amcx.parallel.sharding` also exposes a
``shard_map`` variant with explicit ``psum`` for kernels that want it.

Weights generalize the reference: ``w = 1`` everywhere reproduces its
fit-on-all-paths behaviour (SURVEY Q1); an ITM indicator gives canonical
Longstaff-Schwartz without dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .basis import design_matrix
from .types import RegressionSpec

__all__ = [
    "pinv_solve",
    "weighted_standardize",
    "fit_continuation",
    "regression_fitted_values",
]

_HIGHEST = lax.Precision.HIGHEST


def pinv_solve(G: jnp.ndarray, b: jnp.ndarray, rcond: float = 1e-6) -> jnp.ndarray:
    """Minimum-norm solve of the (symmetric PSD) system ``G c = b``.

    Eigenvalues below ``rcond * max(eig)`` are treated as zero, matching the
    pseudo-inverse semantics of ``np.linalg.lstsq(..., rcond=None)`` that the
    reference relies on for its degenerate t=0 regression
    (`american_monte_carlo.py:117`, SURVEY Q3). ``G`` is (k, k) with k ≤ ~30,
    so the eigendecomposition is negligible next to the moment matmuls.

    The system is column-equilibrated first (``D G D`` with
    ``D = diag(G)^{-1/2}``): the Gram matrix of a polynomial design has
    condition ≈ cond(A)², which f32 eigh cannot resolve; equilibration
    reduces it to the condition of the basis *correlation* matrix at zero
    cost and leaves the fitted values unchanged.
    """
    dg = jnp.diagonal(G)
    d = jnp.where(dg > 0, jax.lax.rsqrt(jnp.maximum(dg, jnp.finfo(G.dtype).tiny)), 0.0)
    Gs = G * d[:, None] * d[None, :]
    bs = b * d
    w, V = jnp.linalg.eigh(Gs)
    wmax = jnp.maximum(jnp.max(jnp.abs(w)), jnp.finfo(G.dtype).tiny)
    inv_w = jnp.where(w > rcond * wmax, 1.0 / w, 0.0)
    return d * (V @ (inv_w * (V.T @ bs)))


def _gsum(x, axis_name: Optional[str]):
    """Sum over the local array, then (optionally) over the mesh axis.

    This is the *only* cross-chip communication the whole engine needs per
    time step: the (k,k)+(k,) regression moments and a handful of scalars,
    all latency-bound psums over ICI (SURVEY §5 distributed plan).
    """
    s = jnp.sum(x)
    if axis_name is not None:
        s = lax.psum(s, axis_name)
    return s


def weighted_standardize(
    x: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    scaling_factor: float = 1.0,
    eps: float = 1e-6,
    axis_name: Optional[str] = None,
):
    """Affine-standardize ``x`` using (weighted) mean/std.

    Parity with the reference's scaling branch
    (`american_monte_carlo.py:111-114`): ``(x - mean) / (factor * max(std,
    1e-6))``. The weighted form keeps the statistics consistent with an
    ITM-restricted fit without gathering a dynamic subset. With
    ``axis_name`` the statistics are global across the sharded path axis.
    """
    ones = jnp.ones_like(x) if weights is None else weights
    wsum = jnp.maximum(_gsum(ones, axis_name), eps)
    mean = _gsum(ones * x, axis_name) / wsum
    var = _gsum(ones * jnp.square(x - mean), axis_name) / wsum
    std = jnp.maximum(jnp.sqrt(var), eps)
    return (x - mean) / (scaling_factor * std)


@partial(jax.jit, static_argnames=("spec",))
def regression_fitted_values(
    x: jnp.ndarray,
    y: jnp.ndarray,
    spec: RegressionSpec,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted-OLS fitted values of ``y`` on the polynomial basis of ``x``.

    Drop-in functional equivalent of `regression_estimate`
    (`american_monte_carlo.py:110-122`): returns the fitted values at *every*
    point of ``x`` (including zero-weight points — the reference evaluates
    its fit on all paths, SURVEY Q1).
    """
    return _fit(x, y, weights, spec)[0]


def _fit(x, y, weights, spec: RegressionSpec, axis_name: Optional[str] = None):
    if weights is not None:
        # Degenerate-weight fallback: an ITM-restricted fit at a step where
        # (almost) no path is ITM (e.g. t=0 exactly at the money) has zero
        # weight mass — the zero Gram would solve to all-zero coefficients,
        # and REPLAYING those (scenario ladders, exported-coeff duals)
        # fabricates cont = 0, i.e. spurious immediate exercise at shifted
        # spots. Fall back to the unweighted fit when fewer than k+1
        # effective points carry weight (exactly when the weighted fit is
        # meaningless anyway; in-sample prices are unaffected — with no ITM
        # paths there is nothing to exercise). Applied before the
        # standardization so frame and fit stay consistent.
        wsum = jnp.sum(weights)
        if axis_name is not None:
            wsum = lax.psum(wsum, axis_name)
        weights = jnp.where(wsum >= float(spec.degree + 2), weights,
                            jnp.ones_like(weights))
    if spec.scaling:
        xs = weighted_standardize(x, weights, spec.scaling_factor, axis_name=axis_name)
    elif spec.internal_standardize:
        # Numerically equivalent reparametrization (same polynomial span →
        # identical fitted values in exact arithmetic); required for f32
        # conditioning. See RegressionSpec docstring.
        xs = weighted_standardize(x, weights, 1.0, axis_name=axis_name)
    else:
        xs = x
    A = design_matrix(xs, spec.basis, spec.degree)  # (n, k)
    wy = y if weights is None else weights * y
    Aw = A if weights is None else A * weights[:, None]
    # Gram moments as broadcast-multiply reductions rather than a matmul:
    # with k = degree+1 ≤ ~11 the matmul is hopeless for the MXU anyway
    # (k×k output), and the einsum forces A (n×k, tens of MB at 1M paths) to
    # be materialized in HBM and re-read. As fused reductions XLA evaluates
    # the basis recurrence inline and streams S_t/y exactly once per step —
    # the whole fit becomes one bandwidth-bound pass. (Measured ~2× end-to-
    # end on v5e at the 1M×100 north-star config.)
    G = jnp.sum(Aw[:, :, None] * A[:, None, :], axis=0)
    b = jnp.sum(A * wy[:, None], axis=0)
    if axis_name is not None:
        # Shard-local moments -> global fit: one tiny all-reduce over ICI.
        G = lax.psum(G, axis_name)
        b = lax.psum(b, axis_name)
    coeffs = pinv_solve(G, b, spec.rcond)
    # Fitted values as a fused dot-with-broadcast (again avoids an HBM
    # round trip for A; the basis is recomputed on the VPU in-fusion).
    return jnp.sum(A * coeffs[None, :], axis=-1), coeffs


def fit_continuation(
    s_t: jnp.ndarray,
    discounted_cashflows: jnp.ndarray,
    spec: RegressionSpec,
    weights: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Continuation-value estimate at one time step, clamped at zero.

    Equivalent of `estimate_continuation_values`
    (`american_monte_carlo.py:126-135`): fit the discounted future cashflows
    on the basis of the current spot, then clamp the fitted values at 0
    (SURVEY Q2, `american_monte_carlo.py:132`). With ``axis_name`` the fit is
    global over a sharded path axis (shard-local moments + psum).
    """
    fitted, _ = _fit(s_t, discounted_cashflows, weights, spec, axis_name)
    return jnp.maximum(fitted, 0.0)


def fit_continuation_with_coeffs(
    s_t: jnp.ndarray,
    discounted_cashflows: jnp.ndarray,
    spec: RegressionSpec,
    weights: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
    clamp: bool = True,
):
    """Like :func:`fit_continuation` but also returns the ``(degree+1,)``
    solved coefficients (per-step observability dump, SURVEY §5).

    ``clamp=False`` skips the Q2 zero-floor — required when the regressed
    value can legitimately be negative (signed forward-style cashflows,
    e.g. `amcx.swing` take-or-pay ladders, where flooring the continuation
    at 0 silently disables every should-exercise-while-OTM decision)."""
    fitted, coeffs = _fit(s_t, discounted_cashflows, weights, spec, axis_name)
    if clamp:
        fitted = jnp.maximum(fitted, 0.0)
    return fitted, coeffs
