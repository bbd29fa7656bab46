"""Early-exercise boundary extraction.

The optimal exercise boundary at step t is the spot level where intrinsic
value crosses the fitted continuation value — directly computable from the
engine's per-step regression coefficients (``return_coeffs=True``), with no
extra passes over the paths. Solved by vectorized bisection on
``g(S) = intrinsic(S) − max(Ĉ(S), 0)`` over all steps at once.

For an American put the boundary S*(t) is the largest S with g(S) ≥ 0
(exercise region S ≤ S*); for a call on a dividend-paying asset, the
smallest such S. Returns NaN at steps where no crossing exists in the
search bracket (e.g. continuation dominates everywhere — common near t=0
for OTM regions of low-dividend calls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .basis import design_matrix
from .types import RegressionSpec

__all__ = ["exercise_boundary"]


def exercise_boundary(
    coeffs: jnp.ndarray,      # (n_steps, k) from LSMCResult.coeffs
    mean_t: jnp.ndarray,      # (n_steps,) standardization means (steps 0..T-1)
    inv_std_t: jnp.ndarray,   # (n_steps,) 1/(factor·std)
    K,
    option_type: str,
    spec: RegressionSpec,
    s_lo: float,
    s_hi: float,
    n_bisect: int = 60,
):
    """Boundary spot per step via bisection on intrinsic − continuation.

    ``mean_t``/``inv_std_t`` must be the standardization used by the fit
    (see `amcx.engine_pallas.precompute_standardization`).
    """
    put = option_type.strip().lower() == "put"
    K = jnp.asarray(K, coeffs.dtype)

    def g(S):
        # S: (n_steps,) candidate boundary per step
        xhat = (S - mean_t) * inv_std_t
        A = design_matrix(xhat, spec.basis, spec.degree)  # (n_steps, k)
        cont = jnp.maximum(jnp.sum(A * coeffs, axis=-1), 0.0)
        intrinsic = jnp.maximum((K - S) if put else (S - K), 0.0)
        return intrinsic - cont

    # The polynomial fit is only trustworthy inside the sampled spot range;
    # clamp the bracket to mean ± 2.5σ per step (outside it, a degree-k
    # extrapolation can cross intrinsic spuriously or not at all).
    std_t = 1.0 / inv_std_t
    lo = jnp.maximum(jnp.asarray(s_lo, coeffs.dtype), mean_t - 2.5 * std_t)
    hi = jnp.minimum(jnp.asarray(s_hi, coeffs.dtype), mean_t + 2.5 * std_t)
    if put:
        hi = jnp.minimum(hi, K - 1e-3)  # boundary lies strictly below K
    else:
        lo = jnp.maximum(lo, K + 1e-3)

    # A fit on all paths (SURVEY Q1 default) can dip back below intrinsic
    # deep ITM, making g positive only on a window; the engine's realized
    # exercise region is exactly that window, and the boundary of interest
    # is its edge nearest the strike. Anchor the bisection at the per-step
    # argmax of g over a coarse grid.
    n_grid = 33
    fracs = jnp.linspace(0.0, 1.0, n_grid)
    grid = lo[None, :] + fracs[:, None] * (hi - lo)[None, :]  # (n_grid, n_steps)
    g_grid = jax.vmap(g)(grid)
    peak = grid[jnp.argmax(g_grid, axis=0), jnp.arange(grid.shape[1])]
    if put:
        lo = peak  # upper crossing: g goes + -> − toward K
    else:
        hi = peak

    def body(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        gm = g(mid)
        exercise_at_mid = gm > 0
        if put:
            lo = jnp.where(exercise_at_mid, mid, lo)   # boundary above mid
            hi = jnp.where(exercise_at_mid, hi, mid)
        else:
            hi = jnp.where(exercise_at_mid, mid, hi)
            lo = jnp.where(exercise_at_mid, lo, mid)
        return (lo, hi), None

    lo0, hi0 = lo, hi
    (lo, hi), _ = jax.lax.scan(body, (lo, hi), None, length=n_bisect)
    boundary = 0.5 * (lo + hi)
    # no crossing in bracket -> NaN
    has_crossing = (g(lo0) > 0) != (g(hi0) > 0)
    return jnp.where(has_crossing, boundary, jnp.nan)
