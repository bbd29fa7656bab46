"""Quasi-Monte Carlo path generation (scrambled Sobol).

Variance-reduction capability beyond the reference: GBM paths driven by a
scrambled Sobol low-discrepancy sequence instead of pseudo-random normals.
For smooth payoff functionals the RMSE decays ~O(n⁻¹ log^d n) instead of
O(n⁻¹/²) — at 2¹⁴ paths the European-put price error is typically ~5-10×
smaller than plain MC.

The sequence is generated host-side (``scipy.stats.qmc.Sobol``, one
dimension per time step, Owen scrambling keyed by the seed) and shipped to
the device once; everything downstream (cumsum, engines) is the standard
on-device pipeline, so QMC paths drop into every pricer that takes a
``paths_tm`` array. Use power-of-two path counts (Sobol balance).

Caveats: the backward-induction exercise rule is a non-smooth functional, so
American-price gains are smaller than European ones (still real). The host
generation is the throughput bottleneck — QMC is for accuracy-critical runs,
not the throughput benchmark.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .types import MarketParams, SimConfig

__all__ = ["sobol_normals", "simulate_gbm_qmc", "simulate_gbm_multi_qmc",
           "brownian_bridge_matrix"]


def brownian_bridge_matrix(n_steps: int, dt: float) -> np.ndarray:
    """Lower-triangular-free construction matrix B with ``W = B @ Z``.

    Brownian-bridge dimension ordering for QMC: Sobol dimension 0 (the most
    uniform) drives the terminal value W_T, dimension 1 the midpoint, then
    recursive bisection — so the coarse structure of the path, which carries
    most of the payoff variance, is resolved by the best-distributed
    coordinates and the effective dimension of the integrand drops. Standard
    technique (Moskowitz & Caflisch 1996); the increment ordering used by
    `sobol_normals` assigns dimension t to step t, which wastes the good
    dimensions on fine detail for long step grids.

    Rows are time steps 1..n_steps (W_0 = 0); ``B @ B.T`` equals the
    Brownian covariance ``min(t_i, t_j)`` on the step grid, so bridged and
    increment-ordered paths are distributionally identical — only the
    pairing of Sobol coordinates with path features changes.
    """
    from collections import deque

    rows = {0: np.zeros(n_steps)}
    rows[n_steps] = np.zeros(n_steps)
    rows[n_steps][0] = np.sqrt(n_steps * dt)
    j = 1
    dq = deque([(0, n_steps)])
    while dq:
        l, r = dq.popleft()
        if r - l < 2:
            continue
        m = (l + r) // 2
        w = rows[l] * ((r - m) / (r - l)) + rows[r] * ((m - l) / (r - l))
        w[j] = np.sqrt((m - l) * (r - m) / (r - l) * dt)
        rows[m] = w
        j += 1
        dq.append((l, m))
        dq.append((m, r))
    return np.stack([rows[i] for i in range(1, n_steps + 1)])


def sobol_normals(seed: int, n_steps: int, n_paths: int) -> np.ndarray:
    """Scrambled-Sobol standard normals, time-major ``(n_steps, n_paths)``.

    One Sobol dimension per time step; Owen-scrambled with ``seed``;
    inverse-CDF transform in float64 on host, cast to float32.
    """
    from scipy.stats import norm, qmc

    eng = qmc.Sobol(d=n_steps, scramble=True, seed=int(seed))
    u = eng.random(n_paths)  # (n_paths, n_steps) in (0, 1)
    # guard the open interval for the inverse CDF
    u = np.clip(u, 1e-12, 1.0 - 1e-12)
    z = norm.ppf(u).astype(np.float32)
    return np.ascontiguousarray(z.T)


def simulate_gbm_qmc(seed: int, market: MarketParams, T, sim: SimConfig,
                     brownian_bridge: bool = False) -> jnp.ndarray:
    """GBM paths from scrambled-Sobol increments; same exact-GBM marginals
    and time-major layout as `amcx.paths.simulate_gbm`.

    ``brownian_bridge=True`` reorders the Sobol dimensions with the
    Brownian-bridge construction (:func:`brownian_bridge_matrix`): one
    (n_steps × n_steps) matmul on the MXU replaces the cumsum, assigning
    the lowest (best) Sobol dimensions to the coarse path structure —
    materially tighter QMC error on long step grids.
    """
    dtype = sim.jnp_dtype
    Z = jnp.asarray(sobol_normals(seed, sim.n_steps, sim.n_paths), dtype)
    S0 = jnp.asarray(market.S0, dtype)
    r = jnp.asarray(market.r, dtype)
    q = jnp.asarray(market.q, dtype)
    sigma = jnp.asarray(market.sigma, dtype)
    dt = jnp.asarray(T, dtype) / sim.n_steps
    drift = (r - q - 0.5 * sigma**2) * dt
    if brownian_bridge:
        B = jnp.asarray(brownian_bridge_matrix(sim.n_steps, float(T) / sim.n_steps),
                        dtype)
        W = B @ Z  # (n_steps, n_paths) Brownian levels on the step grid
        t_idx = jnp.arange(1, sim.n_steps + 1, dtype=dtype)[:, None]
        log_rel = drift * t_idx + sigma * W
    else:
        log_inc = drift + sigma * jnp.sqrt(dt) * Z
        log_rel = jnp.cumsum(log_inc, axis=0)
    log_rel = jnp.concatenate(
        [jnp.zeros((1, sim.n_paths), dtype), log_rel], axis=0
    )
    return S0 * jnp.exp(log_rel)




def simulate_gbm_multi_qmc(seed: int, S0, r, sigma, T, sim: SimConfig,
                           q=0.0, corr=None,
                           brownian_bridge: bool = False) -> jnp.ndarray:
    """Correlated multi-asset GBM from scrambled-Sobol points, time-major
    ``(n_steps+1, n_paths, n_assets)`` (the `amcx.paths.simulate_gbm_multi`
    layout — drops into the basket/max-call/Asian engines).

    One Sobol dimension per (time step × asset); dimension order is
    time-major so ``brownian_bridge=True`` assigns the lowest (best)
    dimensions to the coarse time structure of EVERY asset (the bridge
    matmul acts on the time axis per asset, then the asset axis is
    correlated with the Cholesky factor — linear maps of jointly-QMC
    normal coordinates preserve the marginals exactly).
    """
    dtype = sim.jnp_dtype
    S0 = jnp.atleast_1d(jnp.asarray(S0, dtype))
    A = S0.shape[0]

    def vec(x):
        return jnp.broadcast_to(jnp.asarray(x, dtype), (A,))

    rv, qv, sv = vec(r), vec(q), vec(sigma)
    chol = (jnp.eye(A, dtype=dtype) if corr is None
            else jnp.linalg.cholesky(jnp.asarray(corr, dtype)))
    Z = jnp.asarray(
        sobol_normals(seed, sim.n_steps * A, sim.n_paths), dtype
    ).reshape(sim.n_steps, A, sim.n_paths)
    Zc = jnp.einsum("ab,tbn->tan", chol, Z)
    dt = jnp.asarray(T, dtype) / sim.n_steps
    drift = (rv - qv - 0.5 * sv * sv) * dt  # (A,)
    if brownian_bridge:
        B = jnp.asarray(
            brownian_bridge_matrix(sim.n_steps, float(T) / sim.n_steps),
            dtype)
        W = jnp.einsum("ts,san->tan", B, Zc)  # Brownian levels per asset
        t_idx = jnp.arange(1, sim.n_steps + 1, dtype=dtype)[:, None, None]
        log_rel = drift[None, :, None] * t_idx + sv[None, :, None] * W
    else:
        log_inc = (drift[None, :, None]
                   + sv[None, :, None] * jnp.sqrt(dt) * Zc)
        log_rel = jnp.cumsum(log_inc, axis=0)
    log_rel = jnp.concatenate(
        [jnp.zeros((1, A, sim.n_paths), dtype), log_rel], axis=0)
    return jnp.moveaxis(S0[None, :, None] * jnp.exp(log_rel), 1, 2)
