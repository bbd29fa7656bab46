"""Device-mesh parallelism: data-parallel path sharding.

The reference is single-process NumPy with no parallelism of any kind
(SURVEY §5 verified zero threading/MPI/NCCL imports). The TPU-native scaling
story (BASELINE north star) is a 1-D ``Mesh`` over the **path** axis:

- paths are embarrassingly parallel (simulation, payoff, exercise are
  elementwise per path);
- the only cross-chip communication per backward step is the all-reduce of
  the tiny ``(k,k)``/``(k,)`` regression moments, plus one final psum for
  the discounted-payoff mean — both latency-bound on ICI;
- multi-host (DCN) falls out of the same mesh via
  ``jax.distributed.initialize``.

Two execution styles are provided:

1. :func:`price_option_sharded` — ``jit`` with sharding constraints; XLA
   inserts the collectives automatically (the all-reduce appears where the
   row-sharded Gram matmul produces a replicated ``(k,k)``).
2. :func:`price_option_shardmap` — explicit ``shard_map`` over the mesh with
   hand-placed ``psum``s (via ``axis_name`` threading in the engine), for
   full control of the communication schedule.

The jit-sharded style is bit-reproducible against the single-device engine
given the same threefry key (``jax_threefry_partitionable`` RNG makes path
i's normals independent of the mesh layout). The shard_map style folds the
mesh rank into the key so each rank simulates only its own shard — its price
is *statistically* equivalent (the test suite asserts 5-stderr agreement).
Both are tested on a virtual 8-device CPU mesh in ``tests/test_sharding.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine import LSMCResult, lsmc_option_pricing, resolve_regression_spec
from ..paths import simulate_gbm
from ..types import MarketParams, ProductSpec, RegressionSpec, SimConfig

__all__ = [
    "make_mesh",
    "path_sharding",
    "shard_paths",
    "price_option_sharded",
    "price_option_shardmap",
    "price_option_shardmap_mega",
    "price_option_shardmap_fusedpath",
    "price_max_call_shardmap_mega",
    "price_bermudan_swaption_shardmap",
    "price_bermudan_swaption_g2_shardmap",
    "price_book_shardmap",
    "price_book_shardmap_mega",
    "price_autocall_shardmap",
    "init_multihost",
]

PATH_AXIS = "paths"


def make_mesh(devices=None, axis_name: str = PATH_AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    devices = jax.devices() if devices is None else list(devices)
    import numpy as np

    return Mesh(np.asarray(devices), (axis_name,))


def path_sharding(mesh: Mesh, time_major: bool = True) -> NamedSharding:
    """Sharding for a path array: replicate time, shard paths."""
    spec = P(None, mesh.axis_names[0]) if time_major else P(mesh.axis_names[0])
    return NamedSharding(mesh, spec)


def shard_paths(paths_tm: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place a time-major path array onto the mesh, sharded over paths."""
    return jax.device_put(paths_tm, path_sharding(mesh))


def init_multihost(coordinator_address: Optional[str] = None, **kwargs) -> None:
    """Multi-host (DCN) initialization; the single-mesh program then spans
    all hosts' devices. No-op if already initialized."""
    try:
        jax.distributed.initialize(coordinator_address, **kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process run


def _product_leaves(product: ProductSpec, dtype):
    barrier = None if product.barrier is None else jnp.asarray(product.barrier, dtype)
    return jnp.asarray(product.K, dtype), jnp.asarray(product.T, dtype), barrier


@partial(
    jax.jit,
    static_argnames=("spec", "sim", "option_type", "exercise", "return_surface", "mesh"),
)
def _sharded_pipeline(key, S0, r, sigma, q, K, T, barrier, spec, sim, option_type,
                      exercise, return_surface, mesh):
    market = MarketParams(S0, r, sigma, q)
    paths = simulate_gbm(key, market, T, sim)
    paths = jax.lax.with_sharding_constraint(paths, path_sharding(mesh))
    product = ProductSpec(K=K, T=T, barrier=barrier, option_type=option_type, exercise=exercise)
    return lsmc_option_pricing(paths, product, r, spec, return_surface=return_surface)


def price_option_sharded(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    mesh: Optional[Mesh] = None,
    return_surface: bool = False,
) -> LSMCResult:
    """Simulate + price with the path axis sharded over the mesh (jit-style;
    XLA auto-inserts the moment all-reduces)."""
    spec = resolve_regression_spec(spec, product, q=market.q,
                                   for_surface=return_surface)
    mesh = make_mesh() if mesh is None else mesh
    dtype = sim.jnp_dtype
    K, T, barrier = _product_leaves(product, dtype)
    return _sharded_pipeline(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        K,
        T,
        barrier,
        spec,
        sim,
        product.option_type,
        product.exercise,
        return_surface,
        mesh,
    )


def price_option_shardmap(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    mesh: Optional[Mesh] = None,
) -> LSMCResult:
    """Simulate + price under an explicit ``shard_map``: every rank runs the
    engine on its local path shard; cross-rank reductions are explicit
    ``psum``s threaded through ``axis_name`` (SURVEY §5's distributed plan,
    stated communication schedule: one (k,k)+(k,) moment all-reduce per time
    step + one scalar pair at the end)."""
    spec = resolve_regression_spec(spec, product, q=market.q)
    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if sim.n_paths % n_dev:
        raise ValueError(f"n_paths={sim.n_paths} not divisible by mesh size {n_dev}")
    if sim.antithetic and (sim.n_paths // n_dev) % 2:
        raise ValueError(
            "antithetic under shard_map pairs paths within each rank; "
            f"n_paths/n_dev = {sim.n_paths // n_dev} must be even"
        )
    dtype = sim.jnp_dtype
    K, T, barrier = _product_leaves(product, dtype)

    @partial(jax.jit, static_argnames=())
    def run(key, S0, r, sigma, q, K, T, barrier):
        mkt = MarketParams(S0, r, sigma, q)

        def local(key, S0, r, sigma, q, K, T, barrier):
            # Same global key on every rank: partitionable threefry means we
            # can simulate globally and slice locally — but simulating only
            # the local shard is cheaper. Fold the rank into the key.
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            # antithetic pairs are formed within each rank's shard; the
            # union of per-rank pairs is still a valid antithetic set.
            local_sim = SimConfig(
                n_paths=sim.n_paths // n_dev,
                n_steps=sim.n_steps,
                dtype=sim.dtype,
                antithetic=sim.antithetic,
                backend=sim.backend,
            )
            paths = simulate_gbm(local_key, MarketParams(S0, r, sigma, q), T, local_sim)
            prod = ProductSpec(
                K=K, T=T, barrier=barrier,
                option_type=product.option_type, exercise=product.exercise,
            )
            res = lsmc_option_pricing(paths, prod, r, spec, return_surface=False,
                                      axis_name=axis)
            # price/stderr already psum-reduced (replicated); cashflows/tau
            # stay sharded.
            return res

        from jax import shard_map

        in_specs = (P(),) * 8
        out_specs = LSMCResult(P(), P(), P(axis), P(axis), None)
        return shard_map(
            local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(key, S0, r, sigma, q, K, T, barrier)

    return run(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        K,
        T,
        barrier,
    )


def price_autocall_shardmap(
    key: jax.Array,
    market: MarketParams,
    spec,
    sim: SimConfig,
    mesh: Optional[Mesh] = None,
):
    """Autocallable note on a mesh: each rank simulates its folded-key path
    shard and evaluates the decision-free payout epilogue locally; the ONLY
    cross-chip traffic is one final (sum, sumsq, n) psum — structured-note
    books scale linearly on paths. Returns an object with
    ``(price, stderr)`` like `amcx.models.autocall.price_autocall`."""
    from ..models.autocall import NoteResult, _note_payout
    from ..paths import simulate_gbm

    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if sim.n_paths % n_dev:
        raise ValueError(f"n_paths={sim.n_paths} not divisible by mesh size {n_dev}")
    if sim.antithetic and (sim.n_paths // n_dev) % 2:
        raise ValueError("antithetic shards must hold whole pairs")
    dtype = sim.jnp_dtype
    local_sim = SimConfig(n_paths=sim.n_paths // n_dev, n_steps=sim.n_steps,
                          dtype=sim.dtype, antithetic=sim.antithetic,
                          backend=sim.backend)

    @jax.jit
    def run(key, S0, r, sigma, q):
        def local(key, S0, r, sigma, q):
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            paths = simulate_gbm(local_key, MarketParams(S0, r, sigma, q),
                                 spec.T, local_sim)
            payout = _note_payout(paths, spec, r)
            if sim.antithetic:
                half = local_sim.n_paths // 2
                stat = 0.5 * (payout[:half] + payout[half:])
            else:
                stat = payout
            s1 = jax.lax.psum(jnp.sum(stat), axis)
            s2 = jax.lax.psum(jnp.sum(jnp.square(stat)), axis)
            n = jax.lax.psum(jnp.asarray(stat.shape[0], dtype), axis)
            price = s1 / n
            var = jnp.maximum(s2 / n - jnp.square(price), 0.0)
            return price, jnp.sqrt(var / n)

        from jax import shard_map

        return shard_map(local, mesh=mesh, in_specs=(P(),) * 5,
                         out_specs=(P(), P()), check_vma=False)(
            key, S0, r, sigma, q)

    price, stderr = run(key, jnp.asarray(market.S0, dtype),
                        jnp.asarray(market.r, dtype),
                        jnp.asarray(market.sigma, dtype),
                        jnp.asarray(market.q, dtype))
    return NoteResult(price, stderr)


def price_option_shardmap_mega(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    mesh: Optional[Mesh] = None,
):
    """The flagship single-kernel engine on a mesh: every rank simulates its
    path shard and runs :func:`amcx.ops.lsmc_megakernel.lsmc_price_megakernel`
    in collective mode — the packed regression moments are all-reduced
    mid-scan over an in-kernel RDMA ring (one (P,128) hop per neighbor per
    time step, the only cross-chip bytes), so all ranks solve the same global
    fit and the returned price equals the single-device mega price on the
    union of the shards (up to f32 reduction order).

    Returns ``(price, stderr)`` (replicated scalars).
    """
    spec = resolve_regression_spec(spec, product, q=market.q)
    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if sim.n_paths % n_dev:
        raise ValueError(f"n_paths={sim.n_paths} not divisible by mesh size {n_dev}")
    dtype = sim.jnp_dtype
    K, T, barrier = _product_leaves(product, dtype)
    phi = 1.0 if product.option_type == "call" else -1.0
    n_steps = sim.n_steps

    from jax import shard_map

    from ..ops.lsmc_megakernel import lsmc_price_megakernel

    @jax.jit
    def run(key, S0, r, sigma, q, K, T, barrier):
        def local(key, S0, r, sigma, q, K, T, barrier):
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            local_sim = SimConfig(
                n_paths=sim.n_paths // n_dev,
                n_steps=n_steps,
                dtype=sim.dtype,
                antithetic=sim.antithetic,
                backend=sim.backend,
            )
            paths = simulate_gbm(local_key, MarketParams(S0, r, sigma, q), T, local_sim)
            return lsmc_price_megakernel(
                paths, K, r, T / n_steps, phi,
                basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
                american=product.is_american, barrier=barrier,
                barrier_type=product.barrier_type,
                itm_weights=spec.regress_on == "itm",
                return_stats=True, axis_name=axis, axis_size=n_dev,
            )

        return shard_map(
            local, mesh=mesh, in_specs=(P(),) * 8, out_specs=(P(), P()),
            check_vma=False,
        )(key, S0, r, sigma, q, K, T, barrier)

    return run(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        K,
        T,
        barrier,
    )


def price_option_shardmap_fusedpath(
    key: jax.Array,
    market: MarketParams,
    product: ProductSpec,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    mesh: Optional[Mesh] = None,
):
    """Zero-HBM pricing across the mesh: every rank regenerates its path
    shard backward IN-KERNEL (Brownian bridge + hardware PRNG,
    `amcx.ops.lsmc_fusedpath`) and the packed regression moments all-reduce
    over the in-kernel RDMA ring — the only bytes that move anywhere, HBM
    or ICI, are the (P,128) moment hops. The distributed engine with no
    path storage at all (SURVEY §5 "psum tiny moments, solve replicated",
    taken to its limit).

    Each rank's PRNG stream is seeded with ``fold_in(key, rank)`` so the
    union of shards is a valid global sample. Returns ``(price, stderr)``
    (replicated scalars).

    Barrier products ride along: the knock prepass + τ_B plane
    (`lsmc_price_fusedpath` barrier mode) is rank-local state, so the
    moment-ring algebra is untouched — zero-HBM barrier pricing across the
    mesh.
    """
    spec = resolve_regression_spec(spec, product, q=market.q)
    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if sim.n_paths % n_dev:
        raise ValueError(f"n_paths={sim.n_paths} not divisible by mesh size {n_dev}")
    phi = 1.0 if product.option_type == "call" else -1.0
    n_steps = sim.n_steps
    n_local = sim.n_paths // n_dev

    from jax import shard_map

    from ..ops.gbm_pallas import _key_to_seed
    from ..ops.lsmc_fusedpath import lsmc_price_fusedpath

    @jax.jit
    def run(key):
        def local(key):
            rank = jax.lax.axis_index(axis)
            seed = _key_to_seed(jax.random.fold_in(key, rank))
            return lsmc_price_fusedpath(
                seed, market.S0, product.K, market.r, market.sigma,
                product.T / n_steps, n_steps, n_local, phi, q=market.q,
                basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
                american=product.is_american,
                itm_weights=spec.regress_on == "itm",
                antithetic=sim.antithetic, return_stats=True,
                axis_name=axis, axis_size=n_dev,
                barrier=product.barrier, barrier_type=product.barrier_type,
            )

        return shard_map(
            local, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()),
            check_vma=False,
        )(key)

    return run(key)


def price_bermudan_swaption_g2_shardmap(
    key: jax.Array,
    g2,
    K,
    pay_times,
    exercise_times=None,
    first_reset=None,
    payer: bool = True,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    n_paths: int = 131_072,
    n_steps: int = 32,
    antithetic: bool = False,
    mesh: Optional[Mesh] = None,
):
    """G2++ Bermudan swaption across the mesh on the collective ma-mega
    engine — `price_bermudan_swaption_shardmap` with the two-factor
    (swap value, x, y) state: every rank simulates its own exact
    (eta_x, eta_y, iota) shard, the standardization frame is psum-global,
    and the packed Gram all-reduces over the in-kernel RDMA ring with
    per-path discount planes and the Bermudan schedule in-kernel.

    CI note: the 1-core CPU interpret machinery livelocks on the A=3
    collective schedule even at 2-dev/2-step (probed >9 min; the A=2 HW
    case completes in seconds) — the multichip validation for this entry
    is the deviceless v5e:2x4 AOT topology compile
    (tests_tpu/test_multichip_compile.py::test_g2_swaption_ring_compiles),
    the gate class that actually sees Mosaic collective lowering."""
    from jax import shard_map

    from ..ops.lsmc_ma_mega import lsmc_price_ma_mega
    from ..rates_g2 import (_g2_swaption_setup, _swap_planes_g2,
                            simulate_g2_rates)
    from ..types import SimConfig

    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by mesh size "
                         f"{n_dev}")
    T, dt, sched_steps, w, Ba, Bb = _g2_swaption_setup(
        g2, K, pay_times, exercise_times, first_reset, payer, n_steps)
    local_sim = SimConfig(n_paths=n_paths // n_dev, n_steps=n_steps,
                          antithetic=antithetic)
    w_f = jnp.asarray(w, jnp.float32)
    Ba_f = jnp.asarray(Ba, jnp.float32)
    Bb_f = jnp.asarray(Bb, jnp.float32)

    @jax.jit
    def run(key, w_f, Ba_f, Bb_f):
        def local(key, w_f, Ba_f, Bb_f):
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            x, y, df = simulate_g2_rates(local_key, g2, T, local_sim)
            plane = _swap_planes_g2(x, y, w_f, Ba_f, Bb_f)
            return lsmc_price_ma_mega(
                jnp.stack([plane, x, y], axis=-1), 0.0, 0.0, dt, phi=1.0,
                payoff_kind="first", basis=spec.basis, degree=spec.degree,
                mode="total", rcond=spec.rcond,
                itm_weights=spec.regress_on == "itm",
                exercise_steps=tuple(sched_steps), discount_planes=df,
                antithetic=antithetic, axis_name=axis, axis_size=n_dev)

        return shard_map(
            local, mesh=mesh, in_specs=(P(), P(), P(), P()),
            out_specs=(P(), P()), check_vma=False,
        )(key, w_f, Ba_f, Bb_f)

    return run(key, w_f, Ba_f, Bb_f)


def price_book_shardmap(
    key: jax.Array,
    market: MarketParams,
    strikes,
    T,
    option_type: str = "put",
    american: bool = True,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    mesh: Optional[Mesh] = None,
):
    """A whole strike book on the mesh: paths sharded, strikes scanned.

    Every rank simulates its own path shard once; the scanned backward
    induction threads ``axis_name`` into each strike's regression, so the
    cross-chip traffic is one tiny ``psum`` of the ``(k,k)+(k,)`` moment
    stack per strike per step. Prices/stderrs come back replicated.

    Returns ``(prices, stderrs)``, each ``(n_strikes,)``.
    """
    from ..book import _phi_vector

    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if sim.n_paths % n_dev:
        raise ValueError(f"n_paths={sim.n_paths} not divisible by mesh size {n_dev}")
    dtype = sim.jnp_dtype
    strikes = jnp.atleast_1d(jnp.asarray(strikes, dtype))
    phis, _ = _phi_vector(option_type, strikes.shape[0], dtype)
    n_steps = sim.n_steps
    dt = jnp.asarray(T, dtype) / n_steps

    from jax import shard_map

    from ..engine import backward_induction

    @jax.jit
    def run(key, S0, r, sigma, q, strikes):
        def local(key, S0, r, sigma, q, strikes):
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            local_sim = SimConfig(
                n_paths=sim.n_paths // n_dev,
                n_steps=n_steps,
                dtype=sim.dtype,
                antithetic=sim.antithetic,
                backend=sim.backend,
            )
            paths = simulate_gbm(local_key, MarketParams(S0, r, sigma, q),
                                 T, local_sim)
            knocked = jnp.ones(paths.shape, dtype=bool)

            def one(_, Kphi):
                K, phi = Kphi
                payoff = lambda S: jnp.maximum(phi * (S - K), 0.0)
                res = backward_induction(
                    paths, knocked, r, dt, payoff, spec,
                    american=american, return_surface=False, axis_name=axis,
                )
                return 0, (res.price, res.stderr)

            # scan, not vmap: batched regression reductions lower to MXU
            # dots on TPU whose noise costs real deep-ITM policy value
            # (see amcx.book._price_strike_grid_xla)
            _, out = jax.lax.scan(one, 0, (strikes, phis))
            return out

        return shard_map(
            local, mesh=mesh, in_specs=(P(),) * 6, out_specs=(P(), P()),
            check_vma=False,
        )(key, S0, r, sigma, q, strikes)

    return run(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        strikes,
    )


def price_book_shardmap_mega(
    key: jax.Array,
    market: MarketParams,
    strikes,
    T,
    option_type: str = "put",
    american: bool = True,
    spec: RegressionSpec = RegressionSpec(),
    sim: SimConfig = SimConfig(),
    mesh: Optional[Mesh] = None,
):
    """The strike-batched book kernel on a mesh: every rank simulates its
    path shard and runs `lsmc_book_megakernel` in collective mode — the
    whole moment stack (shared Gram head + per-strike rhs) all-reduces
    mid-scan over the in-kernel RDMA ring, so one kernel per chip prices
    the global book. Returns replicated ``(prices, stderrs)``."""
    if spec.regress_on == "itm":
        raise ValueError(
            "the mega book shares the Gram across strikes, which requires "
            "fit-on-all-paths regression — use price_book_shardmap for "
            "itm-weighted fits"
        )
    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if sim.n_paths % n_dev:
        raise ValueError(f"n_paths={sim.n_paths} not divisible by mesh size {n_dev}")
    dtype = sim.jnp_dtype
    strikes = jnp.atleast_1d(jnp.asarray(strikes, dtype))
    from ..book import _phi_vector

    phi, _ = _phi_vector(option_type, strikes.shape[0])
    n_steps = sim.n_steps

    from jax import shard_map

    from ..ops.lsmc_megakernel import lsmc_book_megakernel

    @jax.jit
    def run(key, S0, r, sigma, q, strikes):
        def local(key, S0, r, sigma, q, strikes):
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            local_sim = SimConfig(
                n_paths=sim.n_paths // n_dev,
                n_steps=n_steps,
                dtype=sim.dtype,
                antithetic=sim.antithetic,
                backend=sim.backend,
            )
            paths = simulate_gbm(local_key, MarketParams(S0, r, sigma, q),
                                 T, local_sim)
            return lsmc_book_megakernel(
                paths, strikes, r, T / n_steps, phi,
                basis=spec.basis, degree=spec.degree, rcond=spec.rcond,
                american=american, axis_name=axis, axis_size=n_dev,
            )

        return shard_map(
            local, mesh=mesh, in_specs=(P(),) * 6, out_specs=(P(), P()),
            check_vma=False,
        )(key, S0, r, sigma, q, strikes)

    return run(
        key,
        jnp.asarray(market.S0, dtype),
        jnp.asarray(market.r, dtype),
        jnp.asarray(market.sigma, dtype),
        jnp.asarray(market.q, dtype),
        strikes,
    )


def price_max_call_shardmap_mega(
    key: jax.Array,
    S0,
    K,
    T,
    r,
    sigma,
    q=0.0,
    corr=None,
    n_exercise_dates: int = 9,
    n_paths: int = 100_000,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    basis_mode: str = "sorted",
    mesh: Optional[Mesh] = None,
):
    """Bermudan max-call across the mesh on the ONE-kernel multi-asset
    engine: every rank simulates its correlated-GBM shard
    (``fold_in(key, rank)`` — the union is a valid global sample), the
    standardization frame is psum-global, and the packed cross-term Gram
    all-reduces over the in-kernel RDMA ring (`amcx.ops.lsmc_ma_mega`
    collective mode). Returns replicated ``(price, stderr)`` scalars that
    match the single-device ma-mega on the union of the shards to f32
    reduction noise.
    """
    from jax import shard_map

    from ..ops.lsmc_ma_mega import lsmc_price_ma_mega
    from ..paths import simulate_gbm_multi

    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by mesh size "
                         f"{n_dev}")
    S0 = jnp.atleast_1d(jnp.asarray(S0, jnp.float32))
    corr_arr = (jnp.eye(S0.shape[0], dtype=jnp.float32) if corr is None
                else jnp.asarray(corr, jnp.float32))
    n_steps = n_exercise_dates
    local_sim = SimConfig(n_paths=n_paths // n_dev, n_steps=n_steps)

    @jax.jit
    def run(key, S0, r, sigma, q, K, T):
        def local(key, S0, r, sigma, q, K, T):
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            paths = simulate_gbm_multi(local_key, S0, r, sigma, T,
                                       local_sim, q=q, corr=corr_arr)
            return lsmc_price_ma_mega(
                paths, K, r, T / n_steps, phi=1.0, payoff_kind="maxcall",
                basis=spec.basis, degree=spec.degree, mode="total",
                sorted_basis=basis_mode == "sorted", rcond=spec.rcond,
                itm_weights=spec.regress_on == "itm", exercise_from_step=1,
                axis_name=axis, axis_size=n_dev)

        return shard_map(
            local, mesh=mesh, in_specs=(P(),) * 7, out_specs=(P(), P()),
            check_vma=False,
        )(key, S0, r, sigma, q, K, T)

    return run(key, S0, jnp.float32(r), jnp.float32(sigma), jnp.float32(q),
               jnp.float32(K), jnp.float32(T))


def price_bermudan_swaption_shardmap(
    key: jax.Array,
    hw,
    K,
    pay_times,
    exercise_times=None,
    first_reset=None,
    payer: bool = True,
    spec: RegressionSpec = RegressionSpec(basis="chebyshev", degree=2),
    n_paths: int = 131_072,
    n_steps: int = 32,
    antithetic: bool = False,
    mesh: Optional[Mesh] = None,
):
    """Bermudan swaption across the mesh on the collective ma-mega engine.

    Every rank simulates its own exact-OU shard (``fold_in(key, rank)``)
    and builds the forward-swap-value plane from the replicated host
    tables; the standardization frame is psum-global and the packed Gram
    all-reduces over the in-kernel RDMA ring, with per-path discount
    planes (stochastic rates) and the Bermudan schedule in-kernel. Returns
    replicated ``(price, stderr)`` — statistically equivalent to
    `amcx.rates.price_bermudan_swaption(engine="mega")` on the union of
    the shards.
    """
    from jax import shard_map

    from ..ops.lsmc_ma_mega import lsmc_price_ma_mega
    from ..rates import _swap_planes, _swaption_setup, simulate_hw_rates
    from ..types import SimConfig

    mesh = make_mesh() if mesh is None else mesh
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    if n_paths % n_dev:
        raise ValueError(f"n_paths={n_paths} not divisible by mesh size "
                         f"{n_dev}")
    T, dt, sched_steps, w, Bb = _swaption_setup(
        hw, K, pay_times, exercise_times, first_reset, payer, n_steps)
    local_sim = SimConfig(n_paths=n_paths // n_dev, n_steps=n_steps,
                          antithetic=antithetic)
    w_f = jnp.asarray(w, jnp.float32)
    Bb_f = jnp.asarray(Bb, jnp.float32)

    @jax.jit
    def run(key, w_f, Bb_f):
        def local(key, w_f, Bb_f):
            rank = jax.lax.axis_index(axis)
            local_key = jax.random.fold_in(key, rank)
            x, df = simulate_hw_rates(local_key, hw, T, local_sim)
            plane = _swap_planes(x, w_f, Bb_f)
            return lsmc_price_ma_mega(
                jnp.stack([plane, x], axis=-1), 0.0, 0.0, dt, phi=1.0,
                payoff_kind="first", basis=spec.basis, degree=spec.degree,
                mode="total", rcond=spec.rcond,
                itm_weights=spec.regress_on == "itm",
                exercise_steps=tuple(sched_steps), discount_planes=df,
                antithetic=antithetic, axis_name=axis, axis_size=n_dev)

        return shard_map(
            local, mesh=mesh, in_specs=(P(), P(), P()),
            out_specs=(P(), P()), check_vma=False,
        )(key, w_f, Bb_f)

    return run(key, w_f, Bb_f)
