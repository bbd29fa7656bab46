"""Command-line driver (reference C16).

The reference's entry point is ``main(params)`` over a flat 17-key dict plus
hardcoded ``__main__`` blocks (`/root/reference/american_monte_carlo.py:
443-532`). Here the same pipeline is a real CLI with subcommands and
structured JSON output (SURVEY §5 observability):

    amcx price   --s0 95 --k 100 --sigma 0.2 --r 0.01 --option-type put \
                 --exercise american --paths 100000 --steps 100 [--barrier 70]
                 [--plot out.png] [--json]
    amcx greeks  ...                      # pathwise delta/vega/rho/theta
    amcx sweep   --study paths|steps|degree|heatmap ...
    amcx maxcall --assets 5 ...
    amcx term    --r-curve 0.5:0.03,1.0:0.08 ...   # term-structure pricing
    amcx preset  <name>                   # BASELINE.json configs + reference demo
    amcx bench                            # the north-star throughput line

``price`` mirrors `main`'s console comparison (`american_monte_carlo.py:
495-503`): LSMC price vs the self-hosted oracle, plus the vanilla oracle
price when a barrier is set.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _market_product_args(p: argparse.ArgumentParser):
    p.add_argument("--s0", type=float, default=100.0)
    p.add_argument("--k", type=float, default=100.0)
    p.add_argument("--t", type=float, default=1.0, help="maturity in years")
    p.add_argument("--r", type=float, default=0.01)
    p.add_argument("--q", type=float, default=0.0, help="dividend yield")
    p.add_argument("--sigma", type=float, default=0.2)
    p.add_argument("--option-type", choices=["put", "call"], default="put")
    p.add_argument("--exercise", choices=["european", "american"], default="american")
    p.add_argument("--barrier", type=float, default=None, help="barrier level")
    p.add_argument("--barrier-type", choices=["down-in", "up-in", "down-out", "up-out"],
                   default="down-in")


def _reg_sim_args(p: argparse.ArgumentParser):
    p.add_argument("--basis", default="chebyshev")
    p.add_argument("--degree", type=int, default=4)
    p.add_argument("--scaling", action="store_true")
    p.add_argument("--scaling-factor", type=float, default=2.0)
    p.add_argument("--regress-on", choices=["auto", "all", "itm"], default="auto")
    p.add_argument("--paths", type=int, default=100_000)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--antithetic", action="store_true")
    p.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    p.add_argument("--qmc", action="store_true",
                   help="scrambled-Sobol path generation (variance reduction)")
    p.add_argument("--brownian-bridge", action="store_true",
                   help="with --qmc: bridge dimension ordering (better on "
                        "long step grids)")
    p.add_argument("--engine", choices=["xla", "fused", "mega", "fusedpath"],
                   default="xla")
    p.add_argument("--seed", type=int, default=42)


def _build(args):
    from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    product = ProductSpec(K=args.k, T=args.t, barrier=args.barrier,
                          option_type=args.option_type, exercise=args.exercise,
                          barrier_type=args.barrier_type)
    spec = RegressionSpec(basis=args.basis, degree=args.degree, scaling=args.scaling,
                          scaling_factor=args.scaling_factor, regress_on=args.regress_on)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic, backend=args.backend)
    return market, product, spec, sim


def _emit(payload, as_json):
    if as_json:
        print(json.dumps(payload))
    return payload



def _gen_paths(args, market, T, sim):
    """Path generation honoring --qmc/--brownian-bridge."""
    if getattr(args, "qmc", False):
        if sim.antithetic:
            raise SystemExit(
                "--qmc is a deterministic stratification; --antithetic "
                "does not compose with it — drop one of the two"
            )
        if jax.default_backend() != "cpu" and sim.n_paths % 512:
            raise SystemExit(
                f"--qmc on TPU needs --paths divisible by 512 "
                f"(got {sim.n_paths}); e.g. use a power of two"
            )
        from .ops.sobol_pallas import simulate_gbm_qmc_device

        return simulate_gbm_qmc_device(
            args.seed, market, T, sim,
            brownian_bridge=getattr(args, "brownian_bridge", False))
    from .paths import simulate_gbm

    return simulate_gbm(jax.random.key(args.seed), market, T, sim)


def cmd_price(args):
    from .engine import lsmc_option_pricing, q0_call_advisory
    from .engine_pallas import lsmc_option_pricing_fused
    from .exposures import compute_ccr_exposures
    from .oracle import oracle_price
    from .paths import simulate_gbm

    market, product, spec, sim = _build(args)
    advisory = q0_call_advisory(market, product, spec)
    if advisory is not None:
        print(f"ADVISORY: {advisory}", file=sys.stderr)
    oos = None
    if getattr(args, "out_of_sample", False):
        if args.plot:
            raise SystemExit("--out-of-sample is price-only (no --plot)")
        if args.qmc:
            raise SystemExit("--out-of-sample draws its own fit/pricing "
                             "streams; drop --qmc")
        from .policy import price_out_of_sample

        fit_engine = args.engine if args.engine in ("mega", "fusedpath") else "mega"
        if fit_engine == "fusedpath" and product.has_barrier:
            raise SystemExit("fusedpath cannot price barriers; use --engine mega")
        replay_engine = args.engine if args.engine in ("mega", "fusedpath") else None
        oos = price_out_of_sample(
            jax.random.key(args.seed), market, product, spec, sim,
            engine=fit_engine, n_fit_paths=args.fit_paths,
            replay_engine=replay_engine,
        )
        res = oos.oos
    elif args.engine == "fusedpath":
        if args.plot:
            raise SystemExit("--engine fusedpath is price-only (no --plot)")
        if args.qmc:
            raise SystemExit("--engine fusedpath generates its own paths "
                             "in-kernel (hardware PRNG); drop --qmc")
        from .engine import price_option

        res = price_option(jax.random.key(args.seed), market, product, spec,
                           sim, engine="fusedpath")
    elif args.engine == "mega":
        paths = _gen_paths(args, market, product.T, sim)
        if args.plot:
            raise SystemExit("--engine mega is price-only (no --plot); "
                             "use --engine fused for surfaces")
        from .ops.lsmc_megakernel import lsmc_price_megakernel

        phi = 1.0 if product.option_type == "call" else -1.0
        price, stderr = lsmc_price_megakernel(
            paths, product.K, market.r, product.T / sim.n_steps, phi,
            basis=spec.basis, degree=spec.degree,
            american=product.is_american, barrier=product.barrier,
            barrier_type=product.barrier_type,
            itm_weights=spec.regress_on == "itm",
            antithetic=sim.antithetic, return_stats=True,
        )
        from .engine import LSMCResult

        res = LSMCResult(price, stderr, None, None, None)
    else:
        paths = _gen_paths(args, market, product.T, sim)
        pricer = lsmc_option_pricing_fused if args.engine == "fused" else lsmc_option_pricing
        res = pricer(paths, product, market.r, spec, return_surface=bool(args.plot))

    oracle = float(oracle_price(market.S0, product.K, product.T, market.r, market.sigma,
                                n_steps=sim.n_steps, q=market.q,
                                option_type=product.option_type,
                                exercise=product.exercise, barrier=product.barrier,
                                barrier_type=product.barrier_type))
    desc = f"{product.exercise.title()} {product.option_type.title()}"
    btxt = f"with Barrier at {product.barrier}" if product.barrier else "without Barrier"
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "oracle": round(oracle, 4),
        "abs_err": round(abs(float(res.price) - oracle), 4),
        "product": f"{desc} {btxt}",
    }
    if product.barrier:
        vanilla = float(oracle_price(market.S0, product.K, product.T, market.r,
                                     market.sigma, n_steps=sim.n_steps, q=market.q,
                                     option_type=product.option_type,
                                     exercise=product.exercise))
        payload["oracle_vanilla"] = round(vanilla, 4)
    if oos is not None:
        payload["fit_price"] = round(float(oos.fit.price), 4)
        payload["foresight_gap"] = round(
            float(oos.fit.price) - float(oos.oos.price), 4)
    if not args.json:
        if oos is not None:
            print(f"{desc} Option Price {btxt} (LSMC, in-sample fit): "
                  f"{payload['fit_price']:.4f}")
        print(f"{desc} Option Price {btxt} (LSMC):   {payload['price']:.4f} "
              f"± {payload['stderr']:.4f}")
        print(f"{desc} Option Price {btxt} (Oracle): {payload['oracle']:.4f}")
        if "oracle_vanilla" in payload:
            print(f"{desc} Option Price without Barrier (Oracle): "
                  f"{payload['oracle_vanilla']:.4f}")
    if args.plot:
        from .analytics import oracle_grid_values
        from .plots import plot_lsmc_results

        n_show = min(args.plot_paths, sim.n_paths)
        # Oracle grid on a larger sample than the scatter crop so the CCR
        # exposure comparison isn't 10-path noise (the reference evaluates
        # QuantLib on every path, american_monte_carlo.py:474-479; with the
        # vectorized oracle we can afford a real sample too).
        n_grid = min(max(n_show, args.oracle_grid_paths), sim.n_paths)
        grid = oracle_grid_values(paths[:, :n_grid], product.K, market.r, product.T,
                                  market.sigma, market.q, product.option_type,
                                  product.exercise, product.barrier,
                                  crr_steps=args.oracle_grid_steps)
        lsmc_ccr = compute_ccr_exposures(res.continuation)
        orac_ccr = compute_ccr_exposures(grid)
        grid = grid[:, :n_show]
        plot_lsmc_results(paths, res.continuation, np.asarray(grid), product.T / sim.n_steps,
                          lsmc_ccr, orac_ccr, difference_type=args.difference_type,
                          key_S_lines=[market.S0, product.K, product.barrier],
                          S0=market.S0, K=product.K, barrier=product.barrier,
                          n_plotted_paths=n_show, save=args.plot)
        if not args.json:
            print(f"wrote {args.plot}")
    return _emit(payload, args.json)


def cmd_greeks(args):
    from .greeks import price_and_greeks

    market, product, spec, sim = _build(args)
    p, g = price_and_greeks(jax.random.key(args.seed), market, product, spec, sim)
    payload = {"price": round(float(p), 4)}
    payload.update({k: round(float(v), 5) for k, v in g.items()})
    if not args.json:
        for k, v in payload.items():
            print(f"{k:13s} {v}")
    return _emit(payload, args.json)


def cmd_sweep(args):
    from . import convergence as cv
    from .types import RegressionSpec

    market, product, spec, _ = _build(args)
    key = jax.random.key(args.seed)
    if args.study == "paths":
        res = cv.price_vs_paths(key, market, product, args.path_range, args.steps, spec)
        payload = {"x": res.x.tolist(), "prices": res.prices.tolist(),
                   "benchmark": res.benchmark}
        if args.plot:
            from .plots import plot_convergence
            plot_convergence(res, "Number of Paths",
                             "Convergence of LSMC Price with Number of Paths",
                             log_x=True, save=args.plot)
    elif args.study == "steps":
        res = cv.price_vs_steps(key, market, product, args.step_range, args.paths, spec)
        payload = {"x": res.x.tolist(), "prices": res.prices.tolist(),
                   "benchmark": res.benchmark}
        if args.plot:
            from .plots import plot_convergence
            plot_convergence(res, "Number of Time Steps",
                             "Convergence of LSMC Price with Number of Time Steps",
                             save=args.plot)
    elif args.study == "degree":
        out = cv.price_vs_degree(key, market, product, args.max_degree,
                                 tuple(args.bases), args.paths, args.steps)
        payload = {b: {"degrees": r.x.tolist(), "prices": r.prices.tolist(),
                       "benchmark": r.benchmark} for b, r in out.items()}
        if args.plot:
            from .plots import plot_error_vs_basis_degree
            plot_error_vs_basis_degree(out, save=args.plot)
    else:  # heatmap
        res = cv.error_heatmap(key, market, product, args.path_range, args.step_range, spec)
        payload = {"paths": res.x.tolist(), "steps": res.extra["step_range"].tolist(),
                   "abs_error": res.prices.tolist(),
                   "min": {k: res.extra[k] for k in ("min_error", "min_n_paths", "min_n_steps")}}
        if args.plot:
            from .plots import plot_error_heatmap
            plot_error_heatmap(res, save=args.plot,
                               option_type=product.option_type,
                               exercise=product.exercise)
    if not args.json:
        print(json.dumps(payload, indent=2))
        if args.plot:
            print(f"wrote {args.plot}")
    return _emit(payload, args.json)


def cmd_maxcall(args):
    from .models.maxcall import price_max_call
    from .types import RegressionSpec

    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    res = price_max_call(jax.random.key(args.seed), [args.s0] * args.assets, args.k,
                         args.t, args.r, args.sigma, q=args.q, corr=None,
                         n_exercise_dates=args.dates, n_paths=args.paths, spec=spec)
    payload = {"price": round(float(res.price), 4), "stderr": round(float(res.stderr), 4),
               "assets": args.assets}
    if not args.json:
        print(f"{args.assets}-asset Bermudan max-call: {payload['price']:.4f} "
              f"± {payload['stderr']:.4f}")
    return _emit(payload, args.json)


def cmd_book(args):
    """Price a strike (and optionally maturity) grid on shared paths."""
    from .book import price_mixed_book, price_strike_grid
    from .oracle import oracle_price
    from .paths import simulate_gbm

    market, product, spec, sim = _build(args)
    if product.barrier is not None:
        raise SystemExit(
            "amcx book prices vanilla grids; barrier books are not "
            "supported — drop --barrier or price per option with amcx price"
        )
    paths = _gen_paths(args, market, product.T, sim)
    strikes = [float(s) for s in args.strikes.split(",")]
    if args.maturity_steps:
        mats = [int(m) for m in args.maturity_steps.split(",")]
        res = price_mixed_book(
            paths, jnp.asarray(strikes), mats, market.r, product.T,
            option_type=product.option_type, american=product.is_american,
            spec=spec, engine=args.book_engine,
        )
    else:
        mats = [sim.n_steps] * len(strikes)
        res = price_strike_grid(
            paths, jnp.asarray(strikes), market.r, product.T,
            option_type=product.option_type, american=product.is_american,
            spec=spec, engine=args.book_engine,
        )
    dt = product.T / sim.n_steps
    rows = []
    for i, (K, m_step) in enumerate(zip(strikes, mats)):
        T_i = m_step * dt
        orc = float(oracle_price(market.S0, K, T_i, market.r, market.sigma,
                                 option_type=product.option_type,
                                 exercise=product.exercise, q=market.q))
        rows.append({
            "K": K, "T": T_i, "price": float(res.prices[i]),
            "stderr": float(res.stderrs[i]), "oracle": orc,
            "abs_err": abs(float(res.prices[i]) - orc),
        })
    payload = {"engine": args.book_engine, "options": rows}
    if not args.json:
        for row in rows:
            print(f"K={row['K']:8.2f} T={row['T']:5.2f}  "
                  f"price={row['price']:9.4f} ± {row['stderr']:.4f}  "
                  f"oracle={row['oracle']:9.4f}  |err|={row['abs_err']:.4f}")
    _emit(payload, args.json)
    return payload


def cmd_roughvol(args):
    """Vanilla option under rough Bergomi volatility."""
    from .oracle import bs_price
    from .roughvol import RBergomiParams, price_option_rbergomi
    from .types import ProductSpec, RegressionSpec, SimConfig

    rp = RBergomiParams(S0=args.s0, r=args.r, q=args.q, xi0=args.xi0,
                        eta=args.eta, rho=args.rho, H=args.hurst)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_option_rbergomi(jax.random.key(args.seed), rp, product,
                                spec, sim, engine=args.engine)
    bs_flat = bs_price(args.s0, args.k, args.t, args.r, args.xi0 ** 0.5,
                       q=args.q, option_type=args.option_type)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "bs_eta0_european": round(float(bs_flat), 4),
    }
    if not args.json:
        ex = product.exercise.title()
        print(f"rBergomi {ex} {product.option_type} (H={args.hurst}, "
              f"η={args.eta}, ρ={args.rho}): {payload['price']:.4f} "
              f"± {payload['stderr']:.4f}  (η→0 BS European reference: "
              f"{payload['bs_eta0_european']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_sabr(args):
    """Vanilla option under SABR (Hagan European reference printed)."""
    from .sabr import SABRParams, price_option_sabr, sabr_european_price
    from .types import ProductSpec, RegressionSpec, SimConfig

    sp = SABRParams(S0=args.s0, r=args.r, q=args.q, alpha=args.alpha,
                    beta=args.beta, rho=args.rho, nu=args.nu)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_option_sabr(jax.random.key(args.seed), sp, product,
                            spec, sim, engine=args.engine)
    hag = sabr_european_price(sp, args.k, args.t, args.option_type)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "hagan_european": round(float(hag), 4),
    }
    if not args.json:
        ex = product.exercise.title()
        print(f"SABR {ex} {product.option_type} (α={args.alpha}, "
              f"β={args.beta}, ρ={args.rho}, ν={args.nu}): "
              f"{payload['price']:.4f} ± {payload['stderr']:.4f}  "
              f"(Hagan European: {payload['hagan_european']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_heston(args):
    """Vanilla option under Heston (or, with --jump-lam > 0, Bates SVJ)."""
    from .dynamics import (HestonParams, MertonJumps, bates_price_cf,
                           heston_price_cf, price_option_bates,
                           price_option_heston)
    from .types import ProductSpec, RegressionSpec, SimConfig

    hp = HestonParams(S0=args.s0, r=args.r, q=args.q, v0=args.v0,
                      kappa=args.kappa, theta=args.theta_v, xi=args.xi,
                      rho=args.rho)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise, barrier=args.barrier,
                          barrier_type=args.barrier_type)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    if args.jump_lam > 0.0:
        jp = MertonJumps(lam=args.jump_lam, mu_j=args.jump_mu,
                         sigma_j=args.jump_sigma)
        res = price_option_bates(jax.random.key(args.seed), hp, jp, product,
                                 spec, sim, engine=args.engine,
                                 scheme=args.scheme)
        cf = bates_price_cf(hp, jp, args.k, args.t, args.option_type)
        label = "Bates"
    else:
        res = price_option_heston(jax.random.key(args.seed), hp, product,
                                  spec, sim, engine=args.engine,
                                  scheme=args.scheme)
        cf = heston_price_cf(hp, args.k, args.t, args.option_type)
        label = "Heston"
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "cf_european": round(cf, 4),
    }
    if not args.json:
        ex = product.exercise.title()
        print(f"{label} {ex} {product.option_type}: {payload['price']:.4f} "
              f"± {payload['stderr']:.4f}  (CF European: "
              f"{payload['cf_european']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_quanto(args):
    """Quanto / compo cross-currency option (closed-form + CRR oracles)."""
    from .quanto import (QuantoParams, compo_european_price,
                         price_compo_option, price_quanto_option,
                         quanto_crr_price, quanto_european_price)
    from .types import ProductSpec, RegressionSpec, SimConfig

    qp = QuantoParams(S0=args.s0, r_d=args.rd, r_f=args.rf,
                      sigma=args.sigma, fx_sigma=args.fx_sigma,
                      rho=args.rho, q=args.q, fx_rate=args.fx_rate)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise, barrier=args.barrier,
                          barrier_type=args.barrier_type)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    key = jax.random.key(args.seed)
    if args.style == "quanto":
        res = price_quanto_option(key, qp, product, spec, sim,
                                  engine=args.engine)
        cf = quanto_european_price(qp, args.k, args.t, args.option_type)
    else:
        res = price_compo_option(key, qp, args.fx_spot, product, spec, sim,
                                 engine=args.engine)
        cf = compo_european_price(qp, args.fx_spot, args.k, args.t,
                                  args.option_type)
    payload = {
        "style": args.style,
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "european_cf": round(cf, 4),
        "q_eff": round(qp.q_eff, 6),
    }
    if args.style == "quanto" and product.exercise == "american" \
            and product.barrier is None:
        payload["crr"] = round(
            quanto_crr_price(qp, args.k, args.t, args.option_type), 4)
    if not args.json:
        print(f"{args.style.title()} {product.exercise} "
              f"{product.option_type}: {payload['price']:.4f} "
              f"\u00b1 {payload['stderr']:.4f}  "
              f"(European CF: {payload['european_cf']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_divs(args):
    """Vanilla option on a discrete cash-dividend payer (PDE oracle)."""
    from .dividends import DividendSchedule, price_option_divs
    from .pde import PDEGrid, pde_price
    from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

    times = [float(t) for t in args.div_times.split(",") if t]
    amounts = [float(a) for a in args.div_amounts.split(",") if a]
    fractions = ([float(f) for f in args.div_fractions.split(",") if f]
                 if args.div_fractions else None)
    divs = DividendSchedule(times, amounts, fractions)
    m = MarketParams(args.s0, args.r, args.sigma, q=args.q)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise, barrier=args.barrier,
                          barrier_type=args.barrier_type)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_option_divs(jax.random.key(args.seed), m, divs, product,
                            spec, sim, engine=args.engine)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "div_pv": round(divs.pv(args.r, args.t), 4),
    }
    if product.barrier is None:
        pde = pde_price(m, product, PDEGrid(n_steps=512, n_space=512),
                        dividends=divs)
        payload["pde"] = round(float(pde.price), 4)
        payload["abs_err"] = round(abs(payload["price"] - payload["pde"]), 4)
    if not args.json:
        ex = product.exercise.title()
        line = (f"Dividend {ex} {product.option_type}: "
                f"{payload['price']:.4f} ± {payload['stderr']:.4f}")
        if "pde" in payload:
            line += f"  (CN-PDE: {payload['pde']:.4f})"
        print(line)
    _emit(payload, args.json)
    return payload


def cmd_asian(args):
    """Average (Asian) option on the (S, A) augmented state."""
    from .models.asian import geometric_asian_price, price_asian_option
    from .types import MarketParams, RegressionSpec, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_asian_option(jax.random.key(args.seed), market, args.k,
                             args.t, args.option_type, args.exercise,
                             args.averaging, args.strike_type, spec, sim,
                             engine=args.engine)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
    }
    if args.averaging == "geometric" and args.strike_type == "fixed" \
            and args.exercise == "european":
        payload["oracle"] = round(
            geometric_asian_price(args.s0, args.k, args.t, args.r, args.sigma,
                                  args.steps, q=args.q,
                                  option_type=args.option_type), 4)
    if not args.json:
        line = (f"{args.averaging.title()} Asian {args.strike_type}-strike "
                f"{args.exercise} {args.option_type}: "
                f"{payload['price']:.4f} ± {payload['stderr']:.4f}")
        if "oracle" in payload:
            line += f"  (exact: {payload['oracle']:.4f})"
        print(line)
    _emit(payload, args.json)
    return payload


def _load_quote_grid(path):
    """Read a `T,K,value` CSV (comments/header tolerated) into the
    rectangular (maturities, strikes, values) arrays the calibrators take."""
    import numpy as np

    rows = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",")
            try:
                rows.append(tuple(float(x) for x in parts[:3]))
            except ValueError:
                continue  # header line
    if not rows:
        raise SystemExit(f"no quotes parsed from {path}")
    grid = {}
    for t, k, v in rows:
        grid.setdefault(t, []).append((k, v))
    mats = sorted(grid)
    widths = {len(grid[t]) for t in mats}
    if len(widths) != 1:
        raise SystemExit("quote grid must be rectangular "
                         "(same strike count per maturity)")
    strikes = np.array([[k for k, _ in sorted(grid[t])] for t in mats])
    vals = np.array([[v for _, v in sorted(grid[t])] for t in mats])
    return np.array(mats), strikes, vals


def cmd_calibrate(args):
    """Calibrate SVI/Dupire or Heston to European quotes; optionally price
    an American option under the calibrated dynamics."""
    import numpy as np

    from .calibrate import (calibrate_heston, dupire_local_vol,
                            fit_svi_surface, implied_vol_np)
    from .dynamics import (heston_price_cf, price_option_heston,
                           price_option_local_vol)
    from .oracle import bs_price
    from .types import ProductSpec, RegressionSpec, SimConfig

    mats, strikes, vals = _load_quote_grid(args.quotes)
    s0, r, q = args.s0, args.r, args.q
    if args.quote_kind == "iv":
        ivs = vals
        prices = np.asarray(bs_price(s0, strikes, mats[:, None], r, ivs, q,
                                     args.quote_type), dtype=np.float64)
    else:
        prices = vals
        ivs = implied_vol_np(prices, s0, strikes, mats[:, None], r, q,
                             args.quote_type)

    payload = {"model": args.model, "n_quotes": int(strikes.size)}
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)

    if args.model == "svi":
        surf = fit_svi_surface(s0, r, q, mats, strikes, ivs)
        fwd = s0 * np.exp((r - q) * mats)
        fit_iv = np.array([
            [float(surf.implied_vol(K, T, F)) for K in strikes[i]]
            for i, (T, F) in enumerate(zip(mats, fwd))])
        payload["max_iv_err"] = round(float(np.max(np.abs(fit_iv - ivs))), 6)
        payload["slices"] = [
            {"T": float(T), "a": round(float(p[0]), 6),
             "b": round(float(p[1]), 6), "rho": round(float(p[2]), 4),
             "m": round(float(p[3]), 4), "s": round(float(p[4]), 4)}
            for T, p in zip(mats, surf.params)]
        if args.price:
            lv = dupire_local_vol(surf, s0, r, q)
            res = price_option_local_vol(jax.random.key(args.seed), s0, r, q,
                                         lv, product, spec, sim)
            payload["price"] = round(float(res.price), 4)
            payload["stderr"] = round(float(res.stderr), 4)
        if not args.json:
            print(f"SVI surface fit: {len(mats)} slices, "
                  f"max |iv err| = {payload['max_iv_err']:.2e}")
            if args.price:
                print(f"Dupire local-vol {args.exercise} {args.option_type}: "
                      f"{payload['price']:.4f} ± {payload['stderr']:.4f}")
    else:  # heston
        hp = calibrate_heston(s0, r, q, mats, strikes, prices,
                              option_type=args.quote_type)
        refit = np.array([
            [heston_price_cf(hp, K, T, args.quote_type) for K in strikes[i]]
            for i, T in enumerate(mats)])
        payload["max_price_err"] = round(float(np.max(np.abs(refit - prices))), 6)
        payload["params"] = {k: round(getattr(hp, k), 6) for k in
                             ("v0", "kappa", "theta", "xi", "rho")}
        if args.price:
            res = price_option_heston(jax.random.key(args.seed), hp, product,
                                      spec, sim)
            payload["price"] = round(float(res.price), 4)
            payload["stderr"] = round(float(res.stderr), 4)
        if not args.json:
            p = payload["params"]
            print(f"Heston fit: v0={p['v0']:.4f} kappa={p['kappa']:.3f} "
                  f"theta={p['theta']:.4f} xi={p['xi']:.3f} rho={p['rho']:.3f}"
                  f"  (max |price err| = {payload['max_price_err']:.2e})")
            if args.price:
                print(f"Heston {args.exercise} {args.option_type}: "
                      f"{payload['price']:.4f} ± {payload['stderr']:.4f}")
    _emit(payload, args.json)
    return payload


def cmd_basket(args):
    """Basket option on correlated GBM assets; geometric Europeans check
    against the exact lognormal oracle."""
    from .models.basket import geometric_basket_price, price_basket_option
    from .types import RegressionSpec, SimConfig

    s0 = [float(x) for x in args.s0.split(",")]
    n = len(s0)
    weights = ([1.0 / n] * n if args.weights is None
               else [float(x) for x in args.weights.split(",")])
    corr = None
    if args.corr is not None:
        rho = float(args.corr)
        corr = jnp.full((n, n), rho) + (1.0 - rho) * jnp.eye(n)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_basket_option(
        jax.random.key(args.seed), s0, weights, args.k, args.t, args.r,
        args.sigma, q=args.q, corr=corr, option_type=args.option_type,
        exercise=args.exercise, averaging=args.averaging, spec=spec,
        sim=sim, engine=args.engine)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "n_assets": n,
    }
    if args.averaging == "geo" and args.exercise == "european":
        payload["oracle"] = round(geometric_basket_price(
            s0, weights, args.k, args.t, args.r, args.sigma,
            corr=None if corr is None else np.asarray(corr), q=args.q,
            option_type=args.option_type), 4)
    if not args.json:
        line = (f"{args.averaging} basket {args.exercise} "
                f"{args.option_type} on {n} assets: {payload['price']:.4f} "
                f"± {payload['stderr']:.4f}")
        if "oracle" in payload:
            line += f"  (exact: {payload['oracle']:.4f})"
        print(line)
    _emit(payload, args.json)
    return payload


def cmd_preset(args):
    from .presets import get_preset

    cfg = dict(get_preset(args.name))
    kind = cfg.pop("kind")
    key = jax.random.key(args.seed)
    if kind == "price":
        from .engine import price_option
        from .oracle import oracle_price

        res = price_option(key, cfg["market"], cfg["product"], cfg["spec"], cfg["sim"])
        m, pr, sim = cfg["market"], cfg["product"], cfg["sim"]
        oracle = float(oracle_price(m.S0, pr.K, pr.T, m.r, m.sigma, n_steps=sim.n_steps,
                                    q=m.q, option_type=pr.option_type,
                                    exercise=pr.exercise, barrier=pr.barrier))
        payload = {"preset": args.name, "price": round(float(res.price), 4),
                   "stderr": round(float(res.stderr), 4), "oracle": round(oracle, 4)}
    elif kind == "degree-sweep":
        from .convergence import price_vs_degree

        out = price_vs_degree(key, cfg["market"], cfg["product"], cfg["max_degree"],
                              cfg["bases"], cfg["n_paths"], cfg["n_steps"])
        payload = {"preset": args.name,
                   **{b: {"prices": r.prices.tolist(), "benchmark": r.benchmark}
                      for b, r in out.items()}}
    elif kind == "variance-reduction":
        from .paths import simulate_gbm
        from .types import SimConfig
        from .variates import control_variate_price

        rows = []
        for i, n in enumerate(cfg["path_range"]):
            sim = SimConfig(n_paths=n, n_steps=cfg["n_steps"], antithetic=True)
            paths = simulate_gbm(jax.random.fold_in(key, i), cfg["market"],
                                 cfg["product"].T, sim)
            r = control_variate_price(paths, cfg["market"], cfg["product"], cfg["spec"])
            rows.append({"n_paths": n, "price": round(float(r.price), 4),
                         "stderr": round(float(r.stderr), 5),
                         "raw_stderr": round(float(r.raw_stderr), 5),
                         "variance_ratio": round(float(r.variance_ratio), 2)})
        payload = {"preset": args.name, "rows": rows}
    elif kind == "greeks":
        from .greeks import price_and_greeks

        p, g = price_and_greeks(key, cfg["market"], cfg["product"], cfg["spec"], cfg["sim"])
        payload = {"preset": args.name, "price": round(float(p), 4),
                   **{k: round(float(v), 5) for k, v in g.items()}}
    elif kind == "max-call":
        from .models.maxcall import price_max_call

        res = price_max_call(key, cfg["S0"], cfg["K"], cfg["T"], cfg["r"], cfg["sigma"],
                             q=cfg["q"], n_exercise_dates=cfg["n_exercise_dates"],
                             n_paths=cfg["n_paths"], spec=cfg["spec"])
        payload = {"preset": args.name, "price": round(float(res.price), 4),
                   "stderr": round(float(res.stderr), 4)}
    else:
        raise ValueError(f"unhandled preset kind {kind}")
    print(json.dumps(payload, indent=None if args.json else 2))
    return payload


def _parse_curve(spec: str, n_steps: int, T: float, name: str) -> np.ndarray:
    """Parse ``"t1:v1,t2:v2,..."`` into an (n_steps,) piecewise-constant
    vector on the simulation grid: value ``v_i`` applies on ``[t_{i−1},
    t_i)`` (times in years, ascending, last ``t`` ≥ T). A bare number is a
    flat curve."""
    try:
        if ":" not in spec:
            return np.full(n_steps, float(spec))
        knots = []
        for part in spec.split(","):
            t_s, v_s = part.split(":")
            knots.append((float(t_s), float(v_s)))
    except ValueError:
        raise SystemExit(
            f"--{name}: expected 't1:v1,t2:v2,...' or a single number, "
            f"got {spec!r}")
    if any(b[0] <= a[0] for a, b in zip(knots, knots[1:])):
        raise SystemExit(f"--{name}: knot times must be ascending")
    if knots[-1][0] < T - 1e-12:
        raise SystemExit(f"--{name}: last knot time {knots[-1][0]} must "
                         f"cover maturity T={T}")
    dt = T / n_steps
    # step s covers [s·dt, (s+1)·dt): take the value at the interval start
    out = np.empty(n_steps)
    ki = 0
    for s in range(n_steps):
        while s * dt >= knots[ki][0] - 1e-12 and ki + 1 < len(knots):
            ki += 1
        out[s] = knots[ki][1]
    return out


def cmd_term(args):
    """Price under deterministic r(t)/σ(t)/q(t) term structures
    (`amcx.term`) and compare with the right oracle for the config: the
    exact effective-parameter closed form for Europeans, the per-step-rate
    f64 lattice for Americans with flat σ."""
    from .term import (TermCurves, crr_price_curves, european_price_curves,
                       price_option_curves)
    from .types import ProductSpec, RegressionSpec, SimConfig

    r_t = _parse_curve(args.r_curve, args.steps, args.t, "r-curve")
    sig_t = _parse_curve(args.sigma_curve, args.steps, args.t, "sigma-curve")
    q_t = _parse_curve(args.q_curve, args.steps, args.t, "q-curve")
    curves = TermCurves(args.s0, jnp.asarray(r_t, jnp.float32),
                        jnp.asarray(sig_t, jnp.float32),
                        jnp.asarray(q_t, jnp.float32))
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    spec = RegressionSpec(basis=args.basis, degree=args.degree,
                          regress_on=args.regress_on)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_option_curves(jax.random.key(args.seed), curves, product,
                              spec, sim, engine=args.engine)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "engine": args.engine,
        "r_eff": round(float(np.mean(r_t)), 6),
        "sigma_eff": round(float(np.sqrt(np.mean(sig_t**2))), 6),
    }
    if product.exercise == "european":
        payload["oracle"] = round(float(european_price_curves(
            curves, args.k, args.t, args.option_type)), 4)
        payload["oracle_kind"] = "effective-parameter closed form (exact)"
    elif np.ptp(sig_t) < 1e-12:
        payload["oracle"] = round(crr_price_curves(
            args.s0, args.k, args.t, r_t, float(sig_t[0]), q_t,
            n_sub=max(1, 2000 // args.steps), option_type=args.option_type,
            american=True), 4)
        payload["oracle_kind"] = "per-step-rate f64 lattice"
    if "oracle" in payload:
        payload["abs_err"] = round(abs(payload["price"] - payload["oracle"]), 4)
    if args.bucketed_rho:
        from .term import TermCurves as TC

        def price_of_r(rv):
            c = TC(args.s0, rv, curves.sigma_t, curves.q_t)
            return price_option_curves(jax.random.key(args.seed), c, product,
                                       spec, sim, engine="xla").price

        buckets = jax.grad(price_of_r)(curves.r_t)
        payload["bucketed_rho"] = [round(float(b), 5) for b in buckets]
    if not args.json:
        desc = f"{product.exercise.title()} {product.option_type.title()}"
        print(f"{desc} under term structures ({args.engine}): "
              f"{payload['price']:.4f} ± {payload['stderr']:.4f}")
        if "oracle" in payload:
            print(f"Oracle ({payload['oracle_kind']}): "
                  f"{payload['oracle']:.4f}  |err| {payload['abs_err']:.4f}")
        if args.bucketed_rho:
            print(f"bucketed rho (per step, sums to "
                  f"{sum(payload['bucketed_rho']):.4f}): "
                  f"{payload['bucketed_rho']}")
    return _emit(payload, args.json)


def cmd_swing(args):
    """Swing option (multiple exercise rights) vs its exact lattice
    oracle on the same date grid."""
    from .swing import crr_swing_price, price_swing_option
    from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise="american")
    spec = RegressionSpec(degree=args.degree, regress_on=args.regress_on)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic, backend=args.backend)
    res = price_swing_option(jax.random.key(args.seed), market, product,
                             args.rights, spec, sim, engine=args.engine,
                             payoff_kind=args.payoff_kind,
                             n_min=args.min_rights)
    oracle = crr_swing_price(args.s0, args.k, args.t, args.r, args.sigma,
                             args.rights, q=args.q, n_steps=args.steps,
                             n_sub=max(1, 2000 // args.steps),
                             option_type=args.option_type,
                             payoff_kind=args.payoff_kind,
                             n_min=args.min_rights)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "oracle": round(oracle, 4),
        "abs_err": round(abs(float(res.price) - oracle), 4),
        "rights": args.rights,
    }
    if not args.json:
        print(f"Swing {args.option_type} ({args.rights} rights, "
              f"{args.steps + 1} dates): {payload['price']:.4f} "
              f"± {payload['stderr']:.4f}")
        print(f"Lattice oracle (same date grid): {payload['oracle']:.4f}  "
              f"|err| {payload['abs_err']:.4f}")
    return _emit(payload, args.json)


def cmd_hw(args):
    """Vanilla option under the Hull-White + GBM hybrid (stochastic short
    rate), vs the exact hybrid closed form for Europeans."""
    from .hybrid import HullWhiteParams, european_price_hw, price_option_hw
    from .types import ProductSpec, RegressionSpec, SimConfig

    hw = HullWhiteParams(args.s0, args.r0, args.sigma, kappa=args.kappa,
                         sigma_r=args.sigma_r, rho=args.rho, q=args.q)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    spec = RegressionSpec(degree=args.degree, regress_on=args.regress_on)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_option_hw(jax.random.key(args.seed), hw, product, spec, sim,
                          engine=args.engine)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "kappa": args.kappa, "sigma_r": args.sigma_r, "rho": args.rho,
    }
    if product.exercise == "european":
        payload["oracle"] = round(float(european_price_hw(
            hw, args.k, args.t, args.option_type)), 4)
        payload["oracle_kind"] = "hybrid closed form (exact)"
        payload["abs_err"] = round(abs(payload["price"] - payload["oracle"]), 4)
    else:
        payload["european_cf"] = round(float(european_price_hw(
            hw, args.k, args.t, args.option_type)), 4)
    if not args.json:
        desc = f"{product.exercise.title()} {product.option_type.title()}"
        print(f"{desc} under Hull-White+GBM (kappa={args.kappa}, "
              f"sigma_r={args.sigma_r}, rho={args.rho}): "
              f"{payload['price']:.4f} ± {payload['stderr']:.4f}")
        if "oracle" in payload:
            print(f"Hybrid closed form: {payload['oracle']:.4f}  "
                  f"|err| {payload['abs_err']:.4f}")
        else:
            print(f"(European closed form: {payload['european_cf']:.4f})")
    return _emit(payload, args.json)


def cmd_bench(args):
    import bench as bench_mod  # repo-root harness

    bench_mod.main()


def cmd_jump(args):
    """Vanilla option under Merton jump diffusion or Variance Gamma."""
    from .dynamics import (MertonJumps, NIGParams, VGParams, merton_price,
                           nig_price_cf, price_option_merton,
                           price_option_nig, price_option_vg, vg_price_cf)
    from .types import MarketParams, ProductSpec, RegressionSpec, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    key = jax.random.key(args.seed)
    if args.model == "merton":
        jp = MertonJumps(lam=args.lam, mu_j=args.mu_j, sigma_j=args.sigma_j)
        res = price_option_merton(key, market, jp, product, spec, sim,
                                  engine=args.engine)
        euro = float(merton_price(args.s0, args.k, args.t, args.r,
                                  args.sigma, args.lam, args.mu_j,
                                  args.sigma_j, args.q, args.option_type))
        label = "Merton"
    elif args.model == "nig":
        nigp = NIGParams(alpha=args.alpha, beta=args.beta, delta=args.delta)
        res = price_option_nig(key, market, nigp, product, spec, sim,
                               engine=args.engine)
        euro = nig_price_cf(args.s0, args.k, args.t, args.r, nigp, args.q,
                            args.option_type)
        label = "NIG"
    else:
        vg = VGParams(theta=args.theta, sigma=args.sigma, nu=args.nu)
        res = price_option_vg(key, market, vg, product, spec, sim,
                              engine=args.engine)
        euro = vg_price_cf(args.s0, args.k, args.t, args.r, vg, args.q,
                           args.option_type)
        label = "Variance Gamma"
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "oracle_european": round(euro, 4),
    }
    if not args.json:
        ex = product.exercise.title()
        print(f"{label} {ex} {product.option_type}: {payload['price']:.4f} "
              f"\u00b1 {payload['stderr']:.4f}  (oracle European: "
              f"{payload['oracle_european']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_pde(args):
    """Crank-Nicolson PDE price (independent non-MC methodology)."""
    from .oracle import bs_price, crr_price
    from .pde import PDEGrid, pde_price
    from .types import MarketParams, ProductSpec

    if getattr(args, "barrier", None) is not None:
        # exact discrete-monitoring semantics (the LSMC estimator's target)
        from .pde_barrier import pde_discrete_barrier_price

        price = pde_discrete_barrier_price(
            args.s0, args.k, args.t, args.r, args.sigma, args.monitor,
            q=args.q, option_type=args.option_type, exercise=args.exercise,
            barrier=args.barrier, barrier_type=args.barrier_type)
        payload = {"price": round(price, 4), "barrier": args.barrier,
                   "barrier_type": args.barrier_type,
                   "n_monitor": args.monitor,
                   "method": "discrete-monitoring CN-PDE (f64)"}
        if not args.json:
            print(f"Discrete-barrier PDE {args.exercise.title()} "
                  f"{args.option_type} {args.barrier_type} H={args.barrier} "
                  f"({args.monitor} grid dates): {payload['price']:.4f}")
        _emit(payload, args.json)
        return payload

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    grid = PDEGrid(n_space=args.space, n_steps=args.steps)
    res = pde_price(market, product, grid)
    if product.is_american:
        oracle = float(crr_price(args.s0, args.k, args.t, args.r, args.sigma,
                                 2000, q=args.q,
                                 option_type=args.option_type,
                                 american=True))
        oracle_name = "CRR-2000"
    else:
        oracle = float(bs_price(args.s0, args.k, args.t, args.r, args.sigma,
                                args.q, args.option_type))
        oracle_name = "Black-Scholes"
    payload = {
        "price": round(float(res.price), 4),
        "delta": round(float(res.delta), 4),
        "gamma": round(float(res.gamma), 6),
        "oracle": round(oracle, 4),
        "oracle_name": oracle_name,
    }
    if not args.json:
        ex = product.exercise.title()
        print(f"PDE {ex} {product.option_type} ({args.space}x{args.steps} "
              f"CN grid): {payload['price']:.4f}  delta {payload['delta']:.4f}"
              f"  ({oracle_name}: {payload['oracle']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_deep(args):
    """Deep LSMC (MLP continuation) price, in-sample or OOS replay."""
    from .deep import DeepSpec, deep_price_option
    from .oracle import crr_price
    from .types import MarketParams, ProductSpec, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    product = ProductSpec(K=args.k, T=args.t, option_type=args.option_type,
                          exercise=args.exercise)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    dspec = DeepSpec(width=args.width, depth=args.depth,
                     n_inner=args.inner, lr=args.lr)
    res = deep_price_option(jax.random.key(args.seed), market, product, sim,
                            dspec, out_of_sample=args.out_of_sample)
    oracle = float(crr_price(args.s0, args.k, args.t, args.r, args.sigma,
                             2000, q=args.q, option_type=args.option_type,
                             american=product.is_american))
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "crr2000": round(oracle, 4),
        "mode": "oos-replay" if args.out_of_sample else "in-sample",
    }
    if not args.json:
        print(f"Deep LSMC {product.exercise.title()} {product.option_type} "
              f"({payload['mode']}): {payload['price']:.4f} \u00b1 "
              f"{payload['stderr']:.4f}  (CRR-2000: {payload['crr2000']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_spread(args):
    """Two-asset spread/exchange option vs its closed-form oracle."""
    from .models.basket import (kirk_price, margrabe_price,
                                price_spread_option)
    from .types import RegressionSpec, SimConfig

    spec = RegressionSpec(basis=args.basis, degree=args.degree,
                          regress_on=args.regress_on)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_spread_option(
        jax.random.key(args.seed), args.s1, args.s2, args.k, args.t,
        args.r, args.sigma1, args.sigma2, rho=args.rho, q1=args.q1,
        q2=args.q2, exercise=args.exercise, spec=spec, sim=sim,
        engine=args.engine)
    if args.k == 0.0:
        oracle = margrabe_price(args.s1, args.s2, args.t, args.sigma1,
                                args.sigma2, rho=args.rho, q1=args.q1,
                                q2=args.q2)
        oracle_name = "Margrabe (exact)"
    else:
        oracle = kirk_price(args.s1, args.s2, args.k, args.t, args.r,
                            args.sigma1, args.sigma2, rho=args.rho,
                            q1=args.q1, q2=args.q2)
        oracle_name = "Kirk approximation"
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "oracle_european": round(oracle, 4),
        "oracle_name": oracle_name,
    }
    if not args.json:
        print(f"Spread {args.exercise.title()} max(S1-S2-{args.k:g}, 0): "
              f"{payload['price']:.4f} \u00b1 {payload['stderr']:.4f}  "
              f"({oracle_name} European: {payload['oracle_european']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_autocall(args):
    """Autocallable (Phoenix) note or issuer-callable reverse convertible
    vs the multi-state discrete CN-PDE oracle."""
    from .models.autocall import (AutocallSpec, autocall_pde,
                                  callable_note_pde, price_autocall,
                                  price_callable_note)
    from .types import MarketParams, RegressionSpec, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    cpn_b = args.coupon_barrier if args.coupon_barrier >= 0 else None
    ki_b = args.ki_barrier if args.ki_barrier >= 0 else None
    spec = AutocallSpec(
        T=args.t, n_obs=args.obs, autocall_barrier=args.ac_barrier,
        coupon=args.coupon, coupon_barrier=cpn_b,
        memory=args.memory, ki_barrier=ki_b,
        put_strike=args.put_strike if ki_b is not None else None)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic, backend=args.backend)
    if args.worst_of > 1:
        from .models.autocall import price_autocall_worst_of, worst_of_mc_anchor

        # worst-of quotes levels as S0-normalized PERFORMANCE fractions
        frac = AutocallSpec(
            T=args.t, n_obs=args.obs,
            autocall_barrier=args.ac_barrier / args.s0,
            coupon=args.coupon,
            coupon_barrier=None if cpn_b is None else cpn_b / args.s0,
            memory=args.memory,
            ki_barrier=None if ki_b is None else ki_b / args.s0,
            put_strike=args.put_strike / args.s0 if ki_b is not None else None)
        A = args.worst_of
        corr = np.full((A, A), args.corr) + (1.0 - args.corr) * np.eye(A)
        res = price_autocall_worst_of(
            jax.random.key(args.seed), [args.s0] * A, args.r, args.sigma,
            corr, frac, sim, q=args.q)
        ref, se = worst_of_mc_anchor([args.s0] * A, args.r, args.sigma, corr,
                                     frac, args.steps, q=args.q,
                                     n_paths=200_000)
        payload = {"price": round(float(res.price), 6),
                   "stderr": round(float(res.stderr), 6),
                   "f64_twin": round(ref, 6), "twin_stderr": round(se, 6),
                   "kind": f"worst-of-{A} autocallable note"}
        if not args.json:
            print(f"worst-of-{A} autocallable: {payload['price']:.4f} ± "
                  f"{payload['stderr']:.4f} of notional (f64 twin "
                  f"{payload['f64_twin']:.4f} ± {payload['twin_stderr']:.4f})")
        _emit(payload, args.json)
        return payload
    if args.callable_by_issuer:
        res = price_callable_note(jax.random.key(args.seed), market, spec,
                                  sim, RegressionSpec(degree=args.degree))
        pde = callable_note_pde(market, spec, args.steps)
        kind = "issuer-callable note (LSMC min-rule)"
    else:
        res = price_autocall(jax.random.key(args.seed), market, spec, sim)
        pde = autocall_pde(market, spec, args.steps)
        kind = "autocallable note"
    payload = {
        "price": round(float(res.price), 6),
        "stderr": round(float(res.stderr), 6),
        "pde_oracle": round(pde, 6),
        "kind": kind,
    }
    if not args.json:
        print(f"{kind}: {payload['price']:.4f} ± {payload['stderr']:.4f} "
              f"of notional (multi-state CN-PDE: {payload['pde_oracle']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_tarf(args):
    """Target redemption forward vs the exact no-knockout analytic strip
    and the f64 twin."""
    from .models.tarf import (TARFSpec, price_tarf, tarf_mc_anchor,
                              tarf_strip_value)
    from .types import MarketParams, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    spec = TARFSpec(K=args.k, T=args.t, n_fix=args.fixings,
                    target=args.target, leverage=args.leverage,
                    knock=args.knock)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic, backend=args.backend)
    res = price_tarf(jax.random.key(args.seed), market, spec, sim)
    ref, se = tarf_mc_anchor(market, spec, n_paths=200_000)
    payload = {"price": round(float(res.price), 6),
               "stderr": round(float(res.stderr), 6),
               "f64_twin": round(ref, 6), "twin_stderr": round(se, 6),
               "strip_no_knock": round(tarf_strip_value(market, spec), 6)}
    if not args.json:
        print(f"TARF ({args.knock} knock @ target {args.target}): "
              f"{payload['price']:.4f} ± {payload['stderr']:.4f} per unit "
              f"notional (f64 twin {payload['f64_twin']:.4f}; no-knock "
              f"analytic strip {payload['strip_no_knock']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_lookback(args):
    """Lookback option on the running extremum vs the reflection-law
    quadrature oracle (BGK-shifted to the discrete monitoring grid)."""
    from .models.lookback import (lookback_fixed_call_cont,
                                  lookback_fixed_put_cont,
                                  lookback_floating_call_cont,
                                  lookback_floating_put_cont,
                                  price_lookback_option)
    from .types import MarketParams, RegressionSpec, SimConfig

    market = MarketParams(args.s0, args.r, args.sigma, args.q)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    res = price_lookback_option(
        jax.random.key(args.seed), market, args.k, args.t,
        option_type=args.option_type, exercise=args.exercise,
        strike_type=args.strike_type, spec=spec, sim=sim,
        engine=args.engine)
    if args.strike_type == "fixed":
        fn = (lookback_fixed_call_cont if args.option_type == "call"
              else lookback_fixed_put_cont)
        oracle = fn(args.s0, args.k, args.t, args.r, args.sigma, q=args.q,
                    n_steps=args.steps)
    else:
        fn = (lookback_floating_call_cont if args.option_type == "call"
              else lookback_floating_put_cont)
        oracle = fn(args.s0, args.t, args.r, args.sigma, q=args.q,
                    n_steps=args.steps)
    payload = {
        "price": round(float(res.price), 4),
        "stderr": round(float(res.stderr), 4),
        "oracle_european": round(oracle, 4),
        "oracle_name": "reflection-law quadrature + BGK shift",
    }
    if not args.json:
        print(f"Lookback {args.strike_type} {args.exercise.title()} "
              f"{args.option_type.title()}: {payload['price']:.4f} "
              f"± {payload['stderr']:.4f}  (European oracle: "
              f"{payload['oracle_european']:.4f})")
    _emit(payload, args.json)
    return payload


def cmd_swaption(args):
    """Bermudan payer/receiver swaption under Hull-White 1F (vs the exact
    Jamshidian European and the f64 CN-PDE Bermudan anchor) or G2++
    two-factor Gaussian (``--model g2``, vs the exact conditioned-GH
    European)."""
    from .rates import (HW1FParams, jamshidian_swaption_price,
                        pde_bermudan_swaption, price_bermudan_swaption,
                        swap_schedule)
    from .types import RegressionSpec, SimConfig

    pay = swap_schedule(args.expiry, args.tenor, args.freq)
    spec = RegressionSpec(basis=args.basis, degree=args.degree)
    sim = SimConfig(n_paths=args.paths, n_steps=args.steps,
                    antithetic=args.antithetic)
    payer = args.side == "payer"
    if args.model == "g2":
        from .rates_g2 import (G2Params, g2_swaption_price,
                               price_bermudan_swaption_g2)

        g2 = G2Params(r0=args.r0, a=args.kappa, b=args.b,
                      sigma=args.sigma_r, eta=args.eta, rho=args.rho_xy)
        res = price_bermudan_swaption_g2(
            jax.random.key(args.seed), g2, args.k, pay, payer=payer,
            first_reset=args.expiry, spec=spec, sim=sim,
            engine=args.engine)
        euro = g2_swaption_price(g2, args.k, args.expiry, pay, payer=payer)
        payload = {
            "model": "g2",
            "price_bp": round(float(res.price) * 1e4, 2),
            "stderr_bp": round(float(res.stderr) * 1e4, 2),
            "european_gh_bp": round(euro * 1e4, 2),
            "side": args.side,
        }
        if not args.json:
            print(f"G2++ Bermudan {args.side} swaption {args.expiry:g}y "
                  f"into {args.tenor:g}y (K={args.k:.4%}): "
                  f"{payload['price_bp']:.2f} bp \u00b1 "
                  f"{payload['stderr_bp']:.2f} "
                  f"(European GH exact: {payload['european_gh_bp']:.2f})")
        _emit(payload, args.json)
        return payload
    hw = HW1FParams(r0=args.r0, kappa=args.kappa, sigma_r=args.sigma_r)
    res = price_bermudan_swaption(
        jax.random.key(args.seed), hw, args.k, pay, payer=payer,
        first_reset=args.expiry, spec=spec, sim=sim, engine=args.engine)
    euro = jamshidian_swaption_price(hw, args.k, args.expiry, pay,
                                     payer=payer)
    payload = {
        "price_bp": round(float(res.price) * 1e4, 2),
        "stderr_bp": round(float(res.stderr) * 1e4, 2),
        "european_jamshidian_bp": round(euro * 1e4, 2),
        "side": args.side,
    }
    if args.pde:
        payload["pde_bermudan_bp"] = round(
            pde_bermudan_swaption(hw, args.k, pay, payer=payer,
                                  first_reset=args.expiry) * 1e4, 2)
    if not args.json:
        print(f"Bermudan {args.side} swaption {args.expiry:g}y into "
              f"{args.tenor:g}y (K={args.k:.4%}, unit notional): "
              f"{payload['price_bp']:.2f} bp ± "
              f"{payload['stderr_bp']:.2f}")
        print(f"European (Jamshidian, exact): "
              f"{payload['european_jamshidian_bp']:.2f} bp"
              + (f"; PDE Bermudan anchor: {payload['pde_bermudan_bp']:.2f}"
                 f" bp" if args.pde else ""))
    _emit(payload, args.json)
    return payload


def build_parser():
    p = argparse.ArgumentParser(prog="amcx",
                                description="TPU-native least-squares Monte Carlo engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("price", help="price one option, compare to the oracle")
    _market_product_args(pp)
    _reg_sim_args(pp)
    pp.add_argument("--json", action="store_true")
    pp.add_argument("--plot", default=None, help="write the 2x2 results figure here")
    pp.add_argument("--plot-paths", type=int, default=10)
    pp.add_argument("--difference-type", choices=["absolute", "difference", "relative"],
                    default="difference")
    pp.add_argument("--oracle-grid-steps", type=int, default=50)
    pp.add_argument("--oracle-grid-paths", type=int, default=512,
                    help="paths sampled for the oracle CCR profile")
    pp.add_argument("--out-of-sample", action="store_true",
                    help="two-pass Longstaff-Schwartz: fit the policy on "
                         "one path set, reprice (replay) on an independent "
                         "one — removes foresight bias (amcx.policy)")
    pp.add_argument("--fit-paths", type=int, default=None,
                    help="with --out-of-sample: fit on this many paths, "
                         "replay on --paths (default: same count)")
    pp.set_defaults(fn=cmd_price)

    pg = sub.add_parser("greeks", help="pathwise Greeks")
    _market_product_args(pg)
    _reg_sim_args(pg)
    pg.add_argument("--json", action="store_true")
    pg.set_defaults(fn=cmd_greeks)

    ps = sub.add_parser("sweep", help="convergence studies")
    _market_product_args(ps)
    _reg_sim_args(ps)
    ps.add_argument("--study", choices=["paths", "steps", "degree", "heatmap"],
                    required=True)
    ps.add_argument("--path-range", type=int, nargs="+",
                    default=[500, 1000, 3000, 5000, 7000, 10000, 12000])
    ps.add_argument("--step-range", type=int, nargs="+",
                    default=[5, 10, 50, 100, 150, 200, 250])
    ps.add_argument("--max-degree", type=int, default=10)
    ps.add_argument("--bases", nargs="+", default=["chebyshev", "power", "legendre"])
    ps.add_argument("--json", action="store_true")
    ps.add_argument("--plot", default=None)
    ps.set_defaults(fn=cmd_sweep)

    pm = sub.add_parser("maxcall", help="multi-asset Bermudan max-call")
    pm.add_argument("--assets", type=int, default=5)
    pm.add_argument("--s0", type=float, default=100.0)
    pm.add_argument("--k", type=float, default=100.0)
    pm.add_argument("--t", type=float, default=3.0)
    pm.add_argument("--r", type=float, default=0.05)
    pm.add_argument("--q", type=float, default=0.10)
    pm.add_argument("--sigma", type=float, default=0.2)
    pm.add_argument("--dates", type=int, default=9)
    pm.add_argument("--paths", type=int, default=100_000)
    pm.add_argument("--basis", default="chebyshev")
    pm.add_argument("--degree", type=int, default=2)
    pm.add_argument("--seed", type=int, default=42)
    pm.add_argument("--json", action="store_true")
    pm.set_defaults(fn=cmd_maxcall)

    pk = sub.add_parser("book", help="price a strike/maturity book on shared paths")
    _market_product_args(pk)
    _reg_sim_args(pk)
    pk.add_argument("--strikes", required=True,
                    help="comma-separated strike list, e.g. 90,100,110")
    pk.add_argument("--maturity-steps", default=None,
                    help="optional comma-separated per-option maturity step "
                         "indices (mixed-maturity book on the shared grid)")
    pk.add_argument("--book-engine", choices=["xla", "mega"], default="xla")
    pk.add_argument("--json", action="store_true")
    pk.set_defaults(fn=cmd_book)

    pv = sub.add_parser("divs",
                        help="option on a discrete cash-dividend payer")
    pv.add_argument("--s0", type=float, default=100.0)
    pv.add_argument("--k", type=float, default=100.0)
    pv.add_argument("--t", type=float, default=1.0)
    pv.add_argument("--r", type=float, default=0.05)
    pv.add_argument("--q", type=float, default=0.0)
    pv.add_argument("--sigma", type=float, default=0.2)
    pv.add_argument("--div-times", default="0.3,0.7",
                    help="comma-separated ex-dates (years)")
    pv.add_argument("--div-amounts", default="2.0,2.0",
                    help="comma-separated cash amounts")
    pv.add_argument("--div-fractions", default="",
                    help="optional comma-separated proportional drops "
                         "(production convention for far-dated estimates)")
    pv.add_argument("--option-type", choices=["put", "call"], default="put")
    pv.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    pv.add_argument("--barrier", type=float, default=None)
    pv.add_argument("--barrier-type",
                    choices=["down-in", "up-in", "down-out", "up-out"],
                    default="down-in")
    pv.add_argument("--basis", default="chebyshev")
    pv.add_argument("--degree", type=int, default=4)
    pv.add_argument("--paths", type=int, default=100_000)
    pv.add_argument("--steps", type=int, default=50)
    pv.add_argument("--antithetic", action="store_true")
    pv.add_argument("--engine", choices=["xla", "mega"], default="xla")
    pv.add_argument("--seed", type=int, default=42)
    pv.add_argument("--json", action="store_true")
    pv.set_defaults(fn=cmd_divs)

    pq = sub.add_parser("quanto",
                        help="quanto / compo cross-currency option")
    pq.add_argument("--style", choices=["quanto", "compo"],
                    default="quanto")
    pq.add_argument("--s0", type=float, default=100.0,
                    help="foreign asset spot (foreign ccy)")
    pq.add_argument("--k", type=float, default=100.0)
    pq.add_argument("--t", type=float, default=1.0)
    pq.add_argument("--rd", type=float, default=0.05,
                    help="domestic rate")
    pq.add_argument("--rf", type=float, default=0.01,
                    help="foreign rate")
    pq.add_argument("--q", type=float, default=0.0)
    pq.add_argument("--sigma", type=float, default=0.25)
    pq.add_argument("--fx-sigma", type=float, default=0.12)
    pq.add_argument("--rho", type=float, default=-0.4,
                    help="corr(asset, FX)")
    pq.add_argument("--fx-rate", type=float, default=1.0,
                    help="fixed quanto conversion rate")
    pq.add_argument("--fx-spot", type=float, default=1.0,
                    help="FX spot X0 (compo style)")
    pq.add_argument("--option-type", choices=["put", "call"],
                    default="put")
    pq.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    pq.add_argument("--barrier", type=float, default=None)
    pq.add_argument("--barrier-type",
                    choices=["down-in", "up-in", "down-out", "up-out"],
                    default="down-in")
    pq.add_argument("--basis", default="chebyshev")
    pq.add_argument("--degree", type=int, default=4)
    pq.add_argument("--paths", type=int, default=100_000)
    pq.add_argument("--steps", type=int, default=50)
    pq.add_argument("--antithetic", action="store_true")
    pq.add_argument("--engine",
                    choices=["xla", "fused", "mega", "fusedpath"],
                    default="xla")
    pq.add_argument("--seed", type=int, default=42)
    pq.add_argument("--json", action="store_true")
    pq.set_defaults(fn=cmd_quanto)

    pa = sub.add_parser("asian", help="average (Asian) option")
    pa.add_argument("--s0", type=float, default=100.0)
    pa.add_argument("--k", type=float, default=100.0)
    pa.add_argument("--t", type=float, default=1.0)
    pa.add_argument("--r", type=float, default=0.05)
    pa.add_argument("--q", type=float, default=0.0)
    pa.add_argument("--sigma", type=float, default=0.2)
    pa.add_argument("--option-type", choices=["put", "call"], default="call")
    pa.add_argument("--exercise", choices=["european", "american"],
                    default="european")
    pa.add_argument("--averaging", choices=["arithmetic", "geometric"],
                    default="arithmetic")
    pa.add_argument("--strike-type", choices=["fixed", "floating"],
                    default="fixed")
    pa.add_argument("--basis", default="chebyshev")
    pa.add_argument("--degree", type=int, default=3)
    pa.add_argument("--paths", type=int, default=100_000)
    pa.add_argument("--steps", type=int, default=50)
    pa.add_argument("--antithetic", action="store_true")
    pa.add_argument("--engine", choices=["xla", "fused", "mega"],
                    default="xla",
                    help="fused = 2 kernels/step; mega = ONE kernel total")
    pa.add_argument("--seed", type=int, default=42)
    pa.add_argument("--json", action="store_true")
    pa.set_defaults(fn=cmd_asian)

    ph = sub.add_parser("heston", help="vanilla option under Heston dynamics")
    ph.add_argument("--s0", type=float, default=100.0)
    ph.add_argument("--k", type=float, default=100.0)
    ph.add_argument("--t", type=float, default=1.0)
    ph.add_argument("--r", type=float, default=0.03)
    ph.add_argument("--q", type=float, default=0.0)
    ph.add_argument("--v0", type=float, default=0.04)
    ph.add_argument("--kappa", type=float, default=1.5)
    ph.add_argument("--theta-v", type=float, default=0.04,
                    help="long-run variance θ")
    ph.add_argument("--xi", type=float, default=0.5, help="vol of vol")
    ph.add_argument("--rho", type=float, default=-0.7)
    ph.add_argument("--barrier", type=float, default=None,
                    help="barrier level (discrete monitoring on the step "
                         "grid; engine='xla')")
    ph.add_argument("--barrier-type",
                    choices=["down-in", "up-in", "down-out", "up-out"],
                    default="down-in")
    ph.add_argument("--scheme", choices=["euler", "qe"], default="euler",
                    help="variance discretization: full-truncation Euler "
                         "or Andersen QE-M (near-unbiased at coarse steps)")
    ph.add_argument("--jump-lam", type=float, default=0.0,
                    help="jump intensity λ; > 0 switches to Bates SVJ")
    ph.add_argument("--jump-mu", type=float, default=-0.1,
                    help="mean log jump size μ_J")
    ph.add_argument("--jump-sigma", type=float, default=0.15,
                    help="log jump size std σ_J")
    ph.add_argument("--option-type", choices=["put", "call"], default="put")
    ph.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    ph.add_argument("--basis", default="chebyshev")
    ph.add_argument("--degree", type=int, default=3)
    ph.add_argument("--paths", type=int, default=100_000)
    ph.add_argument("--steps", type=int, default=100)
    ph.add_argument("--antithetic", action="store_true")
    ph.add_argument("--engine", choices=["xla", "fused", "mega"],
                    default="xla",
                    help="fused = 2 kernels/step; mega = ONE kernel total")
    ph.add_argument("--seed", type=int, default=42)
    ph.add_argument("--json", action="store_true")
    ph.set_defaults(fn=cmd_heston)

    prb = sub.add_parser(
        "roughvol", help="vanilla option under rough Bergomi volatility")
    prb.add_argument("--s0", type=float, default=100.0)
    prb.add_argument("--k", type=float, default=100.0)
    prb.add_argument("--t", type=float, default=1.0)
    prb.add_argument("--r", type=float, default=0.03)
    prb.add_argument("--q", type=float, default=0.0)
    prb.add_argument("--xi0", type=float, default=0.04,
                     help="flat forward variance ξ₀")
    prb.add_argument("--eta", type=float, default=1.5, help="vol of vol η")
    prb.add_argument("--rho", type=float, default=-0.7)
    prb.add_argument("--hurst", type=float, default=0.1,
                     help="Hurst index H (H<0.5 = rough)")
    prb.add_argument("--option-type", choices=["put", "call"], default="put")
    prb.add_argument("--exercise", choices=["european", "american"],
                     default="american")
    prb.add_argument("--basis", default="chebyshev")
    prb.add_argument("--degree", type=int, default=3)
    prb.add_argument("--paths", type=int, default=100_000)
    prb.add_argument("--steps", type=int, default=100)
    prb.add_argument("--antithetic", action="store_true")
    prb.add_argument("--engine", choices=["xla", "fused", "mega"],
                     default="xla",
                     help="fused = 2 kernels/step; mega = ONE kernel total")
    prb.add_argument("--seed", type=int, default=42)
    prb.add_argument("--json", action="store_true")
    prb.set_defaults(fn=cmd_roughvol)

    psb = sub.add_parser(
        "sabr", help="vanilla option under SABR stochastic volatility")
    psb.add_argument("--s0", type=float, default=100.0)
    psb.add_argument("--k", type=float, default=100.0)
    psb.add_argument("--t", type=float, default=1.0)
    psb.add_argument("--r", type=float, default=0.03)
    psb.add_argument("--q", type=float, default=0.0)
    psb.add_argument("--alpha", type=float, default=0.2,
                     help="initial vol level σ₀")
    psb.add_argument("--beta", type=float, default=1.0,
                     help="CEV backbone exponent")
    psb.add_argument("--rho", type=float, default=-0.4)
    psb.add_argument("--nu", type=float, default=0.6, help="vol of vol ν")
    psb.add_argument("--option-type", choices=["put", "call"],
                     default="put")
    psb.add_argument("--exercise", choices=["european", "american"],
                     default="american")
    psb.add_argument("--basis", default="chebyshev")
    psb.add_argument("--degree", type=int, default=3)
    psb.add_argument("--paths", type=int, default=100_000)
    psb.add_argument("--steps", type=int, default=100)
    psb.add_argument("--antithetic", action="store_true")
    psb.add_argument("--engine", choices=["xla", "fused", "mega"],
                     default="xla",
                     help="fused = 2 kernels/step; mega = ONE kernel total")
    psb.add_argument("--seed", type=int, default=42)
    psb.add_argument("--json", action="store_true")
    psb.set_defaults(fn=cmd_sabr)

    pk2 = sub.add_parser(
        "basket", help="basket option on correlated GBM assets")
    pk2.add_argument("--s0", default="100,95,105",
                     help="comma-separated spots (defines n_assets)")
    pk2.add_argument("--weights", default=None,
                     help="comma-separated weights summing to 1 "
                          "(default equal)")
    pk2.add_argument("--corr", default=None,
                     help="single pairwise correlation (default 0 = "
                          "independent)")
    pk2.add_argument("--k", type=float, default=100.0)
    pk2.add_argument("--t", type=float, default=1.0)
    pk2.add_argument("--r", type=float, default=0.05)
    pk2.add_argument("--q", type=float, default=0.0)
    pk2.add_argument("--sigma", type=float, default=0.25)
    pk2.add_argument("--option-type", choices=["put", "call"], default="put")
    pk2.add_argument("--exercise", choices=["european", "american"],
                     default="american")
    pk2.add_argument("--averaging", choices=["arith", "geo"],
                     default="arith")
    pk2.add_argument("--basis", default="chebyshev")
    pk2.add_argument("--degree", type=int, default=2)
    pk2.add_argument("--paths", type=int, default=100_000)
    pk2.add_argument("--steps", type=int, default=50)
    pk2.add_argument("--antithetic", action="store_true")
    pk2.add_argument("--engine", choices=["xla", "fused", "mega"],
                     default="xla")
    pk2.add_argument("--seed", type=int, default=42)
    pk2.add_argument("--json", action="store_true")
    pk2.set_defaults(fn=cmd_basket)

    pc = sub.add_parser(
        "calibrate",
        help="fit SVI/Dupire or Heston to a European quote grid, then price")
    pc.add_argument("--quotes", required=True,
                    help="CSV of 'T,K,value' rows (rectangular grid)")
    pc.add_argument("--quote-kind", choices=["iv", "price"], default="iv")
    pc.add_argument("--quote-type", choices=["put", "call"], default="call",
                    help="option type of the quoted Europeans")
    pc.add_argument("--model", choices=["svi", "heston"], default="svi")
    pc.add_argument("--s0", type=float, default=100.0)
    pc.add_argument("--r", type=float, default=0.03)
    pc.add_argument("--q", type=float, default=0.0)
    pc.add_argument("--price", action="store_true",
                    help="price the --k/--t option under the calibrated model")
    pc.add_argument("--k", type=float, default=100.0)
    pc.add_argument("--t", type=float, default=1.0)
    pc.add_argument("--option-type", choices=["put", "call"], default="put")
    pc.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    pc.add_argument("--basis", default="chebyshev")
    pc.add_argument("--degree", type=int, default=4)
    pc.add_argument("--paths", type=int, default=100_000)
    pc.add_argument("--steps", type=int, default=50)
    pc.add_argument("--antithetic", action="store_true")
    pc.add_argument("--seed", type=int, default=42)
    pc.add_argument("--json", action="store_true")
    pc.set_defaults(fn=cmd_calibrate)

    pt = sub.add_parser(
        "term", help="price under r(t)/sigma(t)/q(t) term-structure curves")
    pt.add_argument("--s0", type=float, default=100.0)
    pt.add_argument("--k", type=float, default=100.0)
    pt.add_argument("--t", type=float, default=1.0)
    pt.add_argument("--r-curve", default="0.05",
                    help="'t1:v1,t2:v2,...' piecewise-constant short rate "
                         "(value v_i applies until time t_i), or one number")
    pt.add_argument("--sigma-curve", default="0.2",
                    help="term volatility, same format")
    pt.add_argument("--q-curve", default="0.0",
                    help="dividend-yield curve, same format")
    pt.add_argument("--option-type", choices=["put", "call"], default="put")
    pt.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    pt.add_argument("--basis", default="chebyshev")
    pt.add_argument("--degree", type=int, default=4)
    pt.add_argument("--regress-on", choices=["auto", "all", "itm"], default="itm")
    pt.add_argument("--paths", type=int, default=100_000)
    pt.add_argument("--steps", type=int, default=100)
    pt.add_argument("--antithetic", action="store_true")
    pt.add_argument("--engine", choices=["xla", "mega", "fusedpath"],
                    default="mega")
    pt.add_argument("--bucketed-rho", action="store_true",
                    help="also print dPrice/dr_t per step (one jax.grad "
                         "through the curve XLA engine)")
    pt.add_argument("--seed", type=int, default=42)
    pt.add_argument("--json", action="store_true")
    pt.set_defaults(fn=cmd_term)

    pw = sub.add_parser(
        "swing", help="swing option: multiple exercise rights (<=1/date)")
    pw.add_argument("--rights", type=int, default=3)
    pw.add_argument("--s0", type=float, default=100.0)
    pw.add_argument("--k", type=float, default=100.0)
    pw.add_argument("--t", type=float, default=1.0)
    pw.add_argument("--r", type=float, default=0.05)
    pw.add_argument("--q", type=float, default=0.0)
    pw.add_argument("--sigma", type=float, default=0.2)
    pw.add_argument("--option-type", choices=["put", "call"], default="put")
    pw.add_argument("--degree", type=int, default=4)
    pw.add_argument("--regress-on", choices=["auto", "all", "itm"], default="itm")
    pw.add_argument("--paths", type=int, default=100_000)
    pw.add_argument("--steps", type=int, default=50)
    pw.add_argument("--antithetic", action="store_true")
    pw.add_argument("--payoff-kind", choices=["option", "forward"],
                    default="option",
                    help="forward = signed take (commodity swing)")
    pw.add_argument("--min-rights", type=int, default=0,
                    help="take-or-pay minimum exercise count")
    pw.add_argument("--engine", choices=["xla", "mega"], default="mega",
                    help="mega = whole rights ladder in one Pallas kernel")
    pw.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    pw.add_argument("--seed", type=int, default=42)
    pw.add_argument("--json", action="store_true")
    pw.set_defaults(fn=cmd_swing)

    pq = sub.add_parser(
        "hw", help="vanilla option under the Hull-White+GBM hybrid")
    pq.add_argument("--s0", type=float, default=100.0)
    pq.add_argument("--k", type=float, default=100.0)
    pq.add_argument("--t", type=float, default=1.0)
    pq.add_argument("--r0", type=float, default=0.04,
                    help="flat initial discount curve level")
    pq.add_argument("--q", type=float, default=0.0)
    pq.add_argument("--sigma", type=float, default=0.2, help="equity vol")
    pq.add_argument("--kappa", type=float, default=0.8,
                    help="rate mean-reversion speed")
    pq.add_argument("--sigma-r", type=float, default=0.015,
                    help="short-rate vol")
    pq.add_argument("--rho", type=float, default=-0.3,
                    help="equity-rate correlation")
    pq.add_argument("--option-type", choices=["put", "call"], default="put")
    pq.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    pq.add_argument("--degree", type=int, default=4)
    pq.add_argument("--regress-on", choices=["auto", "all", "itm"], default="itm")
    pq.add_argument("--paths", type=int, default=100_000)
    pq.add_argument("--steps", type=int, default=50)
    pq.add_argument("--antithetic", action="store_true")
    pq.add_argument("--engine", choices=["xla", "fused", "mega"],
                    default="xla",
                    help="fused = 2 kernels/step; mega = ONE kernel total")
    pq.add_argument("--seed", type=int, default=42)
    pq.add_argument("--json", action="store_true")
    pq.set_defaults(fn=cmd_hw)

    pj = sub.add_parser(
        "jump", help="vanilla option under jump dynamics (Merton or VG)")
    pj.add_argument("--model", choices=["merton", "vg", "nig"],
                    default="merton")
    pj.add_argument("--s0", type=float, default=100.0)
    pj.add_argument("--k", type=float, default=100.0)
    pj.add_argument("--t", type=float, default=1.0)
    pj.add_argument("--r", type=float, default=0.05)
    pj.add_argument("--q", type=float, default=0.0)
    pj.add_argument("--sigma", type=float, default=0.2,
                    help="diffusion vol (merton) / VG sigma")
    pj.add_argument("--lam", type=float, default=0.5,
                    help="merton jump intensity")
    pj.add_argument("--mu-j", type=float, default=-0.1,
                    help="merton mean log jump")
    pj.add_argument("--sigma-j", type=float, default=0.15,
                    help="merton log-jump std")
    pj.add_argument("--theta", type=float, default=-0.14, help="VG drift")
    pj.add_argument("--nu", type=float, default=0.2,
                    help="VG gamma variance rate")
    pj.add_argument("--alpha", type=float, default=8.0, help="NIG steepness")
    pj.add_argument("--beta", type=float, default=-3.0,
                    help="NIG asymmetry")
    pj.add_argument("--delta", type=float, default=0.3, help="NIG scale")
    pj.add_argument("--option-type", choices=["put", "call"], default="put")
    pj.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    pj.add_argument("--basis", default="chebyshev")
    pj.add_argument("--degree", type=int, default=4)
    pj.add_argument("--paths", type=int, default=100_000)
    pj.add_argument("--steps", type=int, default=50)
    pj.add_argument("--antithetic", action="store_true")
    pj.add_argument("--engine", choices=["xla", "mega"], default="xla")
    pj.add_argument("--seed", type=int, default=42)
    pj.add_argument("--json", action="store_true")
    pj.set_defaults(fn=cmd_jump)

    pd = sub.add_parser(
        "pde", help="Crank-Nicolson PDE price (independent of MC)")
    pd.add_argument("--s0", type=float, default=100.0)
    pd.add_argument("--k", type=float, default=100.0)
    pd.add_argument("--t", type=float, default=1.0)
    pd.add_argument("--r", type=float, default=0.05)
    pd.add_argument("--q", type=float, default=0.0)
    pd.add_argument("--sigma", type=float, default=0.2)
    pd.add_argument("--option-type", choices=["put", "call"], default="put")
    pd.add_argument("--exercise", choices=["european", "american"],
                    default="american")
    pd.add_argument("--space", type=int, default=1024,
                    help="log-spot grid points")
    pd.add_argument("--steps", type=int, default=256, help="time steps")
    pd.add_argument("--barrier", type=float, default=None,
                    help="barrier level: switch to the exact "
                         "discrete-monitoring CN-PDE (amcx.pde_barrier)")
    pd.add_argument("--barrier-type", default="down-in",
                    choices=["down-in", "up-in", "down-out", "up-out"])
    pd.add_argument("--monitor", type=int, default=100,
                    help="monitoring/exercise dates for --barrier mode "
                         "(the LSMC simulation grid)")
    pd.add_argument("--json", action="store_true")
    pd.set_defaults(fn=cmd_pde)

    pdl = sub.add_parser(
        "deep", help="deep LSMC (MLP continuation regression)")
    pdl.add_argument("--s0", type=float, default=100.0)
    pdl.add_argument("--k", type=float, default=100.0)
    pdl.add_argument("--t", type=float, default=1.0)
    pdl.add_argument("--r", type=float, default=0.05)
    pdl.add_argument("--q", type=float, default=0.0)
    pdl.add_argument("--sigma", type=float, default=0.2)
    pdl.add_argument("--option-type", choices=["put", "call"], default="put")
    pdl.add_argument("--exercise", choices=["european", "american"],
                     default="american")
    pdl.add_argument("--paths", type=int, default=65_536)
    pdl.add_argument("--steps", type=int, default=50)
    pdl.add_argument("--antithetic", action="store_true")
    pdl.add_argument("--width", type=int, default=32)
    pdl.add_argument("--depth", type=int, default=2)
    pdl.add_argument("--inner", type=int, default=40,
                     help="Adam steps per backward date")
    pdl.add_argument("--lr", type=float, default=3e-3)
    pdl.add_argument("--out-of-sample", action="store_true",
                     help="fit then replay frozen on fresh paths")
    pdl.add_argument("--seed", type=int, default=42)
    pdl.add_argument("--json", action="store_true")
    pdl.set_defaults(fn=cmd_deep)

    psp = sub.add_parser(
        "spread", help="two-asset spread/exchange option (Margrabe/Kirk)")
    psp.add_argument("--s1", type=float, default=100.0)
    psp.add_argument("--s2", type=float, default=95.0)
    psp.add_argument("--k", type=float, default=0.0,
                     help="spread strike; 0 = exchange (exact Margrabe)")
    psp.add_argument("--t", type=float, default=1.0)
    psp.add_argument("--r", type=float, default=0.05)
    psp.add_argument("--q1", type=float, default=0.0)
    psp.add_argument("--q2", type=float, default=0.0)
    psp.add_argument("--sigma1", type=float, default=0.25)
    psp.add_argument("--sigma2", type=float, default=0.2)
    psp.add_argument("--rho", type=float, default=0.3)
    psp.add_argument("--exercise", choices=["european", "american"],
                     default="american")
    psp.add_argument("--basis", default="chebyshev")
    psp.add_argument("--degree", type=int, default=4)
    psp.add_argument("--regress-on", choices=["auto", "all", "itm"], default="itm")
    psp.add_argument("--paths", type=int, default=65_536)
    psp.add_argument("--steps", type=int, default=50)
    psp.add_argument("--antithetic", action="store_true")
    psp.add_argument("--engine", choices=["xla", "fused", "mega"],
                     default="xla")
    psp.add_argument("--seed", type=int, default=42)
    psp.add_argument("--json", action="store_true")
    psp.set_defaults(fn=cmd_spread)

    pac = sub.add_parser(
        "autocall",
        help="autocallable (Phoenix) note / issuer-callable convertible")
    pac.add_argument("--s0", type=float, default=100.0)
    pac.add_argument("--t", type=float, default=2.0)
    pac.add_argument("--r", type=float, default=0.05)
    pac.add_argument("--q", type=float, default=0.0)
    pac.add_argument("--sigma", type=float, default=0.2)
    pac.add_argument("--obs", type=int, default=8,
                     help="observation dates (t_i = i*T/obs)")
    pac.add_argument("--ac-barrier", type=float, default=100.0,
                     help="autocall trigger level (absolute spot)")
    pac.add_argument("--coupon", type=float, default=0.02,
                     help="coupon per observation period on notional 1")
    pac.add_argument("--coupon-barrier", type=float, default=70.0,
                     help="coupon condition level; pass a negative value "
                          "for unconditional coupons")
    pac.add_argument("--memory", action="store_true", default=True)
    pac.add_argument("--no-memory", dest="memory", action="store_false")
    pac.add_argument("--ki-barrier", type=float, default=60.0,
                     help="knock-in level (full-grid discrete monitoring); "
                          "pass a negative value for capital protection")
    pac.add_argument("--put-strike", type=float, default=100.0)
    pac.add_argument("--callable-by-issuer", action="store_true",
                     help="replace the automatic trigger with the issuer's "
                          "optimal call (LSMC; requires --no-memory)")
    pac.add_argument("--worst-of", type=int, default=1, metavar="A",
                     help="price on the worst of A equicorrelated assets "
                          "(levels are rescaled to S0-performance fractions)")
    pac.add_argument("--corr", type=float, default=0.5,
                     help="pairwise correlation for --worst-of")
    pac.add_argument("--degree", type=int, default=4)
    pac.add_argument("--paths", type=int, default=262_144)
    pac.add_argument("--steps", type=int, default=96)
    pac.add_argument("--antithetic", action="store_true")
    pac.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    pac.add_argument("--seed", type=int, default=0)
    pac.add_argument("--json", action="store_true")
    pac.set_defaults(fn=cmd_autocall)

    ptf = sub.add_parser(
        "tarf", help="target redemption forward (accumulator)")
    ptf.add_argument("--s0", type=float, default=100.0)
    ptf.add_argument("--k", type=float, default=100.0)
    ptf.add_argument("--t", type=float, default=1.0)
    ptf.add_argument("--r", type=float, default=0.03)
    ptf.add_argument("--q", type=float, default=0.0)
    ptf.add_argument("--sigma", type=float, default=0.15)
    ptf.add_argument("--fixings", type=int, default=12)
    ptf.add_argument("--target", type=float, default=15.0,
                     help="accumulated-gain knockout level")
    ptf.add_argument("--leverage", type=float, default=2.0)
    ptf.add_argument("--knock", choices=["full", "capped", "none"],
                     default="capped")
    ptf.add_argument("--paths", type=int, default=262_144)
    ptf.add_argument("--steps", type=int, default=48)
    ptf.add_argument("--antithetic", action="store_true")
    ptf.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    ptf.add_argument("--seed", type=int, default=0)
    ptf.add_argument("--json", action="store_true")
    ptf.set_defaults(fn=cmd_tarf)

    plb = sub.add_parser(
        "lookback", help="lookback option on the running max/min")
    plb.add_argument("--s0", type=float, default=100.0)
    plb.add_argument("--k", type=float, default=100.0,
                     help="strike (fixed-strike only)")
    plb.add_argument("--t", type=float, default=1.0)
    plb.add_argument("--r", type=float, default=0.05)
    plb.add_argument("--q", type=float, default=0.0)
    plb.add_argument("--sigma", type=float, default=0.25)
    plb.add_argument("--option-type", choices=["put", "call"],
                     default="call")
    plb.add_argument("--strike-type", choices=["fixed", "floating"],
                     default="fixed")
    plb.add_argument("--exercise", choices=["european", "american"],
                     default="european")
    plb.add_argument("--basis", default="chebyshev")
    plb.add_argument("--degree", type=int, default=2)
    plb.add_argument("--paths", type=int, default=262_144)
    plb.add_argument("--steps", type=int, default=50)
    plb.add_argument("--antithetic", action="store_true")
    plb.add_argument("--engine", choices=["xla", "fused", "mega"],
                     default="xla")
    plb.add_argument("--seed", type=int, default=42)
    plb.add_argument("--json", action="store_true")
    plb.set_defaults(fn=cmd_lookback)

    psw = sub.add_parser(
        "swaption", help="Bermudan swaption under Hull-White 1F")
    psw.add_argument("--k", type=float, default=0.0305,
                     help="fixed rate (decimal)")
    psw.add_argument("--expiry", type=float, default=1.0,
                     help="first reset date (years)")
    psw.add_argument("--tenor", type=float, default=4.0,
                     help="swap tenor from first reset (years)")
    psw.add_argument("--freq", type=int, default=1,
                     help="fixed-leg payments per year")
    psw.add_argument("--side", choices=["payer", "receiver"],
                     default="payer")
    psw.add_argument("--r0", type=float, default=0.03,
                     help="flat initial curve level")
    psw.add_argument("--kappa", type=float, default=0.3)
    psw.add_argument("--sigma-r", type=float, default=0.012)
    psw.add_argument("--basis", default="chebyshev")
    psw.add_argument("--degree", type=int, default=2)
    psw.add_argument("--paths", type=int, default=262_144)
    psw.add_argument("--steps", type=int, default=32)
    psw.add_argument("--antithetic", action="store_true")
    psw.add_argument("--engine", choices=["xla", "mega"], default="xla")
    psw.add_argument("--pde", action="store_true",
                     help="also run the f64 CN-PDE Bermudan anchor")
    psw.add_argument("--seed", type=int, default=42)
    psw.add_argument("--json", action="store_true")
    psw.add_argument("--model", choices=["hw", "g2"], default="hw",
                     help="short-rate model (g2: two-factor Gaussian)")
    psw.add_argument("--b", type=float, default=0.1,
                     help="G2 second-factor mean reversion")
    psw.add_argument("--eta", type=float, default=0.008,
                     help="G2 second-factor vol")
    psw.add_argument("--rho-xy", type=float, default=-0.7,
                     help="G2 factor correlation")
    psw.set_defaults(fn=cmd_swaption)

    pr = sub.add_parser("preset", help="run a named BASELINE config")
    pr.add_argument("name")
    pr.add_argument("--seed", type=int, default=42)
    pr.add_argument("--json", action="store_true")
    pr.set_defaults(fn=cmd_preset)

    pb = sub.add_parser("bench", help="north-star throughput benchmark")
    pb.set_defaults(fn=cmd_bench)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
