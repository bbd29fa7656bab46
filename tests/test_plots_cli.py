"""Smoke tests: plot suite renders files; CLI subcommands run end-to-end.

The reference's visual layer (C14/C15) has no tests; here every figure is
rendered to a PNG and checked for existence/size, and the CLI (C16) is
exercised through its argparse surface.
"""

import json
import os

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

M = MarketParams(95.0, 0.01, 0.2)
PROD = ProductSpec(K=100.0, T=1.0, option_type="put", exercise="american")


@pytest.fixture(scope="module")
def small_run():
    paths = simulate_gbm(jax.random.key(0), M, 1.0, SimConfig(n_paths=512, n_steps=20))
    res = lsmc_option_pricing(paths, PROD, M.r, RegressionSpec(degree=3), return_surface=True)
    return paths, res


def _check(tmp_path, name):
    f = tmp_path / name
    assert f.exists() and f.stat().st_size > 10_000
    return f


def test_plot_asset_paths(small_run, tmp_path):
    from amcx.plots import plot_asset_paths

    paths, _ = small_run
    plot_asset_paths(paths, 1.0, n_paths_to_plot=50, save=tmp_path / "paths.png")
    _check(tmp_path, "paths.png")


def test_plot_lsmc_results_full_figure(small_run, tmp_path):
    from amcx.analytics import oracle_grid_values
    from amcx.plots import plot_lsmc_results

    paths, res = small_run
    grid = oracle_grid_values(paths[:, :64], PROD.K, M.r, PROD.T, M.sigma,
                              option_type="put", exercise="american", crr_steps=20)
    lsmc_ccr = compute_ccr_exposures(res.continuation)
    orac_ccr = compute_ccr_exposures(grid)
    plot_lsmc_results(paths, res.continuation, np.asarray(grid), 0.05, lsmc_ccr, orac_ccr,
                      difference_type="relative", key_S_lines=[95.0, 100.0],
                      S0=95.0, K=100.0, n_plotted_paths=10,
                      save=tmp_path / "results.png")
    _check(tmp_path, "results.png")


def test_plot_convergence_and_heatmap(tmp_path):
    from amcx.convergence import ConvergenceResult
    from amcx.plots import plot_convergence, plot_error_heatmap, plot_error_vs_basis_degree

    res = ConvergenceResult(np.array([100, 1000]), np.array([9.8, 9.9]), 10.0, {})
    plot_convergence(res, "Number of Paths", "Convergence", log_x=True,
                     save=tmp_path / "conv.png")
    _check(tmp_path, "conv.png")

    hm = ConvergenceResult(
        np.array([100, 1000]), np.array([[0.1, 0.2], [0.05, 0.15]]), 10.0,
        {"step_range": np.array([5, 10]), "min_error": 0.05,
         "min_n_paths": 1000, "min_n_steps": 5},
    )
    plot_error_heatmap(hm, save=tmp_path / "heat.png")
    _check(tmp_path, "heat.png")

    plot_error_vs_basis_degree({"chebyshev": res, "power": res}, save=tmp_path / "deg.png")
    _check(tmp_path, "deg.png")


def test_oracle_grid_values_match_pointwise_oracle():
    """C11 parity: the vectorized grid equals per-point oracle calls."""
    from amcx.analytics import oracle_grid_values
    from amcx.oracle import bs_price

    paths = simulate_gbm(jax.random.key(1), M, 1.0, SimConfig(n_paths=16, n_steps=4))
    grid = oracle_grid_values(paths, 100.0, 0.01, 1.0, 0.2,
                              option_type="put", exercise="european")
    t, i = 2, 5
    S = float(paths[t, i])
    want = float(bs_price(S, 100.0, 1.0 - 2 * 0.25, 0.01, 0.2, option_type="put"))
    np.testing.assert_allclose(float(grid[t, i]), want, rtol=1e-5)
    # barrier grid: knocked points carry the vanilla price
    gridb = oracle_grid_values(paths, 100.0, 0.01, 1.0, 0.2,
                               option_type="put", exercise="european", barrier=110.0)
    np.testing.assert_allclose(np.asarray(gridb), np.asarray(grid), rtol=1e-5, atol=1e-4)


def test_cli_price_json(capsys):
    from amcx.cli import main

    main(["price", "--s0", "95", "--paths", "4096", "--steps", "10", "--json",
          "--exercise", "european"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"price", "stderr", "oracle", "abs_err"} <= set(out)
    assert abs(out["price"] - out["oracle"]) < 0.5


def test_cli_sweep_degree_json(capsys):
    from amcx.cli import main

    main(["sweep", "--study", "degree", "--paths", "2000", "--steps", "10",
          "--max-degree", "2", "--bases", "chebyshev", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "chebyshev" in out and len(out["chebyshev"]["prices"]) == 3


def test_cli_preset_listing_error():
    from amcx.presets import get_preset

    with pytest.raises(KeyError, match="Unknown preset"):
        get_preset("nope")


def test_cli_plot_writes_figure(tmp_path, capsys):
    from amcx.cli import main

    out = tmp_path / "fig.png"
    main(["price", "--s0", "95", "--paths", "512", "--steps", "10",
          "--exercise", "european", "--plot", str(out), "--plot-paths", "5",
          "--oracle-grid-paths", "64", "--json"])
    assert out.exists() and out.stat().st_size > 10_000


def test_cli_q0_call_advisory(capsys):
    """The CLI prints the recommended-practice advisory for q=0 American
    calls priced with the parity default (VERDICT r2 #9)."""
    import sys

    from amcx.cli import main as cli_main

    # --regress-on all: the explicit parity opt-in (the auto default now
    # resolves to the bias-reduced itm spec and does not warn)
    argv = ["amcx", "price", "--option-type", "call", "--exercise", "american",
            "--paths", "2048", "--steps", "5", "--regress-on", "all", "--json"]
    old = sys.argv
    try:
        sys.argv = argv
        cli_main()
    finally:
        sys.argv = old
    err = capsys.readouterr().err
    assert "ADVISORY" in err and "q=0" in err


def test_cli_out_of_sample_price(capsys):
    """--out-of-sample runs the two-pass estimator and reports both the
    in-sample fit and the replayed (unbiased-below) price."""
    from amcx.cli import main

    main(["price", "--paths", "8192", "--steps", "10", "--k", "105",
          "--sigma", "0.25", "--r", "0.05", "--engine", "mega",
          "--out-of-sample", "--fit-paths", "4096", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "fit_price" in out and "foresight_gap" in out
    assert abs(out["price"] - out["oracle"]) < 0.5


def test_cli_term_curves(capsys):
    """`amcx term`: piecewise-curve parsing, lattice-oracle comparison, and
    bucketed rho through the curve XLA engine."""
    import json as _json

    from amcx.cli import main

    main(["term", "--r-curve", "0.5:0.03,1.0:0.08", "--sigma-curve", "0.25",
          "--paths", "8192", "--steps", "10", "--engine", "xla",
          "--bucketed-rho", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["oracle_kind"] == "per-step-rate f64 lattice"
    assert payload["abs_err"] < 0.5
    assert len(payload["bucketed_rho"]) == 10
    # two-regime rate parsed onto the grid: r_eff is the midpoint mean
    assert abs(payload["r_eff"] - 0.055) < 1e-9


def test_cli_term_curve_parse_errors():
    from amcx.cli import main

    with pytest.raises(SystemExit, match="ascending"):
        main(["term", "--r-curve", "0.8:0.03,0.5:0.08", "--paths", "1024",
              "--steps", "4"])
    with pytest.raises(SystemExit, match="cover maturity"):
        main(["term", "--r-curve", "0.5:0.03", "--paths", "1024",
              "--steps", "4"])


def test_cli_swing(capsys):
    import json as _json

    from amcx.cli import main

    main(["swing", "--rights", "2", "--k", "105", "--sigma", "0.25",
          "--paths", "16384", "--steps", "10", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["rights"] == 2
    assert payload["abs_err"] < 0.5


def test_cli_hw_hybrid(capsys):
    import json as _json

    from amcx.cli import main

    main(["hw", "--exercise", "european", "--k", "105", "--paths", "16384",
          "--steps", "10", "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["oracle_kind"].startswith("hybrid closed form")
    assert payload["abs_err"] < 4.0 * max(payload["stderr"], 1e-4) + 0.05


def test_cli_swing_constrained(capsys):
    import json as _json

    from amcx.cli import main

    main(["swing", "--rights", "3", "--min-rights", "2", "--payoff-kind",
          "forward", "--k", "100", "--sigma", "0.25", "--engine", "xla",
          "--paths", "16384", "--steps", "8", "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["abs_err"] < 0.5


def test_cli_bates_jump_flags(capsys):
    import json as _json

    from amcx.cli import main

    main(["heston", "--jump-lam", "0.6", "--paths", "16384", "--steps",
          "20", "--exercise", "american", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    # American put under SVJ must clear its own CF European anchor
    assert payload["price"] > payload["cf_european"] - 3 * payload["stderr"]


def test_cli_heston_qe_scheme(capsys):
    import json as _json

    from amcx.cli import main

    main(["heston", "--scheme", "qe", "--xi", "1.0", "--rho", "-0.9",
          "--kappa", "1.0", "--paths", "32768", "--steps", "8",
          "--exercise", "european", "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    # at 8 Euler steps this Feller-violating config is ~+1.0 off the CF
    # oracle; QE lands within MC noise of it
    assert abs(payload["price"] - payload["cf_european"]) < \
        4 * payload["stderr"] + 0.03


def test_cli_heston_barrier(capsys):
    import json as _json

    from amcx.cli import main

    main(["heston", "--barrier", "85", "--paths", "16384", "--steps",
          "25", "--exercise", "american", "--antithetic", "--json"])
    knockin = _json.loads(capsys.readouterr().out)
    main(["heston", "--paths", "16384", "--steps", "25", "--exercise",
          "american", "--antithetic", "--json"])
    vanilla = _json.loads(capsys.readouterr().out)
    assert 0.0 < knockin["price"] < vanilla["price"]


def test_cli_divs_json(capsys):
    import json as _json

    from amcx.cli import main

    main(["divs", "--paths", "16384", "--steps", "25", "--antithetic",
          "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["abs_err"] < 4 * payload["stderr"] + 0.05
    assert payload["div_pv"] > 3.8


def test_cli_roughvol_json(capsys):
    import json as _json

    from amcx.cli import main

    main(["roughvol", "--paths", "32768", "--steps", "20", "--eta", "0.0",
          "--exercise", "european", "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    # η=0 collapses rBergomi to BS exactly — the reference line the CLI
    # prints is then the MC target itself
    assert abs(payload["price"] - payload["bs_eta0_european"]) < (
        4 * payload["stderr"])


def test_cli_sabr_json(capsys):
    import json as _json

    from amcx.cli import main

    main(["sabr", "--paths", "32768", "--steps", "20", "--nu", "0.0",
          "--exercise", "european", "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    # ν=0: Hagan degenerates to exact BS — the printed reference is the
    # MC target itself
    assert abs(payload["price"] - payload["hagan_european"]) < (
        4 * payload["stderr"])


def test_cli_jump_merton_json(capsys):
    from amcx.cli import main

    main(["jump", "--model", "merton", "--paths", "8192", "--steps", "10",
          "--exercise", "european", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(out["price"] - out["oracle_european"]) < 4 * out["stderr"] + 0.05


def test_cli_jump_vg_json(capsys):
    from amcx.cli import main

    main(["jump", "--model", "vg", "--paths", "8192", "--steps", "10",
          "--exercise", "european", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(out["price"] - out["oracle_european"]) < 4 * out["stderr"] + 0.05


def test_cli_pde_json(capsys):
    from amcx.cli import main

    main(["pde", "--space", "256", "--steps", "64", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["oracle_name"] == "CRR-2000"
    assert abs(out["price"] - out["oracle"]) < 0.02


def test_cli_deep_json(capsys):
    from amcx.cli import main

    main(["deep", "--paths", "4096", "--steps", "10", "--inner", "10",
          "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "in-sample"
    assert abs(out["price"] - out["crr2000"]) < 0.3


def test_cli_spread_json(capsys):
    from amcx.cli import main

    main(["spread", "--paths", "8192", "--steps", "10", "--antithetic",
          "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["oracle_name"] == "Margrabe (exact)"
    assert abs(out["price"] - out["oracle_european"]) < 4 * out["stderr"] + 0.1


def test_cli_jump_nig_json(capsys):
    from amcx.cli import main

    main(["jump", "--model", "nig", "--paths", "8192", "--steps", "10",
          "--exercise", "european", "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(out["price"] - out["oracle_european"]) < 4 * out["stderr"] + 0.05


def test_cli_lookback_json(capsys):
    from amcx.cli import main

    main(["lookback", "--paths", "8192", "--steps", "16", "--antithetic",
          "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"price", "stderr", "oracle_european"} <= set(out)
    assert abs(out["price"] - out["oracle_european"]) < max(
        4 * out["stderr"], 0.4)


def test_cli_swaption_json(capsys):
    from amcx.cli import main

    main(["swaption", "--paths", "16384", "--steps", "16", "--antithetic",
          "--json"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {"price_bp", "stderr_bp", "european_jamshidian_bp"} <= set(out)
    # Bermudan >= its own European lower bound, minus MC noise
    assert out["price_bp"] > out["european_jamshidian_bp"] - 4 * out["stderr_bp"]


def test_cli_quanto_json(capsys):
    import json as _json

    from amcx.cli import main

    main(["quanto", "--paths", "16384", "--steps", "25", "--antithetic",
          "--json"])
    payload = _json.loads(capsys.readouterr().out)
    # American >= its European closed form (minus MC noise); CRR present
    assert payload["price"] > payload["european_cf"] - 4 * payload["stderr"]
    assert abs(payload["price"] - payload["crr"]) < 0.25
    # q_eff = rd − rf + q + ρσσ_X = 0.05 − 0.01 + 0 − 0.012
    assert abs(payload["q_eff"] - 0.028) < 1e-9


def test_cli_quanto_compo_json(capsys):
    import json as _json

    from amcx.cli import main

    main(["quanto", "--style", "compo", "--fx-spot", "1.3", "--k", "130",
          "--exercise", "european", "--paths", "16384", "--steps", "25",
          "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert abs(payload["price"] - payload["european_cf"]) < (
        4 * payload["stderr"] + 0.02)


def test_cli_swaption_g2_json(capsys):
    import json as _json

    from amcx.cli import main

    main(["swaption", "--model", "g2", "--k", "0.03", "--paths", "16384",
          "--steps", "32", "--antithetic", "--json"])
    payload = _json.loads(capsys.readouterr().out)
    assert payload["model"] == "g2"
    # Bermudan dominates its own exact European oracle (minus noise)
    assert payload["price_bp"] > payload["european_gh_bp"] - (
        4 * payload["stderr_bp"])
