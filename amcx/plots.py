"""Visualization suite (reference C14/C15).

Matplotlib renderings with the same information content as the reference's
plot layer (`/root/reference/american_monte_carlo.py:254-439` and
`american_monte_carlo_additional_plots.py:6-171`): the 2×2 results figure
(differences scatter / continuation scatter / CCR profile), asset-path fans,
and the four convergence studies. Restructured for array inputs — each
scatter is a single vectorized call over the whole (time × path) grid
instead of a per-timestep Python loop.

All functions accept ``ax``/``save`` and default to the Agg backend (no
display needed on a TPU host). Inputs are time-major arrays as produced by
the engine; ``n_plotted_paths`` crops the path axis like `crop_data`
(`american_monte_carlo.py:201-207`).
"""

from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg", force=False)
import matplotlib.cm as cm  # noqa: E402
import matplotlib.colors as mcolors  # noqa: E402
import matplotlib.gridspec as gridspec  # noqa: E402
import matplotlib.pyplot as plt  # noqa: E402

from .analytics import compute_differences  # noqa: E402

__all__ = [
    "crop_surface",
    "plot_asset_paths",
    "plot_differences",
    "plot_continuation_values",
    "plot_ccr_exposures",
    "plot_lsmc_results",
    "plot_convergence",
    "plot_error_heatmap",
    "plot_error_vs_basis_degree",
]

_CMAP = cm.Spectral_r


def crop_surface(surface_tm, n_plotted_paths: int = 10):
    """First-k-paths crop of a (n_steps+1, n_paths) surface (`crop_data`
    parity)."""
    return np.asarray(surface_tm)[:, :n_plotted_paths]


def _grid_xy(paths_tm, dt):
    paths = np.asarray(paths_tm)
    T1, N = paths.shape
    t = np.repeat(np.arange(T1) * dt, N)
    return t, paths.ravel()


def _param_box(ax, S0, K, barrier):
    txt = f"$S_0$ = {S0}\n$K$ = {K}\nBarrier = {barrier}"
    ax.text(0.05, 0.97, txt, transform=ax.transAxes, fontsize=10, va="top",
            bbox=dict(facecolor="white"))


def plot_asset_paths(paths_tm, T, ax=None, n_paths_to_plot: int = 100, save=None):
    """Fan chart of simulated paths (`additional_plots.py:6-19`)."""
    paths = np.asarray(paths_tm)
    n_steps = paths.shape[0] - 1
    ts = np.linspace(0, T, n_steps + 1)
    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(12, 6))
    ax.plot(ts, paths[:, :n_paths_to_plot], lw=1, alpha=0.7)
    ax.set_title("Simulated Asset Price Paths")
    ax.set_xlabel("Time to Maturity (Years)")
    ax.set_ylabel("Asset Price")
    ax.grid(True)
    return _finish(ax, save, own)


def _scatter_surface(ax, paths_tm, values_tm, dt, norm, title, key_S_lines,
                     plot_paths_backdrop):
    t, S = _grid_xy(paths_tm, dt)
    if plot_paths_backdrop:
        T1 = paths_tm.shape[0]
        ax.plot(np.arange(T1) * dt, np.asarray(paths_tm), color="gray", lw=0.5, alpha=0.3)
    sc = ax.scatter(t, S, c=np.asarray(values_tm).ravel(), cmap=_CMAP, s=30,
                    marker="o", norm=norm)
    ax.set_title(title)
    ax.set_xlabel("Time to Maturity (T)")
    for line in key_S_lines or []:
        if line is not None:
            ax.axhline(line, color="gray", linestyle="--", linewidth=0.8)
    ax.grid(True)
    return sc


def _diff_norm(difference_type, vmin, vmax):
    if difference_type == "relative":
        return mcolors.SymLogNorm(linthresh=1e-2, linscale=1, vmin=vmin, vmax=vmax, base=10)
    return mcolors.Normalize(vmin=vmin, vmax=vmax)


def plot_differences(paths_tm, differences_tm, dt, ax=None, title=None,
                     difference_type="difference", vmin=None, vmax=None,
                     key_S_lines=None, plot_asset_paths=False,
                     S0=None, K=None, barrier=None, save=None):
    """LSMC-vs-oracle difference scatter (`american_monte_carlo.py:260-286`);
    relative mode uses the same SymLogNorm."""
    d = np.asarray(differences_tm)
    vmin = np.nanmin(d) if vmin is None else vmin
    vmax = np.nanmax(d) if vmax is None else vmax
    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(7, 5))
    norm = _diff_norm(difference_type, vmin, vmax)
    title = title or (f"{difference_type.title()} Differences to Oracle"
                      if difference_type != "difference" else "Differences to Oracle")
    sc = _scatter_surface(ax, paths_tm, d, dt, norm, title, key_S_lines, plot_asset_paths)
    if S0 is not None:
        _param_box(ax, S0, K, barrier)
    if own:
        plt.colorbar(sc, ax=ax, label="Differences to Oracle")
    return _finish(ax, save, own)


def plot_continuation_values(paths_tm, continuation_tm, dt, ax=None,
                             key_S_lines=None, plot_asset_paths=False, save=None):
    """Continuation-value scatter (`american_monte_carlo.py:289-309`)."""
    c = np.asarray(continuation_tm)
    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(7, 5))
    norm = mcolors.Normalize(vmin=np.nanmin(c), vmax=np.nanmax(c))
    sc = _scatter_surface(ax, paths_tm, c, dt, norm, "Continuation Values",
                          key_S_lines, plot_asset_paths)
    if own:
        plt.colorbar(sc, ax=ax, label="Continuation Value")
    return _finish(ax, save, own)


def plot_ccr_exposures(lsmc_exposures, oracle_exposures, dt, ax=None, save=None):
    """EPE/PFE profiles, LSMC vs oracle (`american_monte_carlo.py:418-439`).
    Inputs are `CCRExposures` namedtuples (or anything with pfe5/pfe95/epe)."""
    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(7, 5))
    n = len(np.asarray(lsmc_exposures.epe))
    ts = np.arange(n) * dt
    ax.plot(ts, np.asarray(lsmc_exposures.epe), label="LSMC EPE", color="blue")
    ax.plot(ts, np.asarray(lsmc_exposures.pfe5), label="LSMC 5-95% PFE", color="blue", marker=".")
    ax.plot(ts, np.asarray(lsmc_exposures.pfe95), color="blue", marker=".", alpha=0.5)
    if oracle_exposures is not None:
        ax.plot(ts, np.asarray(oracle_exposures.epe), label="Oracle EPE", color="orange")
        ax.plot(ts, np.asarray(oracle_exposures.pfe5), label="Oracle 5-95% PFE",
                color="orange", marker=".")
        ax.plot(ts, np.asarray(oracle_exposures.pfe95), color="orange", marker=".", alpha=0.5)
    ax.set_xlabel("Time")
    ax.set_ylabel("Exposure")
    ax.set_title("Credit Exposure Profiles")
    ax.legend()
    ax.grid(True)
    return _finish(ax, save, own)


def plot_lsmc_results(paths_tm, continuation_tm, oracle_values_tm, dt,
                      lsmc_exposures, oracle_exposures,
                      difference_type="difference", key_S_lines=None,
                      plot_asset_paths=False, vmin_diff=None, vmax_diff=None,
                      S0=None, K=None, barrier=None, n_plotted_paths: int = 10,
                      save=None):
    """The reference's 2×2 results figure (`american_monte_carlo.py:313-381`):
    differences scatter | continuation scatter / CCR panel | (empty), with
    aligned colorbars and the parameter text box."""
    cont = crop_surface(continuation_tm, n_plotted_paths)
    orac = crop_surface(oracle_values_tm, n_plotted_paths)
    pth = crop_surface(paths_tm, n_plotted_paths)
    diffs = np.asarray(compute_differences(cont, orac, difference_type))

    vmin_diff = np.nanmin(diffs) if vmin_diff is None else vmin_diff
    vmax_diff = np.nanmax(diffs) if vmax_diff is None else vmax_diff

    fig = plt.figure(figsize=(10, 7))
    gs = gridspec.GridSpec(2, 2, height_ratios=[1, 1])
    ax_diff = plt.subplot(gs[0, 0])
    ax_cont = plt.subplot(gs[0, 1], sharey=ax_diff)
    ax_ccr = plt.subplot(gs[1, 0], sharex=ax_diff)
    fig.delaxes(plt.subplot(gs[1, 1]))

    norm_diff = _diff_norm(difference_type, vmin_diff, vmax_diff)
    plot_differences(pth, diffs, dt, ax=ax_diff, difference_type=difference_type,
                     vmin=vmin_diff, vmax=vmax_diff, key_S_lines=key_S_lines,
                     plot_asset_paths=plot_asset_paths, S0=S0, K=K, barrier=barrier)
    plot_continuation_values(pth, cont, dt, ax=ax_cont, key_S_lines=key_S_lines,
                             plot_asset_paths=plot_asset_paths)
    plot_ccr_exposures(lsmc_exposures, oracle_exposures, dt, ax=ax_ccr)

    sm_diff = cm.ScalarMappable(cmap=_CMAP, norm=norm_diff)
    sm_diff.set_array([])
    fig.colorbar(sm_diff, ax=ax_diff, label="Differences to Oracle")
    norm_cont = mcolors.Normalize(vmin=np.nanmin(cont), vmax=np.nanmax(cont))
    sm_cont = cm.ScalarMappable(cmap=_CMAP, norm=norm_cont)
    sm_cont.set_array([])
    fig.colorbar(sm_cont, ax=ax_cont, label="Continuation Value")
    sm_empty = cm.ScalarMappable(cmap=_CMAP, norm=norm_cont)
    sm_empty.set_array([])
    cb = fig.colorbar(sm_empty, ax=ax_ccr)
    cb.ax.set_visible(False)

    plt.tight_layout()
    if save:
        fig.savefig(save, dpi=110)
        plt.close(fig)
    return fig


def plot_convergence(result, xlabel, title, ax=None, log_x=False, save=None):
    """Price-vs-sweep line with oracle benchmark line
    (`additional_plots.py:38-52,72-86`)."""
    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(12, 8))
    ax.plot(result.x, result.prices, color="royalblue", marker="o", linestyle="-",
            linewidth=2, markersize=6, label="LSMC Estimated Price")
    ax.axhline(result.benchmark, color="red", linestyle="--", linewidth=2,
               label="Benchmark Price (Oracle)")
    if log_x:
        ax.set_xscale("log")
    ax.set_xlabel(xlabel, fontsize=12)
    ax.set_ylabel("Option Price", fontsize=12)
    ax.set_title(title, fontsize=14, fontweight="bold")
    ax.grid(visible=True, which="both", linestyle="--", linewidth=0.5, alpha=0.7)
    ax.legend(fontsize=10)
    return _finish(ax, save, own)


def plot_error_heatmap(result, ax=None, save=None, option_type=None,
                       exercise=None):
    """|error| heatmap with argmin star (`additional_plots.py:115-135`):
    log-scale path axis, rotated step ticks, product-bearing title."""
    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(10, 8))
    steps = result.extra["step_range"]
    pc = ax.pcolormesh(steps, result.x, result.prices, shading="auto", cmap="viridis")
    plt.colorbar(pc, ax=ax, label="Absolute Error")
    ax.scatter(result.extra["min_n_steps"], result.extra["min_n_paths"], color="red",
               s=200, edgecolor="black", marker="*",
               label=(f"Minimum Absolute Error\nTimeSteps={result.extra['min_n_steps']},"
                      f" Paths={result.extra['min_n_paths']}"))
    # parity with `additional_plots.py:125-132`: path counts span decades —
    # log y-axis with ticks at the tested points; step ticks rotated 45°
    ax.set_yscale("log")
    ax.set_xticks(steps)
    ax.tick_params(axis="x", rotation=45)
    ax.set_yticks(result.x)
    ax.yaxis.set_major_formatter(plt.matplotlib.ticker.ScalarFormatter())
    ax.grid(visible=True, color="black", linestyle="--", linewidth=0.5, alpha=0.5)
    ax.set_xlabel("Number of Time Steps")
    ax.set_ylabel("Number of Paths (Log Scale)")
    if option_type and exercise:
        ax.set_title(
            f"Absolute Error in {option_type.title()} Option Price with "
            f"{exercise.title()} Exercise"
        )
    else:
        ax.set_title("Absolute Error in Option Price")
    ax.legend()
    return _finish(ax, save, own)


def plot_error_vs_basis_degree(results_by_basis, ax=None, save=None):
    """Price vs degree per family (`additional_plots.py:138-171`)."""
    color = {"chebyshev": "royalblue", "power": "forestgreen", "legendre": "darkorange",
             "laguerre": "purple", "hermite": "brown"}
    marker = {"chebyshev": "o", "power": "s", "legendre": "^", "laguerre": "v", "hermite": "D"}
    own = ax is None
    if own:
        _, ax = plt.subplots(figsize=(12, 8))
    bench = None
    for basis, res in results_by_basis.items():
        ax.plot(res.x, res.prices, label=f"{basis.title()} Basis",
                color=color.get(basis), marker=marker.get(basis, "o"),
                linewidth=2, markersize=6)
        bench = res.benchmark
    if bench is not None:
        ax.axhline(bench, color="red", linestyle="--", linewidth=2,
                   label="Benchmark Price (Oracle)")
    ax.set_xlabel("Degree of Polynomial Basis", fontsize=12)
    ax.set_ylabel("Option Price", fontsize=12)
    ax.set_title("LSMC Price vs. Degree of Polynomial Basis", fontsize=14, fontweight="bold")
    ax.grid(visible=True, which="both", linestyle="--", linewidth=0.5, alpha=0.7)
    ax.legend(fontsize=10)
    return _finish(ax, save, own)


def _finish(ax, save, own_fig):
    fig = ax.figure
    if own_fig:
        fig.tight_layout()
    if save:
        fig.savefig(save, dpi=110)
        plt.close(fig)
    return fig
