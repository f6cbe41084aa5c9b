"""Partial-dependence and ICE plots (reference parity layer).

Re-implements the reference's interpretability plots (reference
``pymc_bart/utils.py:134-716``: plot_ice, plot_pdp, plot_convergence and
the _create_figure_axes/_prepare_plot_data/_create_pdp_data/_smooth_mean/
_plot_hdi helpers) on top of the fused posterior-prediction kernel.
PDP uses the reference's "fast PDP" trick: for each variable, predict
with every *other* variable excluded (reference utils.py:393-404,
CHANGELOG.md:378) — exclusion is integrated out on device by
row-count-weighted tree traversal.
"""

from __future__ import annotations

import warnings
from typing import Any, Callable, Dict, Optional

import numpy as np

from .posterior import sample_posterior
from .stats import DEFAULT_CI_PROB, hdi


def _identity(x):
    return x


def _get_axes(grid, n_plots, sharex, sharey, figsize):
    import matplotlib.pyplot as plt

    if grid == "long":
        fig, axes = plt.subplots(n_plots, sharex=sharex, sharey=sharey,
                                 figsize=figsize)
        if n_plots == 1:
            axes = [axes]
    elif grid == "wide":
        fig, axes = plt.subplots(1, n_plots, sharex=sharex, sharey=sharey,
                                 figsize=figsize)
        if n_plots == 1:
            axes = [axes]
    elif isinstance(grid, tuple):
        grid_size = grid[0] * grid[1]
        if n_plots > grid_size:
            warnings.warn(
                "The grid is smaller than the number of available variables "
                "to plot. Automatically adjusting the grid size."
            )
            grid = (n_plots // grid[1] + (n_plots % grid[1] > 0), grid[1])
        fig, axes = plt.subplots(*grid, sharey=sharey, figsize=figsize)
        axes = np.ravel(axes)
        for i in range(n_plots, len(axes)):
            fig.delaxes(axes[i])
        axes = axes[:n_plots]
    else:
        raise ValueError(f"grid must be 'long', 'wide' or a tuple, got {grid!r}")
    return fig, axes


def _bart_shape(bartrv) -> int:
    """Number of output panels per variable (reference utils.py:490-504)."""
    if isinstance(bartrv, list):
        return len(bartrv)
    if len(bartrv.shape) == 1:
        return 1
    return bartrv.config.n_outputs


def _all_trees_of(bartrv):
    if isinstance(bartrv, list):
        if not all(len(rv.shape) == 1 for rv in bartrv):
            raise ValueError("List inputs must contain only 1D BART variables")
        trees = [rv.all_trees for rv in bartrv]
        if any(t is None for t in trees):
            raise ValueError("BART variable has no sampled trees; run sample() first")
        return trees
    if bartrv.all_trees is None:
        raise ValueError("BART variable has no sampled trees; run sample() first")
    return bartrv.all_trees


def _create_figure_axes(bartrv, var_idx, grid="long", sharey=True,
                        figsize=None, ax=None):
    import matplotlib.pyplot as plt  # noqa: F401

    shape = _bart_shape(bartrv)
    n_plots = len(var_idx) * shape
    if ax is None:
        fig, axes = _get_axes(grid, n_plots, False, sharey, figsize)
    elif isinstance(ax, np.ndarray):
        axes = ax
        fig = ax[0].get_figure()
    else:
        axes = [ax]
        fig = ax.get_figure()
    return fig, axes, shape


def _prepare_plot_data(X, Y=None, xs_interval="quantiles", xs_values=None,
                       var_idx=None, var_discrete=None):
    """Labels, defaults, and variable index bookkeeping
    (reference ``utils.py:548-638``)."""
    if xs_interval not in ("insample", "linear", "quantiles"):
        raise ValueError(
            f"{xs_interval} is not supported. Available options are "
            "'insample', 'linear' or 'quantiles'"
        )

    if hasattr(X, "columns") and hasattr(X, "to_numpy"):
        x_names = list(X.columns)
        X = X.to_numpy()
    else:
        x_names = []
    X = np.asarray(X, np.float64)

    if Y is not None and hasattr(Y, "name"):
        y_label = f"Partial {Y.name}"
    else:
        y_label = "Partial Y"

    indices = list(range(X.shape[1]))
    if var_idx is None:
        var_idx = indices
    if var_discrete is None:
        var_discrete = []

    if x_names:
        x_labels = {idx: x_names[idx] for idx in var_idx}
    else:
        x_labels = {idx: f"X_{idx}" for idx in var_idx}

    if xs_interval == "linear" and xs_values is None:
        xs_values = 10
    if xs_interval == "quantiles" and xs_values is None:
        xs_values = [0.05, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.95]

    return (X, x_labels, y_label, indices, var_idx, var_discrete,
            xs_interval, xs_values)


def _create_pdp_data(X, xs_interval, xs_values=None) -> np.ndarray:
    """Evaluation grid (reference ``utils.py:641-673``): in-sample rows,
    an evenly spaced grid, or per-column quantiles."""
    if xs_interval == "insample":
        return X
    if xs_interval == "linear" and isinstance(xs_values, int):
        min_vals = np.nanmin(X, axis=0)
        max_vals = np.nanmax(X, axis=0)
        return np.linspace(min_vals, max_vals, num=xs_values, axis=0)
    if xs_interval == "quantiles" and isinstance(xs_values, list):
        return np.nanquantile(X, q=xs_values, axis=0)
    raise ValueError(f"invalid xs_interval/xs_values: {xs_interval}/{xs_values}")


def _smooth_mean(new_x, p_di, kind="neutral", smooth_kwargs=None):
    """Linear interpolation onto a 200-point grid + Savitzky-Golay filter
    (reference ``utils.py:676-716``)."""
    from scipy.interpolate import griddata
    from scipy.signal import savgol_filter

    smooth_kwargs = dict(smooth_kwargs or {})
    smooth_kwargs.setdefault("window_length", 55)
    smooth_kwargs.setdefault("polyorder", 2)
    x_data = np.linspace(np.nanmin(new_x), np.nanmax(new_x), 200)
    x_data[0] = (x_data[0] + x_data[1]) / 2
    if kind == "neutral":
        interp = griddata(new_x, p_di, x_data)
    elif kind == "pdp":
        interp = griddata(new_x, p_di.mean(0), x_data)
    else:
        interp = griddata(new_x, p_di.T, x_data)
    y_data = savgol_filter(interp, axis=0, **smooth_kwargs)
    return x_data, y_data


def _plot_hdi(x, y, smooth, color, alpha, smooth_kwargs, ax):
    x = np.asarray(x)
    y = np.asarray(y)
    hdi_data = hdi(y, DEFAULT_CI_PROB, axis=0)
    if smooth:
        x_data, y_data = _smooth_mean(x, hdi_data, smooth_kwargs=smooth_kwargs)
    else:
        idx = np.argsort(x)
        x_data = x[idx]
        y_data = hdi_data[idx]
    ax.fill_between(x_data, y_data[:, 0], y_data[:, 1], color=color, alpha=alpha)
    return ax


def plot_convergence(idata, var_name=None, kind="ecdf", figsize=None, ax=None):
    """Deprecated in the reference (reference ``utils.py:99-131``) — kept
    for API parity; warns and does nothing."""
    warnings.warn(
        "This function has been deprecated. "
        "Use a dedicated convergence-diagnostics plot instead.",
        FutureWarning,
    )


def plot_pdp(
    bartrv,
    X,
    Y=None,
    xs_interval: str = "quantiles",
    xs_values=None,
    var_idx=None,
    var_discrete=None,
    func: Optional[Callable] = None,
    samples: int = 200,
    ref_line: bool = True,
    random_seed: Optional[int] = None,
    sharey: bool = True,
    smooth: bool = True,
    grid: str = "long",
    color="C0",
    color_mean: str = "C0",
    alpha: float = 0.1,
    figsize=None,
    smooth_kwargs: Optional[Dict[str, Any]] = None,
    ax=None,
):
    """Partial dependence plot (reference ``utils.py:278-450``)."""
    all_trees = _all_trees_of(bartrv)
    rng = np.random.default_rng(random_seed)
    func = func or _identity

    (X, x_labels, y_label, indices, var_idx, var_discrete, xs_interval,
     xs_values) = _prepare_plot_data(X, Y, xs_interval, xs_values, var_idx,
                                     var_discrete)

    fig, axes, shape = _create_figure_axes(bartrv, var_idx, grid, sharey,
                                           figsize, ax)

    count = 0
    fake_X = _create_pdp_data(X, xs_interval, xs_values)
    null_pd = []
    for var in var_idx:
        excluded = indices[:]
        excluded.remove(var)
        p_d = func(sample_posterior(all_trees, fake_X, rng=rng, size=samples,
                                    excluded=excluded))
        new_x = fake_X[:, var]
        for s_i in range(shape):
            p_di = p_d[:, :, s_i]
            null_pd.append(p_di.mean())
            if var in var_discrete:
                _, idx_uni = np.unique(new_x, return_index=True)
                y_means = p_di.mean(0)[idx_uni]
                hdi_vals = hdi(p_di, prob=DEFAULT_CI_PROB, axis=0)[idx_uni]
                axes[count].errorbar(
                    new_x[idx_uni], y_means,
                    (y_means - hdi_vals[:, 0], hdi_vals[:, 1] - y_means),
                    fmt=".", color=color,
                )
                axes[count].set_xticks(new_x[idx_uni])
            else:
                _plot_hdi(new_x, p_di, smooth=smooth, alpha=alpha, color=color,
                          smooth_kwargs=smooth_kwargs, ax=axes[count])
                if smooth:
                    x_data, y_data = _smooth_mean(new_x, p_di, "pdp",
                                                  smooth_kwargs)
                    axes[count].plot(x_data, y_data, color=color_mean)
                else:
                    axes[count].plot(new_x, p_di.mean(0), color=color_mean)
            axes[count].set_xlabel(x_labels[var])
            count += 1

    if ref_line:
        ref_val = sum(null_pd) / len(null_pd)
        for ax_ in np.ravel(axes):
            ax_.axhline(ref_val, color="0.7", linestyle="--")

    fig.text(-0.05, 0.5, y_label, va="center", rotation="vertical", fontsize=15)
    return axes


def plot_ice(
    bartrv,
    X,
    Y=None,
    var_idx=None,
    var_discrete=None,
    func: Optional[Callable] = None,
    centered: bool = True,
    samples: int = 100,
    instances: int = 30,
    random_seed: Optional[int] = None,
    sharey: bool = True,
    smooth: bool = True,
    grid: str = "long",
    color="C0",
    color_mean: str = "C0",
    alpha: float = 0.1,
    figsize=None,
    smooth_kwargs: Optional[Dict[str, Any]] = None,
    ax=None,
):
    """Individual conditional expectation plot (reference
    ``utils.py:134-275``): pin all-but-one covariate to each of
    ``instances`` random rows and trace the response over the remaining
    one."""
    all_trees = _all_trees_of(bartrv)
    rng = np.random.default_rng(random_seed)
    func = func or _identity

    (X, x_labels, y_label, indices, var_idx, var_discrete, _, _) = (
        _prepare_plot_data(X, Y, "linear", None, var_idx, var_discrete)
    )

    fig, axes, shape = _create_figure_axes(bartrv, var_idx, grid, sharey,
                                           figsize, ax)

    instances_ary = rng.choice(range(X.shape[0]), replace=False, size=instances)
    idx_s = list(range(X.shape[0]))

    count = 0
    for var in var_idx:
        indices_mi = indices[:]
        indices_mi.remove(var)
        y_pred = []
        for instance in instances_ary:
            fake_X = X[idx_s]
            fake_X[:, indices_mi] = X[:, indices_mi][instance]
            y_pred.append(
                np.mean(sample_posterior(all_trees, fake_X, rng=rng,
                                         size=samples), 0)
            )
        new_x = fake_X[:, var]
        p_d = func(np.array(y_pred))

        for s_i in range(shape):
            if centered:
                p_di = p_d[:, :, s_i] - p_d[:, :, s_i][:, 0][:, None]
            else:
                p_di = p_d[:, :, s_i]
            if var in var_discrete:
                axes[count].plot(new_x, p_di.mean(0), "o", color=color_mean)
                axes[count].plot(new_x, p_di.T, ".", color=color, alpha=alpha)
            elif smooth:
                x_data, y_data = _smooth_mean(new_x, p_di, "ice", smooth_kwargs)
                axes[count].plot(x_data, y_data.mean(1), color=color_mean)
                axes[count].plot(x_data, y_data, color=color, alpha=alpha)
            else:
                idx = np.argsort(new_x)
                axes[count].plot(new_x[idx], p_di.mean(0)[idx], color=color_mean)
                axes[count].plot(new_x[idx], p_di.T[idx], color=color,
                                 alpha=alpha)
            axes[count].set_xlabel(x_labels[var])
            count += 1

    fig.text(-0.05, 0.5, y_label, va="center", rotation="vertical", fontsize=15)
    return axes
