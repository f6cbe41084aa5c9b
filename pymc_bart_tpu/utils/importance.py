"""Variable inclusion and variable importance (reference parity layer).

Re-implements the reference's variable-selection toolkit (reference
``pymc_bart/utils.py:719-1311``: get_variable_inclusion,
plot_variable_inclusion, compute_variable_importance, vi_to_kulprit,
plot_variable_importance, plot_scatter_submodels) on top of the fused
posterior-prediction kernel.  Submodel evaluation — predicting with the
complement of a variable subset excluded and scoring squared-Pearson R^2
against the full model — runs through ``sample_posterior`` which
integrates excluded covariates out by row-count weighting on device.

The inclusion statistic itself is stored natively as int arrays (chain,
draw, bart_var, covariate); the reference's base64-varint string format
(produced by its native sampler) is also accepted and decoded.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Union

import numpy as np

from .codec import decode_vi
from .posterior import sample_posterior
from .stats import DEFAULT_CI_PROB, hdi, pearsonr2


def _vi_draw_counts(idata, n_vars: int, model=None, bart_var_name=None,
                    bart_var_names: Optional[Sequence[str]] = None) -> np.ndarray:
    """Per-draw inclusion count matrix (n_total_draws, n_vars)."""
    da = idata["sample_stats"]["variable_inclusion"]
    vals = np.asarray(getattr(da, "values", da))
    if vals.dtype.kind in "OUS":  # reference string wire format
        flat = vals.ravel()
        return np.array([decode_vi(str(s), n_vars) for s in flat])
    if vals.ndim == 4:
        n_bart = vals.shape[2]
        if n_bart > 1:
            if bart_var_names:
                names = [b.name for b in model.bart_rvs]
                total = np.zeros((vals.shape[0] * vals.shape[1], n_vars))
                for nm in bart_var_names:
                    index = names.index(nm)
                    sel = vals[:, :, index, :n_vars]
                    total += sel.reshape(-1, n_vars)
                return total
            if model is None or bart_var_name is None:
                raise ValueError(
                    "The InferenceData was generated from a model with "
                    "multiple BART variables, please provide the model and "
                    "the name of the BART variable for which you want to "
                    "compute the variable inclusion."
                )
            index = [b.name for b in model.bart_rvs].index(bart_var_name)
            vals = vals[:, :, index, :]
        else:
            vals = vals[:, :, 0, :]
    return vals.reshape(-1, vals.shape[-1])[:, :n_vars]


def get_variable_inclusion(idata, X, model=None, bart_var_name=None,
                           labels=None, to_kulprit: bool = False):
    """Normalized variable inclusion, sorted descending
    (reference ``utils.py:719-778``).

    Returns ``(VI_norm[indices], labels)`` or, with ``to_kulprit=True``,
    nested submodel variable-name paths for Kulprit's projection method.
    """
    n_vars = X.shape[1]
    counts = _vi_draw_counts(idata, n_vars, model, bart_var_name).sum(axis=0)
    total = counts.sum()
    vi_norm = counts / total if total > 0 else np.full(n_vars, 1.0 / n_vars)
    indices = np.argsort(vi_norm)[::-1]

    if hasattr(X, "columns") and hasattr(X, "to_numpy"):
        labels = list(np.asarray(X.columns)[indices])
    if labels is None:
        labels = [str(i) for i in indices]

    if to_kulprit:
        return [labels[:idx] for idx in range(n_vars + 1)]
    return vi_norm[indices], labels


def plot_variable_inclusion(idata, X, labels=None, figsize=None,
                            plot_kwargs=None, ax=None):
    """Plot normalized variable inclusion (reference ``utils.py:781-837``)."""
    import matplotlib.pyplot as plt

    plot_kwargs = plot_kwargs or {}
    vi_norm, labels = get_variable_inclusion(idata, X, labels=labels)
    n_vars = len(labels)
    new_labels = ["+ " + el if i != 0 else el for i, el in enumerate(labels)]
    ticks = np.arange(n_vars, dtype=int)

    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=figsize or (8, 3))
    ax.axhline(1 / n_vars, color="0.5", linestyle="--")
    ax.plot(
        vi_norm,
        color=plot_kwargs.get("color", "k"),
        marker=plot_kwargs.get("marker", "o"),
        ls=plot_kwargs.get("ls", "-"),
    )
    ax.set_xticks(ticks, new_labels, rotation=plot_kwargs.get("rotation", 0))
    ax.set_ylim(0, 1)
    return ax


def generate_sequences(n_vars, i_var, include):
    """All subsets formed by adding one variable to ``include``
    (reference ``utils.py:1305-1311``)."""
    if i_var:
        return [tuple(include + [i]) for i in range(n_vars) if i not in include]
    return [()]


def compute_variable_importance(  # noqa: PLR0915, PLR0912
    idata: Any,
    bartrv,
    X,
    model=None,
    method: str = "VI",
    fixed: int = 0,
    samples: int = 50,
    random_seed: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Estimate variable importance from the BART posterior
    (reference ``utils.py:840-1065``): rank variables (by inclusion counts
    or backward search) and score nested submodels by squared-Pearson R^2
    of their predictions against the full model's.
    """
    if method not in ("VI", "backward", "backward_VI"):
        raise ValueError("method must be 'VI', 'backward' or 'backward_VI'")

    rng = np.random.default_rng(random_seed)

    if isinstance(bartrv, list):
        if not all(len(rv.shape) == 1 for rv in bartrv):
            raise ValueError("List inputs must contain only 1D BART variables")
        all_trees: Union[list, Any] = [rv.all_trees for rv in bartrv]
        bart_var_names = [rv.name for rv in bartrv]
        shape = len(bartrv)
    else:
        all_trees = bartrv.all_trees
        bart_var_names = [bartrv.name]
        shape = 1 if len(bartrv.shape) == 1 else bartrv.config.n_outputs

    n_vars = X.shape[1]
    if hasattr(X, "columns") and hasattr(X, "to_numpy"):
        labels_all = np.asarray(X.columns)
        X = X.to_numpy()
    else:
        labels_all = np.arange(n_vars).astype(str)
    X = np.asarray(X, np.float64)
    n_rows = X.shape[0]

    r2_mean = np.zeros(n_vars)
    r2_hdi_ = np.zeros((n_vars, 2))
    preds = np.zeros((n_vars, samples, n_rows, shape))

    if method == "backward_VI":
        if fixed >= n_vars:
            raise ValueError("fixed must be less than the number of variables")
        if fixed < 1:
            raise ValueError("fixed must be greater than 0")
        init = fixed + 1
    else:
        fixed = 0
        init = 0

    predicted_all = sample_posterior(all_trees, X, rng=rng, size=samples,
                                     excluded=None)

    indices: List[int] = []
    if method in ("VI", "backward_VI"):
        counts = _vi_draw_counts(
            idata, n_vars, model,
            bart_var_names[0] if len(bart_var_names) == 1 else None,
            bart_var_names=bart_var_names if len(bart_var_names) > 1 else None,
        ).sum(axis=0)
        idxs = np.argsort(counts)
        subsets: List[Optional[List[int]]] = [
            list(idxs[:-i]) for i in range(1, len(idxs))
        ]
        subsets.append(None)
        if method == "backward_VI":
            subsets = subsets[-init:]
        indices = list(idxs[::-1])

        for pos, subset in enumerate(subsets):
            predicted_subset = sample_posterior(
                all_trees, X, rng=rng, size=samples, excluded=subset
            )
            r2 = np.array([
                pearsonr2(predicted_all[j], predicted_subset[j])
                for j in range(samples)
            ])
            r2_mean[pos] = r2.mean()
            r2_hdi_[pos] = hdi(r2, prob=DEFAULT_CI_PROB)
            preds[pos] = predicted_subset

    if method in ("backward", "backward_VI"):
        if method == "backward_VI":
            least_important_vars: List[int] = indices[-fixed:]
            r2_mean_vi = r2_mean[:init]
            r2_hdi_vi = r2_hdi_[:init]
            preds_vi = preds[:init]
            r2_mean = np.zeros(n_vars - fixed - 1)
            r2_hdi_ = np.zeros((n_vars - fixed - 1, 2))
            preds = np.zeros((n_vars - fixed - 1, samples, n_rows, shape))
        else:
            least_important_vars = []

        for i_var in range(init, n_vars):
            subsets_b = generate_sequences(n_vars, i_var, least_important_vars)
            max_r2 = -np.inf
            best = None
            for subset in subsets_b:
                predicted_subset = sample_posterior(
                    all_trees, X, rng=rng, size=samples, excluded=list(subset)
                )
                r2 = np.array([
                    pearsonr2(predicted_all[j], predicted_subset[j])
                    for j in range(samples)
                ])
                mean_r2 = float(r2.mean())
                if mean_r2 > max_r2:
                    max_r2 = mean_r2
                    best = (subset, r2, predicted_subset)
            subset, r2, predicted_subset = best
            r2_mean[i_var - init] = max_r2
            r2_hdi_[i_var - init] = hdi(r2, prob=DEFAULT_CI_PROB)
            preds[i_var - init] = predicted_subset
            for v in subset:
                if v not in least_important_vars:
                    least_important_vars.append(v)

        for v in range(n_vars):
            if v not in least_important_vars:
                least_important_vars.append(v)

        if method == "backward_VI":
            r2_mean = np.concatenate((r2_mean[::-1], r2_mean_vi))
            r2_hdi_ = np.concatenate((r2_hdi_[::-1], r2_hdi_vi))
            preds = np.concatenate((preds[::-1], preds_vi))
        else:
            r2_mean = r2_mean[::-1]
            r2_hdi_ = r2_hdi_[::-1]
            preds = preds[::-1]
        indices = least_important_vars[::-1]

    labels = np.array([
        "+ " + el if i != 0 else el
        for i, el in enumerate(np.asarray(labels_all)[indices])
    ])

    return {
        "indices": np.asarray(indices),
        "labels": labels,
        "r2_mean": r2_mean,
        "r2_hdi": r2_hdi_,
        "preds": preds.squeeze(),
        "preds_all": predicted_all.squeeze(),
    }


def vi_to_kulprit(vi_results: dict) -> List[List[str]]:
    """Export VI results as Kulprit submodel paths (reference
    ``utils.py:1068-1083``)."""
    clean = [label.strip("+ ") for label in vi_results["labels"]]
    return [clean[:idx] for idx in range(len(clean))]


def plot_variable_importance(vi_results: dict, submodels=None, labels=None,
                             figsize=None, plot_kwargs=None, ax=None):
    """Submodel R^2 errorbar plot with full-model reference band
    (reference ``utils.py:1086-1185``)."""
    import matplotlib.pyplot as plt

    if submodels is None:
        submodels = np.sort(vi_results["indices"])
    else:
        submodels = np.sort(submodels)

    indices = vi_results["indices"][submodels]
    r2_mean = vi_results["r2_mean"][submodels]
    r2_hdi_ = vi_results["r2_hdi"][submodels]
    preds = vi_results["preds"][submodels]
    preds_all = vi_results["preds_all"]
    samples = preds.shape[1]
    n_vars = len(indices)
    ticks = np.arange(n_vars, dtype=int)

    plot_kwargs = plot_kwargs or {}
    if ax is None:
        _, ax = plt.subplots(1, 1, figsize=figsize or (8, 3))
    if labels is None:
        labels = vi_results["labels"][submodels]

    r2_ref = np.array([
        pearsonr2(preds_all[j], preds_all[j + 1]) for j in range(samples - 1)
    ])
    yerr_min = np.clip(r2_mean - r2_hdi_[:, 0], 0, None)
    yerr_max = np.clip(r2_hdi_[:, 1] - r2_mean, 0, None)

    ax.errorbar(
        ticks, r2_mean, np.array((yerr_min, yerr_max)),
        color=plot_kwargs.get("color_r2", "k"),
        fmt=plot_kwargs.get("marker_r2", "o"),
        mfc=plot_kwargs.get("marker_fc_r2", "white"),
    )
    ax.axhline(
        np.mean(r2_ref),
        ls=plot_kwargs.get("ls_ref", "--"),
        color=plot_kwargs.get("color_ref", "grey"),
    )
    ax.fill_between(
        [-0.5, n_vars - 0.5],
        *hdi(r2_ref, prob=DEFAULT_CI_PROB),
        alpha=0.1,
        color=plot_kwargs.get("color_ref", "grey"),
    )
    ax.set_xticks(ticks, labels, rotation=plot_kwargs.get("rotation", 0))
    ax.set_ylabel("R²", rotation=0, labelpad=12)
    ax.set_ylim(0, 1)
    ax.set_xlim(-0.5, n_vars - 0.5)
    return ax


def plot_scatter_submodels(vi_results: dict, func=None, submodels=None,
                           grid: str = "long", labels=None, figsize=None,
                           plot_kwargs=None, ax=None):
    """Submodel vs full-model predicted-value scatter with 45-degree
    reference (reference ``utils.py:1188-1302``)."""
    from .plots import _get_axes

    if submodels is None:
        submodels = np.sort(vi_results["indices"])
    else:
        submodels = np.sort(submodels)

    indices = vi_results["indices"][submodels]
    preds_sub = vi_results["preds"][submodels]
    preds_all = vi_results["preds_all"]

    if labels is None:
        labels = vi_results["labels"][submodels]

    n_cats = None
    if preds_all.ndim > 2:
        n_cats = preds_all.shape[-1]
        indices = np.tile(indices, n_cats)

    if ax is None:
        _, ax = _get_axes(grid, len(indices), True, True, figsize)

    plot_kwargs = plot_kwargs or {}
    if func is not None:
        preds_sub = func(preds_sub)
        preds_all = func(preds_all)

    min_ = min(np.min(preds_sub), np.min(preds_all))
    max_ = max(np.max(preds_sub), np.max(preds_all))

    if n_cats is not None:
        i = 0
        for cat in range(n_cats):
            for pred_sub, x_label in zip(preds_sub, labels):
                ax[i].plot(
                    pred_sub[..., cat], preds_all[..., cat],
                    marker=plot_kwargs.get("marker_scatter", "."), ls="",
                    color=plot_kwargs.get("color_scatter", f"C{cat}"),
                    alpha=plot_kwargs.get("alpha_scatter", 0.1),
                )
                ax[i].set(xlabel=x_label, ylabel="ref model",
                          title=f"Category {cat}")
                ax[i].axline(
                    [min_, min_], [max_, max_],
                    color=plot_kwargs.get("color_ref", "0.5"),
                    ls=plot_kwargs.get("ls_ref", "--"),
                )
                i += 1
    else:
        for pred_sub, x_label, axi in zip(preds_sub, labels, np.ravel(ax)):
            axi.plot(
                pred_sub, preds_all,
                marker=plot_kwargs.get("marker_scatter", "."), ls="",
                color=plot_kwargs.get("color_scatter", "C0"),
                alpha=plot_kwargs.get("alpha_scatter", 0.1),
            )
            axi.set(xlabel=x_label, ylabel="ref model")
            axi.axline(
                [min_, min_], [max_, max_],
                color=plot_kwargs.get("color_ref", "0.5"),
                ls=plot_kwargs.get("ls_ref", "--"),
            )
    return ax
