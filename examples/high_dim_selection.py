"""High-dimensional variable selection (BASELINE config 5).

Sparse signal in p=1000 covariates: only the first 5 columns matter.  A
split prior up-weighting nothing a priori, PGBART's tuning-phase
split-prior adaptation, and the variable-inclusion statistic recover the
active set; PDP plots then show the per-variable effects.

Run: python examples/high_dim_selection.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import pymc_bart_tpu as pmb


def main():
    rng = np.random.default_rng(7)
    n, p, k_active = 400, 1000, 5
    X = rng.uniform(size=(n, p))
    f_true = (
        10 * np.sin(np.pi * X[:, 0] * X[:, 1])
        + 20 * (X[:, 2] - 0.5) ** 2
        + 10 * X[:, 3]
        + 5 * X[:, 4]
    )
    Y = f_true + rng.normal(0, 1.0, n)

    with pmb.Model() as model:
        mu = pmb.BART("mu", X, Y, m=50)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=300, draws=300, chains=2, random_seed=0,
                           progressbar=True)

    vi_norm, labels = pmb.get_variable_inclusion(idata, X)
    cols = np.array([int(str(lbl).split("_")[-1]) for lbl in labels])
    print("top-5 variables by inclusion:", sorted(cols[:k_active].tolist()))
    print("inclusion mass on the 5 active columns:",
          float(np.asarray(vi_norm)[cols < k_active].sum()))

    # NOTE: compute_variable_importance on the full p=1000 grid would
    # evaluate ~1000 submodels (hours) — at this dimensionality the
    # screening workflow is inclusion ranking (above) followed by
    # refitting a small model on the selected columns; see
    # examples/friedman_regression.py for the submodel-R^2 path on a
    # low-dimensional problem.

    import matplotlib

    matplotlib.use("Agg")
    pmb.plot_pdp(mu, X=X, Y=Y, var_idx=list(range(k_active)))
    pmb.plot_ice(mu, X=X, Y=Y, var_idx=[0, 3])
    print("PDP/ICE rendered for the active columns")


if __name__ == "__main__":
    main()
