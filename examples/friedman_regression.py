"""Gaussian BART regression on the Friedman-5 benchmark (BASELINE config 1).

Run: python examples/friedman_regression.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import pymc_bart_tpu as pmb


def main():
    rng = np.random.default_rng(0)
    n, p = 500, 10
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
        idata = pmb.sample(tune=300, draws=300, chains=4, random_seed=0,
                           progressbar=True)

    fhat = idata.posterior["mu"].values.mean(axis=(0, 1))
    rmse = np.sqrt(np.mean((fhat - f_true) ** 2))
    print(f"RMSE vs true function: {rmse:.3f} (noise sd 1.0)")
    print(f"sigma posterior mean:  {idata.posterior['sigma'].values.mean():.3f}")

    vi_norm, labels = pmb.get_variable_inclusion(idata, X)
    print("variable inclusion (sorted):",
          dict(zip(labels[:5], vi_norm[:5].round(3))))


if __name__ == "__main__":
    main()
