"""Out-of-sample prediction via mutable Data containers (the reference's
pm.Data/set_data contract; tests/test_bart.py:84-104).

Run: python examples/out_of_sample.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import pymc_bart_tpu as pmb


def main():
    rng = np.random.default_rng(0)
    n = 200
    X = rng.uniform(-2, 2, size=(n, 3))
    f = np.sin(X[:, 0]) * 3 + X[:, 1] ** 2
    Y = f + rng.normal(0, 0.3, n)

    X_test = rng.uniform(-2, 2, size=(50, 3))
    f_test = np.sin(X_test[:, 0]) * 3 + X_test[:, 1] ** 2

    with pmb.Model() as model:
        xd = pmb.Data("xd", X)
        mu = pmb.BART("mu", xd, Y, m=30)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=300, draws=300, chains=2, random_seed=0)

        pmb.set_data({"xd": X_test})
        ppc = pmb.sample_posterior_predictive(
            idata, sample_vars=["mu", "y"], extend_inferencedata=False)

    mu_test = ppc.posterior_predictive["mu"].values.mean(axis=(0, 1))
    rmse = np.sqrt(np.mean((mu_test - f_test) ** 2))
    print(f"out-of-sample RMSE: {rmse:.3f} (noise sd 0.3)")


if __name__ == "__main__":
    main()
