"""End-to-end statistical validation of ``response="linear"/"mix"``.

The reference parametrizes its signal-recovery VI oracle and its NaN
test over ``response in {constant, linear}`` (reference
tests/test_bart.py:45-49 and :68-72).  Round 2 implemented linear/mix
(sampler/pgbart.py linear leaf fits, ops/trees.py slope arrays) but
never sampled them end-to-end; these tests close that gap, plus a
linear-data oracle the reference lacks: with one tree, the linear leaf
response must beat the constant response at equal budget.
"""

import numpy as np
import pytest

import pymc_bart_tpu as pmb


@pytest.mark.parametrize("response", ["linear", "mix"])
def test_vi_signal_recovery_response(response):
    # reference test_bart_vi parametrization (tests/test_bart.py:45-64)
    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, size=(200, 3))
    Y = rng.normal(0, 1, size=200)
    X[:, 0] = rng.normal(Y, 0.1)

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=10, response=response)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=120, draws=120, chains=1, random_seed=3415)

    vi = idata["sample_stats"]["variable_inclusion"].values
    var_imp = vi.sum(axis=(0, 1))[0].astype(float)
    var_imp = var_imp / var_imp.sum()
    assert var_imp[0] > var_imp[1:].sum(), var_imp
    assert np.isfinite(idata.posterior["mu"].values).all()


def test_missing_data_linear():
    # reference test_missing_data over response (tests/test_bart.py:67-81)
    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, size=(50, 2))
    Y = rng.normal(0, 1, size=50)
    X[10:20, 0] = np.nan

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=10, response="linear")
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=50, draws=50, chains=1, random_seed=3415)
    assert np.isfinite(idata.posterior["mu"].values).all()


def test_linear_beats_constant_on_linear_data():
    """One-tree oracle: data y = a*x + noise; at equal (tiny) budget the
    linear leaf response must fit better than the constant response,
    whose single tree can only produce a step function."""
    rng = np.random.default_rng(2)
    n = 120
    X = rng.uniform(-1, 1, size=(n, 1))
    f = 2.5 * X[:, 0]
    Y = f + 0.1 * rng.normal(size=n)

    rmse = {}
    for response in ("constant", "linear"):
        with pmb.Model():
            mu = pmb.BART("mu", X, Y, m=1, response=response)
            pmb.Normal("y", mu, 0.1, observed=Y)
            idata = pmb.sample(tune=100, draws=100, chains=1,
                               random_seed=7, num_particles=10,
                               batch=(1.0, 1.0))
        mu_hat = idata.posterior["mu"].values.mean(axis=(0, 1))
        rmse[response] = float(np.sqrt(np.mean((mu_hat - f) ** 2)))
    assert rmse["linear"] < rmse["constant"], rmse
