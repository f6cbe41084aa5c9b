"""End-to-end sampling tests through the full model surface.

Mirrors the reference's integration-test oracles (reference
tests/test_bart.py): signal recovery via variable inclusion, NaN rows,
shapes/dims, multi-output, compound HMC step for sigma.
"""

import numpy as np
import pytest

import pymc_bart_tpu as pmb


def test_bart_vi_signal_recovery():
    # reference test_bart_vi (tests/test_bart.py:44-64): plant signal in
    # column 0; decoded normalized inclusion puts > 50% mass on it.
    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, size=(250, 3))
    Y = rng.normal(0, 1, size=250)
    X[:, 0] = rng.normal(Y, 0.1)

    with pmb.Model() as model:
        mu = pmb.BART("mu", X, Y, m=10)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=150, draws=150, chains=2, random_seed=3415)

    vi = idata["sample_stats"]["variable_inclusion"].values  # (c, d, 1, 3)
    var_imp = vi.sum(axis=(0, 1))[0].astype(float)
    var_imp = var_imp / var_imp.sum()
    assert var_imp[0] > var_imp[1:].sum(), var_imp
    np.testing.assert_almost_equal(var_imp.sum(), 1.0)
    # posterior mu shape
    assert idata.posterior["mu"].shape == (2, 150, 250)
    # sigma sampled and positive
    s = idata.posterior["sigma"].values
    assert s.shape == (2, 150)
    assert (s > 0).all()
    # sigma should be near the true residual scale (0.1 noise on col 0
    # means mu can fit Y closely; just check it's within a sane range)
    assert 0.01 < s.mean() < 1.5


def test_missing_data_runs():
    rng = np.random.default_rng(1)
    X = rng.normal(0, 1, size=(50, 2))
    Y = rng.normal(0, 1, size=50)
    X[10:20, 0] = np.nan

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=10)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=50, draws=50, chains=1, random_seed=3415)
    assert np.isfinite(idata.posterior["mu"].values).all()


def test_multi_output_shape():
    # reference test_shape (tests/test_bart.py:107-123)
    rng = np.random.default_rng(2)
    X = rng.normal(0, 1, size=(250, 3))
    Y = rng.normal(0, 1, size=250)

    with pmb.Model():
        w = pmb.BART("w", X, Y, m=2, shape=(2, 250))
        pmb.Normal("y", w[0], pmb.math.abs(w[1]), observed=Y)
        idata = pmb.sample(tune=20, draws=10, chains=1, random_seed=3415)

    assert idata.posterior["w"].shape == (1, 10, 2, 250)
    assert idata.posterior.coords["w_dim_0"].data.size == 2
    assert idata.posterior.coords["w_dim_1"].data.size == 250


def test_multiple_bart_variables():
    # reference test_multiple_bart_variables (tests/test_bart.py:167-208)
    rng = np.random.default_rng(3)
    X1 = rng.normal(0, 1, size=(50, 2))
    X2 = rng.normal(0, 1, size=(50, 3))
    Y1 = X1[:, 0] + rng.normal(0, 0.1, size=50)
    Y2 = X2[:, 0] + X2[:, 1] + rng.normal(0, 0.1, size=50)
    Y = rng.normal(0, 1, size=50)

    with pmb.Model() as model:
        mu1 = pmb.BART("mu1", X1, Y1, m=5)
        mu2 = pmb.BART("mu2", X2, Y2, m=5)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu1 + mu2, sigma, observed=Y)
        idata = pmb.sample(tune=40, draws=40, chains=1, random_seed=3415)

    assert mu1.all_trees is not None
    assert mu2.all_trees is not None
    assert mu1.all_trees is not mu2.all_trees
    assert idata.posterior["mu1"].shape == (1, 40, 50)
    assert idata.posterior["mu2"].shape == (1, 40, 50)
    # vi stat has a leading dim per BART variable, padded to max p
    assert idata["sample_stats"]["variable_inclusion"].shape == (1, 40, 2, 3)

    # reference tests/test_bart.py:200-208: VI compute and inclusion with
    # model=/bart_var_name= disambiguation
    vi_results = pmb.compute_variable_importance(idata, mu1, X1, model=model)
    assert vi_results["labels"].shape == (2,)
    assert vi_results["preds"].shape == (2, 50, 50)
    assert vi_results["preds_all"].shape == (50, 50)

    vi_tuple = pmb.get_variable_inclusion(idata, X1, model=model,
                                          bart_var_name="mu1")
    assert vi_tuple[0].shape == (2,)
    assert len(vi_tuple[1]) == 2
    assert isinstance(vi_tuple[1][0], str)


def test_manual_pgbart_step():
    # reference test_multiple_bart_variables_manual_step (tests/test_bart.py:211-241)
    rng = np.random.default_rng(4)
    X1 = rng.normal(0, 1, size=(30, 2))
    Y1 = X1[:, 0] + rng.normal(0, 0.1, size=30)
    Y = rng.normal(0, 1, size=30)

    with pmb.Model():
        mu1 = pmb.BART("mu1", X1, Y1, m=3)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu1, sigma, observed=Y)
        step1 = pmb.PGBART([mu1], num_particles=5)
        idata = pmb.sample(tune=20, draws=20, chains=1, step=[step1],
                           random_seed=3415)
    assert idata.posterior["mu1"].shape == (1, 20, 30)


def test_named_dims_and_data():
    # reference test_mutable_named_dim (tests/test_bart.py:244-256)
    rng = np.random.default_rng(0)
    N = 50
    X = rng.normal(size=(N, 2))
    Y = rng.normal(size=N)

    with pmb.Model(coords={"obs": np.arange(N), "feature": ["a", "b"]}) as model:
        x = pmb.Data("x", X, dims=("obs", "feature"))
        mu = pmb.BART("mu", X=x, Y=Y, m=10, dims="obs")
        pmb.Normal("y", mu=mu, sigma=1.0, observed=Y, dims="obs")
        idata = pmb.sample(tune=20, draws=20, chains=1, random_seed=7)
    assert idata.posterior["mu"].shape == (1, 20, 50)
