"""Categorical/softmax BART model — reference test_categorical_model
(tests/test_bart.py:140-164): 3-class recovery through a softmax link
with multi-output trees and per-column split rules."""

import numpy as np
import pytest

import pymc_bart_tpu as pmb


@pytest.mark.parametrize("split_rule", ["ContinuousSplit", "OneHotSplit"])
def test_categorical_model(split_rule):
    Y = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2])
    rng = np.random.default_rng(12345)
    X = np.concatenate([Y[:, None], rng.integers(0, 6, size=(9, 4))], axis=1)

    with pmb.Model() as model:
        lo = pmb.BART("logodds", X, Y, m=2, shape=(3, 9),
                      split_rules=[split_rule] * 5)
        y = pmb.Categorical("y", p=pmb.math.softmax(lo.T, axis=-1), observed=Y)
        idata = pmb.sample(tune=200, draws=200, chains=1, random_seed=3415,
                           batch=(1.0, 1.0))
        idata = pmb.sample_posterior_predictive(
            idata, predictions=True, extend_inferencedata=True, random_seed=3415
        )

    # Fit should be good enough that the right category is the posterior-
    # predictive median for every row (reference oracle).
    med = idata.predictions["y"].median(["chain", "draw"]).values
    assert (med == Y).all(), med

    vi = pmb.compute_variable_importance(idata, bartrv=lo, X=X)
    assert vi["preds"].shape == (5, 50, 9, 3)


def test_subset_split_rule():
    """SubsetSplit routes categories by random-subset membership — a
    non-ordinal grouping ({0,2,4} vs {1,3}) that a single rule can carve
    (reference SubsetSplitRule, docs/api_reference.rst:16)."""
    rng = np.random.default_rng(0)
    n = 150
    cats = rng.integers(0, 5, size=n)
    group = np.isin(cats, [0, 2, 4]).astype(float)
    X = np.stack([cats.astype(float), rng.uniform(size=n)], axis=1)
    Y = 5.0 * group + rng.normal(0, 0.3, n)

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=10,
                      split_rules=["SubsetSplit", "ContinuousSplit"])
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=150, draws=150, chains=1, random_seed=42)

    fhat = idata.posterior["mu"].values.mean(axis=(0, 1))
    # group means recovered: gap between the two category groups ~5
    gap = fhat[group == 1].mean() - fhat[group == 0].mean()
    assert gap > 3.0, gap
    # the categorical column should dominate inclusion
    vi_norm, labels = pmb.get_variable_inclusion(idata, X)
    assert labels[0] == "0", (vi_norm, labels)
