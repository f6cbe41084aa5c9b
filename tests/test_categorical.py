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


def test_subset_split_rule_many_categories():
    """40+ categories: the hash-salted subset rule has no category bound
    (round-3 VERDICT item 7 — the old bitmask silently clamped at 31;
    reference SubsetSplitRule has no such bound).  A non-ordinal grouping
    over 48 categories must be recoverable, and stored-forest predictions
    must replay the training routing (native C++ core cross-check runs in
    tests/test_native_core.py)."""
    rng = np.random.default_rng(7)
    n = 400
    cats = rng.integers(0, 48, size=n)
    group = (cats % 3 == 0).astype(float)  # {0,3,6,...,45} vs the rest
    X = np.stack([cats.astype(float), rng.uniform(size=n)], axis=1)
    Y = 5.0 * group + rng.normal(0, 0.3, n)

    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=10,
                      split_rules=["SubsetSplit", "ContinuousSplit"])
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=200, draws=150, chains=1, random_seed=42)

    fhat = idata.posterior["mu"].values.mean(axis=(0, 1))
    hi = fhat[group == 1].mean()
    lo = fhat[group == 0].mean()
    assert hi - lo > 3.0, (hi, lo)
    # high categories (>31, silently clamped before) are discriminated
    hi_cats = cats > 31
    if hi_cats.any():
        hi_gap = (fhat[hi_cats & (group == 1)].mean()
                  - fhat[hi_cats & (group == 0)].mean())
        assert hi_gap > 3.0, hi_gap
    # out-of-sample replay through the stored forests matches training
    from pymc_bart_tpu.utils.posterior import sample_posterior

    brv = idata._model.bart_rvs[0]
    preds = sample_posterior(brv.all_trees, X, size=20,
                             rng=np.random.default_rng(0))
    assert np.sqrt(np.mean((preds.mean(axis=0)[:, 0] - fhat) ** 2)) < 1.0
