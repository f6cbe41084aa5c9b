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
