"""Interpretability-suite tests against a single fitted model fixture,
mirroring reference tests/test_utils.py (class-level fixture, kwargs
matrices for pdp/ice, VI compute + plots + kulprit export, codec
round-trip)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import pymc_bart_tpu as pmb
from pymc_bart_tpu.utils import decode_vi, encode_vi, sample_posterior


class TestUtils:
    rng = np.random.default_rng(12345)
    X_norm = rng.normal(0, 1, size=(50, 2))
    X_binom = rng.binomial(1, 0.5, size=(50, 1))
    X = np.hstack([X_norm, X_binom])
    Y = rng.normal(0, 1, size=50)

    with pmb.Model() as model:
        mu = pmb.BART("mu", X, Y, m=10)
        sigma = pmb.HalfNormal("sigma", 1.0)
        y = pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=40, draws=40, chains=1, random_seed=3415)

    def test_sample_posterior(self):
        rng = np.random.default_rng(3)
        pred_all = sample_posterior(self.mu.all_trees, X=self.X, rng=rng,
                                    size=2)
        rng = np.random.default_rng(3)
        pred_first = sample_posterior(self.mu.all_trees, X=self.X[:10],
                                      rng=rng)
        # same seed -> same selected draws -> consistent on shared rows
        np.testing.assert_almost_equal(pred_first, pred_all[0, :10], decimal=4)
        assert pred_all.shape == (2, 50, 1)
        assert pred_first.shape == (10, 1)

    @pytest.mark.parametrize(
        "kwargs",
        [
            {},
            {"samples": 2, "var_discrete": [2]},
            {"instances": 2},
            {"var_idx": [0], "smooth": False, "color": "k"},
            {"grid": (1, 2), "sharey": False, "alpha": 0.5},
        ],
    )
    def test_ice(self, kwargs):
        pmb.plot_ice(self.mu, X=self.X, Y=self.Y, **kwargs)

    @pytest.mark.parametrize(
        "kwargs",
        [
            {},
            {"samples": 2, "xs_interval": "quantiles",
             "xs_values": [0.25, 0.5, 0.75], "var_discrete": [2]},
            {"xs_interval": "linear", "xs_values": 10},
            {"var_idx": [0], "smooth": False, "color": "k"},
            {"grid": (1, 2), "sharey": False, "alpha": 0.5},
        ],
    )
    def test_pdp(self, kwargs):
        pmb.plot_pdp(self.mu, X=self.X, Y=self.Y, **kwargs)

    @pytest.mark.parametrize(
        "kwargs",
        [
            {"samples": 50},
            {"samples": 50, "method": "VI"},
            {"samples": 10, "method": "backward"},
            {"samples": 10, "method": "backward_VI", "fixed": 1},
        ],
    )
    def test_vi(self, kwargs):
        vi_results = pmb.compute_variable_importance(
            self.idata, bartrv=self.mu, X=self.X, **kwargs
        )
        samples = kwargs["samples"]
        assert vi_results["preds"].shape == (3, samples, 50)
        assert vi_results["preds_all"].shape == (samples, 50)
        assert vi_results["r2_mean"].shape == (3,)
        pmb.plot_variable_importance(vi_results)
        pmb.plot_scatter_submodels(vi_results)
        paths = pmb.vi_to_kulprit(vi_results)
        assert len(paths) == 3
        assert paths[0] == []

    def test_get_variable_inclusion(self):
        vi_norm, labels = pmb.get_variable_inclusion(self.idata, self.X)
        assert vi_norm.shape == (3,)
        np.testing.assert_almost_equal(vi_norm.sum(), 1.0)
        assert len(labels) == 3
        assert isinstance(labels[0], str)
        paths = pmb.get_variable_inclusion(self.idata, self.X, to_kulprit=True)
        assert len(paths) == 4
        pmb.plot_variable_inclusion(self.idata, self.X)

    def test_pdp_pandas_labels(self):
        import pandas as pd

        Xdf = pd.DataFrame(self.X, columns=["norm1", "norm2", "binom"])
        axes = pmb.plot_pdp(self.mu, X=Xdf, Y=self.Y)
        assert axes[0].get_xlabel() == "norm1"

    def test_posterior_predictive(self):
        ppc = pmb.sample_posterior_predictive(self.idata, model=self.model,
                                              extend_inferencedata=False,
                                              random_seed=0)
        assert ppc.posterior_predictive["y"].shape == (1, 40, 50)


def test_encode_decode_roundtrip():
    # reference tests/test_utils.py:99-111 edge cases
    cases = [
        [0, 0, 0],
        [1, 2, 3],
        [127, 128, 129],
        [2**20, 0, 7],
        [16383, 16384, 16385],
        [],
    ]
    for vec in cases:
        enc = encode_vi(vec)
        dec = decode_vi(enc, len(vec))
        assert dec == vec, (vec, enc, dec)


def test_shared_variable_out_of_sample():
    # reference test_shared_variable (tests/test_bart.py:84-104)
    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, size=(50, 2))
    Y = rng.normal(0, 1, size=50)

    with pmb.Model() as model:
        data_X = pmb.Data("data_X", X)
        mu = pmb.BART("mu", data_X, Y, m=2)
        sigma = pmb.HalfNormal("sigma", 1.0)
        y = pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=30, draws=30, chains=2, random_seed=3415)
        ppc = pmb.sample_posterior_predictive(idata, extend_inferencedata=False,
                                              random_seed=0)
        pmb.set_data({"data_X": X[:3]})
        ppc2 = pmb.sample_posterior_predictive(
            idata, sample_vars=["mu", "y"], extend_inferencedata=False,
            random_seed=0)

    assert ppc.posterior_predictive["y"].shape == (2, 30, 50)
    assert ppc2.posterior_predictive["y"].shape == (2, 30, 3)
    assert ppc2.posterior_predictive["mu"].shape == (2, 30, 3)
