"""ESS / R-hat diagnostics sanity checks on synthetic chains."""

import numpy as np

from pymc_bart_tpu.utils.diagnostics import ess_bulk, rhat


def test_rhat_iid_near_one():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 500))
    r = rhat(x)
    assert 0.99 < r < 1.02, r


def test_rhat_detects_divergent_chains():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 500))
    x[0] += 5.0  # one chain stuck elsewhere
    assert rhat(x) > 1.2


def test_ess_iid_close_to_n():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 500))
    e = ess_bulk(x)
    assert e > 1000, e  # ~2000 nominal


def test_ess_autocorrelated_much_smaller():
    rng = np.random.default_rng(3)
    c, d = 4, 1000
    x = np.zeros((c, d))
    for i in range(c):
        for t in range(1, d):
            x[i, t] = 0.95 * x[i, t - 1] + rng.normal() * 0.1
    e = ess_bulk(x)
    assert e < 0.25 * c * d, e
