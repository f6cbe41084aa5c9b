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


def _synth_idata(shift_first_chain=0.0, k=200, seed=4):
    from pymc_bart_tpu.models.inference_data import (DataArray, Dataset,
                                                     InferenceData)

    rng = np.random.default_rng(seed)
    mu = rng.normal(size=(4, 300, k))
    mu[0] += shift_first_chain
    sigma = rng.normal(size=(4, 300))
    return InferenceData(posterior=Dataset({
        "mu": DataArray(mu, ["chain", "draw", "mu_dim_0"], name="mu"),
        "sigma": DataArray(sigma, ["chain", "draw"], name="sigma"),
    }))


def test_check_convergence_subsamples_and_passes_iid():
    from pymc_bart_tpu.utils.diagnostics import check_convergence

    rhats = check_convergence(_synth_idata(), max_slices=16)
    assert set(rhats) == {"mu", "sigma"}
    assert all(v < 1.1 for v in rhats.values()), rhats


def test_maybe_warn_convergence_flags_stuck_chain():
    import warnings

    from pymc_bart_tpu.utils.diagnostics import maybe_warn_convergence

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rhats = maybe_warn_convergence(_synth_idata(shift_first_chain=5.0))
    assert rhats["mu"] > 1.2
    assert any("split-R-hat" in str(w.message) for w in rec)

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        maybe_warn_convergence(_synth_idata())
    assert not [w for w in rec if "split-R-hat" in str(w.message)]
