"""Model-layer contracts mirrored from the reference test suite.

* ``test_bart_moment`` — support point and finite initial logp
  (reference ``tests/test_bart.py:126-137``): with Y = 0 the BART
  variable's initial value is the zero vector, and the joint log
  density at the initial point is finite (BART itself contributes
  logp = 0; reference ``bart.py:170-182``).
* ``test_split_rule_classes`` — the class-valued split-rule API
  (reference exports ContinuousSplitRule / OneHotSplitRule /
  SubsetSplitRule, ``docs/api_reference.rst:16``).
"""

import numpy as np
import jax.numpy as jnp

import pymc_bart_tpu as pmb


def test_bart_moment():
    X = np.linspace(0, 1, 50).reshape(50, 1)
    Y = np.zeros(50)
    with pmb.Model() as model:
        mu = pmb.BART("mu", X, Y, m=5)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)

    point = model.initial_point()
    np.testing.assert_allclose(point["mu"], np.zeros(50))
    assert point["mu"].shape == (50,)

    from pymc_bart_tpu.sampler.compound import CompiledModel

    compiled = CompiledModel(model)
    theta0 = compiled.initial_theta()
    lp = compiled.logdensity(jnp.asarray(theta0),
                             {"mu": jnp.zeros((50, 1), jnp.float32)})
    assert np.isfinite(float(lp))


def test_bart_moment_multioutput():
    X = np.linspace(0, 1, 30).reshape(30, 1)
    Y = np.zeros(30)
    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=4, shape=(2, 30))
    assert mu.shape == (2, 30)
    point_val = np.full((2, 30), float(np.mean(Y)))
    np.testing.assert_allclose(point_val, 0.0)


def test_split_rule_classes():
    rng = np.random.default_rng(0)
    X = np.column_stack([
        rng.uniform(size=40),
        rng.integers(0, 2, size=40).astype(float),
        rng.integers(0, 4, size=40).astype(float),
    ])
    Y = rng.normal(size=40)
    with pmb.Model():
        mu = pmb.BART(
            "mu", X, Y, m=3,
            split_rules=[pmb.ContinuousSplitRule, pmb.OneHotSplitRule,
                         pmb.SubsetSplitRule])
    np.testing.assert_array_equal(mu.rules_array(), [0, 1, 2])

    # strings and instances are accepted interchangeably
    with pmb.Model():
        mu2 = pmb.BART(
            "mu", X, Y, m=3,
            split_rules=["ContinuousSplit", pmb.OneHotSplitRule(), 2])
    np.testing.assert_array_equal(mu2.rules_array(), [0, 1, 2])


def test_jitter_duplicate_split_values():
    """A fully tied continuous column can never split without jitter
    (every proposed split leaves the right child empty); with the
    setup-time duplicate jitter (reference CHANGELOG.md:296-299) it can.
    """
    rng = np.random.default_rng(8)
    n = 80
    X = np.ones((n, 1), np.float32)  # all values tied
    Y = rng.normal(size=n).astype(np.float32)

    def run(jitter):
        with pmb.Model():
            pmb.BART("mu", X, Y, m=3, max_depth=2)
            sigma = pmb.HalfNormal("sigma", 1.0)
            pmb.Normal("y", pmb.Model.get_context()["mu"], sigma,
                       observed=Y)
            idata = pmb.sample(tune=30, draws=30, chains=1, random_seed=9,
                               jitter_duplicates=jitter)
        return int(np.asarray(
            idata["sample_stats"]["variable_inclusion"].values).sum())

    assert run(False) == 0
    assert run(True) > 0
