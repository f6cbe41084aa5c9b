"""Cross-check the C++ host predictor against the JAX kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from pymc_bart_tpu import native
from pymc_bart_tpu.ops import Forest, forest_predict, forest_predict_excluded

from test_trees_predict import random_forest


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_matches_jax(lib):
    rng = np.random.default_rng(7)
    m, D, k, p, n = 4, 4, 2, 5, 50
    sv, sl, ss, leaf, count = random_forest(rng, m, D, k, p)
    slope = rng.normal(scale=0.1, size=leaf.shape).astype(np.float32)
    X = rng.normal(size=(n, p)).astype(np.float32)
    X[0, 0] = np.nan  # NaN routing must agree too
    rules = np.zeros(p, np.int32)

    forest = Forest(*map(jnp.asarray, (sv, sl, ss, leaf, count, slope)))
    want = np.asarray(forest_predict(forest, jnp.asarray(X), jnp.asarray(rules)))

    got = native.forest_predict_native(
        sv[None], sl[None], ss[None], leaf[None], count[None], slope[None],
        X, rules)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)


def test_native_excluded_matches_jax(lib):
    rng = np.random.default_rng(8)
    m, D, k, p, n = 3, 4, 1, 5, 30
    sv, sl, ss, leaf, count = random_forest(rng, m, D, k, p)
    slope = np.zeros_like(leaf)
    X = rng.normal(size=(n, p)).astype(np.float32)
    rules = np.zeros(p, np.int32)
    excluded = [1, 4]
    mask = np.zeros(p, bool)
    mask[excluded] = True

    forest = Forest(*map(jnp.asarray, (sv, sl, ss, leaf, count, slope)))
    want = np.asarray(forest_predict_excluded(
        forest, jnp.asarray(X), jnp.asarray(rules), jnp.asarray(mask)))
    got = native.forest_predict_native(
        sv[None], sl[None], ss[None], leaf[None], count[None], slope[None],
        X, rules, excluded=excluded)
    np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-4)
