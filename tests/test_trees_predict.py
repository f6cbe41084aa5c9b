"""Kernel-level unit tests of the SoA tree tensors against a NumPy oracle.

The reference has no such tier (its tree internals are tested in the
external native crate); SURVEY section 4 calls for adding them here.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pymc_bart_tpu.config import RULE_CONTINUOUS, RULE_ONEHOT, RULE_SUBSET
from pymc_bart_tpu.ops import (
    Forest,
    forest_predict,
    forest_predict_excluded,
    init_forest,
    tree_leaf_index,
)


def oracle_decide_left(x, val, sset, rule):
    if np.isnan(x):
        return False
    if rule == RULE_CONTINUOUS:
        return bool(x <= val)
    if rule == RULE_ONEHOT:
        return bool(x == val)
    # hash-salted random subset (ops/trees.py subset_member): the stored
    # word is a SALT; the split value's own category is always a member
    c = int(x)
    if (not np.isnan(val)) and c == int(val):
        return True
    M = 0xFFFFFFFF
    h = (int(sset) ^ ((c * 1103515245) & M)) & M
    h = ((h ^ (h >> 15)) * 73244475) & M
    h = (h ^ (h >> 13)) & M
    return bool(h & 1)


def oracle_tree_predict(sv, sl, ss, leaf, X, rules):
    n = X.shape[0]
    out = np.zeros((n, leaf.shape[-1]))
    for i in range(n):
        node = 0
        while sv[node] >= 0:
            v = sv[node]
            node = 2 * node + 1 + (0 if oracle_decide_left(X[i, v], sl[node], ss[node], rules[v]) else 1)
        out[i] = leaf[node]
    return out


def oracle_tree_predict_excluded(sv, sl, ss, leaf, count, X, rules, excluded):
    """Recursive mass propagation oracle."""
    n = X.shape[0]
    k = leaf.shape[-1]
    out = np.zeros((n, k))

    def rec(i, node, w):
        if sv[node] < 0:
            out[i] += w * leaf[node]
            return
        v = sv[node]
        if v in excluded:
            cl, cr = count[2 * node + 1], count[2 * node + 2]
            tot = max(cl + cr, 1e-12)
            rec(i, 2 * node + 1, w * cl / tot)
            rec(i, 2 * node + 2, w * cr / tot)
        else:
            go_left = oracle_decide_left(X[i, v], sl[node], ss[node], rules[v])
            rec(i, 2 * node + 1 + (0 if go_left else 1), w)

    for i in range(n):
        rec(i, 0, 1.0)
    return out


def random_forest(rng, m, D, k, p, n_cat=6):
    """Random valid forest: internal nodes only above depth D, counts consistent."""
    S = 2 ** (D + 1) - 1
    sv = np.full((m, S), -1, np.int32)
    sl = np.zeros((m, S), np.float32)
    ss = np.zeros((m, S), np.uint32)
    leaf = rng.normal(size=(m, S, k)).astype(np.float32)
    count = np.zeros((m, S), np.float32)
    count[:, 0] = 100.0
    for j in range(m):
        for node in range(2**D - 1):  # internal-capable slots
            parent = (node - 1) // 2
            alive = node == 0 or sv[j, parent] >= 0
            if alive and rng.random() < 0.6:
                sv[j, node] = rng.integers(0, p)
                sl[j, node] = rng.normal()
                ss[j, node] = rng.integers(1, 2**n_cat)
                frac = rng.uniform(0.2, 0.8)
                count[j, 2 * node + 1] = count[j, node] * frac
                count[j, 2 * node + 2] = count[j, node] * (1 - frac)
    return sv, sl, ss, leaf, count


@pytest.mark.parametrize("rules_kind", ["continuous", "mixed"])
def test_forest_predict_matches_oracle(rules_kind):
    rng = np.random.default_rng(0)
    m, D, k, p, n = 5, 4, 2, 4, 60
    sv, sl, ss, leaf, count = random_forest(rng, m, D, k, p)
    X = rng.normal(size=(n, p)).astype(np.float32)
    if rules_kind == "continuous":
        rules = np.zeros(p, np.int32)
    else:
        rules = np.array([RULE_CONTINUOUS, RULE_ONEHOT, RULE_SUBSET, RULE_CONTINUOUS], np.int32)
        X[:, 1] = rng.integers(0, 4, size=n)  # one-hot column
        X[:, 2] = rng.integers(0, 6, size=n)  # subset column
    forest = Forest(*map(jnp.asarray, (sv, sl, ss, leaf, count, np.zeros_like(leaf))))
    got = np.asarray(forest_predict(forest, jnp.asarray(X), jnp.asarray(rules)))
    want = sum(oracle_tree_predict(sv[j], sl[j], ss[j], leaf[j], X, rules) for j in range(m))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_nan_routes_right():
    # single tree: root splits on var 0; NaN must go right (continuous rule).
    D = 2
    S = 2 ** (D + 1) - 1
    sv = np.full((1, S), -1, np.int32)
    sv[0, 0] = 0
    sl = np.zeros((1, S), np.float32)
    ss = np.zeros((1, S), np.uint32)
    leaf = np.zeros((1, S, 1), np.float32)
    leaf[0, 1, 0] = -1.0  # left
    leaf[0, 2, 0] = +1.0  # right
    count = np.ones((1, S), np.float32)
    X = np.array([[np.nan], [-1.0], [1.0]], np.float32)
    forest = Forest(*map(jnp.asarray, (sv, sl, ss, leaf, count, np.zeros_like(leaf))))
    got = np.asarray(forest_predict(forest, jnp.asarray(X), jnp.zeros(1, jnp.int32)))
    np.testing.assert_allclose(got[:, 0], [1.0, -1.0, 1.0])


def test_forest_predict_excluded_matches_oracle():
    rng = np.random.default_rng(1)
    m, D, k, p, n = 4, 4, 1, 5, 40
    sv, sl, ss, leaf, count = random_forest(rng, m, D, k, p)
    X = rng.normal(size=(n, p)).astype(np.float32)
    rules = np.zeros(p, np.int32)
    excluded = [0, 3]
    mask = np.zeros(p, bool)
    mask[excluded] = True
    forest = Forest(*map(jnp.asarray, (sv, sl, ss, leaf, count, np.zeros_like(leaf))))
    got = np.asarray(
        forest_predict_excluded(forest, jnp.asarray(X), jnp.asarray(rules), jnp.asarray(mask))
    )
    want = sum(
        oracle_tree_predict_excluded(sv[j], sl[j], ss[j], leaf[j], count[j], X, rules, excluded)
        for j in range(m)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_excluded_none_equals_fast_path():
    rng = np.random.default_rng(2)
    m, D, k, p, n = 3, 3, 1, 4, 30
    sv, sl, ss, leaf, count = random_forest(rng, m, D, k, p)
    X = rng.normal(size=(n, p)).astype(np.float32)
    rules = np.zeros(p, np.int32)
    forest = Forest(*map(jnp.asarray, (sv, sl, ss, leaf, count, np.zeros_like(leaf))))
    fast = np.asarray(forest_predict(forest, jnp.asarray(X), jnp.asarray(rules)))
    slow = np.asarray(
        forest_predict_excluded(forest, jnp.asarray(X), jnp.asarray(rules),
                                jnp.zeros(p, bool))
    )
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


def test_init_forest_predicts_mean():
    f = init_forest(m=10, n_nodes=15, n_outputs=1, init_leaf_value=np.array([0.37]), n_rows=7)
    X = np.zeros((7, 2), np.float32)
    got = np.asarray(forest_predict(f, jnp.asarray(X), jnp.zeros(2, jnp.int32)))
    np.testing.assert_allclose(got, np.full((7, 1), 3.7), rtol=1e-5)


def test_truncated_leaf_index():
    # depth-truncated traversal stops at the truncation level
    D = 3
    S = 2 ** (D + 1) - 1
    sv = np.full(S, -1, np.int32)
    sv[[0, 1, 3]] = 0  # left spine split on var 0
    sl = np.zeros(S, np.float32)  # all thresholds 0 -> x=-1 goes left
    ss = np.zeros(S, np.uint32)
    X = np.full((1, 1), -1.0, np.float32)
    rules = np.zeros(1, np.int32)
    args = (jnp.asarray(sv), jnp.asarray(sl), jnp.asarray(ss), jnp.asarray(X), jnp.asarray(rules))
    assert int(tree_leaf_index(*args, depth=0)[0]) == 0
    assert int(tree_leaf_index(*args, depth=1)[0]) == 1
    assert int(tree_leaf_index(*args, depth=2)[0]) == 3
    assert int(tree_leaf_index(*args, depth=3)[0]) == 7
