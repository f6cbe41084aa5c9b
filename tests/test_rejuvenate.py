"""Distributional + invariant tests for retained-path rejuvenation
(``PgbartConfig(ancestor_sampling=True)`` — sampler/rejuvenate.py).

The grow/prune Metropolis kernel claims to target exactly the same
per-tree conditional as the CSMC (likelihood x implied growth-process
prior).  Two sharp oracles:

1. ``test_conjugate_posterior_with_rejuvenation`` — the analytic
   conjugate leaf posterior of tests/test_statistical.py must be
   preserved when the extra kernel runs (a wrong leaf-prior term in the
   moves would shift the posterior sd).
2. ``test_prior_preserved_under_rejuvenation`` — with a CONSTANT
   likelihood (zero precision) the acceptance ratio reduces to the pure
   structural prior ratio, so the stationary split rates must still
   match the Chipman et al. alpha*(1+d)^-beta schedule; any error in
   the grow/prune proposal-count or depth-prior algebra shifts this
   equilibrium and fails the test.

Plus forest-invariant and end-to-end checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.sampler import pgbart


def _run_chain(key, state, X, Yt, rules, cfg, pg, gauss_w, steps,
               collect):
    def loglik(f, params):
        y, w = params
        return jnp.sum(-0.5 * w * (y - f) ** 2)

    @jax.jit
    def run(key, state):
        def body(st, k):
            st, _ = pgbart.pgbart_step(
                k, st, X, Yt, rules, cfg, pg, loglik, (Yt, gauss_w),
                False, gauss_w=gauss_w)
            return st, collect(st)

        return jax.lax.scan(body, state, jax.random.split(key, steps))[1]

    return np.asarray(run(key, state))


def test_conjugate_posterior_with_rejuvenation():
    """tests/test_statistical.py's analytic oracle, with the grow/prune
    kernel composed in: the leaf-value posterior given the (unique)
    split must be unchanged."""
    n = 40
    rng = np.random.default_rng(42)
    sigma = 5.0
    x = np.repeat([0.0, 1.0], n // 2).astype(np.float32)
    y = (np.where(x > 0.5, 1.0, -1.0) + rng.normal(0, 0.3, n)).astype(
        np.float32)

    X = jnp.asarray(x)[:, None]
    Yt = jnp.asarray(y)[:, None]
    cfg = BartConfig(m=1, max_depth=1, alpha=0.95)
    pg = PgbartConfig(num_particles=20, batch=(1.0, 1.0),
                      num_refinements=5, ancestor_sampling=True)
    rules = jnp.zeros(1, jnp.int32)
    gauss_w = jnp.full((n, 1), 1.0 / sigma**2, jnp.float32)

    state = pgbart.init_state(X, Yt, cfg)
    s_prior = float(state.leaf_sd[0])

    def analytic(mask):
        n_c = mask.sum()
        ybar_c = y[mask].mean()
        prec = 1.0 / s_prior**2 + n_c / sigma**2
        return ybar_c, prec**-0.5

    mean_l, sd_l = analytic(x < 0.5)
    mean_r, sd_r = analytic(x > 0.5)

    out = _run_chain(
        jax.random.PRNGKey(0), state, X, Yt, rules, cfg, pg, gauss_w,
        steps=5000,
        collect=lambda st: jnp.stack([
            st.forest.split_var[0, 0].astype(jnp.float32),
            st.forest.leaf[0, 1, 0], st.forest.leaf[0, 2, 0]]))
    out = out[500:]
    split = out[:, 0] >= 0
    assert split.mean() > 0.5
    vl, vr = out[split, 1], out[split, 2]
    T = vl.size
    for v, mean_a, sd_a, side in ((vl, mean_l, sd_l, "L"),
                                  (vr, mean_r, sd_r, "R")):
        se_mean = sd_a * np.sqrt(25.0 / T)
        assert abs(v.mean() - mean_a) < 4 * se_mean, (
            f"{side} mean {v.mean():.4f} vs analytic {mean_a:.4f}")
        se_sd = sd_a / np.sqrt(2 * T / 25.0)
        assert abs(v.std() - sd_a) < 4 * se_sd + 0.03 * sd_a, (
            f"{side} sd {v.std():.4f} vs analytic {sd_a:.4f}")


def test_prior_preserved_under_rejuvenation():
    """Constant likelihood: the stationary structure distribution must
    stay the Chipman prior (errors in the grow/prune acceptance algebra
    — candidate counts, depth factors — shift this equilibrium)."""
    n, p = 256, 3
    rng = np.random.default_rng(7)
    X = jnp.asarray(rng.uniform(size=(n, p)), jnp.float32)
    Yt = jnp.asarray(rng.normal(size=(n, 1)), jnp.float32)
    alpha, beta = 0.7, 1.2
    cfg = BartConfig(m=1, max_depth=3, alpha=alpha, beta=beta)
    pg = PgbartConfig(num_particles=8, batch=(1.0, 1.0),
                      num_refinements=0, ancestor_sampling=True,
                      rejuvenation_sweeps=2)
    rules = jnp.zeros(p, jnp.int32)
    gauss_w = jnp.zeros((n, 1), jnp.float32)  # constant likelihood

    state = pgbart.init_state(X, Yt, cfg)
    sv = _run_chain(jax.random.PRNGKey(3), state, X, Yt, rules, cfg, pg,
                    gauss_w, steps=4000,
                    collect=lambda st: st.forest.split_var[0])
    sv = sv[200:]

    root_split = sv[:, 0] >= 0
    p_hat0 = root_split.mean()
    want0 = alpha
    d1 = sv[root_split][:, 1:3] >= 0
    p_hat1 = d1.mean()
    want1 = alpha * 2.0**-beta

    T = sv.shape[0]
    se0 = np.sqrt(want0 * (1 - want0) * 25.0 / T)
    assert abs(p_hat0 - want0) < 4 * se0 + 0.02, (
        f"root split rate {p_hat0:.3f} vs Chipman alpha={want0:.3f}")
    se1 = np.sqrt(want1 * (1 - want1) * 25.0 / max(d1.shape[0], 1))
    assert abs(p_hat1 - want1) < 4 * se1 + 0.03, (
        f"depth-1 split rate {p_hat1:.3f} vs alpha*2^-beta={want1:.3f}")


def test_forest_invariants_and_pred_consistency():
    """After rejuvenated steps: cached per-tree predictions equal
    predictions recomputed from the forest; sum_trees equals their sum;
    pruned children really leave the active set (ct == 0 below leaves)."""
    n, p = 120, 4
    rng = np.random.default_rng(11)
    X = jnp.asarray(rng.uniform(size=(n, p)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(n,)), jnp.float32)
    Yt = y[:, None]
    cfg = BartConfig(m=5, max_depth=3)
    pg = PgbartConfig(num_particles=6, batch=(1.0, 1.0),
                      num_refinements=2, ancestor_sampling=True)
    rules = jnp.zeros(p, jnp.int32)
    gauss_w = jnp.ones((n, 1), jnp.float32)

    def loglik(f, params):
        return jnp.sum(-0.5 * (params[0] - f) ** 2)

    state = pgbart.init_state(X, Yt, cfg)
    key = jax.random.PRNGKey(5)
    for i in range(10):
        key, k = jax.random.split(key)
        state, vi = pgbart.pgbart_step(
            k, state, X, Yt, rules, cfg, pg, loglik, (Yt,), i < 5,
            gauss_w=gauss_w)

    sum_direct = np.asarray(state.tree_pred).sum(axis=0)
    np.testing.assert_allclose(np.asarray(state.sum_trees), sum_direct,
                               rtol=0, atol=1e-4)
    refreshed = pgbart.refresh_tree_pred(state, X, rules, cfg)
    np.testing.assert_allclose(np.asarray(state.tree_pred),
                               np.asarray(refreshed.tree_pred),
                               rtol=0, atol=1e-5)
    # active-set hygiene: slots below a leaf carry no count
    sv = np.asarray(state.forest.split_var)
    ct = np.asarray(state.forest.count)
    S = cfg.n_nodes
    for j in range(cfg.m):
        for s in range(S):
            if sv[j, s] < 0 and 2 * s + 2 < S:
                assert ct[j, 2 * s + 1] == 0.0
                assert ct[j, 2 * s + 2] == 0.0
    # vi counts match the committed forest
    want_vi = (sv.reshape(cfg.m * S)[:, None]
               == np.arange(p)[None, :]).sum(axis=0)
    np.testing.assert_array_equal(np.asarray(vi), want_vi)


def test_sample_with_ancestor_sampling_end_to_end():
    import pymc_bart_tpu as pmb

    rng = np.random.default_rng(0)
    X = rng.uniform(size=(80, 3)).astype(np.float32)
    Y = (np.sin(6 * X[:, 0]) + rng.normal(0, 0.3, 80)).astype(np.float32)
    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=5)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=15, draws=15, chains=2, random_seed=1,
                           ancestor_sampling=True)
    assert idata.posterior["mu"].values.shape == (2, 15, 80)
    assert np.isfinite(idata.posterior["mu"].values).all()


def test_ancestor_sampling_rejects_linear_response():
    import pymc_bart_tpu as pmb

    rng = np.random.default_rng(0)
    X = rng.uniform(size=(40, 2)).astype(np.float32)
    Y = X[:, 0].astype(np.float32)
    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=3, response="linear")
        pmb.Normal("y", mu, 1.0, observed=Y)
        with pytest.raises(ValueError, match="ancestor_sampling"):
            pmb.sample(tune=2, draws=2, chains=1,
                       ancestor_sampling=True)
