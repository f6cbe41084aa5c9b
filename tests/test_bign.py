"""Row-tiled big-n kernel (ops/bign_pallas): equivalence with the
megakernel and end-to-end engagement through sample().

The big-n kernel reformulates the PGBART step with sufficient-statistics
likelihoods and chunked row passes; with ``rng_mode="reference"`` it
consumes the exact key-split sequence of the megakernel, so the two must
agree to float-rounding tolerances (tree STRUCTURE exactly) across
consecutive steps, chains, tuning and draw phases.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.ops.bign_pallas import (
    bign_supported_reason,
    pgbart_step_bign,
)
from pymc_bart_tpu.ops.draw_pallas import pgbart_step_fused
from pymc_bart_tpu.sampler import pgbart


@pytest.fixture(autouse=True)
def _enable_bign(monkeypatch):
    monkeypatch.setenv("PYMC_BART_TPU_BIGN", "1")  # interpret mode on CPU


def _setup(n=300, p=3, m=6, depth=3, particles=4, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, p)).astype(np.float32))
    Y = jnp.asarray(
        np.sin(3 * np.asarray(X[:, 0])) + 0.1 * rng.normal(size=n),
        jnp.float32)[:, None]
    cfg = BartConfig(m=m, max_depth=depth)
    pg = PgbartConfig(num_particles=particles, batch=(0.5, 0.5))
    gw = jnp.full((n, 1), 4.0, jnp.float32)
    return X, Y, cfg, pg, gw


def test_bign_matches_megakernel_over_steps():
    """10 consecutive steps x 2 chains, tuning then draws: identical tree
    structures, counts, VI and adaptation; float state to rounding."""
    X, Y, cfg, pg, gw = _setup()
    C = 2
    rules = jnp.zeros(X.shape[1], jnp.int32)
    state1 = pgbart.init_state(X, Y, cfg)
    stateC = jax.tree.map(lambda a: jnp.broadcast_to(a, (C,) + a.shape),
                          state1)
    keysC = jax.random.split(jax.random.PRNGKey(42), C)
    sa = sb = stateC
    for t in range(10):
        tun = t < 5
        ks = jax.vmap(lambda k: jax.random.fold_in(k, t))(keysC)
        sa, via = jax.vmap(lambda k, s: pgbart_step_fused(
            k, s, X, Y, rules, cfg, pg, gw, tun, rng_mode="reference",
            all_cont=True, x_nan=False))(ks, sa)
        sb, vib = jax.vmap(lambda k, s: pgbart_step_bign(
            k, s, X, Y, cfg, pg, jnp.full((1,), 4.0), tun,
            rng_mode="reference"))(ks, sb)
        np.testing.assert_array_equal(np.asarray(sa.forest.split_var),
                                      np.asarray(sb.forest.split_var))
        np.testing.assert_array_equal(np.asarray(sa.forest.count),
                                      np.asarray(sb.forest.count))
        np.testing.assert_array_equal(np.asarray(via), np.asarray(vib))
        np.testing.assert_allclose(np.asarray(sa.forest.leaf),
                                   np.asarray(sb.forest.leaf),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sa.sum_trees),
                                   np.asarray(sb.sum_trees),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sa.tree_pred),
                                   np.asarray(sb.tree_pred),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sa.alpha_vec),
                                   np.asarray(sb.alpha_vec))
        np.testing.assert_allclose(np.asarray(sa.leaf_sd),
                                   np.asarray(sb.leaf_sd),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("lik", ["bernoulli", "het_abs"])
def test_bign_rowll_matches_megakernel(lik):
    """Row-ll regime (non-Gaussian likelihoods, round-5): identical tree
    structures and float state vs the megakernel under the shared
    reference RNG sequence, across tuning and draw steps.  Refinements
    are off (the row-ll gate requires it)."""
    n = 300
    rng = np.random.default_rng(9)
    X = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    if lik == "bernoulli":
        labels = (rng.uniform(size=n) < 0.5 + 0.4 * np.asarray(X[:, 0] > 0.5)
                  ).astype(np.float32)
        Y = jnp.asarray(labels)[:, None]
        gw_mega = None
        llw = None
    else:
        yobs = rng.normal(size=n).astype(np.float32)
        mu0 = np.zeros(n, np.float32)
        row = ((yobs - mu0) ** 2).astype(np.float32)
        Y = jnp.asarray(yobs)[:, None]
        gw_mega = jnp.asarray(row)[:, None]
        llw = jnp.asarray(row)
    cfg = BartConfig(m=6, max_depth=3)
    pg = PgbartConfig(num_particles=4, batch=(0.5, 0.5),
                      num_refinements=0)
    rules = jnp.zeros(3, jnp.int32)
    C = 2
    state1 = pgbart.init_state(X, Y, cfg)
    stateC = jax.tree.map(lambda a: jnp.broadcast_to(a, (C,) + a.shape),
                          state1)
    keysC = jax.random.split(jax.random.PRNGKey(17), C)
    lc = 0.05 if lik == "het_abs" else 0.0
    sa = sb = stateC
    for t in range(6):
        tun = t < 3
        ks = jax.vmap(lambda k: jax.random.fold_in(k, t))(keysC)
        sa, via = jax.vmap(lambda k, s: pgbart_step_fused(
            k, s, X, Y, rules, cfg, pg, gw_mega, tun,
            rng_mode="reference", lik=lik, lik_const=lc,
            all_cont=True, x_nan=False))(ks, sa)
        sb, vib = jax.vmap(lambda k, s, w: pgbart_step_bign(
            k, s, X, Y, cfg, pg, jnp.zeros((1,)), tun,
            rng_mode="reference", lik=lik, lik_const=lc, llw=w))(
                ks, sb, (jnp.zeros((C, n)) if llw is None
                         else jnp.broadcast_to(llw, (C, n))))
        np.testing.assert_array_equal(np.asarray(sa.forest.split_var),
                                      np.asarray(sb.forest.split_var))
        np.testing.assert_array_equal(np.asarray(sa.forest.count),
                                      np.asarray(sb.forest.count))
        np.testing.assert_array_equal(np.asarray(via), np.asarray(vib))
        np.testing.assert_allclose(np.asarray(sa.forest.leaf),
                                   np.asarray(sb.forest.leaf),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sa.sum_trees),
                                   np.asarray(sb.sum_trees),
                                   rtol=1e-4, atol=1e-4)


def test_bign_bernoulli_end_to_end():
    """sample() engages the big-n kernel for a Bernoulli model (env-
    forced on CPU interpret) and recovers the signal."""
    import pymc_bart_tpu as pmb

    rng = np.random.default_rng(6)
    n = 400
    X = rng.uniform(size=(n, 4)).astype(np.float32)
    p_true = 1 / (1 + np.exp(-(6 * X[:, 0] - 3)))
    Y = rng.binomial(1, p_true).astype(np.float32)
    with pmb.Model():
        lo = pmb.BART("lo", X, Y, m=10)
        pmb.Bernoulli("y", p=pmb.math.sigmoid(lo), observed=Y)
        idata = pmb.sample(tune=40, draws=40, chains=2, random_seed=0,
                           num_particles=5, num_refinements=0,
                           store_trees=False)
    lo_hat = idata.posterior["lo"].values.mean(axis=(0, 1))
    acc = float(((lo_hat > 0) == (Y > 0.5)).mean())
    assert acc > 0.7, acc


def test_bign_supported_reason_gates():
    X = jnp.zeros((50_000, 10), jnp.float32)
    cfg = BartConfig(m=20)
    pg = PgbartConfig(num_particles=10)
    assert bign_supported_reason(cfg, pg, X, "gauss", True, True,
                                 False) is None
    assert "scalar" in bign_supported_reason(cfg, pg, X, "gauss", False,
                                             True, False)
    assert bign_supported_reason(cfg, pg, X, "bernoulli", True, True,
                                 False) is not None
    assert bign_supported_reason(cfg, pg, X, "gauss", True, False,
                                 False) is not None
    assert bign_supported_reason(cfg, pg, X, "gauss", True, True,
                                 True) is not None
    cfg2 = BartConfig(m=20, response="linear")
    assert bign_supported_reason(cfg2, pg, X, "gauss", True, True,
                                 False) is not None
    Xbig = jnp.zeros((2_000_000, 10), jnp.float32)
    assert "VMEM" in bign_supported_reason(cfg, pg, Xbig, "gauss", True,
                                           True, False)


def test_bign_end_to_end_sample():
    """sample() engages the big-n kernel (env-forced on CPU interpret)
    and the posterior is statistically sane."""
    import pymc_bart_tpu as pmb

    rng = np.random.default_rng(5)
    n = 400
    X = rng.uniform(size=(n, 4)).astype(np.float32)
    f = 8 * X[:, 0]
    Y = (f + rng.normal(0, 0.5, n)).astype(np.float32)
    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=10)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=40, draws=40, chains=2, random_seed=0,
                           num_particles=5, store_trees=False,
                           progressbar=False)
    mu_hat = idata.posterior["mu"].values.mean(axis=(0, 1))
    rmse = float(np.sqrt(np.mean((mu_hat - f) ** 2)))
    assert rmse < 0.8 * float(np.std(f)), rmse


def test_bign_chain_split_fallback(monkeypatch):
    """When C chains exceed the VMEM budget the vmap rule splits into
    sequential single-chain kernel calls — results must match the
    batched path exactly."""
    import pymc_bart_tpu.ops.bign_pallas as bp

    X, Y, cfg, pg, gw = _setup(n=200)
    C = 2
    state1 = pgbart.init_state(X, Y, cfg)
    stateC = jax.tree.map(lambda a: jnp.broadcast_to(a, (C,) + a.shape),
                          state1)
    keysC = jax.random.split(jax.random.PRNGKey(3), C)
    w = jnp.full((C, 1), 4.0)

    def run():
        bp._bign_step_cached.cache_clear()
        return jax.vmap(lambda k, s, w1: bp.pgbart_step_bign(
            k, s, X, Y, cfg, pg, w1, True,
            rng_mode="reference"))(keysC, stateC, w)

    batched, vi_b = run()
    monkeypatch.setattr(bp, "_vmem_fits",
                        lambda C_, P_, n_, p_, **kw: C_ <= 1)
    split, vi_s = run()
    np.testing.assert_array_equal(np.asarray(batched.forest.split_var),
                                  np.asarray(split.forest.split_var))
    np.testing.assert_array_equal(np.asarray(vi_b), np.asarray(vi_s))
    np.testing.assert_allclose(np.asarray(batched.sum_trees),
                               np.asarray(split.sum_trees),
                               rtol=1e-5, atol=1e-5)
