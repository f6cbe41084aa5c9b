"""Equivalence of the whole-draw PGBART megakernel (ops/draw_pallas) with
the existing per-kernel fused-Gaussian Pallas path in sampler/pgbart.

With ``rng_mode="reference"`` the megakernel consumes the exact key-split
sequence of ``_update_one_tree``, so given the same top-level key the two
paths compute the same floating-point program modulo benign reduction-
order differences — states must agree to tight tolerances and tree
STRUCTURE must agree exactly.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.ops.draw_pallas import (
    fused_draw_supported,
    pgbart_step_fused,
)
from pymc_bart_tpu.sampler import pgbart


def _setup(seed=0, n=48, p=3, m=6, depth=3, particles=4, with_nan=False):
    rng = np.random.default_rng(seed)
    X_np = rng.uniform(size=(n, p)).astype(np.float32)
    if with_nan:  # missing-data rows must route identically on both paths
        X_np[rng.random(size=(n, p)) < 0.1] = np.nan
    X = jnp.asarray(X_np)
    Y = jnp.asarray(
        np.sin(3 * np.asarray(X[:, 0])) + 0.1 * rng.normal(size=n),
        jnp.float32,
    )[:, None]
    cfg = BartConfig(m=m, max_depth=depth)
    pg = PgbartConfig(num_particles=particles, batch=(0.5, 0.5))
    rules = jnp.zeros(p, jnp.int32)
    gauss_w = jnp.full((n, 1), 4.0, jnp.float32)
    state = pgbart.init_state(X, Y, cfg)
    return X, Y, cfg, pg, rules, gauss_w, state


def _loglik(f, params):
    y, w = params
    return jnp.sum(-0.5 * w * (y - f) ** 2)


@pytest.mark.parametrize("tuning", [False, True])
@pytest.mark.parametrize("with_nan", [False, True])
def test_megakernel_matches_existing_path(tuning, with_nan, monkeypatch):
    X, Y, cfg, pg, rules, gauss_w, state = _setup(with_nan=with_nan)
    key = jax.random.PRNGKey(7)

    # existing path, forced onto the per-kernel Pallas route (interpret)
    monkeypatch.setenv("PYMC_BART_TPU_PALLAS", "1")
    monkeypatch.setenv("PYMC_BART_TPU_MEGAKERNEL", "0")
    want_state, want_vi = pgbart.pgbart_step(
        key, state, X, Y, rules, cfg, pg, _loglik, (Y, gauss_w[:, 0:1]),
        tuning, gauss_w=gauss_w,
    )

    got_state, got_vi = pgbart_step_fused(
        key, state, X, Y, rules, cfg, pg, gauss_w, tuning,
        rng_mode="reference",
    )

    # tree structure must match exactly
    np.testing.assert_array_equal(np.asarray(want_state.forest.split_var),
                                  np.asarray(got_state.forest.split_var))
    np.testing.assert_array_equal(np.asarray(want_state.forest.split_set),
                                  np.asarray(got_state.forest.split_set))
    np.testing.assert_array_equal(np.asarray(want_vi), np.asarray(got_vi))
    np.testing.assert_allclose(np.asarray(want_state.forest.split_val),
                               np.asarray(got_state.forest.split_val),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(want_state.forest.leaf),
                               np.asarray(got_state.forest.leaf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(want_state.forest.count),
                                  np.asarray(got_state.forest.count))
    np.testing.assert_allclose(np.asarray(want_state.sum_trees),
                               np.asarray(got_state.sum_trees),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(want_state.tree_pred),
                               np.asarray(got_state.tree_pred),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(want_state.alpha_vec),
                               np.asarray(got_state.alpha_vec))
    np.testing.assert_allclose(np.asarray(want_state.leaf_sd),
                               np.asarray(got_state.leaf_sd),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(want_state.wf_mean),
                               np.asarray(got_state.wf_mean),
                               rtol=1e-4, atol=1e-5)
    assert int(got_state.iteration) == int(want_state.iteration)
    assert int(got_state.batch_offset) == int(want_state.batch_offset)


def test_megakernel_chain_runs_and_fits():
    """Multi-step smoke: batched RNG mode, loss actually decreases."""
    X, Y, cfg, pg, rules, gauss_w, state = _setup(seed=3, n=64, m=8)
    key = jax.random.PRNGKey(0)
    rmse0 = float(jnp.sqrt(jnp.mean((state.sum_trees - Y) ** 2)))
    for i in range(30):
        key, k = jax.random.split(key)
        state, _ = pgbart_step_fused(
            k, state, X, Y, rules, cfg, pg, gauss_w, tuning=(i < 15),
        )
    rmse1 = float(jnp.sqrt(jnp.mean((state.sum_trees - Y) ** 2)))
    assert np.isfinite(rmse1)
    assert rmse1 < rmse0


def test_supported_gate():
    X, Y, cfg, pg, rules, gauss_w, state = _setup()
    assert fused_draw_supported(cfg, pg, X, gauss_w)
    assert not fused_draw_supported(cfg, pg, X, None)
    cfg2 = BartConfig(m=6, max_depth=3, response="linear")
    assert not fused_draw_supported(cfg2, pg, X, gauss_w)
    cfg3 = BartConfig(m=6, max_depth=3, n_outputs=2)
    assert not fused_draw_supported(cfg3, pg, X, gauss_w)


def test_megakernel_chunked_cdf_p600(monkeypatch):
    """p > 512 rides the chunked-CDF megakernel path; bit-comparable to
    the kernel-aligned XLA bernoulli branch (the gauss XLA branch uses
    Gumbel categorical winner selection and is not bit-comparable)."""
    monkeypatch.setenv("PYMC_BART_TPU_PALLAS", "0")
    monkeypatch.setenv("PYMC_BART_TPU_MEGAKERNEL", "0")
    rng = np.random.default_rng(0)
    n, p, m = 48, 600, 4
    X = jnp.asarray(rng.uniform(size=(n, p)).astype(np.float32))
    Y = jnp.asarray(
        (rng.random(n) < 1 / (1 + np.exp(-3 * (np.asarray(X[:, 0]) - 0.5))))
        .astype(np.float32))[:, None]
    cfg = BartConfig(m=m, max_depth=3)
    pg = PgbartConfig(num_particles=4, batch=(0.5, 0.5))
    rules = jnp.zeros(p, jnp.int32)
    state = pgbart.init_state(X, Y, cfg)
    key = jax.random.PRNGKey(1)
    want, want_vi = pgbart.pgbart_step(
        key, state, X, Y, rules, cfg, pg, lambda f, q: jnp.zeros(()), None,
        True, gauss_w=None, lik="bernoulli")
    got, got_vi = pgbart_step_fused(
        key, state, X, Y, rules, cfg, pg, None, True,
        rng_mode="reference", lik="bernoulli")
    np.testing.assert_array_equal(np.asarray(want.forest.split_var),
                                  np.asarray(got.forest.split_var))
    np.testing.assert_array_equal(np.asarray(want_vi), np.asarray(got_vi))
    np.testing.assert_allclose(np.asarray(want.forest.leaf),
                               np.asarray(got.forest.leaf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(want.sum_trees),
                               np.asarray(got.sum_trees),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(want.alpha_vec),
                               np.asarray(got.alpha_vec))
