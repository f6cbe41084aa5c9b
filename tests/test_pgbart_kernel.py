"""Sampler-kernel tests: PGBART fits signal; HMC samples a known posterior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.sampler import hmc, pgbart


def gaussian_loglik(f, params):
    """f: (n, k); params = (y (n,k), sigma scalar)."""
    y, sigma = params
    return jnp.sum(-0.5 * ((y - f) / sigma) ** 2 - jnp.log(sigma))


def test_pgbart_fits_step_function():
    rng = np.random.default_rng(0)
    n = 200
    X = rng.uniform(-2, 2, size=(n, 2)).astype(np.float32)
    f_true = np.where(X[:, 0] > 0, 2.0, -1.0)
    Y = (f_true + rng.normal(0, 0.2, n)).astype(np.float32)

    cfg = BartConfig(m=20, max_depth=4)
    pg = PgbartConfig(num_particles=10, batch=(0.5, 0.5))
    Xj = jnp.asarray(X)
    Yj = jnp.asarray(Y)[:, None]
    rules = jnp.zeros(2, jnp.int32)
    state = pgbart.init_state(Xj, Yj, cfg)
    params = (Yj, jnp.float32(0.2))

    key = jax.random.PRNGKey(0)
    for i in range(60):
        key, sub = jax.random.split(key)
        state, vi = pgbart.pgbart_step(
            sub, state, Xj, Yj, rules, cfg, pg, gaussian_loglik, params,
            tuning=(i < 30),
        )
    fhat = np.asarray(state.sum_trees)[:, 0]
    rmse = np.sqrt(np.mean((fhat - f_true) ** 2))
    assert rmse < 0.35, f"PGBART failed to fit step function, rmse={rmse}"
    # the signal variable (column 0) should dominate inclusion
    vi = np.asarray(vi)
    assert vi[0] > vi[1], f"variable inclusion did not find signal: {vi}"
    # prediction cache must stay consistent with the forest
    refreshed = pgbart.refresh_tree_pred(state, Xj, rules, cfg)
    np.testing.assert_allclose(
        np.asarray(refreshed.sum_trees), np.asarray(state.sum_trees),
        rtol=1e-4, atol=1e-4,
    )


def test_hmc_standard_normal():
    def logp(theta, _):
        return -0.5 * jnp.sum(theta**2)

    state = hmc.init_state(jnp.zeros(2))
    key = jax.random.PRNGKey(1)
    step = jax.jit(
        lambda k, s, tuning: hmc.hmc_step(k, s, logp, None, tuning=tuning),
        static_argnames="tuning",
    )
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, _ = step(sub, state, True)
    state = hmc.finalize_adaptation(state)
    draws = []
    for _ in range(600):
        key, sub = jax.random.split(key)
        state, acc = step(sub, state, False)
        draws.append(np.asarray(state.theta))
    draws = np.stack(draws)
    assert abs(draws.mean()) < 0.15
    assert abs(draws.std() - 1.0) < 0.15
