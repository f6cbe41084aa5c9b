"""Equivalence of the fused SMC glue kernel vs the JAX reference ops."""

import numpy as np
import jax
import jax.numpy as jnp

from pymc_bart_tpu.ops.resample import (
    effective_sample_size,
    normalize_log_weights,
    systematic_indices,
)
from pymc_bart_tpu.ops.smc_pallas import smc_resample_pallas


def reference_glue(ll, ll_prev, log_w, key, P):
    log_w = log_w + ll - ll_prev
    ll_prev = ll
    probs, log_mean = normalize_log_weights(log_w[1:])
    do = effective_sample_size(probs) < 0.5 * (P - 1)
    idx = systematic_indices(key, probs, P - 1) + 1
    idx = jnp.where(do, idx, jnp.arange(1, P, dtype=jnp.int32))
    take = jnp.concatenate([jnp.zeros((1,), jnp.int32), idx])
    reset = jnp.concatenate([log_w[:1], jnp.full((P - 1,), log_mean)])
    log_w = jnp.where(do, reset, log_w)
    return log_w, take, ll_prev[take]


def test_smc_glue_matches_reference():
    rng = np.random.default_rng(0)
    P = 12
    for trial in range(6):
        spread = [0.1, 5.0][trial % 2]  # low spread -> no resample branch
        ll = jnp.asarray(rng.normal(scale=spread, size=P), jnp.float32)
        ll_prev = jnp.asarray(rng.normal(scale=spread, size=P), jnp.float32)
        log_w = jnp.asarray(rng.normal(scale=spread, size=P), jnp.float32)
        key = jax.random.PRNGKey(trial)
        u = jax.random.uniform(key, ())

        want_lw, want_take, want_llp = reference_glue(ll, ll_prev, log_w, key, P)
        got_lw, got_take, got_llp = smc_resample_pallas(ll, ll_prev, log_w, u)

        np.testing.assert_array_equal(np.asarray(want_take), np.asarray(got_take),
                                      err_msg=f"take mismatch trial {trial}")
        np.testing.assert_allclose(np.asarray(want_lw), np.asarray(got_lw),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(want_llp), np.asarray(got_llp),
                                   rtol=1e-6, atol=1e-6)
