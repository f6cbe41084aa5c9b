"""Systematic resampling of SMC particles.

The reference's native sampler uses systematic resampling of the
non-frozen particles by normalized weights (behavioral evidence:
reference CHANGELOG.md:400-402 "fix bug systematic resampling").  Here it
is a sort-free searchsorted over the weight CDF, fully inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_log_weights(log_w):
    """Return (normalized probabilities, log-mean weight).

    The log-mean is the value resampled particles' log-weights are reset
    to, preserving the absolute weight scale across rounds (mirrors the
    reference sampler's post-resampling weight reset; SURVEY 2.3 step 3).
    """
    log_w = jnp.asarray(log_w)
    m = jnp.max(log_w)
    w = jnp.exp(log_w - m)
    total = w.sum()
    probs = w / total
    log_mean = m + jnp.log(total / log_w.shape[0])
    return probs, log_mean


def systematic_indices(key, probs, num: int):
    """Systematic resampling: ``num`` ancestor indices ~ probs."""
    u = jax.random.uniform(key, ())
    positions = (u + jnp.arange(num, dtype=jnp.float32)) / num
    cdf = jnp.cumsum(probs)
    cdf = cdf / cdf[-1]
    return jnp.searchsorted(cdf, positions).astype(jnp.int32)


def effective_sample_size(probs):
    """ESS of normalized weights: 1 / sum p_i^2."""
    return 1.0 / jnp.maximum(jnp.sum(probs * probs), 1e-38)
