"""Fused SMC weight-update / resampling kernel.

After the grow kernel fusion, the remaining per-round cost is the SMC
glue: incremental weight update, normalization over the non-frozen
particles, the ESS gate, systematic resampling indices, and the
post-resampling weight reset — ~12 small HLO ops on (P,)-sized vectors,
each paying fixed kernel overhead.  This kernel computes all of it in one
program: cumulative sums ride a lower-triangular mask matmul (P is tiny),
searchsorted is a compare-count.

Semantics mirror ops/resample.py + the resampling block of
sampler/pgbart._update_one_tree exactly (same normalization, same
log-mean reset, same +1 frozen-particle offset).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ll_ref, llp_ref, lw_ref, u_ref, lw_o, take_o, llp_o, *, P: int):
    ll = ll_ref[0, :]
    lw1 = lw_ref[0, :] + ll - llp_ref[0, :]

    idxv = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)[0]
    nonfrozen = idxv >= 1
    neg_inf = jnp.float32(-jnp.inf)
    w_nf = jnp.where(nonfrozen, lw1, neg_inf)
    mx = jnp.max(w_nf)
    e = jnp.where(nonfrozen, jnp.exp(lw1 - mx), 0.0)
    tot = jnp.sum(e)
    probs = e / tot
    log_mean = mx + jnp.log(tot / (P - 1))
    ess = 1.0 / jnp.maximum(jnp.sum(probs * probs), 1e-38)
    do = ess < 0.5 * (P - 1)

    # cdf over the non-frozen slots via lower-triangular matmul
    lt = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
          <= jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(jnp.float32)
    cdf = jax.lax.dot_general(
        probs[None, :], lt, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    cdf = cdf / cdf[P - 1]

    # systematic positions for output slots 1..P-1
    u = u_ref[0, 0]
    pos = (u + idxv.astype(jnp.float32) - 1.0) / (P - 1)
    # searchsorted('left') into the non-frozen cdf = count of cdf < pos,
    # restricted to slots 1..P-1 of the padded cdf; +1 maps back to
    # particle indices (slot 0 is the frozen reference particle)
    cmp = (cdf[None, :] < pos[:, None]) & nonfrozen[None, :]
    anc = jnp.sum(cmp.astype(jnp.int32), axis=1) + 1
    anc = jnp.clip(anc, 1, P - 1)

    resampled = do & nonfrozen
    take = jnp.where(resampled, anc, idxv)
    take_o[0, :] = take
    lw_o[0, :] = jnp.where(resampled, log_mean, lw1)

    # gather ll at ancestors for the next round's ll_prev (selection matmul)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
           == take[None, :]).astype(jnp.float32)
    llp_o[0, :] = jax.lax.dot_general(
        ll[None, :], sel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]


@functools.partial(jax.jit, static_argnames=())
def smc_resample_pallas(ll, ll_prev, log_w, u):
    """One fused SMC bookkeeping step.

    Args: ll, ll_prev, log_w — float32[P]; u — scalar uniform.
    Returns (log_w_new, take, ll_prev_new): updated weights, ancestor
    indices for the next growth round, and ll gathered at the ancestors.
    """
    P = ll.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, P=P),
        out_shape=[
            jax.ShapeDtypeStruct((1, P), jnp.float32),
            jax.ShapeDtypeStruct((1, P), jnp.int32),
            jax.ShapeDtypeStruct((1, P), jnp.float32),
        ],
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=(jax.default_backend() == "cpu"),
    )(ll.reshape(1, P), ll_prev.reshape(1, P), log_w.reshape(1, P),
      u.reshape(1, 1))
    return out[0][0], out[1][0], out[2][0]
