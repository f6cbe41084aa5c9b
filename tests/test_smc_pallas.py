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


def test_select_refine_matches_reference():
    from pymc_bart_tpu.ops.select_pallas import select_refine_pallas

    rng = np.random.default_rng(1)
    P, S, n, k, R = 5, 15, 32, 1, 4
    sv = jnp.asarray(rng.integers(-1, 2, size=(P, S)), jnp.int32)
    sl = jnp.asarray(rng.normal(size=(P, S)), jnp.float32)
    st = jnp.asarray(rng.integers(0, 2**31, size=(P, S)), jnp.uint32)
    lf = jnp.asarray(rng.normal(size=(P, S, k)), jnp.float32)
    ct = jnp.asarray(rng.integers(0, 5, size=(P, S)).astype(np.float32))
    li = jnp.asarray(rng.integers(0, S, size=(P, n)), jnp.int32)
    pred = jnp.asarray(np.take_along_axis(
        np.asarray(lf)[:, :, 0], np.asarray(li), axis=1)[..., None],
        jnp.float32)
    log_w = jnp.asarray(rng.normal(size=P), jnp.float32)
    resid = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    llw = jnp.ones((n, k), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(R, S, k)) * 0.1, jnp.float32)
    u_acc = jnp.asarray(rng.random(R), jnp.float32)
    u_sel = jnp.float32(rng.random())
    leaf_sd = 1.3
    hiv = 0.5 / leaf_sd**2

    got = select_refine_pallas(
        sv, sl, st, lf.transpose(0, 2, 1), ct, li,
        pred.transpose(0, 2, 1), log_w, resid.T, llw.T,
        eps.transpose(0, 2, 1), u_acc, u_sel, jnp.float32(hiv),
        num_refinements=R)

    # NumPy reference of the same algorithm
    w = np.exp(np.asarray(log_w) - np.asarray(log_w).max())
    cdf = np.cumsum(w)
    widx = int(np.searchsorted(cdf, float(u_sel) * cdf[-1], side="right"))
    widx = min(widx, P - 1)
    lf_w = np.asarray(lf)[widx].copy()
    pred_w = np.asarray(pred)[widx].copy()
    mask = ((np.asarray(sv)[widx] < 0) & (np.asarray(ct)[widx] > 0))[:, None]
    li_w = np.asarray(li)[widx]

    def post(lf_x, pred_x):
        # likelihood + Normal(0, leaf_sd) leaf prior on active leaves
        return (-0.5 * np.sum((np.asarray(resid) - pred_x) ** 2)
                - hiv * np.sum(mask * lf_x * lf_x))

    ll = post(lf_w, pred_w)
    for r in range(R):
        lf_p = lf_w + np.asarray(eps)[r] * mask
        pred_p = lf_p[li_w]
        ll_p = post(lf_p, pred_p)
        if np.log(float(u_acc[r])) < ll_p - ll:
            lf_w, pred_w, ll = lf_p, pred_p, ll_p

    assert int((np.asarray(got[0]) == np.asarray(sv)[widx]).all())
    np.testing.assert_allclose(np.asarray(got[3]).T, lf_w, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[6]).T, pred_w, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got[5]), li_w)
