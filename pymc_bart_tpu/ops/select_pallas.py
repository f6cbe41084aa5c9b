"""Fused winner-selection + Metropolis leaf-refinement kernel.

After the grow and SMC-glue fusions, the remaining per-tree-update kernel
count is dominated by the final categorical tree selection (gathers over
all particle-state arrays) and the R Metropolis refinement sweeps over
the winner's leaf values (each a gather + likelihood + accept).  This
kernel does all of it in one program for the fused-Gaussian likelihood
path:

* categorical winner via softmax cumsum + compare-count on log-weights,
* winner extraction via selection matmuls (int arrays ride exact int32
  multiply-sums; the uint32 subset masks ride i32 bit patterns),
* R refinement iterations (static unroll) with pre-drawn noise, each a
  (n, S) one-hot x (S,) prediction matmul + weighted SSE likelihood.

K-MAJOR layout (see grow_pallas._grow_math): lf/pred carry the output
axis first so k=1 trailing dims are not padded to 128 lanes.
Constant leaf response, n_outputs == 1 only (callers fall back to XLA
otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(sv_ref, sl_ref, st_ref, lf_ref, ct_ref, li_ref, pred_ref,
            lw_ref, resid_ref, llw_ref, eps_ref, uacc_ref, usel_ref,
            hiv_ref,
            sv_o, sl_o, st_o, lf_o, ct_o, li_o, pred_o,
            *, P: int, S: int, n: int, R: int, m: int):
    # --- categorical winner over all particles ---
    lw = lw_ref[0, :]
    mx = jnp.max(lw)
    e = jnp.exp(lw - mx)
    cdf_mat = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
               <= jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(jnp.float32)
    cdf = jax.lax.dot_general(
        e[None, :], cdf_mat, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    u = usel_ref[0, 0] * cdf[P - 1]
    widx = jnp.sum((cdf < u).astype(jnp.int32))
    widx = jnp.clip(widx, 0, P - 1)

    wsel = (jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)[0]
            == widx).astype(jnp.float32)  # (P,)

    def pick2(mat_f32):  # (P, Z) f32 -> (Z,)
        return jax.lax.dot_general(
            wsel[None, :], mat_f32,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]

    # integer selections via int32 multiply-sum (no i1 broadcasts —
    # Mosaic only broadcasts 32-bit types across a new minor dim)
    wsel_i = wsel.astype(jnp.int32)[:, None]  # (P, 1)
    sv_w = jnp.sum(sv_ref[:, 0, :] * wsel_i, axis=0)
    st_w = jnp.sum(
        jax.lax.bitcast_convert_type(st_ref[:, 0, :], jnp.int32) * wsel_i,
        axis=0)
    li_w = jnp.sum(li_ref[:, 0, :] * wsel_i, axis=0)
    sl_w = pick2(sl_ref[:, 0, :])
    ct_w = pick2(ct_ref[:, 0, :])
    lf_w = pick2(lf_ref[:, 0, :])      # (S,)  [k-major, k == 1]
    pred_w = pick2(pred_ref[:, 0, :])  # (n,)

    # --- R Metropolis refinement sweeps on the winner's leaf values ---
    # Acceptance = likelihood ratio x leaf-prior ratio, the prior being
    # the growth proposal density N(leaf residual mean / m, leaf_sd)
    # (hiv = 0.5 / leaf_sd^2); see sampler/pgbart refine_body for why.
    resid = resid_ref[0, :]  # (n,)
    llw = llw_ref[0, :]
    hiv = hiv_ref[0, 0]
    leaf_mask = ((sv_w < 0) & (ct_w > 0)).astype(jnp.float32)
    soh = (jax.lax.broadcasted_iota(jnp.int32, (S, n), 0)
           == li_w[None, :]).astype(jnp.float32)  # (S, n): rows in lanes
    leaf_rsum = jax.lax.dot_general(
        resid[None, :], soh, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[0]  # (S,)
    prior_center = leaf_rsum / jnp.maximum(ct_w, 1.0) / m

    def ll_of(pred_x):
        diff = resid - pred_x
        return -0.5 * jnp.sum(llw * diff * diff)

    def lp_of(lf_x):
        dev = lf_x - prior_center
        return -hiv * jnp.sum(leaf_mask * dev * dev)

    ll_c = ll_of(pred_w) + lp_of(lf_w)
    for r in range(R):
        lf_p = lf_w + eps_ref[r, 0, :] * leaf_mask
        pred_p = jax.lax.dot_general(
            lf_p[None, :], soh, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        ll_p = ll_of(pred_p) + lp_of(lf_p)
        acc = jnp.log(uacc_ref[0, r]) < (ll_p - ll_c)
        accf = acc.astype(jnp.float32)
        lf_w = accf * lf_p + (1.0 - accf) * lf_w
        pred_w = accf * pred_p + (1.0 - accf) * pred_w
        ll_c = jnp.where(acc, ll_p, ll_c)

    sv_o[0, :] = sv_w
    sl_o[0, :] = sl_w
    st_o[0, :] = jax.lax.bitcast_convert_type(st_w, jnp.uint32)
    lf_o[0, :] = lf_w
    ct_o[0, :] = ct_w
    li_o[0, :] = li_w
    pred_o[0, :] = pred_w


@functools.partial(jax.jit, static_argnames=("num_refinements", "m"))
def select_refine_pallas(sv, sl, st, lf, ct, leaf_idx, pred, log_w,
                         resid, ll_weight, eps, u_acc, u_sel,
                         half_inv_var, num_refinements: int, m: int = 1):
    """Select the winner tree by categorical(log_w) and refine its leaves.

    K-major: lf/pred (P, k, S)/(P, k, n); resid/ll_weight (k, n);
    eps (R, k, S) pre-scaled refinement noise; u_acc (R,) accept uniforms;
    u_sel scalar selection uniform; half_inv_var scalar 0.5/leaf_sd^2 and
    m the tree count, for the N(leaf residual mean / m, leaf_sd)
    leaf-value prior term of the MH acceptance.
    Returns (sv (S,), sl, st, lf (k, S), ct, leaf_idx (n,), pred (k, n)).
    Only supports n_outputs == 1 (callers fall back to XLA otherwise).
    """
    P, S = sv.shape
    n = leaf_idx.shape[1]
    k = lf.shape[1]
    if k != 1:
        raise ValueError("select_refine_pallas supports n_outputs == 1 only")
    R = num_refinements

    out = pl.pallas_call(
        functools.partial(_kernel, P=P, S=S, n=n, R=R, m=m),
        out_shape=[
            jax.ShapeDtypeStruct((1, S), jnp.int32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.uint32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11
        + [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        interpret=(jax.default_backend() == "cpu"),
    )(sv.reshape(P, 1, S), sl.reshape(P, 1, S), st.reshape(P, 1, S),
      lf, ct.reshape(P, 1, S), leaf_idx.reshape(P, 1, n), pred,
      log_w.reshape(1, P), resid, ll_weight, eps,
      u_acc.reshape(1, R), u_sel.reshape(1, 1),
      jnp.asarray(half_inv_var, jnp.float32).reshape(1, 1))
    return (out[0][0], out[1][0], out[2][0], out[3][0][None, :],
            out[4][0], out[5][0], out[6][0][None, :])
