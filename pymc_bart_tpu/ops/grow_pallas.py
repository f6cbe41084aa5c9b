"""Fused Pallas TPU kernel for the PGBART growth round.

Motivation (measured on TPU v5e): the JAX implementation of one growth
round lowers to ~50-70 small HLO kernels per round, and per-kernel fixed
cost (~tens of microseconds at these tiny shapes) dominates the draw
time.  This kernel fuses the whole round — grow decisions, split
variable/value draws, row routing, child sufficient statistics via an
MXU one-hot matmul, empty-child revert, structure/leaf commits, and the
round's sum-of-trees predictions — into ONE ``pallas_call`` with a grid
over particles, with everything resident in VMEM.

Two further fusions ride along:

* **Ancestor gather**: the conditional-SMC resampling step selects
  ancestor particles; instead of gathering the seven particle-state
  arrays with separate HLO ops, the kernel reads each state block through
  a scalar-prefetched ``take`` index (``PrefetchScalarGridSpec``), so
  resampling costs nothing on the state arrays.
* **Prediction**: the per-round particle predictions (needed for SMC
  weights) are produced by the same kernel via an (n, S) one-hot x
  (S, k) leaf matmul on the MXU.

All random numbers are DRAWN OUTSIDE with ``jax.random`` and passed in,
so this kernel is bit-exact against the pure-JAX reference path
(`sampler/pgbart._grow_round`) and unit-tested for equality.

Scope: constant leaf response (the default hot path); linear/mix
responses and very large X (n*p*4B beyond VMEM) fall back to the JAX
path.  Reference for semantics: SURVEY 2.3 and sampler/pgbart.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BartConfig


def _kernel(take_ref, frozen_ref,
            sv_ref, sl_ref, st_ref, lf_ref, ct_ref, sp_ref, li_ref,
            x_ref, resid_ref, rules_ref, cdf_ref, lsd_ref, llw_ref,
            u_grow_ref, u_var_ref, row_gum_ref, eps_ref, set_bits_ref,
            sv_o, sl_o, st_o, lf_o, ct_o, sp_o, li_o, pred_o, ll_o,
            *, d: int, S: int, n: int, p: int, k: int,
            m: int, p_grow: float):
    lo, hi = 2**d - 1, 2 ** (d + 1) - 1
    G = hi - lo

    gidx = pl.program_id(0)
    frozen = frozen_ref[take_ref[gidx]] != 0

    sv = sv_ref[0, 0, :]          # (S,)
    ct = ct_ref[0, 0, :]
    li = li_ref[0, 0, :]          # (n,)

    node_sv = sv[lo:hi]
    node_ct = ct[lo:hi]
    is_leaf = node_sv < 0
    alive = node_ct >= 2.0
    want_grow = (u_grow_ref[0, 0, :] < p_grow) & is_leaf & alive & (~frozen)

    # split variable via inverse CDF over alpha weights: (G, p) mask count
    cdf = cdf_ref[0, :]
    u_var = u_var_ref[0, 0, :] * cdf[p - 1]
    var_s = jnp.sum((cdf[None, :] < u_var[:, None]).astype(jnp.int32), axis=1)
    var_s = jnp.clip(var_s, 0, p - 1)

    # uniform row per node via Gumbel-max within node membership
    slots = lo + jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)[0]
    in_node = li[:, None] == slots[None, :]
    scores = jnp.where(in_node, row_gum_ref[0, 0, :][:, None], -jnp.inf)
    row_sel = jnp.argmax(scores, axis=0).astype(jnp.int32)

    # effective split params (frozen replays stored splits)
    node_sl = sl_ref[0, 0, lo:hi]
    node_st = st_ref[0, 0, lo:hi]
    varx = jnp.where(frozen, node_sv, var_s)
    varx_c = jnp.clip(varx, 0, p - 1)

    # split value per node: X[row_sel[g], varx_c[g]] via two selection
    # matmuls on the MXU — B = rowsel^T X is (G, p), then pick the node's
    # column.  NaNs are masked through the matmuls and re-flagged,
    # preserving NaN-routes-right semantics.  Temporaries are kept at
    # (G, p) / (n,) shapes to stay inside the 16MB VMEM budget.
    xraw = x_ref[:, :]
    xnan = jnp.isnan(xraw)
    x_z = jnp.where(xnan, 0.0, xraw)
    xnan_f = xnan.astype(jnp.float32)
    colsel = (jax.lax.broadcasted_iota(jnp.int32, (G, p), 1)
              == varx_c[:, None]).astype(jnp.float32)  # (G, p)
    rowsel = (jax.lax.broadcasted_iota(jnp.int32, (n, G), 0)
              == row_sel[None, :]).astype(jnp.float32)  # (n, G)
    Bv = jax.lax.dot_general(  # (G, p): selected row's full X row per node
        rowsel, x_z, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    Bn = jax.lax.dot_general(
        rowsel, xnan_f, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    val_raw = jnp.sum(Bv * colsel, axis=1)
    val_nan = jnp.sum(Bn * colsel, axis=1) > 0.5
    val_raw = jnp.where(val_nan, jnp.nan, val_raw)

    # subset-rule bitmask includes the selected row's own category.
    # All bitmask arithmetic runs on int32 bit patterns (Mosaic supports
    # neither u32 reductions nor f32->u32 casts); exactness is preserved
    # because only bitwise ops are applied.
    own_cat = jnp.clip(jnp.nan_to_num(val_raw, nan=0.0).astype(jnp.int32),
                       0, 31)
    bits_i = jax.lax.bitcast_convert_type(set_bits_ref[0, 0, :], jnp.int32)
    st_s_i = bits_i | (jnp.int32(1) << own_cat)
    node_st_i = jax.lax.bitcast_convert_type(node_st, jnp.int32)

    valx = jnp.where(frozen, node_sl, val_raw)
    setx_i = jnp.where(frozen, node_st_i, st_s_i)
    active = (frozen & (node_sv >= 0)) | (~frozen & want_grow)

    # per-node split rule
    rules = rules_ref[0, :]
    rule_g = jnp.sum(jnp.where(colsel > 0.5, rules[None, :], 0), axis=1)

    # per-row split parameters at the row's own node (selection matmuls
    # over G; exact — each row weight vector has a single 1)
    in_level = (li >= lo) & (li < hi)
    g_row = jnp.clip(li - lo, 0, G - 1)
    row_onehot = (g_row[:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (n, G), 1))
    row_onehot_f = row_onehot.astype(jnp.float32)

    def pick_row(vec_f32):  # (G,) f32 -> per-row value (n,)
        return jax.lax.dot_general(
            row_onehot_f, vec_f32.reshape(G, 1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0]

    varx_row = pick_row(varx_c.astype(jnp.float32)).astype(jnp.int32)
    valx_row = pick_row(jnp.where(jnp.isnan(valx), 0.0, valx))
    valnan_row = pick_row(jnp.isnan(valx).astype(jnp.float32)) > 0.5
    rule_row = pick_row(rule_g.astype(jnp.float32)).astype(jnp.int32)
    active_row = pick_row(active.astype(jnp.float32)) > 0.5
    # selection-sum over i32 bit patterns; exact: each row selects a
    # single entry among zeros
    setx_row_i = jnp.sum(jnp.where(row_onehot, setx_i[None, :], 0), axis=1)

    # the row's own covariate value x[i, varx_row[i]] via (n, p) one-hot
    colsel_row = (jax.lax.broadcasted_iota(jnp.int32, (n, p), 1)
                  == varx_row[:, None]).astype(jnp.float32)
    xv = jnp.sum(x_z * colsel_row, axis=1)
    xv_nan = jnp.sum(xnan_f * colsel_row, axis=1) > 0.5

    anynan = xv_nan | valnan_row
    cont = (xv <= valx_row) & ~anynan
    eq_rule = (xv == valx_row) & ~anynan
    cat_row = jnp.clip(xv, 0.0, 31.0).astype(jnp.int32)
    # arithmetic right shift: bit 0 of (x >> c) is bit c of x for c in [0,31]
    subset = (((setx_row_i >> cat_row) & jnp.int32(1)) > 0) & ~xv_nan
    rr0 = rule_row == 0
    rr1 = rule_row == 1
    left = (rr0 & cont) | (rr1 & eq_rule) | (~rr0 & ~rr1 & subset)
    row_active = in_level & active_row
    child = 2 * li + 1 + (1 - left.astype(jnp.int32))
    tentative = jnp.where(row_active, child, li)

    # child sufficient statistics on the MXU: one-hot (n, 2G)
    cslots = hi + jax.lax.broadcasted_iota(jnp.int32, (n, 2 * G), 1)
    oh = (tentative[:, None] == cslots).astype(jnp.float32)
    ccounts = jnp.sum(oh, axis=0)                       # (2G,)
    csums = jax.lax.dot_general(                        # (2G, k)
        oh, resid_ref[:, :],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # left/right child counts via selection matmuls over ccounts (tiny;
    # Mosaic has no vector reshape)
    i2g = jax.lax.broadcasted_iota(jnp.int32, (2 * G, G), 0)
    ig = jax.lax.broadcasted_iota(jnp.int32, (2 * G, G), 1)
    sel_l = (i2g == 2 * ig).astype(jnp.float32)        # picks even entries
    sel_r = (i2g == 2 * ig + 1).astype(jnp.float32)    # picks odd entries
    cl = jax.lax.dot_general(
        ccounts[None, :], sel_l, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    cr = jax.lax.dot_general(
        ccounts[None, :], sel_r, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    valid = (cl > 0) & (cr > 0)
    grow_ok = want_grow & valid
    active_final = (frozen & (node_sv >= 0)) | (~frozen & grow_ok)
    row_act_final = in_level & (pick_row(active_final.astype(jnp.float32)) > 0.5)
    li_new = jnp.where(row_act_final, child, li)
    li_o[0, 0, :] = li_new

    # commit structure (full copy + static-slice overwrite of the level)
    node_sv_new = jnp.where(grow_ok, var_s, node_sv)
    sv_o[0, 0, :] = sv
    sv_o[0, 0, lo:hi] = node_sv_new
    sl_o[0, 0, :] = sl_ref[0, 0, :]
    sl_o[0, 0, lo:hi] = jnp.where(grow_ok, val_raw, node_sl)
    st_o[0, 0, :] = st_ref[0, 0, :]
    st_o[0, 0, lo:hi] = jax.lax.bitcast_convert_type(
        jnp.where(grow_ok, st_s_i, node_st_i), jnp.uint32)

    # children: counts + leaf values ~ N(child mean / m, leaf_sd).
    # expand (G,) -> (2G,) child mask with a selection matmul (no reshapes)
    gf = grow_ok.astype(jnp.float32)
    expand = (jax.lax.broadcasted_iota(jnp.int32, (G, 2 * G), 1) // 2
              == jax.lax.broadcasted_iota(jnp.int32, (G, 2 * G), 0)
              ).astype(jnp.float32)
    pmask2g = jax.lax.dot_general(
        gf[None, :], expand,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]  # (2G,)
    parent_ok = pmask2g > 0.5
    old_cct = ct[hi : hi + 2 * G]
    ct_o[0, 0, :] = ct
    ct_o[0, 0, hi : hi + 2 * G] = jnp.where(parent_ok, ccounts, old_cct)

    lsd = lsd_ref[0, :]  # (k,)
    mu = csums / jnp.maximum(ccounts, 1.0)[:, None] / m \
        + eps_ref[0, :, :] * lsd[None, :]
    lf_full = lf_ref[0, :, :]  # (S, k)
    old_clf = lf_full[hi : hi + 2 * G, :]
    # float-mask blend: Mosaic cannot broadcast i1 vectors across axes
    new_clf = pmask2g[:, None] * mu + (1.0 - pmask2g[:, None]) * old_clf
    pieces = [lf_full[:hi, :], new_clf]
    if hi + 2 * G < S:  # static; Mosaic rejects empty vector slices
        pieces.append(lf_full[hi + 2 * G :, :])
    lf_new = jnp.concatenate(pieces, axis=0)
    lf_o[0, :, :] = lf_new
    sp_o[0, :, :] = sp_ref[0, :, :]  # constant response: slopes stay zero

    # per-round prediction: one-hot (n, S) x leaf (S, k) on the MXU
    soh = (li_new[:, None]
           == jax.lax.broadcasted_iota(jnp.int32, (n, S), 1)).astype(jnp.float32)
    pred = jax.lax.dot_general(
        soh, lf_new,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pred_o[0, :, :] = pred

    # fused Gaussian SMC weight (constant-free log-likelihood):
    # ll = -0.5 * sum(W * (resid - pred)^2); W == 0 when the model's
    # likelihood is not Gaussian (output then unused by the caller)
    diff = resid_ref[:, :] - pred
    llv = -0.5 * jnp.sum(llw_ref[:, :] * diff * diff)
    ll_o[0, :, :] = jnp.full((1, 1), llv, jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("d", "cfg"),
)
def grow_round_pallas(take, frozen, sv, sl, st, lf, ct, sp, leaf_idx,
                      X, resid, rules, alpha_cdf, leaf_sd, ll_weight,
                      u_grow, u_var, row_gum, eps, set_bits,
                      d: int, cfg: BartConfig):
    """One fused growth round for all particles.

    take: int32[P] ancestor index per output particle (identity when the
    SMC did not resample this round).  State arrays are (P, S[, k]);
    randoms are per-particle blocks drawn outside with jax.random.
    ``ll_weight`` (n, k): per-observation Gaussian precision for the fused
    SMC log-likelihood output (pass zeros for non-Gaussian models and use
    the XLA likelihood on ``pred`` instead).
    Returns (sv, sl, st, lf, ct, sp, leaf_idx, pred, ll).
    """
    P, S = sv.shape
    n, p = X.shape
    k = lf.shape[-1]
    lo, hi = 2**d - 1, 2 ** (d + 1) - 1
    G = hi - lo
    p_grow = float(cfg.alpha * (1.0 + d) ** (-cfg.beta))

    kernel = functools.partial(
        _kernel, d=d, S=S, n=n, p=p, k=k, m=cfg.m, p_grow=p_grow,
    )

    # Mosaic requires the last two block dims to divide (8, 128) or equal
    # the array dims; per-particle vectors therefore ride as (P, 1, Z)
    # with (1, 1, Z) blocks.
    def anc3(i, take_ref):  # ancestor-indexed state blocks
        return (take_ref[i], 0, 0)

    def own3(i, take_ref):  # per-particle randoms
        return (i, 0, 0)

    def shared(i, take_ref):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(P,),
        in_specs=[
            pl.BlockSpec((P,), lambda i, t: (0,), memory_space=pltpu.SMEM),  # frozen
            pl.BlockSpec((1, 1, S), anc3),
            pl.BlockSpec((1, 1, S), anc3),
            pl.BlockSpec((1, 1, S), anc3),
            pl.BlockSpec((1, S, k), anc3),
            pl.BlockSpec((1, 1, S), anc3),
            pl.BlockSpec((1, S, k), anc3),
            pl.BlockSpec((1, 1, n), anc3),
            pl.BlockSpec((n, p), shared),
            pl.BlockSpec((n, k), shared),
            pl.BlockSpec((1, p), shared),
            pl.BlockSpec((1, p), shared),
            pl.BlockSpec((1, k), shared),
            pl.BlockSpec((n, k), shared),
            pl.BlockSpec((1, 1, G), own3),
            pl.BlockSpec((1, 1, G), own3),
            pl.BlockSpec((1, 1, n), own3),
            pl.BlockSpec((1, 2 * G, k), own3),
            pl.BlockSpec((1, 1, G), own3),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, S, k), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, S, k), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, n), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, n, k), lambda i, t: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, t: (i, 0, 0)),
        ],
    )

    out_shape = [
        jax.ShapeDtypeStruct((P, 1, S), jnp.int32),
        jax.ShapeDtypeStruct((P, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, S), jnp.uint32),
        jax.ShapeDtypeStruct((P, S, k), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((P, S, k), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, n), jnp.int32),
        jax.ShapeDtypeStruct((P, n, k), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, 1), jnp.float32),
    ]

    frozen_i32 = frozen.astype(jnp.int32)
    r3 = lambda a: a.reshape(P, 1, -1)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=(jax.default_backend() == "cpu"),
    )(take.astype(jnp.int32), frozen_i32,
      r3(sv), r3(sl), r3(st), lf, r3(ct), sp, r3(leaf_idx),
      X, resid, rules.reshape(1, -1), alpha_cdf.reshape(1, -1),
      leaf_sd.reshape(1, -1), ll_weight,
      r3(u_grow), r3(u_var), r3(row_gum), eps.reshape(P, 2 * G, k),
      r3(set_bits))
    sv_o, sl_o, st_o, lf_o, ct_o, sp_o, li_o, pred_o, ll_o = out
    return (sv_o.reshape(P, S), sl_o.reshape(P, S), st_o.reshape(P, S),
            lf_o, ct_o.reshape(P, S), sp_o, li_o.reshape(P, n), pred_o,
            ll_o.reshape(P))
