"""Fused Pallas TPU kernels for the PGBART growth round.

Motivation (measured on TPU v5e): the JAX implementation of one growth
round lowers to ~50-70 small HLO kernels per round, and per-kernel fixed
cost (~tens of microseconds at these tiny shapes) dominates the draw
time.  These kernels fuse the whole round — grow decisions, split
variable/value draws, row routing, child sufficient statistics via MXU
one-hot matmuls, empty-child revert, structure/leaf commits, the round's
sum-of-trees predictions, and a fused constant-free Gaussian SMC
log-likelihood — into a single ``pallas_call``.

Two drivers share one algorithm body (``_grow_math``):

* ``grow_round_pallas`` — grid over particles; ancestor selection after
  resampling is folded in by reading state blocks through a
  scalar-prefetched ``take`` index.
* ``grow_round_pallas_single`` — ONE program with an internal fori over
  particles.  Measured per-grid-program overhead is ~15us on v5e; with
  P=20 particles x 30 rounds per draw that overhead alone is ~9ms/draw,
  so the single-program form is the default.

All random numbers are DRAWN OUTSIDE with ``jax.random`` and passed in,
so these kernels are bit-equivalent to the pure-JAX reference path
(`sampler/pgbart._grow_round`) and unit-tested for equality.

Mosaic (v5e) constraints honored throughout: no dynamic_slice on values
(static slicing only — d is static), no select/broadcast/reshape on i1
vectors (logical algebra, f32 mask blends, selection matmuls), no u32
reductions or f32->u32 casts (i32 bit patterns), no vector reshapes, no
empty vector slices, no scalar VMEM stores, VMEM-budget-aware
temporaries (row-level vectors + (G, p) selection products).

Scope: constant, linear and mix leaf responses (round-5: per-child
least-squares slope fits ride three extra sufficient-statistics matmuls
against the child one-hot — reference bart.py:85-87,125-129); very
large X (n*p beyond VMEM) falls back to the JAX path.
Reference for semantics: SURVEY 2.3 and sampler/pgbart.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BartConfig


def _grow_math(frozen, sv, sl, st, lf, ct, sp, li, pred_prev,
               x_z, xnan_f, xT_z, xnanT_f, resid, rules, cdf, lsd, llw,
               u_grow, u_var, row_gum, eps, set_bits, u_mix,
               *, d: int, S: int, n: int, p: int, k: int,
               m: int, p_grow: float, response: str = "constant"):
    """One particle's growth round on VMEM-resident values.

    LANE-MAJOR-ROWS layout: the n-row axis rides last everywhere so the
    (8, 128) tiling packs rows into lanes and small node/output axes into
    sublanes (a (n, G<=32) matrix would otherwise pad G to 128 lanes —
    4-16x wasted VPU work): lf/sp (k, S), resid/llw (k, n), eps (k, 2G),
    node-by-row masks (G, n); returns pred (k, n).  ``xT_z``/``xnanT_f``
    are the (p, n) transposes, precomputed once outside.
    Other inputs: sv/sl/ct (S,), st (S,) uint32, li (n,) int32.

    ``response`` (static): "constant" leaves ``sp`` untouched; "linear"/
    "mix" fit a per-child least-squares slope of the residual against the
    parent's split covariate (reference bart.py:85-87) from three extra
    per-child sufficient statistics (sum x, sum x^2, sum x*r — two more
    MXU matmuls against the already-built child one-hot), matching
    ``sampler/pgbart._grow_round`` bit-for-bit under shared randoms.
    A leaf then predicts ``lf + sp * x[:, parent split var]``
    (ops/predict.leaf_values_at), carried incrementally like the
    constant case — the parent split covariate ``xv`` is already in
    registers when the moved rows pick their child values.

    ``pred_prev`` (k, n) is this particle's prediction after the previous
    round; the new prediction is computed INCREMENTALLY — rows only move
    one level per round, and leaf values at slots < 2^(d+1)-1 are never
    written in round d, so only rows that actually routed to a child this
    round change value (to that child's leaf value).  This replaces the
    (S, n) one-hot + (k,S)x(S,n) matmul full recomputation, the single
    largest VPU+MXU item of the round, with a (k,2G)x(2G,n) pick that
    reuses the already-built child one-hot.
    Returns (sv', sl', st', lf', ct', li', pred (k, n), ll scalar).
    """
    lo, hi = 2**d - 1, 2 ** (d + 1) - 1
    G = hi - lo

    node_sv = sv[lo:hi]
    node_ct = ct[lo:hi]
    is_leaf = node_sv < 0
    alive = node_ct >= 2.0
    want_grow = (u_grow < p_grow) & is_leaf & alive & (~frozen)

    # split variable via inverse CDF over alpha weights: (G, p) mask count
    u_v = u_var * cdf[p - 1]
    var_s = jnp.sum((cdf[None, :] < u_v[:, None]).astype(jnp.int32), axis=1)
    var_s = jnp.clip(var_s, 0, p - 1)

    # node membership one-hot (G, n): doubles as the Gumbel-max scoring
    # mask AND the node->row selection operand of every per-row pick
    # below (a row outside this level has an all-zero column; such rows
    # are masked by in_level before anything they touch is used)
    slots = lo + jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)[0]
    in_level = (li >= lo) & (li < hi)
    row_onehot = slots[:, None] == li[None, :]            # (G, n)
    row_onehot_f = row_onehot.astype(jnp.float32)

    # uniform row per node via Gumbel-max within node membership
    scores = jnp.where(row_onehot, row_gum[None, :], -jnp.inf)
    row_sel = jnp.argmax(scores, axis=1).astype(jnp.int32)

    # effective split params (frozen replays stored splits)
    node_sl = sl[lo:hi]
    node_st = st[lo:hi]
    varx = jnp.where(frozen, node_sv, var_s)
    varx_c = jnp.clip(varx, 0, p - 1)
    active = (frozen & (node_sv >= 0)) | (~frozen & want_grow)

    def rows_pick(mat_gxn_rows):  # (r, G) f32 -> (r, n): exact selections
        return jax.lax.dot_general(
            mat_gxn_rows, row_onehot_f,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def pack_rows(*vecs):  # r x (G,) f32 -> (r, G) via iota blends (tiny)
        r = len(vecs)
        out = jnp.zeros((r, G), jnp.float32)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (r, G), 0)
        for i, v in enumerate(vecs):
            out = jnp.where(row_iota == i, v[None, :], out)
        return out

    # wave 1: the row's node's split variable
    varx_row = rows_pick(pack_rows(varx_c.astype(jnp.float32)))[0]
    varx_row = varx_row.astype(jnp.int32)

    if p <= 32:
        # the row's own covariate value x[i, varx_row[i]] and the rule of
        # that column, via a (p, n) covariate one-hot — cheaper than the
        # per-node xcol matmuls when p is small
        colhot = (jax.lax.broadcasted_iota(jnp.int32, (p, n), 0)
                  == varx_row[None, :]).astype(jnp.float32)
        xv = jnp.sum(colhot * xT_z, axis=0)
        xv_nan = jnp.sum(colhot * xnanT_f, axis=0) > 0.5
        rule_row = jnp.sum(colhot * rules[None, :].T.astype(jnp.float32),
                           axis=0).astype(jnp.int32)
        # split value per node = xv at the node's selected row
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (G, n), 1)
                  == row_sel[:, None]).astype(jnp.float32)
        val_raw = jnp.sum(rowsel * xv[None, :], axis=1)
        val_nan = jnp.sum(rowsel * xv_nan.astype(jnp.float32)[None, :],
                          axis=1) > 0.5
        val_raw = jnp.where(val_nan, jnp.nan, val_raw)
    else:
        # wide-X path: per-node column extraction on the MXU
        colsel = (jax.lax.broadcasted_iota(jnp.int32, (G, p), 1)
                  == varx_c[:, None]).astype(jnp.float32)  # (G, p)
        rowsel = (jax.lax.broadcasted_iota(jnp.int32, (G, n), 1)
                  == row_sel[:, None]).astype(jnp.float32)  # (G, n)
        Bv = jax.lax.dot_general(
            rowsel, x_z, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        Bn = jax.lax.dot_general(
            rowsel, xnan_f, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        val_raw = jnp.sum(Bv * colsel, axis=1)
        val_nan = jnp.sum(Bn * colsel, axis=1) > 0.5
        val_raw = jnp.where(val_nan, jnp.nan, val_raw)
        rule_g = jnp.sum(jnp.where(colsel > 0.5, rules[None, :], 0), axis=1)
        xcol = jax.lax.dot_general(
            colsel, xT_z, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # (G, n)
        xcol_nan = jax.lax.dot_general(
            colsel, xnanT_f, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xv = jnp.sum(jnp.where(row_onehot, xcol, 0.0), axis=0)
        xv_nan = jnp.sum(jnp.where(row_onehot, xcol_nan, 0.0), axis=0) > 0.5
        rule_row = rows_pick(pack_rows(rule_g.astype(jnp.float32)))[0]
        rule_row = rule_row.astype(jnp.int32)

    # hash-salted subset rule: the stored word is a raw SALT (i32 bit
    # patterns; Mosaic: no u32 reductions, no f32->u32 casts); the own
    # category is a member via split-value equality below.
    st_s_i = jax.lax.bitcast_convert_type(set_bits, jnp.int32)
    node_st_i = jax.lax.bitcast_convert_type(node_st, jnp.int32)

    valx = jnp.where(frozen, node_sl, val_raw)
    setx_i = jnp.where(frozen, node_st_i, st_s_i)

    # wave 2: every remaining per-row node quantity in ONE selection
    # matmul; the 32-bit subset masks ride as two 16-bit halves (exact in
    # f32) instead of a separate i32 mask-and-reduce
    set_lo = (setx_i & jnp.int32(0xFFFF)).astype(jnp.float32)
    set_hi = jax.lax.shift_right_logical(setx_i, 16).astype(jnp.float32)
    picked = rows_pick(pack_rows(
        jnp.where(jnp.isnan(valx), 0.0, valx),
        jnp.isnan(valx).astype(jnp.float32),
        active.astype(jnp.float32),
        set_lo,
        set_hi,
    ))
    valx_row = picked[0]
    valnan_row = picked[1] > 0.5
    active_row = picked[2] > 0.5
    setx_row_i = (picked[3].astype(jnp.int32)
                  | (picked[4].astype(jnp.int32) << 16))

    anynan = xv_nan | valnan_row
    cont = (xv <= valx_row) & ~anynan
    eq_rule = (xv == valx_row) & ~anynan
    cat_row = jnp.nan_to_num(xv, nan=0.0).astype(jnp.int32)
    # hash-salted membership (ops/trees.py subset_member, inlined with
    # the already-computed own-category equality eq_rule)
    hsh = setx_row_i ^ (cat_row * jnp.int32(1103515245))
    hsh = (hsh ^ jax.lax.shift_right_logical(hsh, 15)) * jnp.int32(73244475)
    hsh = hsh ^ jax.lax.shift_right_logical(hsh, 13)
    subset = (eq_rule | ((hsh & jnp.int32(1)) > 0)) & ~xv_nan
    rr0 = rule_row == 0
    rr1 = rule_row == 1
    left = (rr0 & cont) | (rr1 & eq_rule) | (~rr0 & ~rr1 & subset)
    row_active = in_level & active_row
    child = 2 * li + 1 + (1 - left.astype(jnp.int32))
    tentative = jnp.where(row_active, child, li)

    # child sufficient statistics on the MXU: one-hot (2G, n)
    cslots = hi + jax.lax.broadcasted_iota(jnp.int32, (2 * G, n), 0)
    oh = (cslots == tentative[None, :]).astype(jnp.float32)
    ccounts = jnp.sum(oh, axis=1)                       # (2G,)
    csums = jax.lax.dot_general(                        # (k, 2G)
        resid, oh,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if response != "constant":
        # linear leaf response: per-child (sum x, sum x^2) in one packed
        # (2, n) matmul and (sum x*r) in a (k, n) matmul, all against the
        # same child one-hot; xv is the parent's split covariate per row
        # (zero outside the level — those rows have an all-zero oh column)
        xrow_iota = jax.lax.broadcasted_iota(jnp.int32, (2, n), 0)
        xmat = jnp.where(xrow_iota == 0, xv[None, :], (xv * xv)[None, :])
        xstats = jax.lax.dot_general(                   # (2, 2G)
            xmat, oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_x = xstats[0]
        s_x2 = xstats[1]
        s_xr = jax.lax.dot_general(                     # (k, 2G)
            resid * xv[None, :], oh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    # left/right child counts via selection matmuls over ccounts (tiny;
    # Mosaic has no vector reshape)
    i2g = jax.lax.broadcasted_iota(jnp.int32, (2 * G, G), 0)
    ig = jax.lax.broadcasted_iota(jnp.int32, (2 * G, G), 1)
    sel_l = (i2g == 2 * ig).astype(jnp.float32)
    sel_r = (i2g == 2 * ig + 1).astype(jnp.float32)
    cl = jax.lax.dot_general(
        ccounts[None, :], sel_l, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    cr = jax.lax.dot_general(
        ccounts[None, :], sel_r, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    valid = (cl > 0) & (cr > 0)
    grow_ok = want_grow & valid
    active_final = (frozen & (node_sv >= 0)) | (~frozen & grow_ok)
    # wave 3: the post-validation activity bit per row
    af_row = rows_pick(pack_rows(active_final.astype(jnp.float32)))[0]
    row_act_final = in_level & (af_row > 0.5)
    li_new = jnp.where(row_act_final, child, li)

    # commit structure: scatter the level segment back into the S-vector
    # with selection products (Mosaic-safe; no 1-D concatenates)
    iota_S = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0]
    lvl_mask = (iota_S >= lo) & (iota_S < hi)

    def scatter_level_f32(vec, level_new):
        selM = (jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
                == lo + jax.lax.broadcasted_iota(jnp.int32, (G, S), 0)
                ).astype(jnp.float32)
        full = jax.lax.dot_general(
            level_new[None, :], selM,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        return jnp.where(lvl_mask, full, vec)

    def scatter_level_i32(vec_i, level_new_i):
        selM_i = (jax.lax.broadcasted_iota(jnp.int32, (G, S), 1)
                  == lo + jax.lax.broadcasted_iota(jnp.int32, (G, S), 0)
                  ).astype(jnp.int32)
        full = jnp.sum(level_new_i[:, None] * selM_i, axis=0)
        return jnp.where(lvl_mask, full, vec_i)

    sv_new = scatter_level_i32(sv, jnp.where(grow_ok, var_s, node_sv))
    sl_new = scatter_level_f32(sl, jnp.where(grow_ok, val_raw, node_sl))
    st_new = jax.lax.bitcast_convert_type(
        scatter_level_i32(jax.lax.bitcast_convert_type(st, jnp.int32),
                          jnp.where(grow_ok, st_s_i, node_st_i)), jnp.uint32)

    # children: counts + leaf values ~ N(child mean / m, leaf_sd).
    # expand (G,) -> (2G,) child mask with a selection matmul
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

    child_mask = (iota_S >= hi) & (iota_S < hi + 2 * G)

    def scatter_children_f32(vec, child_new):
        selC = (jax.lax.broadcasted_iota(jnp.int32, (2 * G, S), 1)
                == hi + jax.lax.broadcasted_iota(jnp.int32, (2 * G, S), 0)
                ).astype(jnp.float32)
        full = jax.lax.dot_general(
            child_new[None, :], selC,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        return jnp.where(child_mask, full, vec)

    ct_new = scatter_children_f32(
        ct, jnp.where(parent_ok, ccounts, ct[hi : hi + 2 * G]))

    # children leaf values (k-major): mu (k, 2G)
    c_safe = jnp.maximum(ccounts, 1.0)
    mu_base = csums / c_safe[None, :] / m
    if response != "constant":
        # least-squares slope of the child residual against the parent's
        # split covariate (sampler/pgbart._grow_round linear branch)
        var_x = s_x2 - s_x * s_x / c_safe
        slope_hat = ((s_xr - (s_x / c_safe)[None, :] * csums)
                     / jnp.maximum(var_x, 1e-6)[None, :])
        usable = (ccounts >= 3.0) & (var_x > 1e-6)
        if response == "mix":
            usable = usable & (u_mix < 0.5)
        usable_f = usable.astype(jnp.float32)[None, :]  # (1, 2G) blend
        slope_hat = slope_hat * usable_f
        intercept = (csums - slope_hat * s_x[None, :]) / c_safe[None, :]
        mu_base = usable_f * (intercept / m) + (1.0 - usable_f) * mu_base
        child_slope = slope_hat / m
    mu = mu_base + eps * lsd[:, None]
    old_clf = lf[:, hi : hi + 2 * G]
    new_clf = pmask2g[None, :] * mu + (1.0 - pmask2g[None, :]) * old_clf
    selC = (jax.lax.broadcasted_iota(jnp.int32, (2 * G, S), 1)
            == hi + jax.lax.broadcasted_iota(jnp.int32, (2 * G, S), 0)
            ).astype(jnp.float32)
    full_clf = jax.lax.dot_general(
        new_clf, selC, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (k, S)
    lf_new = jnp.where(child_mask[None, :], full_clf, lf)

    if response != "constant":
        # commit children slopes exactly like leaf values (frozen replay
        # keeps the stored slopes)
        old_csp = sp[:, hi : hi + 2 * G]
        new_csp = (pmask2g[None, :] * child_slope
                   + (1.0 - pmask2g[None, :]) * old_csp)
        full_csp = jax.lax.dot_general(
            new_csp, selC, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sp_new = jnp.where(child_mask[None, :], full_csp, sp)
    else:
        sp_new = sp

    # incremental per-round prediction (k, n): rows that moved pick their
    # child's leaf value through the already-built child one-hot ``oh``;
    # unmoved rows keep pred_prev (their leaf value is untouched in this
    # round — see docstring).  Linear response adds the slope term
    # ``sp[child] * xv`` — xv IS the parent split covariate that
    # ops/predict.leaf_values_at would gather for the moved rows.
    mu_row = jax.lax.dot_general(
        new_clf, oh,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (k, n)
    if response != "constant":
        slope_row = jax.lax.dot_general(
            new_csp, oh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mu_row = mu_row + slope_row * xv[None, :]
    moved_f = (row_act_final).astype(jnp.float32)[None, :]
    pred = moved_f * mu_row + (1.0 - moved_f) * pred_prev

    # fused Gaussian SMC weight (constant-free log-likelihood); llw == 0
    # for non-Gaussian models (caller then ignores ll)
    diff = resid - pred
    ll = -0.5 * jnp.sum(llw * diff * diff)

    return sv_new, sl_new, st_new, lf_new, ct_new, sp_new, li_new, pred, ll


# ---------------------------------------------------------------------------
# driver 1: grid over particles (ancestor blocks via scalar prefetch)
# ---------------------------------------------------------------------------


def _kernel_grid(take_ref, frozen_ref,
                 sv_ref, sl_ref, st_ref, lf_ref, ct_ref, sp_ref, li_ref,
                 pred_ref,
                 x_ref, xt_ref, resid_ref, rules_ref, cdf_ref, lsd_ref,
                 llw_ref,
                 u_grow_ref, u_var_ref, row_gum_ref, eps_ref, set_bits_ref,
                 u_mix_ref,
                 sv_o, sl_o, st_o, lf_o, ct_o, sp_o, li_o, pred_o, ll_o,
                 *, d: int, S: int, n: int, p: int, k: int,
                 m: int, p_grow: float, response: str):
    gidx = pl.program_id(0)
    frozen = frozen_ref[0, take_ref[0, gidx]] != 0
    xraw = x_ref[:, :]
    xnan = jnp.isnan(xraw)
    xtraw = xt_ref[:, :]
    xtnan = jnp.isnan(xtraw)
    out = _grow_math(
        frozen, sv_ref[0, 0, :], sl_ref[0, 0, :], st_ref[0, 0, :],
        lf_ref[0, :, :], ct_ref[0, 0, :], sp_ref[0, :, :], li_ref[0, 0, :],
        pred_ref[0, :, :],
        jnp.where(xnan, 0.0, xraw), xnan.astype(jnp.float32),
        jnp.where(xtnan, 0.0, xtraw), xtnan.astype(jnp.float32),
        resid_ref[:, :], rules_ref[0, :], cdf_ref[0, :], lsd_ref[0, :],
        llw_ref[:, :],
        u_grow_ref[0, 0, :], u_var_ref[0, 0, :], row_gum_ref[0, 0, :],
        eps_ref[0, :, :], set_bits_ref[0, 0, :], u_mix_ref[0, 0, :],
        d=d, S=S, n=n, p=p, k=k, m=m, p_grow=p_grow, response=response,
    )
    sv_new, sl_new, st_new, lf_new, ct_new, sp_new, li_new, pred, ll = out
    sv_o[0, 0, :] = sv_new
    sl_o[0, 0, :] = sl_new
    st_o[0, 0, :] = st_new
    lf_o[0, :, :] = lf_new          # (k, S)
    ct_o[0, 0, :] = ct_new
    sp_o[0, :, :] = sp_new
    li_o[0, 0, :] = li_new
    pred_o[0, :, :] = pred          # (k, n)
    ll_o[0, :, :] = jnp.full((1, 1), ll, jnp.float32)


# ---------------------------------------------------------------------------
# driver 2: one program, fori over particles (default: amortizes the
# per-grid-program overhead that dominates at BART shapes)
# ---------------------------------------------------------------------------


def _kernel_single(take_ref, frozen_ref,
                   sv_ref, sl_ref, st_ref, lf_ref, ct_ref, sp_ref, li_ref,
                   pred_ref,
                   x_ref, xt_ref, resid_ref, rules_ref, cdf_ref, lsd_ref,
                   llw_ref,
                   u_grow_ref, u_var_ref, row_gum_ref, eps_ref, set_bits_ref,
                   u_mix_ref,
                   sv_o, sl_o, st_o, lf_o, ct_o, sp_o, li_o, pred_o, ll_o,
                   *, P: int, d: int, S: int, n: int, p: int, k: int,
                   m: int, p_grow: float, response: str):
    xraw = x_ref[:, :]
    xnan = jnp.isnan(xraw)
    x_z = jnp.where(xnan, 0.0, xraw)
    xnan_f = xnan.astype(jnp.float32)
    xtraw = xt_ref[:, :]
    xtnan = jnp.isnan(xtraw)
    xT_z = jnp.where(xtnan, 0.0, xtraw)
    xnanT_f = xtnan.astype(jnp.float32)
    resid = resid_ref[:, :]
    rules = rules_ref[0, :]
    cdf = cdf_ref[0, :]
    lsd = lsd_ref[0, :]
    llw = llw_ref[:, :]

    def body(pi, _):
        anc = take_ref[0, pi]
        frozen = frozen_ref[0, anc] != 0
        out = _grow_math(
            frozen, sv_ref[anc, 0, :], sl_ref[anc, 0, :], st_ref[anc, 0, :],
            lf_ref[anc, :, :], ct_ref[anc, 0, :], sp_ref[anc, :, :],
            li_ref[anc, 0, :],
            pred_ref[anc, :, :],
            x_z, xnan_f, xT_z, xnanT_f, resid, rules, cdf, lsd, llw,
            u_grow_ref[pi, 0, :], u_var_ref[pi, 0, :], row_gum_ref[pi, 0, :],
            eps_ref[pi, :, :], set_bits_ref[pi, 0, :], u_mix_ref[pi, 0, :],
            d=d, S=S, n=n, p=p, k=k, m=m, p_grow=p_grow, response=response,
        )
        sv_new, sl_new, st_new, lf_new, ct_new, sp_new, li_new, pred, ll = out
        sv_o[pi, 0, :] = sv_new
        sl_o[pi, 0, :] = sl_new
        st_o[pi, 0, :] = st_new
        lf_o[pi, :, :] = lf_new
        ct_o[pi, 0, :] = ct_new
        sp_o[pi, :, :] = sp_new
        li_o[pi, 0, :] = li_new
        pred_o[pi, :, :] = pred
        ll_o[pi, :, :] = jnp.full((1, 1), ll, jnp.float32)
        return 0

    jax.lax.fori_loop(0, P, body, 0)


@functools.partial(jax.jit, static_argnames=("d", "cfg", "single"))
def grow_round_pallas(take, frozen, sv, sl, st, lf, ct, sp, leaf_idx,
                      pred_prev,
                      X, resid, rules, alpha_cdf, leaf_sd, ll_weight,
                      u_grow, u_var, row_gum, eps, set_bits, u_mix=None,
                      *, d: int, cfg: BartConfig, single: bool = True):
    """One fused growth round for all particles.

    take: int32[P] ancestor index per output particle (identity when the
    SMC did not resample this round); ``pred_prev`` (P, k, n) is each
    particle's prediction after the previous round, read through ``take``
    like the rest of the state (so callers must NOT pre-gather it).
    K-MAJOR layout (see _grow_math):
    lf/sp (P, k, S), eps (P, k, 2G), resid/ll_weight (k, n); other state
    (P, S)/(P, n).  ``ll_weight``: per-observation Gaussian precision for
    the fused SMC log-likelihood output (zeros for non-Gaussian models —
    use the XLA likelihood on ``pred`` instead).
    Returns (sv, sl, st, lf (P,k,S), ct, sp, leaf_idx, pred (P,k,n), ll).
    """
    P, S = sv.shape
    n, p = X.shape
    k = lf.shape[1]
    lo, hi = 2**d - 1, 2 ** (d + 1) - 1
    G = hi - lo
    p_grow = float(cfg.alpha * (1.0 + d) ** (-cfg.beta))
    response = cfg.response
    if u_mix is None:
        u_mix = jnp.ones((P, 2 * G), jnp.float32)

    out_shape = [
        jax.ShapeDtypeStruct((P, 1, S), jnp.int32),
        jax.ShapeDtypeStruct((P, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, S), jnp.uint32),
        jax.ShapeDtypeStruct((P, k, S), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((P, k, S), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, n), jnp.int32),
        jax.ShapeDtypeStruct((P, k, n), jnp.float32),
        jax.ShapeDtypeStruct((P, 1, 1), jnp.float32),
    ]

    # 2-D (1, P) SMEM scalars: 1-D SMEM inputs fail Mosaic lowering when a
    # chain-vmap adds a batch dim (block (Squeezed(), P) over array (C, P));
    # with a leading 1 the per-program block equals the array's trailing dims.
    frozen_i32 = frozen.astype(jnp.int32).reshape(1, P)
    r3 = lambda a: a.reshape(P, 1, -1)  # noqa: E731
    args = (take.astype(jnp.int32).reshape(1, P), frozen_i32,
            r3(sv), r3(sl), r3(st), lf, r3(ct), sp, r3(leaf_idx),
            pred_prev,
            X, X.T, resid, rules.reshape(1, -1), alpha_cdf.reshape(1, -1),
            leaf_sd.reshape(1, -1), ll_weight,
            r3(u_grow), r3(u_var), r3(row_gum), eps,
            r3(set_bits), r3(u_mix))

    if single:
        kernel = functools.partial(
            _kernel_single, P=P, d=d, S=S, n=n, p=p, k=k, m=cfg.m,
            p_grow=p_grow, response=response,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 21,
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            interpret=(jax.default_backend() == "cpu"),
        )(*args)
    else:
        kernel = functools.partial(
            _kernel_grid, d=d, S=S, n=n, p=p, k=k, m=cfg.m, p_grow=p_grow,
            response=response,
        )

        def anc3(i, take_ref):  # ancestor-indexed state blocks
            return (take_ref[0, i], 0, 0)

        def own3(i, take_ref):  # per-particle randoms
            return (i, 0, 0)

        def shared(i, take_ref):
            return (0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P,),
            in_specs=[
                pl.BlockSpec((1, P), lambda i, t: (0, 0),
                             memory_space=pltpu.SMEM),  # frozen
                pl.BlockSpec((1, 1, S), anc3),
                pl.BlockSpec((1, 1, S), anc3),
                pl.BlockSpec((1, 1, S), anc3),
                pl.BlockSpec((1, k, S), anc3),
                pl.BlockSpec((1, 1, S), anc3),
                pl.BlockSpec((1, k, S), anc3),
                pl.BlockSpec((1, 1, n), anc3),
                pl.BlockSpec((1, k, n), anc3),
                pl.BlockSpec((n, p), shared),
                pl.BlockSpec((p, n), shared),
                pl.BlockSpec((k, n), shared),
                pl.BlockSpec((1, p), shared),
                pl.BlockSpec((1, p), shared),
                pl.BlockSpec((1, k), shared),
                pl.BlockSpec((k, n), shared),
                pl.BlockSpec((1, 1, G), own3),
                pl.BlockSpec((1, 1, G), own3),
                pl.BlockSpec((1, 1, n), own3),
                pl.BlockSpec((1, k, 2 * G), own3),
                pl.BlockSpec((1, 1, G), own3),
                pl.BlockSpec((1, 1, 2 * G), own3),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, k, S), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, S), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, k, S), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, n), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, k, n), lambda i, t: (i, 0, 0)),
                pl.BlockSpec((1, 1, 1), lambda i, t: (i, 0, 0)),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=(jax.default_backend() == "cpu"),
        )(*args)

    sv_o, sl_o, st_o, lf_o, ct_o, sp_o, li_o, pred_o, ll_o = out
    return (sv_o.reshape(P, S), sl_o.reshape(P, S), st_o.reshape(P, S),
            lf_o, ct_o.reshape(P, S), sp_o, li_o.reshape(P, n), pred_o,
            ll_o.reshape(P))
