"""Whole-draw PGBART megakernel: one Pallas program per MCMC step.

Runs the ENTIRE PGBART step — the Gibbs loop over the batch's B trees,
each tree's full conditional SMC (D depth-synchronous growth rounds,
ESS-gated systematic resampling, categorical winner selection, R
Metropolis leaf refinements), the forest/sum-of-trees commit, the
tuning-phase adaptation (split-prior counts, Welford leaf variance) and
the per-draw variable-inclusion histogram — as ONE program.

Round-3 generalizations over the round-2 kernel:

* CHAIN-VECTORIZED: C chains ride one kernel instance as C*P sublane
  rows (global particle q = chain*P + particle).  The round-2 kernel was
  instruction-bound (~20 ns fixed Mosaic overhead per op); vmapping it
  over chains serialized them as grid programs.  Folding chains into the
  particle axis keeps the instruction count of ONE chain while the
  vector work (cheap) covers all C.  Cross-chain isolation: resampling
  CDFs ride a block-diagonal lower-triangular matmul, per-chain
  normalizers ride (C, CP)/(CP, C) segment matmuls, and winner
  selection/refinement/commit run a static per-chain loop (cold
  section).  ``jax.vmap`` over ``pgbart_step_fused`` routes here via a
  ``jax.custom_batching.custom_vmap`` rule — callers keep writing
  ``vmap(step)(keys, states)``.
* GRID OVER TREES: the Gibbs tree loop is the Pallas grid (sequential
  on TPU), so per-tree RNG blocks stream through VMEM ((1, D*C*P, n)
  blocks, double-buffered by Mosaic) instead of residing whole — the
  row-Gumbel block for C=4 chains would otherwise be ~10 MB.
* FUSED LIKELIHOOD CODES: ``lik`` selects the SMC weight model —
  ``"gauss"``      : y ~ Normal(F, sigma); row data = precision 1/sigma^2
  ``"bernoulli"``  : y ~ Bernoulli(sigmoid(F)); ll = y*F - softplus(F)
  ``"het_abs"``    : y ~ Normal(mu0, |F| + c); row data = (y - mu0)^2
  ``"het_exp"``    : y ~ Normal(mu0, exp(F));  row data = (y - mu0)^2
  (the het codes are the separate-trees scale-forest update of the
  heteroscedastic config — BASELINE config 4; bernoulli is config 3).
* p <= 2048: split variables are drawn by a per-node compare-count of
  the weight CDF against a (C*P, p) block; the CDF itself is computed
  by 512-wide chunked lower-triangular matmuls so the p=1000
  variable-selection config (BASELINE config 5) rides the megakernel
  (the round-2 kernel used a p-step scalar loop and gated at p <= 32).

Randomness: "reference" replicates ``_update_one_tree``'s exact
per-tree key-split sequence (bit-comparable equivalence tests);
"batched" draws each random block with one batched call; "kernel"
generates the row-Gumbel block on-chip (Mosaic PRNG, reseeded per tree
with the grid index) for very large n.

Reference for the algorithm: SURVEY 2.3 (PGBART, reconstructed from
arXiv:1502.04622 + reference CHANGELOG.md); this file is a scheduling
fusion only — no statistical behavior is introduced here.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BartConfig, PgbartConfig

NEG = -3e38  # python float: a jnp scalar here would be a captured constant


def _row_from_col(col2, Q: int):
    """(Q, 1) f32 column -> (Q,) row value via a diag matmul (no transpose)."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)).astype(jnp.float32)
    ones = jnp.ones((1, Q), jnp.float32)
    return jax.lax.dot_general(
        ones, col2 * eye, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]


def _col_from_row(row2, Q: int):
    """(1, Q) f32 row -> (Q, 1) column via a diag matmul (no transpose)."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (Q, Q), 1)).astype(jnp.float32)
    ones = jnp.ones((Q, 1), jnp.float32)
    return jax.lax.dot_general(
        eye * row2, ones, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _softplus(x):
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _draw_kernel(
    # SMEM scalars
    jt_ref, u_res_ref, u_sel_ref, u_acc_ref, seed_ref,
    # VMEM inputs (persistent state + per-tree RNG blocks)
    scal_i, sv_fi, sl_fi, st_fi, lf_fi, ct_fi, sp_fi, tp_i, sum_i,
    y_ref, xt_ref, rules_ref, av_i, llw_ref, wfm_i, wfm2_i,
    ug_ref, uv_ref, rg_ref, eps_ref, sb_ref, epsr_ref,
    # VMEM outputs (revisited across the tree grid)
    sv_fo, sl_fo, st_fo, lf_fo, ct_fo, sp_fo, tp_o, sum_o, av_o,
    wfm_o, wfm2_o, scal_o, vi_o,
    *, C: int, B: int, P: int, D: int, S: int, n: int, p: int, m: int,
    R: int, alpha: float, beta: float, tuning: bool, gen_gumbel: bool,
    lik: str, lik_const: float, vi_in_kernel: bool, spd: float,
    all_cont: bool = False, x_nan: bool = True,
):
    """One grid step = one tree's conditional SMC for all C chains.

    Particle state rides (C*P, S)/(C*P, n) values (chain-major rows);
    every grow-loop instruction covers all chains and particles.  The
    cold post-SMC section (winner selection, refinement, commit,
    adaptation) is a static per-chain loop.

    Static specializations (the caller sets them from the CONCRETE host
    arrays, so they cannot be wrong for the data): ``all_cont`` — every
    column uses the continuous rule, so the one-hot/subset routing and
    the whole split_set machinery drop out; ``x_nan`` — X contains NaNs,
    else all NaN-tracking (bit-pattern blends, NaN-safe gathers) drops
    out.  Together they remove ~1/3 of the per-node vector ops on the
    common clean-continuous configuration.
    """
    CP = C * P
    bi = pl.program_id(0)

    @pl.when(bi == 0)
    def _copy_in():
        sv_fo[:, :] = sv_fi[:, :]
        sl_fo[:, :] = sl_fi[:, :]
        st_fo[:, :] = st_fi[:, :]
        lf_fo[:, :] = lf_fi[:, :]
        ct_fo[:, :] = ct_fi[:, :]
        sp_fo[:, :] = sp_fi[:, :]
        tp_o[:, :] = tp_i[:, :]
        sum_o[:, :] = sum_i[:, :]
        av_o[:, :] = av_i[:, :]
        wfm_o[:, :] = wfm_i[:, :]
        wfm2_o[:, :] = wfm2_i[:, :]
        scal_o[:, :] = scal_i[:, :]
        vi_o[:, :] = jnp.zeros((C, p), jnp.float32)

    # ---- shared blocks ----
    xtraw = xt_ref[:, :]                  # (p, n)
    if x_nan:
        xtnan = jnp.isnan(xtraw)
        xT_z = jnp.where(xtnan, 0.0, xtraw)
        xnanT_f = xtnan.astype(jnp.float32)
    else:
        xT_z = xtraw
    y2 = y_ref[:, :]                      # (1, n) shared across chains
    llw_C = llw_ref[:, :]                 # (C, n) per-chain row data
    rules_row = rules_ref[:, :].astype(jnp.float32)  # (1, p)
    nf = jnp.float32(n)

    # lane/column bookkeeping (global particle q = chain*P + particle)
    idxCP = jax.lax.broadcasted_iota(jnp.int32, (1, CP), 1)[0]   # (CP,)
    pi_lane = idxCP % P
    ci_lane = idxCP // P
    nonfrozen = pi_lane >= 1
    iotaCP_col = jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)  # (CP, 1)
    pi_col = iotaCP_col % P
    ci_col = iotaCP_col // P
    frozen_c = (pi_col == 0)
    frozen_f = frozen_c.astype(jnp.float32)        # (CP, 1)
    frozen_i = frozen_c.astype(jnp.int32)
    nonfroz_f = 1.0 - frozen_f
    iotaC_col = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)    # (C, 1)
    iota_S_row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)   # (1, S)
    iota_p_row = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    iota_4_row = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    iota_C_row = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    # chain-expansion one-hots: E (CP, C) row q -> chain q//P; Ect (C, CP)
    E = (jax.lax.broadcasted_iota(jnp.int32, (CP, C), 1)
         == ci_col).astype(jnp.float32)
    Ect = (jax.lax.broadcasted_iota(jnp.int32, (C, CP), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (C, CP), 1) // P
           ).astype(jnp.float32)
    # block-diagonal lower-triangular (within-chain cumsum over lanes)
    rPP = jax.lax.broadcasted_iota(jnp.int32, (CP, CP), 0)
    cPP = jax.lax.broadcasted_iota(jnp.int32, (CP, CP), 1)
    sameblock = (rPP // P) == (cPP // P)
    lt_CP = ((rPP <= cPP) & sameblock).astype(jnp.float32)
    if p <= 512:
        lt_p = (jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
                <= jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
                ).astype(jnp.float32)
    else:
        lt_p = None  # chunked CDF below avoids the (p, p) materialization

    def mm(a, b):  # (r, c) @ (c, z) on the MXU
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def chain_sum_lane(v):
        """(CP,) lane vector -> (CP,) per-chain sums broadcast back."""
        s = mm(v[None, :], E)            # (1, C)
        return mm(s, Ect)[0]             # (CP,)

    def chain_max_lane(v):
        """(CP,) lane vector -> (CP,) per-chain max broadcast back."""
        out = jnp.zeros((CP,), jnp.float32)
        for c in range(C):
            msk = (ci_lane == c)
            mx = jnp.max(jnp.where(msk, v, NEG))
            out = out + mx * msk.astype(jnp.float32)
        return out

    if gen_gumbel:
        # on-chip row-Gumbel generation; fold the tree (grid) index into
        # the seed words so every tree gets a fresh stream (the Mosaic
        # PRNG accepts at most 2 seed values)
        pltpu.prng_seed(seed_ref[0, 0] ^ (bi * 1103515245),
                        seed_ref[0, 1] + bi)

    def fresh_gumbel():
        bits = pltpu.prng_random_bits((CP, n))
        u = (jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(bits, jnp.int32), 8
        ).astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)
        return -jnp.log(-jnp.log(u))

    # ---- per-tree, per-chain state ----
    jt_c = [jt_ref[c, bi] for c in range(C)]        # traced scalars
    row_c = [c * m + jt_c[c] for c in range(C)]

    tp_jt_C = jnp.concatenate(
        [tp_o[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)   # (C, n)
    sum_C = sum_o[:, :]
    sum_noi_C = sum_C - tp_jt_C
    resid2_C = y2 - sum_noi_C                       # (C, n)

    resid_e = mm(E, resid2_C)                       # (CP, n)
    if lik != "bernoulli":
        llw_e = mm(E, llw_C)
    if lik != "gauss":
        noi_e = mm(E, sum_noi_C)

    av = jnp.maximum(av_o[:, :], 1e-12)             # (C, p)
    if lt_p is not None:
        cdf_C = mm(av, lt_p)                        # (C, p)
    else:
        # chunked inclusive cumsum: per 512-wide chunk a (C, w)@(w, w)
        # lower-triangular matmul plus the running total of earlier
        # chunks — avoids the (p, p) VMEM block that capped p at 512
        # (round-3 VERDICT item 2: BASELINE config 5 is p=1000)
        parts = []
        run = jnp.zeros((C, 1), jnp.float32)
        for s0 in range(0, p, 512):
            e0 = min(s0 + 512, p)
            w0 = e0 - s0
            lt_w = (jax.lax.broadcasted_iota(jnp.int32, (w0, w0), 0)
                    <= jax.lax.broadcasted_iota(jnp.int32, (w0, w0), 1)
                    ).astype(jnp.float32)
            blk = av[:, s0:e0]
            parts.append(mm(blk, lt_w) + run)
            run = run + jnp.sum(blk, axis=1, keepdims=True)
        cdf_C = jnp.concatenate(parts, axis=1)      # (C, p)
    cdf_e = mm(E, cdf_C)                            # (CP, p)
    total_col = jnp.sum(
        cdf_e * (iota_p_row == p - 1).astype(jnp.float32),
        axis=1, keepdims=True)                      # (CP, 1)

    leaf_sd_C = scal_o[:, 0:1]                      # (C, 1) carried
    leaf_sd_cp = mm(E, leaf_sd_C)                   # (CP, 1)

    # frozen reference tree per chain, expanded to particle rows
    t_sv_C = jnp.concatenate(
        [sv_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)  # (C, S) i32
    t_sl_C = jnp.concatenate(
        [sl_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)
    t_st_C = jax.lax.bitcast_convert_type(jnp.concatenate(
        [st_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0), jnp.int32)
    t_lf_C = jnp.concatenate(
        [lf_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)
    t_ct_C = jnp.concatenate(
        [ct_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)

    sv_exp = mm(E, (t_sv_C + 1).astype(jnp.float32)).astype(jnp.int32) - 1
    sv_v = frozen_i * sv_exp + (1 - frozen_i) * (-1)               # (CP, S)
    if x_nan:
        # stored split values may be NaN: expand the zeroed values and
        # the NaN flags separately, then blend on the BIT pattern
        sl_nan = jnp.isnan(t_sl_C)
        sl_clean_e = mm(E, jnp.where(sl_nan, 0.0, t_sl_C))
        sl_flag_e = mm(E, sl_nan.astype(jnp.float32))
        sl_frozen = jnp.where(sl_flag_e > 0.5, jnp.nan, sl_clean_e)
        sl_v = jax.lax.bitcast_convert_type(
            frozen_i * jax.lax.bitcast_convert_type(sl_frozen, jnp.int32),
            jnp.float32)
    else:
        sl_v = frozen_f * mm(E, t_sl_C)
    if all_cont:
        st_v = jnp.zeros((CP, S), jnp.int32)  # split_set unused
    else:
        st_lo_e = mm(E, (t_st_C & 0xFFFF).astype(jnp.float32))
        st_hi_e = mm(E, jax.lax.shift_right_logical(
            t_st_C, 16).astype(jnp.float32))
        st_v = frozen_i * (st_lo_e.astype(jnp.int32)
                           | (st_hi_e.astype(jnp.int32) << 16))

    root_col = (iota_S_row == 0).astype(jnp.float32)   # (1, S)
    root_sum_C = jnp.sum(resid2_C, axis=1, keepdims=True)          # (C, 1)
    root_cp = mm(E, root_sum_C) / nf / m                           # (CP, 1)
    lf_exp = mm(E, t_lf_C)
    lf_v = frozen_f * lf_exp + nonfroz_f * (root_cp * root_col)
    ct_exp = mm(E, t_ct_C)
    ct_v = frozen_f * ct_exp + nonfroz_f * (nf * root_col)
    li_v = jnp.zeros((CP, n), jnp.int32)
    froot = jnp.sum(lf_exp * root_col, axis=1, keepdims=True)      # (CP, 1)
    pred0 = frozen_f * froot + nonfroz_f * root_cp
    pred_v = jnp.broadcast_to(pred0, (CP, n))

    def ll_cols(pv):  # (CP, n) predictions -> (CP,) log-likelihood lanes
        if lik == "gauss":
            diff = resid_e - pv
            col = -0.5 * jnp.sum(llw_e * diff * diff, axis=1, keepdims=True)
        elif lik == "bernoulli":
            F = noi_e + pv
            col = jnp.sum(y2 * F - _softplus(F), axis=1, keepdims=True)
        elif lik == "het_abs":
            F = noi_e + pv
            sg = jnp.abs(F) + lik_const
            col = jnp.sum(-0.5 * llw_e / (sg * sg) - jnp.log(sg),
                          axis=1, keepdims=True)
        elif lik == "het_exp":
            F = noi_e + pv
            col = jnp.sum(-0.5 * llw_e * jnp.exp(-2.0 * F) - F,
                          axis=1, keepdims=True)
        elif lik == "cat_logit":
            # separate-trees softmax class update: y2 > 0 flags this
            # output's rows, llw = logsumexp of the OTHER outputs
            F = noi_e + pv
            lse = jnp.maximum(F, llw_e) + jnp.log1p(
                jnp.exp(-jnp.abs(F - llw_e)))
            col = jnp.sum((y2 > 0).astype(jnp.float32) * F - lse,
                          axis=1, keepdims=True)
        else:
            raise ValueError(lik)
        return _row_from_col(col, CP)

    ll = ll_cols(pred_v)
    log_w = ll
    ll_prev = ll
    take = idxCP

    ug_t = ug_ref[0]                          # (CP, Gtot)
    uv_t = uv_ref[0]
    eps_t = eps_ref[0]                        # (CP, 2*Gtot)
    sb_t = jax.lax.bitcast_convert_type(sb_ref[0], jnp.int32)

    for d in range(D):
        lo, hi = 2 ** d - 1, 2 ** (d + 1) - 1
        G = hi - lo
        p_grow = float(alpha * (1.0 + d) ** (-beta))

        if d > 0:
            # ancestor gather via exact selection matmuls (NaN-safe for sl)
            A = (cPP == take[:, None]).astype(jnp.float32)  # (CP, CP)
            if x_nan:
                sl_isnan = jnp.isnan(sl_v)
                sl_clean_g = mm(A, jnp.where(sl_isnan, 0.0, sl_v))
                sl_flag_g = mm(A, sl_isnan.astype(jnp.float32))
                sl_v = jnp.where(sl_flag_g > 0.5, jnp.nan, sl_clean_g)
            else:
                sl_v = mm(A, sl_v)
            lf_v = mm(A, lf_v)
            ct_v = mm(A, ct_v)
            pred_v = mm(A, pred_v)
            sv_v = mm(A, (sv_v + 1).astype(jnp.float32)).astype(jnp.int32) - 1
            li_v = mm(A, li_v.astype(jnp.float32)).astype(jnp.int32)
            if not all_cont:
                st_lo = mm(A, (st_v & 0xFFFF).astype(jnp.float32))
                st_hi = mm(A, jax.lax.shift_right_logical(
                    st_v, 16).astype(jnp.float32))
                st_v = (st_lo.astype(jnp.int32)
                        | (st_hi.astype(jnp.int32) << 16))

        sv_lvl = sv_v[:, lo:hi]
        ct_lvl = ct_v[:, lo:hi]
        uv_lvl = uv_t[:, lo:hi]
        want_lvl_f = ((ug_t[:, lo:hi] < p_grow).astype(jnp.float32)
                      * (sv_lvl < 0).astype(jnp.float32)
                      * (ct_lvl >= 2.0).astype(jnp.float32)
                      * nonfroz_f)
        # per-node activity over ALL particles: a node's ~26-op vector
        # body is skipped when no particle grows or replays there (deep
        # levels are mostly dead slots); skipping preserves state
        # exactly — an inactive node commits nothing
        frozen_act_f = frozen_f * (sv_lvl >= 0).astype(jnp.float32)
        busy_row = jnp.sum(want_lvl_f + frozen_act_f, axis=0,
                           keepdims=True)                        # (1, G)
        if gen_gumbel:
            rg_d = fresh_gumbel()                       # (CP, n)
        else:
            rg_d = rg_ref[0, d * CP:(d + 1) * CP, :]    # (CP, n)

        # ---- per-node growth: fori over the level's nodes ----
        # (a fully unrolled node loop blows the Mosaic compile up; node
        # columns are mask-extracted: sum(arr * (iota == node)))
        iota_G_row = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
        iota_Gt_row = jax.lax.broadcasted_iota(
            jnp.int32, (1, ug_t.shape[1]), 1)
        iota_2Gt_row = jax.lax.broadcasted_iota(
            jnp.int32, (1, eps_t.shape[1]), 1)

        def g_body(g, st8):
            if _os.environ.get("PYMC_BART_TPU_NODESKIP", "1") == "0":
                return g_work(g, st8)
            busy_g = jnp.sum(busy_row * (iota_G_row == g))

            def _skip(st8):
                return st8

            def _work(st8):
                return g_work(g, st8)

            return jax.lax.cond(busy_g > 0.5, _work, _skip, st8)

        def g_work(g, st8):
            sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v = st8
            node = lo + g
            l = 2 * node + 1
            r = 2 * node + 2
            gmask = (iota_G_row == g).astype(jnp.float32)     # (1, G)
            gmask_i = gmask.astype(jnp.int32)
            ncol = (iota_S_row == node).astype(jnp.float32)   # (1, S)
            lcol = (iota_S_row == l).astype(jnp.float32)
            rcol = (iota_S_row == r).astype(jnp.float32)

            def ext_f(arr, mask_row):  # (CP, Z) x (1, Z) -> (CP, 1)
                return jnp.sum(arr * mask_row, axis=1, keepdims=True)

            def ext_i(arr_i, mask_row_i):
                return jnp.sum(arr_i * mask_row_i, axis=1, keepdims=True)

            mask = li_v == node                            # (CP, n)
            mask_f = mask.astype(jnp.float32)
            cnt = jnp.sum(mask_f, axis=1, keepdims=True)   # (CP, 1)

            # split variable ~ categorical(alpha_vec): count CDF entries
            # below the uniform (works to p = 2048; the round-2 kernel's
            # p-step scalar loop capped p at 32)
            u_node = ext_f(uv_lvl, gmask) * total_col      # (CP, 1)
            cnt_var = jnp.sum((cdf_e < u_node).astype(jnp.int32),
                              axis=1, keepdims=True)
            var_draw = jnp.clip(cnt_var, 0, p - 1)
            sv_node = ext_i(sv_lvl + 1, gmask_i) - 1       # (CP, 1)
            var_eff = (frozen_i * jnp.clip(sv_node, 0, p - 1)
                       + (1 - frozen_i) * var_draw)
            onehot_var = (iota_p_row == var_eff).astype(jnp.float32)
            xcol = mm(onehot_var, xT_z)                    # (CP, n)
            if x_nan:
                xnan_col_f = mm(onehot_var, xnanT_f)       # 0/1 values

            # uniform row via Gumbel-max within the node; ties broken by
            # the MIN row index attaining the max (all sampler paths use
            # this rule — round-4 ADVICE low #3)
            sc = jnp.where(mask, rg_d, NEG)
            mx = jnp.max(sc, axis=1, keepdims=True)
            win = (sc == mx) & mask
            iota_n_cp = jax.lax.broadcasted_iota(jnp.int32, (CP, n), 1)
            ridx = jnp.min(jnp.where(win, iota_n_cp, n), axis=1,
                           keepdims=True)
            wsel_row = ((iota_n_cp == ridx) & win).astype(jnp.float32)
            val_g = jnp.sum(wsel_row * xcol, axis=1, keepdims=True)
            if x_nan:
                valnan_g_f = jnp.minimum(
                    jnp.sum(wsel_row * xnan_col_f, axis=1, keepdims=True),
                    1.0)

            # stored split value at the node (NaN tracked separately)
            if x_nan:
                sl_nanflag = jnp.isnan(sl_v).astype(jnp.float32)
                sl_clean = jnp.where(jnp.isnan(sl_v), 0.0, sl_v)
                node_sl = ext_f(sl_clean, ncol)
                node_sl_nan = ext_f(sl_nanflag, ncol)
                valxnan_f = (frozen_f * node_sl_nan
                             + nonfroz_f * valnan_g_f)
            else:
                node_sl = ext_f(sl_v, ncol)
            valx = frozen_f * node_sl + nonfroz_f * val_g
            if not all_cont:
                rule_g = jnp.sum(onehot_var * rules_row, axis=1,
                                 keepdims=True).astype(jnp.int32)
                # hash-salted subset rule: the stored word is a raw SALT;
                # own-category membership rides the eq_f value equality
                st_prop = ext_i(sb_t, (iota_Gt_row == node).astype(jnp.int32))
                setx = (frozen_i * ext_i(st_v, ncol.astype(jnp.int32))
                        + (1 - frozen_i) * st_prop)

            # routing decision for the node's rows (0/1 f32 algebra)
            if x_nan:
                notnan_f = (1.0 - xnan_col_f) * (1.0 - valxnan_f)
                cont_f = (xcol <= valx).astype(jnp.float32) * notnan_f
            else:
                cont_f = (xcol <= valx).astype(jnp.float32)
            if all_cont:
                left_f = cont_f
            else:
                if x_nan:
                    eq_f = (xcol == valx).astype(jnp.float32) * notnan_f
                    nonan_row = 1.0 - xnan_col_f
                else:
                    eq_f = (xcol == valx).astype(jnp.float32)
                    nonan_row = 1.0
                # hash-salted membership (ops/trees.py subset_member);
                # xcol is NaN-cleaned so the int cast is safe
                cat_rows = xcol.astype(jnp.int32)
                hsh = setx ^ (cat_rows * 1103515245)
                hsh = (hsh ^ jax.lax.shift_right_logical(hsh, 15)) \
                    * 73244475
                hsh = hsh ^ jax.lax.shift_right_logical(hsh, 13)
                sub_f = jnp.minimum(
                    eq_f + (hsh & 1).astype(jnp.float32) * nonan_row, 1.0)
                rr0_f = (rule_g == 0).astype(jnp.float32)
                rr1_f = (rule_g == 1).astype(jnp.float32)
                left_f = (rr0_f * cont_f + rr1_f * eq_f
                          + (1.0 - rr0_f - rr1_f) * sub_f)

            lm = mask_f * left_f
            cl = jnp.sum(lm, axis=1, keepdims=True)
            cr = cnt - cl
            grow_ok_f = (ext_f(want_lvl_f, gmask)
                         * (cl > 0.5).astype(jnp.float32)
                         * (cr > 0.5).astype(jnp.float32))
            act_fin_f = (frozen_f * (sv_node >= 0).astype(jnp.float32)
                         + nonfroz_f * grow_ok_f)

            # children leaf values ~ N(child residual mean / m, sd)
            sums_l = jnp.sum(resid_e * lm, axis=1, keepdims=True)
            sums_t = jnp.sum(resid_e * mask_f, axis=1, keepdims=True)
            sums_r = sums_t - sums_l
            eps_l = ext_f(eps_t, (iota_2Gt_row == 2 * node
                                  ).astype(jnp.float32))
            eps_r = ext_f(eps_t, (iota_2Gt_row == 2 * node + 1
                                  ).astype(jnp.float32))
            mu_l = sums_l / jnp.maximum(cl, 1.0) / m + eps_l * leaf_sd_cp
            mu_r = sums_r / jnp.maximum(cr, 1.0) / m + eps_r * leaf_sd_cp
            lval = frozen_f * ext_f(lf_v, lcol) + nonfroz_f * mu_l
            rval = frozen_f * ext_f(lf_v, rcol) + nonfroz_f * mu_r

            # commit structure + children (single-column f32 blends)
            mkn = ncol * grow_ok_f                 # (CP, S) 0/1
            mkn_i = mkn.astype(jnp.int32)
            sv_v = mkn_i * var_eff + (1 - mkn_i) * sv_v
            if x_nan:
                # commit the split value on the BIT pattern (may be NaN)
                val_commit = jnp.where(valnan_g_f > 0.5, jnp.nan, val_g)
                sl_v = jax.lax.bitcast_convert_type(
                    mkn_i * jax.lax.bitcast_convert_type(val_commit,
                                                         jnp.int32)
                    + (1 - mkn_i) * jax.lax.bitcast_convert_type(
                        sl_v, jnp.int32),
                    jnp.float32)
            else:
                sl_v = mkn * val_g + (1.0 - mkn) * sl_v
            if not all_cont:
                st_v = mkn_i * st_prop + (1 - mkn_i) * st_v
            mkl = lcol * grow_ok_f
            mkr = rcol * grow_ok_f
            ct_v = mkl * cl + (1.0 - mkl) * ct_v
            ct_v = mkr * cr + (1.0 - mkr) * ct_v
            lf_v = mkl * mu_l + (1.0 - mkl) * lf_v
            lf_v = mkr * mu_r + (1.0 - mkr) * lf_v

            # route rows + incremental prediction
            dm_f = mask_f * act_fin_f              # (CP, n) 0/1
            dm_i = dm_f.astype(jnp.int32)
            left_i = left_f.astype(jnp.int32)
            li_v = dm_i * (l + 1 - left_i) + (1 - dm_i) * li_v
            child_val = left_f * lval + (1.0 - left_f) * rval
            pred_v = dm_f * child_val + (1.0 - dm_f) * pred_v
            return (sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v)

        (sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v) = jax.lax.fori_loop(
            0, G, g_body, (sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v))

        ll = ll_cols(pred_v)
        lw1 = log_w + ll - ll_prev

        if d < D - 1:
            # per-chain ESS-gated systematic resampling (block-diagonal
            # CDF matmul; per-chain normalizers via segment matmuls)
            u_row = jnp.zeros((1, C), jnp.float32)
            for c in range(C):
                u_row = u_row + u_res_ref[c, bi * D + d] \
                    * (iota_C_row == c).astype(jnp.float32)
            u_cp = mm(u_row, Ect)[0]                        # (CP,)
            w_nf = jnp.where(nonfrozen, lw1, jnp.float32(-jnp.inf))
            mxw_cp = chain_max_lane(w_nf)
            e = jnp.where(nonfrozen, jnp.exp(lw1 - mxw_cp), 0.0)
            tot_cp = chain_sum_lane(e)
            probs = e / tot_cp
            log_mean_cp = mxw_cp + jnp.log(tot_cp / (P - 1))
            ess_cp = 1.0 / jnp.maximum(chain_sum_lane(probs * probs), 1e-38)
            do_cp = ess_cp < 0.5 * (P - 1)
            cdfP = mm(probs[None, :], lt_CP)[0]
            last_cp = chain_sum_lane(cdfP * (pi_lane == P - 1
                                             ).astype(jnp.float32))
            cdfP = cdfP / last_cp
            pos = (u_cp + pi_lane.astype(jnp.float32) - 1.0) / (P - 1)
            cmp = ((cdfP[None, :] < pos[:, None])
                   & nonfrozen[None, :] & sameblock)
            anc_within = jnp.clip(
                jnp.sum(cmp.astype(jnp.int32), axis=1) + 1, 1, P - 1)
            anc = ci_lane * P + anc_within
            resampled = do_cp & nonfrozen
            take = jnp.where(resampled, anc, idxCP)
            log_w = jnp.where(resampled, log_mean_cp, lw1)
            sel = (rPP == take[None, :]).astype(jnp.float32)
            ll_prev = mm(ll[None, :], sel)[0]
        else:
            log_w = lw1

    # ---- winner + refinement + commit: cold per-chain loop ----
    eyeS = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)).astype(jnp.float32)
    iota_Sp = jax.lax.broadcasted_iota(jnp.int32, (S, p), 1)
    iota_Sn = jax.lax.broadcasted_iota(jnp.int32, (S, n), 0)
    scal_rows = []
    for c in range(C):
        cm_lane = (ci_lane == c)
        mxw = jnp.max(jnp.where(cm_lane, log_w, NEG))
        e = jnp.where(cm_lane, jnp.exp(log_w - mxw), 0.0)
        cdfPc = mm(e[None, :], lt_CP)[0]
        total = jnp.sum(e)
        u = u_sel_ref[c, bi] * total
        widx = jnp.clip(jnp.sum(((cdfPc < u) & cm_lane).astype(jnp.int32)),
                        0, P - 1) + c * P
        wsel = (idxCP == widx).astype(jnp.float32)[None, :]   # (1, CP)

        sv_w = mm(wsel, (sv_v + 1).astype(jnp.float32)) - 1.0  # (1, S) f32
        if all_cont:
            st_w = jnp.zeros((1, S), jnp.int32)
        else:
            st_lo_w = mm(wsel, (st_v & 0xFFFF).astype(jnp.float32))
            st_hi_w = mm(wsel, jax.lax.shift_right_logical(
                st_v, 16).astype(jnp.float32))
            st_w = (st_lo_w.astype(jnp.int32)
                    | (st_hi_w.astype(jnp.int32) << 16))
        if x_nan:
            sl_isnan = jnp.isnan(sl_v)
            sl_clean_w = mm(wsel, jnp.where(sl_isnan, 0.0, sl_v))
            sl_flag_w = mm(wsel, sl_isnan.astype(jnp.float32))
            sl_w = jnp.where(sl_flag_w > 0.5, jnp.nan, sl_clean_w)
        else:
            sl_w = mm(wsel, sl_v)
        lf_w = mm(wsel, lf_v)                                  # (1, S)
        ct_w = mm(wsel, ct_v)
        li_w = mm(wsel, li_v.astype(jnp.float32)).astype(jnp.int32)  # (1, n)
        pred_w = mm(wsel, pred_v)                              # (1, n)

        resid1 = resid2_C[c:c + 1, :]                          # (1, n)
        noi1 = sum_noi_C[c:c + 1, :]
        llw1 = llw_C[c:c + 1, :]
        ls_c = jnp.sum(leaf_sd_C * (iotaC_col == c))           # scalar
        leaf_mask = ((sv_w < -0.5) & (ct_w > 0)).astype(jnp.float32)
        soh = (iota_Sn == li_w).astype(jnp.float32)            # (S, n)
        leaf_rsum = jax.lax.dot_general(
            resid1, soh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (1, S)
        prior_center = leaf_rsum / jnp.maximum(ct_w, 1.0) / m

        def ll_of(pred_row):
            if lik == "gauss":
                diff = resid1 - pred_row
                return -0.5 * jnp.sum(llw1 * diff * diff)
            if lik == "bernoulli":
                F = noi1 + pred_row
                return jnp.sum(y2 * F - _softplus(F))
            if lik == "het_abs":
                F = noi1 + pred_row
                sg = jnp.abs(F) + lik_const
                return jnp.sum(-0.5 * llw1 / (sg * sg) - jnp.log(sg))
            if lik == "cat_logit":
                F = noi1 + pred_row
                lse = jnp.maximum(F, llw1) + jnp.log1p(
                    jnp.exp(-jnp.abs(F - llw1)))
                return jnp.sum((y2 > 0).astype(jnp.float32) * F - lse)
            F = noi1 + pred_row
            return jnp.sum(-0.5 * llw1 * jnp.exp(-2.0 * F) - F)

        # MH acceptance = likelihood ratio x leaf-prior ratio, the prior
        # being the growth proposal N(leaf residual mean / m, leaf_sd)
        hiv = 0.5 / (ls_c * ls_c)

        def lp_of(lf_x):
            dev = lf_x - prior_center
            return -hiv * jnp.sum(leaf_mask * dev * dev)

        ll_c = ll_of(pred_w) + lp_of(lf_w)
        eps_scale = 0.3 * ls_c
        for r_i in range(R):
            eps_row = epsr_ref[0, pl.ds(r_i * C + c, 1), :]    # (1, S)
            lf_p = lf_w + eps_row * eps_scale * leaf_mask
            pred_p = mm(lf_p, soh)                             # (1, n)
            ll_p = ll_of(pred_p) + lp_of(lf_p)
            acc = jnp.log(u_acc_ref[c, bi * R + r_i]) < (ll_p - ll_c)
            accf = acc.astype(jnp.float32)
            lf_w = accf * lf_p + (1.0 - accf) * lf_w
            pred_w = accf * pred_p + (1.0 - accf) * pred_w
            ll_c = jnp.where(acc, ll_p, ll_c)

        # ---- commit winner into the chain's forest + running sums ----
        sv_w_i = sv_w.astype(jnp.int32)
        sv_fo[pl.ds(row_c[c], 1), :] = sv_w_i
        sl_fo[pl.ds(row_c[c], 1), :] = sl_w
        st_fo[pl.ds(row_c[c], 1), :] = jax.lax.bitcast_convert_type(
            st_w, jnp.uint32)
        lf_fo[pl.ds(row_c[c], 1), :] = lf_w
        ct_fo[pl.ds(row_c[c], 1), :] = ct_w
        sp_fo[pl.ds(row_c[c], 1), :] = jnp.zeros((1, S), jnp.float32)
        tp_o[pl.ds(row_c[c], 1), :] = pred_w
        sum_o[c:c + 1, :] = noi1 + pred_w

        wf_count = jnp.sum(scal_o[c:c + 1, :]
                           * (iota_4_row == 1).astype(jnp.float32))
        iteration = jnp.sum(scal_o[c:c + 1, :]
                            * (iota_4_row == 2).astype(jnp.float32)) + 1.0
        new_ls = ls_c
        if tuning:
            # Dirichlet-style split-prior adaptation: +1 per SPLIT NODE
            # using the variable (multiset — see sampler/pgbart.py).
            # tcounts via matmul one-hot so the cost is p-independent.
            sv_col = _col_from_row(sv_w, S)                   # (S, 1)
            used = (sv_col.astype(jnp.int32) == iota_Sp).astype(jnp.float32)
            tcounts = mm(jnp.ones((1, S), jnp.float32), used)  # (1, p)
            av_o[c:c + 1, :] = av_o[c:c + 1, :] * spd + tcounts
            # Welford running leaf variance -> leaf_sd
            wf_count = wf_count + 1.0
            wfm_row = wfm_o[c:c + 1, :]
            delta = pred_w - wfm_row
            wfm_new = wfm_row + delta / wf_count
            wfm2_new = wfm2_o[c:c + 1, :] + delta * (pred_w - wfm_new)
            wfm_o[c:c + 1, :] = wfm_new
            wfm2_o[c:c + 1, :] = wfm2_new
            sd = jnp.sum(
                jnp.sqrt(jnp.maximum(wfm2_new / jnp.maximum(wf_count, 1.0),
                                     1e-12))) / nf
            new_ls = jnp.where(iteration > m, jnp.maximum(sd, 1e-6), ls_c)
        scal_rows.append(
            jnp.where(iota_4_row == 0, new_ls,
                      jnp.where(iota_4_row == 1, wf_count,
                                jnp.where(iota_4_row == 2, iteration, 0.0))))
    for c in range(C):
        scal_o[c:c + 1, :] = scal_rows[c]

    if vi_in_kernel:
        @pl.when(bi == B - 1)
        def _vi():
            # per-draw variable-inclusion histogram over each chain's
            # forest (replaces a separate XLA dispatch per draw)
            for c in range(C):
                sv_blk = sv_fo[c * m:(c + 1) * m, :]          # (m, S)
                vi_row = jnp.zeros((1, p), jnp.float32)
                for j in range(p):
                    cnt_j = jnp.sum((sv_blk == j).astype(jnp.float32))
                    vi_row = jnp.where(iota_p_row == j, cnt_j, vi_row)
                vi_o[c:c + 1, :] = vi_row


# ---------------------------------------------------------------------------
# RNG preparation (single chain; the chains wrapper vmaps over keys)
# ---------------------------------------------------------------------------


def _rands_reference(key, B, P, D, n, Gtot, R, S, num_refinements):
    """Replicate the exact per-tree key-split sequence of
    ``pgbart_step``/``_update_one_tree`` (fused-likelihood branch) so the
    megakernel is bit-comparable given the same top-level key."""
    k = 1
    ug, uv, rg, eps, sb, ures, usel, epsr, uacc = ([] for _ in range(9))
    kc = key
    for _i in range(B):
        kc, k_tree = jax.random.split(kc)
        kk = k_tree
        _k_init, kk = jax.random.split(kk)
        kk, k1, k2, k3, k4, k5, _k6, k_res_all = jax.random.split(kk, 8)
        ug.append(jax.random.uniform(k1, (P, Gtot)))
        uv.append(jax.random.uniform(k2, (P, Gtot)))
        rg.append(jax.random.gumbel(k3, (D, P, n)))
        eps.append(jax.random.normal(k4, (P, 2 * Gtot, k)))
        sb.append(jax.random.bits(k5, (P, Gtot), dtype=jnp.uint32))
        res_keys = jax.random.split(k_res_all, D)
        ures.append(jnp.stack([jax.random.uniform(res_keys[d], ())
                               for d in range(D)]))
        kk, k_sel = jax.random.split(kk)
        kk, k_eps, k_acc = jax.random.split(kk, 3)
        if num_refinements > 0:
            epsr.append(jax.random.normal(k_eps, (R, k, S)))
            uacc.append(jax.random.uniform(k_acc, (R,)))
        else:
            epsr.append(jnp.zeros((R, k, S), jnp.float32))
            uacc.append(jnp.ones((R,), jnp.float32))
        usel.append(jax.random.uniform(k_sel, ()))
    return (jnp.stack(ug), jnp.stack(uv), jnp.stack(rg), jnp.stack(eps),
            jnp.stack(sb), jnp.stack(ures), jnp.stack(usel),
            jnp.stack(epsr), jnp.stack(uacc))


def _rands_batched(key, B, P, D, n, Gtot, R, S, num_refinements):
    """One batched draw per random block (~10 RNG ops per step)."""
    k = 1
    k1, k2, k3, k4, k5, k6, k7, k8, k9 = jax.random.split(key, 9)
    ug = jax.random.uniform(k1, (B, P, Gtot))
    uv = jax.random.uniform(k2, (B, P, Gtot))
    rg = jax.random.gumbel(k3, (B, D, P, n))
    eps = jax.random.normal(k4, (B, P, 2 * Gtot, k))
    sb = jax.random.bits(k5, (B, P, Gtot), dtype=jnp.uint32)
    ures = jax.random.uniform(k6, (B, D))
    usel = jax.random.uniform(k7, (B,))
    if num_refinements > 0:
        epsr = jax.random.normal(k8, (B, R, k, S))
        uacc = jax.random.uniform(k9, (B, R))
    else:
        epsr = jnp.zeros((B, R, k, S), jnp.float32)
        uacc = jnp.ones((B, R), jnp.float32)
    return ug, uv, rg, eps, sb, ures, usel, epsr, uacc


# ---------------------------------------------------------------------------
# Support gate
# ---------------------------------------------------------------------------


def fused_draw_unsupported_reason(cfg: BartConfig, pg: PgbartConfig, X,
                                  gauss_w, lik: str = "gauss"):
    """None when the whole-draw megakernel covers this configuration,
    else a human-readable reason for the fallback (surfaced by
    ``sample()`` so users know when they left the fast path).

    p <= 2048: the kernel draws split variables by a per-node
    compare-count against the (C*P, p) weight-CDF block (chunked
    cumsum); wider X falls back to the per-round path."""
    if lik not in ("gauss", "bernoulli", "het_abs", "het_exp", "cat_logit"):
        return (f"likelihood is not fused ({lik!r}); no closed-form "
                "per-row log-likelihood available in-kernel")
    if lik != "bernoulli" and gauss_w is None:
        return ("likelihood is not fused-Gaussian (no per-observation "
                "row data available)")
    if cfg.response != "constant":
        return f"response={cfg.response!r} (megakernel covers 'constant')"
    if cfg.n_outputs != 1:
        return (f"n_outputs={cfg.n_outputs} (megakernel covers 1; use "
                "separate_trees=True to give each output its own fused "
                "forest)")
    n, p = X.shape
    if p > 2048:
        return (f"p={p} covariates (megakernel chunked-CDF search covers "
                "p <= 2048)")
    if n * p > 2_000_000:
        return f"X size n*p={n * p} exceeds the 2M-element VMEM budget"
    # the per-tree row-Gumbel block must fit VMEM comfortably (per chain;
    # the chains wrapper re-checks with the actual chain count)
    if cfg.max_depth * pg.num_particles * n * 4 > 6_000_000:
        return ("per-tree row-Gumbel block (depth x particles x n) "
                "exceeds the 6 MB VMEM budget")
    return None


def fused_draw_supported(cfg: BartConfig, pg: PgbartConfig, X,
                         gauss_w, lik: str = "gauss") -> bool:
    """Whether the whole-draw megakernel covers this configuration."""
    return fused_draw_unsupported_reason(cfg, pg, X, gauss_w, lik) is None


def _chains_vmem_ok(C: int, cfg: BartConfig, pg: PgbartConfig, n: int,
                    m: int, with_rg: bool = True) -> bool:
    """Rough VMEM budget for C chains in one kernel instance.

    ``with_rg=False`` models the in-kernel Mosaic-PRNG mode, where the
    (depth x C x P x n) row-Gumbel block never materializes — that mode
    extends chain batching to higher C."""
    CP = C * pg.num_particles
    rg_block = (cfg.max_depth * CP * n * 4 * 2 if with_rg else 0)
    forest = 2 * 6 * C * m * cfg.n_nodes * 4
    tp = 2 * C * m * n * 4
    transient = 3 * CP * n * 4 + cfg.n_nodes * n * 4
    return rg_block + forest + tp + transient < 13_000_000


# ---------------------------------------------------------------------------
# Chain-batched implementation
# ---------------------------------------------------------------------------


def _chains_impl(keys, state, X, Y_target, rules, cfg: BartConfig,
                 pg: PgbartConfig, lik_row, tuning: bool, rng_mode: str,
                 lik: str, lik_const: float, all_cont: bool = False,
                 x_nan: bool = True):
    """Run one PGBART step for C chains in ONE kernel instance.

    ``keys``: (C,) per-chain PRNG keys; ``state``: PgbartState pytree with
    a leading C axis on every field; ``lik_row``: (C, n, 1) per-row
    likelihood data or None (bernoulli).  X / Y_target / rules are shared
    across chains.  Returns (state with leading C, vi (C, p)).
    """
    from ..sampler.pgbart import PgbartState
    from ..ops.trees import Forest

    C, m, S = state.forest.split_var.shape
    n, p = X.shape
    P = pg.num_particles
    D = cfg.max_depth
    B = pg.batch_size(m, tuning)
    Gtot = 2 ** D - 1
    R = max(pg.num_refinements, 1)
    CP = C * P

    gen_gumbel = rng_mode == "kernel" and jax.default_backend() != "cpu"
    if gen_gumbel:
        ug, uv, _rg, eps, sb, ures, usel, epsr, uacc = jax.vmap(
            lambda k_: _rands_batched(k_, B, P, D, 1, Gtot, R, S,
                                      pg.num_refinements))(keys)
        rg = jnp.zeros((B, 1, 1), jnp.float32)
    else:
        make = _rands_reference if rng_mode == "reference" else _rands_batched
        ug, uv, rg, eps, sb, ures, usel, epsr, uacc = jax.vmap(
            lambda k_: make(k_, B, P, D, n, Gtot, R, S,
                            pg.num_refinements))(keys)
        # (C, B, D, P, n) -> (B, D*C*P, n): level-major, chain-major rows
        rg = rg.transpose(1, 2, 0, 3, 4).reshape(B, D * CP, n)
    # (C, B, P, Z) -> (B, C*P, Z)
    ug = ug.transpose(1, 0, 2, 3).reshape(B, CP, Gtot)
    uv = uv.transpose(1, 0, 2, 3).reshape(B, CP, Gtot)
    eps = eps.transpose(1, 0, 2, 3, 4).reshape(B, CP, 2 * Gtot)
    sb = sb.transpose(1, 0, 2, 3).reshape(B, CP, Gtot)
    ures = ures.reshape(C, B * D)
    usel = usel.reshape(C, B)
    # (C, B, R, 1, S) -> (B, R*C, S): refinement-major, chain-minor rows
    epsr = epsr.reshape(C, B, R, S).transpose(1, 2, 0, 3).reshape(B, R * C, S)
    uacc = uacc.reshape(C, B * R)

    kd = (jax.random.key_data(keys[0])
          if jax.dtypes.issubdtype(keys.dtype, jax.dtypes.prng_key)
          else keys[0])
    seed = jax.lax.bitcast_convert_type(
        kd.reshape(-1)[-2:].astype(jnp.uint32), jnp.int32).reshape(1, 2)

    f = state.forest
    scal = jnp.stack([state.leaf_sd[:, 0], state.wf_count,
                      state.iteration.astype(jnp.float32),
                      jnp.zeros((C,), jnp.float32)], axis=1)      # (C, 4)
    jt_all = ((state.batch_offset[:, None]
               + jnp.arange(B, dtype=jnp.int32)[None, :]) % m)    # (C, B)
    llw = (jnp.ones((C, n), jnp.float32) if lik_row is None
           else lik_row.reshape(C, n))

    vi_in_kernel = p <= 32
    out_shape = [
        jax.ShapeDtypeStruct((C * m, S), jnp.int32),
        jax.ShapeDtypeStruct((C * m, S), jnp.float32),
        jax.ShapeDtypeStruct((C * m, S), jnp.uint32),
        jax.ShapeDtypeStruct((C * m, S), jnp.float32),
        jax.ShapeDtypeStruct((C * m, S), jnp.float32),
        jax.ShapeDtypeStruct((C * m, S), jnp.float32),
        jax.ShapeDtypeStruct((C * m, n), jnp.float32),
        jax.ShapeDtypeStruct((C, n), jnp.float32),
        jax.ShapeDtypeStruct((C, p), jnp.float32),
        jax.ShapeDtypeStruct((C, n), jnp.float32),
        jax.ShapeDtypeStruct((C, n), jnp.float32),
        jax.ShapeDtypeStruct((C, 4), jnp.float32),
        jax.ShapeDtypeStruct((C, p), jnp.float32),
    ]
    kernel = functools.partial(
        _draw_kernel, C=C, B=B, P=P, D=D, S=S, n=n, p=p, m=m, R=R,
        alpha=float(cfg.alpha), beta=float(cfg.beta), tuning=tuning,
        gen_gumbel=gen_gumbel, lik=lik, lik_const=float(lik_const),
        vi_in_kernel=vi_in_kernel, spd=float(pg.split_prior_decay),
        all_cont=all_cont, x_nan=x_nan,
    )

    def full(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda b, _z=zeros: _z,
                            memory_space=pltpu.VMEM)

    def per_tree(shape):
        rest = (0,) * (len(shape) - 1)
        return pl.BlockSpec((1,) + shape[1:], lambda b, _r=rest: (b,) + _r,
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = (
        [smem] * 5
        + [full(s) for s in [
            (C, 4), (C * m, S), (C * m, S), (C * m, S), (C * m, S),
            (C * m, S), (C * m, S), (C * m, n), (C, n),
            (1, n), (p, n), (1, p), (C, p), (C, n), (C, n), (C, n)]]
        + [per_tree(a.shape) for a in (ug, uv, rg, eps, sb, epsr)]
    )
    out_specs = [full(s.shape) for s in out_shape]
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=(jax.default_backend() == "cpu"),
    )(
        jt_all, ures, usel, uacc, seed,
        scal,
        f.split_var.reshape(C * m, S), f.split_val.reshape(C * m, S),
        f.split_set.reshape(C * m, S), f.leaf.reshape(C * m, S),
        f.count.reshape(C * m, S), f.slope.reshape(C * m, S),
        state.tree_pred.reshape(C * m, n),
        state.sum_trees.reshape(C, n),
        Y_target.reshape(1, n),
        X.T, rules.reshape(1, p),
        state.alpha_vec.reshape(C, p),
        llw,
        state.wf_mean.reshape(C, n), state.wf_m2.reshape(C, n),
        ug, uv, rg, eps, sb, epsr,
    )
    (sv_o, sl_o, st_o, lf_o, ct_o, sp_o, tp_o, sum_o, av_o,
     wfm_o, wfm2_o, scal_o, vi_o) = out

    if not vi_in_kernel:
        sv_r = sv_o.reshape(C, m * S)
        vi_o = (sv_r[:, :, None]
                == jnp.arange(p, dtype=jnp.int32)[None, None, :]
                ).astype(jnp.float32).sum(axis=1)

    forest = Forest(
        sv_o.reshape(C, m, S), sl_o.reshape(C, m, S),
        st_o.reshape(C, m, S), lf_o.reshape(C, m, S, 1),
        ct_o.reshape(C, m, S), sp_o.reshape(C, m, S, 1),
    )
    new_state = PgbartState(
        forest=forest,
        tree_pred=tp_o.reshape(C, m, n, 1),
        sum_trees=sum_o.reshape(C, n, 1),
        alpha_vec=av_o,
        leaf_sd=scal_o[:, 0:1],
        wf_count=scal_o[:, 1],
        wf_mean=wfm_o.reshape(C, n, 1),
        wf_m2=wfm2_o.reshape(C, n, 1),
        batch_offset=(state.batch_offset + B) % m,
        iteration=state.iteration + B,
    )
    return new_state, vi_o


# ---------------------------------------------------------------------------
# Public wrapper: custom_vmap routes vmap-over-chains into ONE kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fused_step_cached(cfg: BartConfig, pg: PgbartConfig, tuning: bool,
                       rng_mode: str, lik: str, lik_const: float,
                       all_cont: bool, x_nan: bool):
    from jax import custom_batching

    def single(key, state, X, Y_target, rules, lik_row):
        lead = lambda a: a[None]
        st1 = jax.tree.map(lead, state)
        lr1 = None if lik_row is None else lik_row[None]
        out_state, vi = _chains_impl(
            key[None], st1, X, Y_target, rules, cfg, pg, lr1, tuning,
            rng_mode, lik, lik_const, all_cont, x_nan)
        return jax.tree.map(lambda a: a[0], out_state), vi[0]

    step = custom_batching.custom_vmap(single)

    @step.def_vmap
    def _rule(axis_size, in_batched, key, state, X, Y_target, rules,
              lik_row):
        kb, sb_, xb, yb, rb, lb = in_batched
        n, _p = X.shape if not xb else X.shape[1:]
        data_shared = not (xb or yb or rb)
        m = (state.forest.split_var.shape[-2])
        # when only the pre-drawn row-Gumbel block breaks the VMEM
        # budget, generate it in-kernel (Mosaic PRNG) instead of
        # falling back to sequential per-chain execution
        rng_eff = rng_mode
        if (data_shared and jax.default_backend() != "cpu"
                and not _chains_vmem_ok(axis_size, cfg, pg, n, m)
                and _chains_vmem_ok(axis_size, cfg, pg, n, m,
                                    with_rg=False)):
            rng_eff = "kernel"
        if (not data_shared
                or not _chains_vmem_ok(
                    axis_size, cfg, pg, n, m,
                    with_rg=(rng_eff != "kernel"
                             or jax.default_backend() == "cpu"))):
            # fall back to a sequential per-chain scan (matches the
            # pre-round-3 grid-serialized behavior)
            def bc(x, b):
                return x if b else jax.tree.map(
                    lambda a: jnp.broadcast_to(
                        a, (axis_size,) + jnp.shape(a)), x)
            args = (bc(key, kb),
                    jax.tree.map(lambda a, b: bc(a, b), state, sb_),
                    bc(X, xb), bc(Y_target, yb), bc(rules, rb),
                    None if lik_row is None else bc(lik_row, lb))
            outs = jax.lax.map(lambda a: single(*a), args)
            return outs, (jax.tree.map(lambda _: True, outs[0]), True)

        def bcl(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

        keys_C = bcl(key, kb)
        state_C = jax.tree.map(bcl, state, sb_)
        lr_C = None if lik_row is None else bcl(lik_row, lb)
        outs = _chains_impl(keys_C, state_C, X, Y_target, rules, cfg, pg,
                            lr_C, tuning, rng_eff, lik, lik_const,
                            all_cont, x_nan)
        return outs, (jax.tree.map(lambda _: True, outs[0]), True)

    return step


def pgbart_step_fused(key, state, X, Y_target, rules, cfg: BartConfig,
                      pg: PgbartConfig, gauss_w, tuning: bool,
                      rng_mode: str = "batched", lik: str = "gauss",
                      lik_const: float = 0.0, all_cont: bool = False,
                      x_nan: bool = True):
    """One full PGBART MCMC step as a single Pallas program (one chain).

    Drop-in for ``pgbart.pgbart_step`` on the fused-likelihood path.
    ``gauss_w`` is the per-row likelihood data (n, k): Gaussian precision
    for ``lik="gauss"``, squared residuals (y - mu0)^2 for the ``het_*``
    codes, ignored for ``"bernoulli"``.  ``jax.vmap`` over (key, state
    [, gauss_w]) runs ALL chains in ONE kernel instance via the
    custom_vmap rule above.  Returns (new_state, vi counts float32[p]).
    """
    step = _fused_step_cached(cfg, pg, bool(tuning), rng_mode, lik,
                              float(lik_const), bool(all_cont), bool(x_nan))
    return step(key, state, X, Y_target, rules, gauss_w)
