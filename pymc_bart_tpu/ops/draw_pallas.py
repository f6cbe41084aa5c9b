"""Whole-draw PGBART megakernel: one ``pallas_call`` per MCMC step.

Runs the ENTIRE PGBART step — the Gibbs loop over the batch's B trees,
each tree's full conditional SMC (D depth-synchronous growth rounds,
ESS-gated systematic resampling, categorical winner selection, R
Metropolis leaf refinements), the forest/sum-of-trees commit, the
tuning-phase adaptation (split-prior counts, Welford leaf variance) and
the per-draw variable-inclusion histogram — as ONE program.

The formulation is PARTICLE-VECTORIZED (see _draw_kernel): particle
state is carried as (P, S)/(P, n) values, growth is a fori over the
level's nodes with all P particles per instruction, resample gathers
are exact (P, P) selection matmuls.  The per-particle fori formulation
it replaced was bound by ~20 ns of fixed Mosaic overhead per op across
~60 ops x P x D x B calls per draw (5.4 ms -> 1.4 ms per 4-chain draw
at bench shapes).

Randomness:
* ``rng="reference"`` replicates ``_update_one_tree``'s exact key-split
  sequence per tree, so the megakernel is bit-comparable to the
  per-round kernels given the same top-level key (equivalence tests);
* ``rng="batched"`` draws each random block with one batched call;
* ``rng="kernel"`` generates the large row-Gumbel block on-chip with
  the Mosaic PRNG seeded from the step key (only the small node-level
  blocks stay on the jax.random stream) — measured slightly SLOWER than
  "batched" at n=1000 (the XLA block overlaps with kernel execution,
  Gumbel transcendentals do not), kept for very large n.

Mosaic idioms: selection matmuls instead of gathers, i32 bit patterns
for the uint32 subset masks and NaN-able split values, f32/i32 mask
arithmetic instead of i1 broadcasts, (P, 1) node quantities broadcast
against (P, n) row blocks.

Scope (callers fall back to ``pgbart_step``'s per-round kernel path
otherwise): constant leaf response, n_outputs == 1, fused Gaussian
likelihood (``gauss_w`` given), p <= 32.

Reference for the algorithm: SURVEY 2.3 (PGBART, reconstructed from
arXiv:1502.04622 + reference CHANGELOG.md); this file is a scheduling
fusion only — no statistical behavior is introduced here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BartConfig, PgbartConfig


def _row_from_col(col2, P: int):
    """(P, 1) f32 column -> (P,) row value via a diag matmul (no transpose)."""
    eye = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(jnp.float32)
    ones = jnp.ones((1, P), jnp.float32)
    return jax.lax.dot_general(
        ones, col2 * eye, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]


def _draw_kernel(
    # SMEM scalars
    jt_ref, scal_ref, u_res_ref, u_sel_ref, u_acc_ref, seed_ref,
    # VMEM inputs
    sv_fi, sl_fi, st_fi, lf_fi, ct_fi, sp_fi, tp_i, sum_i,
    y_ref, xt_ref, rules_ref, av_i, llw_ref, wfm_i, wfm2_i,
    ug_ref, uv_ref, rg_ref, eps_ref, sb_ref, epsr_ref,
    # VMEM outputs
    sv_fo, sl_fo, st_fo, lf_fo, ct_fo, sp_fo, tp_o, sum_o, av_o,
    wfm_o, wfm2_o, scal_o, vi_o,
    *, B: int, P: int, D: int, S: int, n: int, p: int, m: int, R: int,
    alpha: float, beta: float, tuning: bool, gen_gumbel: bool,
):
    """PARTICLE-VECTORIZED formulation (k = 1, p <= 32).

    The per-particle fori formulation spent ~20 ns of fixed Mosaic
    instruction overhead per op across ~60 ops x P x D x B calls per
    draw (ablations: removing whole op groups barely moved the time —
    the cost is instruction count, not FLOPs).  Here every instruction
    covers ALL P particles: particle state is carried as (P, S)/(P, n)
    VALUES through the static depth/node loops, growth is driven by a
    static per-NODE loop (row masks (P, n), node quantities (P, 1)),
    and the post-resampling ancestor gather is a handful of exact
    selection matmuls (P, P) @ (P, *) — int arrays ride f32 (values
    < 2^24), the u32 subset masks ride two 16-bit halves.
    """
    k = 1  # n_outputs; callers gate on this

    # ---- copy persistent state in -> out (whole-array ops) ----
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

    # ---- shared blocks ----
    xtraw = xt_ref[:, :]                  # (p, n)
    xtnan = jnp.isnan(xtraw)
    xT_z = jnp.where(xtnan, 0.0, xtraw)
    xnanT_f = xtnan.astype(jnp.float32)
    y2 = y_ref[:, :]                      # (1, n)
    llw2 = llw_ref[:, :]                  # (1, n)
    rules_row = rules_ref[:, :].astype(jnp.float32)  # (1, p)
    nf = jnp.float32(n)

    idxP = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)[0]   # (P,) lanes
    nonfrozen = idxP >= 1
    iotaP_col = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)  # (P, 1)
    frozen_c = (iotaP_col == 0)
    frozen_f = frozen_c.astype(jnp.float32)        # (P, 1)
    frozen_i = frozen_c.astype(jnp.int32)
    nonfroz_f = 1.0 - frozen_f
    iota_S_row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)  # (1, S)
    iota_p_row = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    lt_P = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(jnp.float32)
    lt_p = (jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)).astype(jnp.float32)
    iotaPP = jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)
    NEG = jnp.float32(-3e38)

    def mm(a, b):  # (r, c) @ (c, z) on the MXU
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if gen_gumbel:
        # on-chip generation of the B*D*P*n row-Gumbel block (2.4 MB per
        # draw at bench shapes); see the module docstring for when this
        # wins over the prefetched XLA block
        pltpu.prng_seed(seed_ref[0, 0], seed_ref[0, 1])

    def fresh_gumbel():
        bits = pltpu.prng_random_bits((P, n))
        u = (jax.lax.shift_right_logical(
            jax.lax.bitcast_convert_type(bits, jnp.int32), 8
        ).astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)
        return -jnp.log(-jnp.log(u))

    def tree_body(bi, carry):
        leaf_sd, wf_count, iteration = carry
        jt = jt_ref[0, bi]

        tp_jt = tp_o[jt, :][None, :]           # (1, n)
        sum_noi = sum_o[:, :] - tp_jt          # (1, n)
        resid2 = y2 - sum_noi                  # (1, n)

        av = jnp.maximum(av_o[:, :], 1e-12)    # (1, p)
        cdf_row = mm(av, lt_p)                 # (1, p)
        total = cdf_row[0, p - 1]

        # ---- init particles: slot 0 = frozen current tree, rest = root ----
        t_sv = sv_fo[jt, :][None, :]           # (1, S) i32
        t_sl = sl_fo[jt, :][None, :]
        t_st_i = jax.lax.bitcast_convert_type(st_fo[jt, :], jnp.int32)[None, :]
        t_lf = lf_fo[jt, :][None, :]
        t_ct = ct_fo[jt, :][None, :]
        root_mu = jnp.sum(resid2) / nf / m

        root_col = (iota_S_row == 0).astype(jnp.float32)   # (1, S)
        sv_v = frozen_i * t_sv + (1 - frozen_i) * (-1)     # (P, S)
        # stored split values may be NaN (ties/NaN covariates); blend on
        # the BIT pattern — 0 * NaN would poison the fresh particles
        sl_v = jax.lax.bitcast_convert_type(
            frozen_i * jax.lax.bitcast_convert_type(t_sl, jnp.int32),
            jnp.float32)
        st_v = frozen_i * t_st_i
        lf_v = frozen_f * t_lf + nonfroz_f * (root_mu * root_col)
        ct_v = frozen_f * t_ct + nonfroz_f * (nf * root_col)
        li_v = jnp.zeros((P, n), jnp.int32)
        pred0 = frozen_f * t_lf[0, 0] + nonfroz_f * root_mu  # (P, 1)
        pred_v = jnp.broadcast_to(pred0, (P, n))

        def ll_of_pred(pv):  # (P, n) -> (P,) lane vector
            diff = resid2 - pv
            col = jnp.sum(llw2 * diff * diff, axis=1, keepdims=True)
            return _row_from_col(-0.5 * col, P)

        ll = ll_of_pred(pred_v)
        log_w = ll
        ll_prev = ll
        take = idxP                                # identity ancestors

        ug_t = ug_ref[bi]                          # (P, Gtot)
        uv_t = uv_ref[bi]
        eps_t = eps_ref[bi]                        # (P, 2*Gtot)
        sb_t = jax.lax.bitcast_convert_type(sb_ref[bi], jnp.int32)

        for d in range(D):
            lo, hi = 2 ** d - 1, 2 ** (d + 1) - 1
            G = hi - lo
            p_grow = float(alpha * (1.0 + d) ** (-beta))

            if d > 0:
                # ancestor gather via exact selection matmuls.  sl may
                # hold NaNs: gather the zeroed values and the NaN flags
                # separately (NaN * 0 = NaN would poison the matmul).
                A = (iotaPP == take[:, None]).astype(jnp.float32)  # (P, P)
                sl_isnan = jnp.isnan(sl_v)
                sl_clean_g = mm(A, jnp.where(sl_isnan, 0.0, sl_v))
                sl_flag_g = mm(A, sl_isnan.astype(jnp.float32))
                sl_v = jnp.where(sl_flag_g > 0.5, jnp.nan, sl_clean_g)
                lf_v = mm(A, lf_v)
                ct_v = mm(A, ct_v)
                pred_v = mm(A, pred_v)
                sv_v = mm(A, (sv_v + 1).astype(jnp.float32)).astype(jnp.int32) - 1
                li_v = mm(A, li_v.astype(jnp.float32)).astype(jnp.int32)
                st_lo = mm(A, (st_v & 0xFFFF).astype(jnp.float32))
                st_hi = mm(A, jax.lax.shift_right_logical(
                    st_v, 16).astype(jnp.float32))
                st_v = (st_lo.astype(jnp.int32)
                        | (st_hi.astype(jnp.int32) << 16))

            # per-level node quantities (P, G).  Mosaic broadcasts only
            # 32-bit types, so (P, 1)-to-(P, G) blends ride f32/i32
            # arithmetic instead of boolean masks.
            sv_lvl = sv_v[:, lo:hi]
            ct_lvl = ct_v[:, lo:hi]
            u_v = uv_t[:, lo:hi] * total
            var_lvl = jnp.zeros((P, G), jnp.int32)
            for j in range(p - 1):
                var_lvl = var_lvl + (cdf_row[0, j] < u_v).astype(jnp.int32)
            want_lvl_f = ((ug_t[:, lo:hi] < p_grow).astype(jnp.float32)
                          * (sv_lvl < 0).astype(jnp.float32)
                          * (ct_lvl >= 2.0).astype(jnp.float32)
                          * nonfroz_f)
            var_eff_lvl = (frozen_i * jnp.clip(sv_lvl, 0, p - 1)
                           + (1 - frozen_i) * var_lvl)
            if gen_gumbel:
                rg_d = fresh_gumbel()                  # (P, n)
            else:
                rg_d = rg_ref[bi * D + d]              # (P, n)

            # ---- per-node growth: fori over the level's nodes ----
            # A fully unrolled node loop (63 blocks at D=6) blows the
            # Mosaic program up into ~20-minute compiles; a fori with a
            # traced node index keeps the program one block per level.
            # Dynamic lane slices of VALUES are not available, so node
            # columns are mask-extracted: sum(arr * (iota == node)).
            iota_G_row = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
            iota_Gt_row = jax.lax.broadcasted_iota(
                jnp.int32, (1, ug_t.shape[1]), 1)
            iota_2Gt_row = jax.lax.broadcasted_iota(
                jnp.int32, (1, eps_t.shape[1]), 1)

            def g_body(g, st8):
                sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v = st8
                node = lo + g
                l = 2 * node + 1
                r = 2 * node + 2
                gmask = (iota_G_row == g).astype(jnp.float32)     # (1, G)
                gmask_i = gmask.astype(jnp.int32)
                ncol = (iota_S_row == node).astype(jnp.float32)   # (1, S)
                ncol_i = ncol.astype(jnp.int32)
                lcol = (iota_S_row == l).astype(jnp.float32)
                rcol = (iota_S_row == r).astype(jnp.float32)

                def ext_f(arr, mask_row):  # (P, Z) x (1, Z) -> (P, 1)
                    return jnp.sum(arr * mask_row, axis=1, keepdims=True)

                def ext_i(arr_i, mask_row_i):
                    return jnp.sum(arr_i * mask_row_i, axis=1,
                                   keepdims=True)

                mask = li_v == node                            # (P, n)
                mask_f = mask.astype(jnp.float32)
                cnt = jnp.sum(mask_f, axis=1, keepdims=True)   # (P, 1)

                # the node's column of X per particle (exact selection)
                var_eff = ext_i(var_eff_lvl, gmask_i)          # (P, 1)
                onehot_var = (iota_p_row == var_eff).astype(jnp.float32)
                xcol = mm(onehot_var, xT_z)                    # (P, n)
                xnan_col_f = mm(onehot_var, xnanT_f)           # 0/1 values
                rule_g = jnp.sum(onehot_var * rules_row, axis=1,
                                 keepdims=True).astype(jnp.int32)

                # uniform row via Gumbel-max within the node
                sc = jnp.where(mask, rg_d, NEG)
                mx = jnp.max(sc, axis=1, keepdims=True)
                win = ((sc == mx) & mask).astype(jnp.float32)
                nwin = jnp.maximum(jnp.sum(win, axis=1, keepdims=True), 1.0)
                val_g = jnp.sum(win * xcol, axis=1, keepdims=True) / nwin
                valnan_g_f = jnp.minimum(
                    jnp.sum(win * xnan_col_f, axis=1, keepdims=True), 1.0)

                # stored split value at the node (NaN tracked separately:
                # a NaN anywhere in sl_v would poison the extraction)
                sl_nanflag = jnp.isnan(sl_v).astype(jnp.float32)
                sl_clean = jnp.where(jnp.isnan(sl_v), 0.0, sl_v)
                node_sl = ext_f(sl_clean, ncol)
                node_sl_nan = ext_f(sl_nanflag, ncol)
                valx = frozen_f * node_sl + nonfroz_f * val_g
                valxnan_f = frozen_f * node_sl_nan + nonfroz_f * valnan_g_f
                own_cat = jnp.clip(val_g.astype(jnp.int32), 0, 31)
                sb_col = ext_i(sb_t, (iota_Gt_row == node).astype(jnp.int32))
                st_prop = sb_col | (jnp.int32(1) << own_cat)
                setx = (frozen_i * ext_i(st_v, ncol_i)
                        + (1 - frozen_i) * st_prop)

                # routing decision for the node's rows (0/1 f32 algebra)
                notnan_f = (1.0 - xnan_col_f) * (1.0 - valxnan_f)
                cont_f = (xcol <= valx).astype(jnp.float32) * notnan_f
                eq_f = (xcol == valx).astype(jnp.float32) * notnan_f
                cat_rows = jnp.clip(xcol, 0.0, 31.0).astype(jnp.int32)
                sub_f = ((setx >> cat_rows) & 1).astype(jnp.float32) \
                    * (1.0 - xnan_col_f)
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
                sv_col = ext_i(sv_lvl + 1, gmask_i) - 1  # ext of -1s needs shift
                act_fin_f = (frozen_f * (sv_col >= 0).astype(jnp.float32)
                             + nonfroz_f * grow_ok_f)

                # children leaf values ~ N(child residual mean / m, sd);
                # child c of level d rides eps column 2*lo + c = 2*node(+1)
                sums_l = jnp.sum(resid2 * lm, axis=1, keepdims=True)
                sums_t = jnp.sum(resid2 * mask_f, axis=1, keepdims=True)
                sums_r = sums_t - sums_l
                eps_l = ext_f(eps_t, (iota_2Gt_row == 2 * node
                                      ).astype(jnp.float32))
                eps_r = ext_f(eps_t, (iota_2Gt_row == 2 * node + 1
                                      ).astype(jnp.float32))
                mu_l = sums_l / jnp.maximum(cl, 1.0) / m + eps_l * leaf_sd
                mu_r = sums_r / jnp.maximum(cr, 1.0) / m + eps_r * leaf_sd
                lval = frozen_f * ext_f(lf_v, lcol) + nonfroz_f * mu_l
                rval = frozen_f * ext_f(lf_v, rcol) + nonfroz_f * mu_r

                # commit structure + children (single-column f32 blends)
                mkn = ncol * grow_ok_f                 # (P, S) 0/1
                mkn_i = mkn.astype(jnp.int32)
                sv_v = mkn_i * var_eff + (1 - mkn_i) * sv_v
                # commit the split value on the BIT pattern: the blended
                # value may be NaN (NaN-covariate winner row) and a
                # 0 * NaN float blend would poison uncommitted slots
                val_commit = jnp.where(valnan_g_f > 0.5, jnp.nan, val_g)
                sl_v = jax.lax.bitcast_convert_type(
                    mkn_i * jax.lax.bitcast_convert_type(val_commit,
                                                         jnp.int32)
                    + (1 - mkn_i) * jax.lax.bitcast_convert_type(
                        sl_v, jnp.int32),
                    jnp.float32)
                st_v = mkn_i * st_prop + (1 - mkn_i) * st_v
                mkl = lcol * grow_ok_f
                mkr = rcol * grow_ok_f
                ct_v = mkl * cl + (1.0 - mkl) * ct_v
                ct_v = mkr * cr + (1.0 - mkr) * ct_v
                lf_v = mkl * mu_l + (1.0 - mkl) * lf_v
                lf_v = mkr * mu_r + (1.0 - mkr) * lf_v

                # route rows + incremental prediction
                dm_f = mask_f * act_fin_f              # (P, n) 0/1
                dm_i = dm_f.astype(jnp.int32)
                left_i = left_f.astype(jnp.int32)
                li_v = dm_i * (l + 1 - left_i) + (1 - dm_i) * li_v
                child_val = left_f * lval + (1.0 - left_f) * rval
                pred_v = dm_f * child_val + (1.0 - dm_f) * pred_v
                return (sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v)

            (sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v) = jax.lax.fori_loop(
                0, G, g_body, (sv_v, sl_v, st_v, lf_v, ct_v, li_v, pred_v))

            ll = ll_of_pred(pred_v)
            lw1 = log_w + ll - ll_prev

            if d < D - 1:
                # SMC bookkeeping — mirrors smc_pallas._kernel
                u = u_res_ref[0, bi * D + d]
                w_nf = jnp.where(nonfrozen, lw1, jnp.float32(-jnp.inf))
                mxw = jnp.max(w_nf)
                e = jnp.where(nonfrozen, jnp.exp(lw1 - mxw), 0.0)
                tot = jnp.sum(e)
                probs = e / tot
                log_mean = mxw + jnp.log(tot / (P - 1))
                ess = 1.0 / jnp.maximum(jnp.sum(probs * probs), 1e-38)
                do = ess < 0.5 * (P - 1)
                cdfP = mm(probs[None, :], lt_P)[0]
                cdfP = cdfP / cdfP[P - 1]
                pos = (u + idxP.astype(jnp.float32) - 1.0) / (P - 1)
                cmp = (cdfP[None, :] < pos[:, None]) & nonfrozen[None, :]
                anc = jnp.clip(jnp.sum(cmp.astype(jnp.int32), axis=1) + 1,
                               1, P - 1)
                resampled = do & nonfrozen
                take = jnp.where(resampled, anc, idxP)
                log_w = jnp.where(resampled, log_mean, lw1)
                sel = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
                       == take[None, :]).astype(jnp.float32)
                ll_prev = mm(ll[None, :], sel)[0]
            else:
                log_w = lw1

        # ---- categorical winner + refinement — mirrors select_pallas ----
        mxw = jnp.max(log_w)
        e = jnp.exp(log_w - mxw)
        cdfP = mm(e[None, :], lt_P)[0]
        u = u_sel_ref[0, bi] * cdfP[P - 1]
        widx = jnp.clip(jnp.sum((cdfP < u).astype(jnp.int32)), 0, P - 1)
        wsel = (idxP == widx).astype(jnp.float32)
        wsel_i = wsel.astype(jnp.int32)[:, None]

        def pick2(mat_f32):  # (P, Z) -> (Z,)
            return mm(wsel[None, :], mat_f32)[0]

        sv_w = jnp.sum(sv_v * wsel_i, axis=0)
        st_w = jnp.sum(st_v * wsel_i, axis=0)
        li_w = jnp.sum(li_v * wsel_i, axis=0)
        sl_w = pick2(sl_v)
        ct_w = pick2(ct_v)
        lf_w = pick2(lf_v)
        pred_w = pick2(pred_v)

        resid1 = resid2[0]
        llw1 = llw2[0]
        leaf_mask = ((sv_w < 0) & (ct_w > 0)).astype(jnp.float32)
        soh = (jax.lax.broadcasted_iota(jnp.int32, (S, n), 0)
               == li_w[None, :]).astype(jnp.float32)
        leaf_rsum = jax.lax.dot_general(
            resid1[None, :], soh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        prior_center = leaf_rsum / jnp.maximum(ct_w, 1.0) / m

        def ll_of(pred_x):
            diff = resid1 - pred_x
            return -0.5 * jnp.sum(llw1 * diff * diff)

        # MH acceptance = likelihood ratio x leaf-prior ratio, the prior
        # being the growth proposal N(leaf residual mean / m, leaf_sd)
        hiv = 0.5 / (leaf_sd * leaf_sd)

        def lp_of(lf_x):
            dev = lf_x - prior_center
            return -hiv * jnp.sum(leaf_mask * dev * dev)

        ll_c = ll_of(pred_w) + lp_of(lf_w)
        eps_scale = 0.3 * leaf_sd
        for r_i in range(R):
            lf_p = lf_w + epsr_ref[bi * R + r_i, 0, :] * eps_scale * leaf_mask
            pred_p = mm(lf_p[None, :], soh)[0]
            ll_p = ll_of(pred_p) + lp_of(lf_p)
            acc = jnp.log(u_acc_ref[0, bi * R + r_i]) < (ll_p - ll_c)
            accf = acc.astype(jnp.float32)
            lf_w = accf * lf_p + (1.0 - accf) * lf_w
            pred_w = accf * pred_p + (1.0 - accf) * pred_w
            ll_c = jnp.where(acc, ll_p, ll_c)

        # ---- commit winner into the forest + running sums ----
        sv_fo[jt, :] = sv_w
        sl_fo[jt, :] = sl_w
        st_fo[jt, :] = jax.lax.bitcast_convert_type(st_w, jnp.uint32)
        lf_fo[jt, :] = lf_w
        ct_fo[jt, :] = ct_w
        sp_fo[jt, :] = jnp.zeros((S,), jnp.float32)
        tp_o[jt, :] = pred_w
        sum_o[0, :] = sum_noi[0] + pred_w
        iteration = iteration + 1.0

        if tuning:
            # Dirichlet-style split-prior adaptation: +1 per SPLIT NODE
            # using the variable (multiset — see sampler/pgbart.py)
            used = (sv_w[:, None]
                    == jax.lax.broadcasted_iota(jnp.int32, (S, p), 1))
            tcounts = used.astype(jnp.float32).sum(axis=0)
            av_o[0, :] = av_o[0, :] + tcounts
            # Welford running leaf variance -> leaf_sd
            wf_count = wf_count + 1.0
            pred_w2 = pred_w[None, :]
            delta = pred_w2 - wfm_o[:, :]
            wfm_new = wfm_o[:, :] + delta / wf_count
            wfm2_new = wfm2_o[:, :] + delta * (pred_w2 - wfm_new)
            wfm_o[:, :] = wfm_new
            wfm2_o[:, :] = wfm2_new
            sd = jnp.sum(
                jnp.sqrt(jnp.maximum(wfm2_new / jnp.maximum(wf_count, 1.0),
                                     1e-12))) / nf
            leaf_sd = jnp.where(iteration > m, jnp.maximum(sd, 1e-6), leaf_sd)

        return (leaf_sd, wf_count, iteration)

    leaf_sd0 = scal_ref[0, 0]
    wf_count0 = scal_ref[0, 1]
    iteration0 = scal_ref[0, 2]
    leaf_sd, wf_count, iteration = jax.lax.fori_loop(
        0, B, tree_body, (leaf_sd0, wf_count0, iteration0))

    i4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)[0]
    scal_o[0, :] = jnp.where(
        i4 == 0, leaf_sd,
        jnp.where(i4 == 1, wf_count, jnp.where(i4 == 2, iteration, 0.0)))

    # per-draw variable-inclusion histogram over the whole forest
    # (replaces a separate ~0.25 ms XLA dispatch per draw)
    sv_all = sv_fo[:, :]                              # (m, S)
    vi_row = jnp.zeros((1, p), jnp.float32)
    for j in range(p):
        cnt_j = jnp.sum((sv_all == j).astype(jnp.float32))
        vi_row = jnp.where(iota_p_row == j, cnt_j, vi_row)
    vi_o[:, :] = vi_row


# ---------------------------------------------------------------------------
# RNG preparation
# ---------------------------------------------------------------------------


def _rands_reference(key, B, P, D, n, Gtot, R, S, num_refinements):
    """Replicate the exact per-tree key-split sequence of
    ``pgbart_step``/``_update_one_tree`` (fused-Gaussian Pallas branch) so
    the megakernel is bit-comparable given the same top-level key."""
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
# Public wrapper
# ---------------------------------------------------------------------------


def fused_draw_unsupported_reason(cfg: BartConfig, pg: PgbartConfig, X,
                                  gauss_w):
    """None when the whole-draw megakernel covers this configuration,
    else a human-readable reason for the fallback (surfaced by
    ``sample()`` so users know when they left the fast path).

    p <= 32: the vectorized kernel draws split variables by a p-step
    compare-count over the weight CDF; wider X falls back to the
    per-round kernel path."""
    if gauss_w is None:
        return ("likelihood is not fused-Gaussian (no per-observation "
                "precision available)")
    if cfg.response != "constant":
        return f"response={cfg.response!r} (megakernel covers 'constant')"
    if cfg.n_outputs != 1:
        return f"n_outputs={cfg.n_outputs} (megakernel covers 1)"
    n, p = X.shape
    if p > 32:
        return f"p={p} covariates (megakernel CDF search covers p <= 32)"
    if n * p > 2_000_000:
        return f"X size n*p={n * p} exceeds the 2M-element VMEM budget"
    # the pre-drawn row-Gumbel block must fit VMEM comfortably
    B = max(pg.batch_size(cfg.m, True), pg.batch_size(cfg.m, False))
    if B * cfg.max_depth * pg.num_particles * n * 4 > 6_000_000:
        return ("per-draw row-Gumbel block (batch x depth x particles x n) "
                "exceeds the 6 MB VMEM budget")
    return None


def fused_draw_supported(cfg: BartConfig, pg: PgbartConfig, X,
                         gauss_w) -> bool:
    """Whether the whole-draw megakernel covers this configuration."""
    return fused_draw_unsupported_reason(cfg, pg, X, gauss_w) is None


@functools.partial(jax.jit,
                   static_argnames=("cfg", "pg", "tuning", "rng_mode"))
def pgbart_step_fused(key, state, X, Y_target, rules, cfg: BartConfig,
                      pg: PgbartConfig, gauss_w, tuning: bool,
                      rng_mode: str = "batched"):
    """One full PGBART MCMC step as a single Pallas program.

    Drop-in for ``pgbart.pgbart_step`` on the fused-Gaussian path
    (``gauss_w`` = per-observation precision, (n, k)).  Returns
    ``(new_state, variable_inclusion_counts)``.
    """
    from ..sampler.pgbart import PgbartState

    m, S = state.forest.split_var.shape
    n, p = X.shape
    P = pg.num_particles
    D = cfg.max_depth
    B = pg.batch_size(m, tuning)
    Gtot = 2 ** D - 1
    R = max(pg.num_refinements, 1)

    # the Mosaic PRNG has no interpret-mode lowering: "kernel" silently
    # degrades to "batched" on CPU (statistically equivalent)
    gen_gumbel = rng_mode == "kernel" and jax.default_backend() != "cpu"
    if gen_gumbel:
        # "kernel": the big (B, D, P, n) row-Gumbel block is generated
        # on-chip by the Mosaic PRNG seeded from the step key; the small
        # node-level blocks stay on the jax.random stream
        ug, uv, _rg, eps, sb, ures, usel, epsr, uacc = _rands_batched(
            key, B, P, D, 1, Gtot, R, S, pg.num_refinements)
        rg = jnp.zeros((1, 1, 1), jnp.float32)
    else:
        make = _rands_reference if rng_mode == "reference" else _rands_batched
        ug, uv, rg, eps, sb, ures, usel, epsr, uacc = make(
            key, B, P, D, n, Gtot, R, S, pg.num_refinements)
        rg = rg.reshape(B * D, P, n)
    kd = (jax.random.key_data(key)
          if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key)
          else key)
    seed = jax.lax.bitcast_convert_type(
        kd.reshape(-1)[-2:].astype(jnp.uint32), jnp.int32).reshape(1, 2)

    f = state.forest
    scal = jnp.stack([state.leaf_sd[0], state.wf_count,
                      state.iteration.astype(jnp.float32)])

    out_shape = [
        jax.ShapeDtypeStruct((m, S), jnp.int32),
        jax.ShapeDtypeStruct((m, S), jnp.float32),
        jax.ShapeDtypeStruct((m, S), jnp.uint32),
        jax.ShapeDtypeStruct((m, S), jnp.float32),
        jax.ShapeDtypeStruct((m, S), jnp.float32),
        jax.ShapeDtypeStruct((m, S), jnp.float32),
        jax.ShapeDtypeStruct((m, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, p), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, 4), jnp.float32),
        jax.ShapeDtypeStruct((1, p), jnp.float32),
    ]
    kernel = functools.partial(
        _draw_kernel, B=B, P=P, D=D, S=S, n=n, p=p, m=m, R=R,
        alpha=float(cfg.alpha), beta=float(cfg.beta), tuning=tuning,
        gen_gumbel=gen_gumbel,
    )
    jt_all = (state.batch_offset + jnp.arange(B, dtype=jnp.int32)) % m
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 6
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 21,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        interpret=(jax.default_backend() == "cpu"),
    )(
        jt_all.reshape(1, B), scal.reshape(1, 3),
        ures.reshape(1, B * D), usel.reshape(1, B), uacc.reshape(1, B * R),
        seed,
        f.split_var, f.split_val, f.split_set,
        f.leaf[:, :, 0], f.count, f.slope[:, :, 0],
        state.tree_pred[:, :, 0],
        state.sum_trees.T,
        Y_target.reshape(n, 1).T,
        X.T, rules.reshape(1, p),
        state.alpha_vec.reshape(1, p),
        gauss_w.reshape(n, 1).T,
        state.wf_mean.T, state.wf_m2.T,
        ug, uv,
        rg,
        eps.reshape(B, P, 2 * Gtot),
        sb,
        epsr.reshape(B * R, 1, S),
    )
    (sv_o, sl_o, st_o, lf_o, ct_o, sp_o, tp_o, sum_o, av_o,
     wfm_o, wfm2_o, scal_o, vi_o) = out

    from ..ops.trees import Forest

    forest = Forest(
        sv_o, sl_o, st_o, lf_o[:, :, None], ct_o, sp_o[:, :, None],
    )
    new_state = PgbartState(
        forest=forest,
        tree_pred=tp_o[:, :, None],
        sum_trees=sum_o.T,
        alpha_vec=av_o.reshape(p),
        leaf_sd=scal_o[0, 0].reshape(1),
        wf_count=scal_o[0, 1],
        wf_mean=wfm_o.T,
        wf_m2=wfm2_o.T,
        batch_offset=(state.batch_offset + B) % m,
        iteration=state.iteration + B,
    )
    return new_state, vi_o.reshape(p)
