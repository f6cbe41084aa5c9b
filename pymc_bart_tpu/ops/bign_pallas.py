"""Row-tiled whole-draw PGBART kernel for LARGE n (Gaussian likelihood).

The chain-batched megakernel (ops/draw_pallas) holds every row-space
array — per-tree predictions (C*m, n), per-node masks (C*P, n), the
refinement one-hot (S, n) — wholly in VMEM, which gates it out around
n ~ 12k.  This kernel removes every O(n)-resident structure except ONE
(C*P, n) int32 scratch (the row -> node assignment ``li``) and streams
all other row work through (C*P, BN) chunks, so n = 50k+ runs at
megakernel-class speed (round-3 VERDICT item 1a; the reference's Rust
sampler is O(n*depth) per tree with no cliff, SURVEY 2.3).

Three structural ideas make the chunking cheap:

1. **Sufficient-statistics likelihoods.**  With constant leaf response
   every row's prediction IS its node's leaf value, so the Gaussian
   log-likelihood of a particle is an exact function of per-node
   (count, sum r, sum r^2) statistics:

       ll = -w/2 * sum_{leaves s} (Q_s - 2 lf_s R_s + lf_s^2 N_s)

   SMC weights, ESS resampling, winner selection AND the Metropolis
   leaf refinements therefore need NO row passes at all — they are
   node-space algebra on (C*P, S) arrays.  (Requires a per-chain SCALAR
   precision w — true whenever sigma is a scalar RV, e.g. the large-n
   bench config; the caller checks this statically.)

2. **Two chunked row passes per level.**  Pass 1 finds each node's
   split value (running Gumbel-argmax over chunks — the value rides the
   max, so one pass suffices) and Pass 2 accumulates left-child
   (count, sum, sum^2) stats given the winner values.  Pass 2 also
   writes the TENTATIVE routed assignment into ``li``; nodes whose
   growth is reverted (an empty child) are healed by the next level's
   Pass 1, which knows the final per-node activation flags — so routing
   costs no third pass.

3. **Resampling by relabeling.**  Systematic resampling only permutes
   particle labels; ``li`` is remapped by a (C*P, C*P) selection matmul
   at the next level's Pass 1 read, never gathered in HBM.

Scope (the caller gates; everything else stays on the existing paths):
Gaussian likelihood with scalar per-chain precision, constant response,
single output, all-continuous split rules, NaN-free X, p <= 512.  The
``li`` scratch bounds n at roughly 100k rows for a single chain (the
chains wrapper splits chain counts that exceed VMEM into sequential
single-chain calls); streaming ``li`` through HBM block-wise would lift
that ceiling and is the natural next extension, as is a third chunked
pass per level to carry the non-collapsible likelihood codes
(bernoulli/heteroscedastic).

Randomness: node-level blocks are the same ``_rands_batched`` layout as
the megakernel; row Gumbels are generated on-chip (Mosaic PRNG) with a
per-(tree, level, chunk) reseed so every pass regenerates identical
bits, or pre-drawn (``rg``) for interpret-mode tests.

Algorithm semantics: SURVEY 2.3 (PGBART), identical to sampler/pgbart.py
— this file is a scheduling/streaming reformulation only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BartConfig, PgbartConfig

NEG = -3e38


def _bign_kernel(
    # scalar prefetch
    jt_ref,
    # SMEM scalars
    u_res_ref, u_sel_ref, u_acc_ref, seed_ref, w_ref,
    # VMEM inputs
    scal_i, sv_fi, sl_fi, lf_fi, ct_fi, tp_i, sum_i, yt_ref, xt_ref,
    av_i, wfm_i, wfm2_i, llw_ref, ug_ref, uv_ref, eps_ref, epsr_ref,
    rg_ref,
    # VMEM outputs
    sv_fo, sl_fo, lf_fo, ct_fo, tp_o, sum_o, av_o, wfm_o, wfm2_o, scal_o,
    # scratch (pred_ref only allocated in the row-ll regime)
    li_ref, resid_ref, pred_ref=None,
    *, C: int, B: int, P: int, D: int, S: int, n: int, NPAD: int, BN: int,
    p: int, m: int, R: int, alpha: float, beta: float, tuning: bool,
    gen_gumbel: bool, spd: float, lik: str = "gauss",
    lik_const: float = 0.0,
):
    """One grid step = one tree's conditional SMC for all C chains.

    Two likelihood regimes:

    * ``lik == "gauss"`` — the original sufficient-statistics path: SMC
      weights, selection and refinement are node-space algebra on
      per-node (count, sum r, sum r^2); NO per-row likelihood state.
    * ``lik in ("bernoulli", "het_abs", "het_exp", "cat_logit")`` — the
      ROW-LL regime (round-4 VERDICT "Next round" #5): the likelihood
      does not collapse onto node statistics, so a per-particle row
      prediction buffer (``pred_ref``, (C*P, NPAD)) is carried
      incrementally and a third chunked pass per level heals the
      routing, updates predictions and accumulates the exact row
      log-likelihood (same closed forms as the megakernel's
      ``ll_cols``).  Metropolis leaf refinements are not available in
      this regime (the gate requires ``num_refinements == 0``; pair
      with ``ancestor_sampling`` for value mixing).
    """
    CP = C * P
    NB = NPAD // BN
    bi = pl.program_id(0)
    rowll = lik != "gauss"

    @pl.when(bi == 0)
    def _copy_in():
        sv_fo[:, :] = sv_fi[:, :]
        sl_fo[:, :] = sl_fi[:, :]
        lf_fo[:, :] = lf_fi[:, :]
        ct_fo[:, :] = ct_fi[:, :]
        sum_o[:, :] = sum_i[:, :]
        av_o[:, :] = av_i[:, :]
        wfm_o[:, :] = wfm_i[:, :]
        wfm2_o[:, :] = wfm2_i[:, :]
        scal_o[:, :] = scal_i[:, :]

    # ---- lane/column bookkeeping (as in draw_pallas) ----
    idxCP = jax.lax.broadcasted_iota(jnp.int32, (1, CP), 1)[0]
    pi_lane = idxCP % P
    ci_lane = idxCP // P
    nonfrozen = pi_lane >= 1
    iotaCP_col = jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)
    pi_col = iotaCP_col % P
    ci_col = iotaCP_col // P
    frozen_c = (pi_col == 0)
    frozen_f = frozen_c.astype(jnp.float32)
    frozen_i = frozen_c.astype(jnp.int32)
    nonfroz_f = 1.0 - frozen_f
    iota_S_row = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)
    iota_p_row = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    iota_4_row = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    iota_C_row = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1)
    E = (jax.lax.broadcasted_iota(jnp.int32, (CP, C), 1)
         == ci_col).astype(jnp.float32)
    Ect = (jax.lax.broadcasted_iota(jnp.int32, (C, CP), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (C, CP), 1) // P
           ).astype(jnp.float32)
    rPP = jax.lax.broadcasted_iota(jnp.int32, (CP, CP), 0)
    cPP = jax.lax.broadcasted_iota(jnp.int32, (CP, CP), 1)
    sameblock = (rPP // P) == (cPP // P)
    lt_CP = ((rPP <= cPP) & sameblock).astype(jnp.float32)
    lt_p = (jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
            ).astype(jnp.float32)

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def chain_sum_lane(v):
        s = mm(v[None, :], E)
        return mm(s, Ect)[0]

    def chain_max_lane(v):
        out = jnp.zeros((CP,), jnp.float32)
        for c in range(C):
            msk = (ci_lane == c)
            mx = jnp.max(jnp.where(msk, v, NEG))
            out = out + mx * msk.astype(jnp.float32)
        return out

    # ---- per-tree shared values ----
    jt_b = jt_ref[bi]
    row_c = [c * m + jt_b for c in range(C)]
    nf = jnp.float32(n)
    w_row = jnp.concatenate(
        [w_ref[c, 0] * jnp.ones((1, 1), jnp.float32) for c in range(C)],
        axis=0)                                        # (C, 1)
    w_cp = mm(E, w_row)                                # (CP, 1) per-chain w

    # residual target lives in a VMEM scratch ref so chunked passes can
    # read dynamic slices (Mosaic has no dynamic_slice on values)
    resid_ref[:, :] = yt_ref[:, :] - (sum_o[:, :] - tp_i[0])
    resid_C = resid_ref[:, :]
    root_r_C = jnp.sum(resid_C, axis=1, keepdims=True)          # (C, 1)
    root_q_C = jnp.sum(resid_C * resid_C, axis=1, keepdims=True)

    # split-variable CDF (p <= 512)
    av = jnp.maximum(av_o[:, :], 1e-12)
    cdf_C = mm(av, lt_p)
    cdf_e = mm(E, cdf_C)                               # (CP, p)
    total_col = jnp.sum(
        cdf_e * (iota_p_row == p - 1).astype(jnp.float32),
        axis=1, keepdims=True)

    leaf_sd_C = scal_o[:, 0:1]
    leaf_sd_cp = mm(E, leaf_sd_C)

    # frozen reference tree, expanded to particle rows (all-continuous,
    # NaN-free: no split_set / NaN machinery)
    t_sv_C = jnp.concatenate(
        [sv_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)
    t_sl_C = jnp.concatenate(
        [sl_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)
    t_lf_C = jnp.concatenate(
        [lf_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)
    t_ct_C = jnp.concatenate(
        [ct_fo[pl.ds(row_c[c], 1), :] for c in range(C)], axis=0)
    sv_exp = mm(E, (t_sv_C + 1).astype(jnp.float32)).astype(jnp.int32) - 1
    sv_v = frozen_i * sv_exp + (1 - frozen_i) * (-1)   # (CP, S)
    sl_v = frozen_f * mm(E, t_sl_C)
    root_col = (iota_S_row == 0).astype(jnp.float32)
    root_cp = mm(E, root_r_C) / nf / m
    lf_exp = mm(E, t_lf_C)
    lf_v = frozen_f * lf_exp + nonfroz_f * (root_cp * root_col)
    ct_exp = mm(E, t_ct_C)
    ct_v = frozen_f * ct_exp + nonfroz_f * (nf * root_col)
    # per-node sufficient statistics (N from ct_v; R/Q tracked here) and
    # the current-leaf partition mask
    rs_v = mm(E, root_r_C) * root_col                  # (CP, S) sum r
    rq_v = mm(E, root_q_C) * root_col                  # (CP, S) sum r^2
    lm_v = jnp.broadcast_to(root_col, (CP, S)) * 1.0   # leaf mask

    eyeCP = (rPP == cPP).astype(jnp.float32)

    def col_to_lanes(col):
        """(CP, 1) f32 column -> (CP,) lane row via a diag matmul."""
        return jax.lax.dot_general(
            jnp.ones((1, CP), jnp.float32), col * eyeCP,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]

    def stats_ll(lfx, ctx, rsx, rqx, lmx):
        """(CP,) exact Gaussian ll lanes from per-node stats."""
        q = lmx * (rqx - 2.0 * lfx * rsx + lfx * lfx * ctx)
        return col_to_lanes(-0.5 * w_cp * jnp.sum(q, axis=1, keepdims=True))

    # per-tree node-level randoms
    ug_t = ug_ref[0]
    uv_t = uv_ref[0]
    eps_t = eps_ref[0]
    iota_BN_row = jax.lax.broadcasted_iota(jnp.int32, (CP, BN), 1)

    if rowll:
        # per-particle initial prediction: frozen -> stored root leaf
        # (depth-0 truncation), fresh -> root residual mean / m
        froot = jnp.sum(lf_exp * root_col, axis=1, keepdims=True)
        pred0 = frozen_f * froot + nonfroz_f * root_cp      # (CP, 1)

    def ll_rows_chunk(nb, pred_c):
        """(CP, 1) exact row log-likelihood of chunk ``nb`` given the
        chunk's per-particle predictions (the megakernel's ``ll_cols``
        closed forms, chunked; padding rows contribute 0)."""
        sl_nb = pl.ds(nb * BN, BN)
        y_nb = yt_ref[:, sl_nb]                          # (1, BN) shared
        noi_c = y_nb - resid_ref[:, sl_nb]               # (C, BN)
        F = mm(E, noi_c) + pred_c                        # (CP, BN)
        if lik == "bernoulli":
            spv = jnp.maximum(F, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(F)))
            llr = y_nb * F - spv
        elif lik == "het_abs":
            w_e = mm(E, llw_ref[:, sl_nb])
            sg = jnp.abs(F) + lik_const
            llr = -0.5 * w_e / (sg * sg) - jnp.log(sg)
        elif lik == "het_exp":
            w_e = mm(E, llw_ref[:, sl_nb])
            llr = -0.5 * w_e * jnp.exp(-2.0 * F) - F
        else:  # cat_logit: llw = logsumexp of the other class outputs
            w_e = mm(E, llw_ref[:, sl_nb])
            lse = jnp.maximum(F, w_e) + jnp.log1p(
                jnp.exp(-jnp.abs(F - w_e)))
            llr = (y_nb > 0).astype(jnp.float32) * F - lse
        col = iota_BN_row + nb * BN
        llr = jnp.where(col < n, llr, 0.0)
        return jnp.sum(llr, axis=1, keepdims=True)       # (CP, 1)

    def gumbel_chunk(d, nb):
        if gen_gumbel:
            pltpu.prng_seed(
                seed_ref[0, 0] ^ ((bi * 8 + d) * 131071 + nb * 2654435),
                seed_ref[0, 1] + bi * 1024 + d * 128 + nb)
            bits = pltpu.prng_random_bits((CP, BN))
            u = (jax.lax.shift_right_logical(
                jax.lax.bitcast_convert_type(bits, jnp.int32), 8
            ).astype(jnp.float32) + 0.5) * jnp.float32(2.0 ** -24)
            return -jnp.log(-jnp.log(u))
        return rg_ref[0, d * CP:(d + 1) * CP, pl.ds(nb * BN, BN)]

    # route-heal state from the previous level (level -1: nothing)
    prev = {"act": None, "lo": 0, "G": 0}

    # initialize li (0 for real rows, S for padding); in row-ll mode also
    # the prediction buffer and the initial row log-likelihood
    def init_body(nb, acc):
        col = iota_BN_row + nb * BN
        li_ref[:, pl.ds(nb * BN, BN)] = jnp.where(col < n, 0, S)
        if rowll:
            pc = pred0 + jnp.zeros((CP, BN), jnp.float32)
            pred_ref[:, pl.ds(nb * BN, BN)] = pc
            acc = acc + ll_rows_chunk(nb, pc)
        return acc

    acc0 = jax.lax.fori_loop(0, NB, init_body,
                             jnp.zeros((CP, 1), jnp.float32), unroll=False)
    ll = (col_to_lanes(acc0) if rowll
          else stats_ll(lf_v, ct_v, rs_v, rq_v, lm_v))
    log_w = ll
    ll_prev = ll
    take = idxCP

    for d in range(D):
        lo, hi = 2 ** d - 1, 2 ** (d + 1) - 1
        G = hi - lo
        p_grow = float(alpha * (1.0 + d) ** (-beta))
        iota_G_row = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)

        sv_lvl = sv_v[:, lo:hi]
        ct_lvl = ct_v[:, lo:hi]
        want_lvl_f = ((ug_t[:, lo:hi] < p_grow).astype(jnp.float32)
                      * (sv_lvl < 0).astype(jnp.float32)
                      * (ct_lvl >= 2.0).astype(jnp.float32)
                      * nonfroz_f)
        # node activity predicate (per node, over all particles):
        # a node's chunk work can be skipped when NO particle grows or
        # replays there — at depth >= 3 most slots are dead
        frozen_act = frozen_f * (sv_lvl >= 0).astype(jnp.float32)
        node_busy = jnp.sum(want_lvl_f + frozen_act, axis=0)       # (G,)

        # per-node split variable (CDF compare-count) and effective var
        u_node_all = uv_t[:, lo:hi] * total_col                    # (CP, G)
        var_draws = []
        for g in range(G):
            u_g = jnp.sum(u_node_all * (iota_G_row == g), axis=1,
                          keepdims=True)
            cnt_g = jnp.sum((cdf_e < u_g).astype(jnp.int32), axis=1,
                            keepdims=True)
            var_draws.append(jnp.clip(cnt_g, 0, p - 1))
        sv_node_g = [jnp.sum((sv_lvl + 1) * (iota_G_row == g).astype(
            jnp.int32), axis=1, keepdims=True) - 1 for g in range(G)]
        var_eff_g = [frozen_i * jnp.clip(sv_node_g[g], 0, p - 1)
                     + (1 - frozen_i) * var_draws[g] for g in range(G)]
        onehot_var_g = [(iota_p_row == var_eff_g[g]).astype(jnp.float32)
                        for g in range(G)]

        # take matmul for the pending resample (identity when none)
        A = (cPP == take[:, None]).astype(jnp.float32)

        # ---- Pass 1: heal previous routing + per-node Gumbel winner ----
        pG, plo_, pact = prev["G"], prev["lo"], prev["act"]
        phi = 2 ** (d) - 1  # hi of previous level == lo of this one

        def p1_body(nb, carry):
            run_mx, run_val = carry
            sl_nb = pl.ds(nb * BN, BN)
            li_c = li_ref[:, sl_nb]
            if (not rowll) and pact is not None:
                # heal: revert children of reverted parents (row-ll mode
                # heals eagerly in its own pass 3 instead)
                in_ch = (li_c >= phi) & (li_c < phi + 2 * pG)
                par = (li_c - 1) >> 1
                actf = jnp.zeros((CP, BN), jnp.float32)
                for g in range(pG):
                    actf = actf + (par == plo_ + g).astype(jnp.float32) \
                        * pact[:, g:g + 1]
                li_c = jnp.where(in_ch & (actf < 0.5), par, li_c)
            # relabel particles for the pending resample
            li_c = mm(A, li_c.astype(jnp.float32)).astype(jnp.int32)
            li_ref[:, sl_nb] = li_c
            if rowll:
                pred_ref[:, sl_nb] = mm(A, pred_ref[:, sl_nb])
            rg_c = gumbel_chunk(d, nb)
            x_nb = xt_ref[:, sl_nb]                     # (p, BN)
            for g in range(G):
                node = lo + g

                def _upd(args):
                    run_mx, run_val = args
                    m_f = (li_c == node)
                    sc = jnp.where(m_f, rg_c, NEG)
                    mxc = jnp.max(sc, axis=1, keepdims=True)   # (CP, 1)
                    win = (sc == mxc) & m_f
                    # ties: MIN row index attaining the chunk max (the
                    # strict > below keeps the earliest chunk on cross-
                    # chunk ties, so the combined rule is the global
                    # min-index winner — round-4 ADVICE low #3)
                    ridx = jnp.min(jnp.where(win, iota_BN_row, BN),
                                   axis=1, keepdims=True)
                    wsel = ((iota_BN_row == ridx) & win
                            ).astype(jnp.float32)
                    xcol = mm(onehot_var_g[g], x_nb)           # (CP, BN)
                    val_c = jnp.sum(wsel * xcol, axis=1, keepdims=True)
                    gmask = (iota_G_row == g).astype(jnp.float32)
                    old_mx = jnp.sum(run_mx * gmask, axis=1, keepdims=True)
                    better = (mxc > old_mx).astype(jnp.float32)
                    new_mx = better * mxc + (1.0 - better) * old_mx
                    old_val = jnp.sum(run_val * gmask, axis=1,
                                      keepdims=True)
                    new_val = better * val_c + (1.0 - better) * old_val
                    run_mx = run_mx * (1.0 - gmask) + new_mx * gmask
                    run_val = run_val * (1.0 - gmask) + new_val * gmask
                    return (run_mx, run_val)

                run_mx, run_val = jax.lax.cond(
                    node_busy[g] > 0.5, _upd, lambda a: a,
                    (run_mx, run_val))
            return (run_mx, run_val)

        run_mx0 = jnp.full((CP, G), NEG, jnp.float32)
        run_val0 = jnp.zeros((CP, G), jnp.float32)
        run_mx, run_val = jax.lax.fori_loop(
            0, NB, p1_body, (run_mx0, run_val0), unroll=False)

        # effective split values: frozen -> stored, grown -> winner
        valx = frozen_f * sl_v[:, lo:hi] + nonfroz_f * run_val  # (CP, G)
        act_any = jnp.where(frozen_c, (sv_lvl >= 0).astype(jnp.float32),
                            want_lvl_f)                          # (CP, G)

        # ---- Pass 2: left-child stats + tentative routing ----
        def p2_body(nb, carry):
            a_cl, a_rl, a_ql = carry
            sl_nb = pl.ds(nb * BN, BN)
            li_c = li_ref[:, sl_nb]
            x_nb = xt_ref[:, sl_nb]
            r_c = mm(E, resid_ref[:, sl_nb])                    # (CP, BN)
            li_new = li_c
            for g in range(G):
                node = lo + g

                def _upd(args):
                    a_cl, a_rl, a_ql, li_new = args
                    m_b = (li_c == node)
                    m_f = m_b.astype(jnp.float32)
                    xcol = mm(onehot_var_g[g], x_nb)
                    v_g = jnp.sum(valx * (iota_G_row == g), axis=1,
                                  keepdims=True)
                    left_f = (xcol <= v_g).astype(jnp.float32)
                    lm = m_f * left_f
                    gmask = (iota_G_row == g).astype(jnp.float32)
                    a_cl = a_cl + gmask * jnp.sum(lm, axis=1, keepdims=True)
                    a_rl = a_rl + gmask * jnp.sum(lm * r_c, axis=1,
                                                  keepdims=True)
                    a_ql = a_ql + gmask * jnp.sum(lm * r_c * r_c, axis=1,
                                                  keepdims=True)
                    act_g = jnp.sum(act_any * gmask, axis=1, keepdims=True)
                    dm = m_f * act_g
                    child = (2 * node + 1) + (1 - left_f.astype(jnp.int32))
                    dm_i = dm.astype(jnp.int32)
                    li_new = dm_i * child + (1 - dm_i) * li_new
                    return (a_cl, a_rl, a_ql, li_new)

                a_cl, a_rl, a_ql, li_new = jax.lax.cond(
                    node_busy[g] > 0.5, _upd, lambda a: a,
                    (a_cl, a_rl, a_ql, li_new))
            li_ref[:, sl_nb] = li_new
            return (a_cl, a_rl, a_ql)

        z = jnp.zeros((CP, G), jnp.float32)
        cl, rl, ql = jax.lax.fori_loop(
            0, NB, p2_body, (z, z, z), unroll=False)

        # ---- node-level commit ----
        cnt_lvl_tot = ct_v[:, lo:hi]
        rs_lvl = rs_v[:, lo:hi]
        rq_lvl = rq_v[:, lo:hi]
        cr = cnt_lvl_tot - cl
        rr = rs_lvl - rl
        qr = rq_lvl - ql
        valid_f = ((cl > 0.5) & (cr > 0.5)).astype(jnp.float32)
        grow_ok = want_lvl_f * valid_f                           # (CP, G)
        act_fin = frozen_f * (sv_lvl >= 0).astype(jnp.float32) \
            + nonfroz_f * grow_ok                               # (CP, G)

        # children leaf values ~ N(child residual mean / m, leaf_sd)
        eps_lvl = eps_t[:, 2 * lo:2 * lo + 2 * G]               # (CP, 2G)
        iota_2G = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * G), 1)
        # interleave left/right stats into child-slot order
        def interleave(a_l, a_r):
            out = jnp.zeros((CP, 2 * G), jnp.float32)
            for g in range(G):
                out = out + a_l[:, g:g + 1] * (iota_2G == 2 * g) \
                    + a_r[:, g:g + 1] * (iota_2G == 2 * g + 1)
            return out

        c_ch = interleave(cl, cr)
        r_ch = interleave(rl, rr)
        q_ch = interleave(ql, qr)
        mu_ch = r_ch / jnp.maximum(c_ch, 1.0) / m \
            + eps_lvl * leaf_sd_cp                              # (CP, 2G)
        grow_rep = interleave(grow_ok, grow_ok)
        act_rep = interleave(act_fin, act_fin)

        # commit into (CP, S) node state via column blends
        var_eff_lvl = jnp.concatenate(var_eff_g, axis=1)        # (CP, G)
        for g in range(G):
            node = lo + g

            def _commit(args):
                sv_v, sl_v = args
                ncol = (iota_S_row == node).astype(jnp.float32)
                gok = jnp.sum(grow_ok * (iota_G_row == g), axis=1,
                              keepdims=True)
                mkn = ncol * gok
                mkn_i = mkn.astype(jnp.int32)
                v_eff = var_eff_lvl[:, g:g + 1]
                v_val = run_val[:, g:g + 1]
                sv_v = mkn_i * v_eff + (1 - mkn_i) * sv_v
                sl_v = mkn * v_val + (1.0 - mkn) * sl_v
                return (sv_v, sl_v)

            sv_v, sl_v = jax.lax.cond(
                node_busy[g] > 0.5, _commit, lambda a: a, (sv_v, sl_v))

        # children: counts/leaves/stats/partition (column blends over 2G)
        for j in range(2 * G):
            slot = hi + j

            def _child(args):
                lf_v, ct_v, rs_v, rq_v, lm_v = args
                ccol = (iota_S_row == slot).astype(jnp.float32)
                gokj = grow_rep[:, j:j + 1]
                actj = act_rep[:, j:j + 1]
                # committed counts/leaves: grown (non-frozen) children
                # only — the frozen particle's stored children are already
                # present from the init expansion.  Sufficient statistics
                # and the partition update cover BOTH grown and replayed
                # children (act includes the frozen replay).
                mk = ccol * gokj
                lf_v = mk * mu_ch[:, j:j + 1] + (1.0 - mk) * lf_v
                ct_v = mk * c_ch[:, j:j + 1] + (1.0 - mk) * ct_v
                mka = ccol * actj
                rs_v = mka * r_ch[:, j:j + 1] + (1.0 - mka) * rs_v
                rq_v = mka * q_ch[:, j:j + 1] + (1.0 - mka) * rq_v
                lm_v = jnp.maximum(lm_v, mka)
                return (lf_v, ct_v, rs_v, rq_v, lm_v)

            lf_v, ct_v, rs_v, rq_v, lm_v = jax.lax.cond(
                node_busy[j // 2] > 0.5, _child, lambda a: a,
                (lf_v, ct_v, rs_v, rq_v, lm_v))
        # routed parents leave the partition
        for g in range(G):
            node = lo + g

            def _par(lm_v):
                ncol = (iota_S_row == node).astype(jnp.float32)
                actg = jnp.sum(act_fin * (iota_G_row == g), axis=1,
                               keepdims=True)
                return lm_v * (1.0 - ncol * actg)

            lm_v = jax.lax.cond(node_busy[g] > 0.5, _par,
                                lambda a: a, lm_v)

        if rowll:
            # ---- Pass 3 (row-ll only): heal this level's routing with
            # the final activation flags, update per-row predictions to
            # the committed child leaf values, and accumulate the exact
            # row log-likelihood (the gauss path needs none of this —
            # its ll is node-stats algebra and healing is lazy) ----
            lf_ch_l, lf_ch_r, act_ok = [], [], []
            for g in range(G):
                l_slot = 2 * (lo + g) + 1
                lcolf = (iota_S_row == l_slot).astype(jnp.float32)
                rcolf = (iota_S_row == l_slot + 1).astype(jnp.float32)
                lf_ch_l.append(jnp.sum(lf_v * lcolf, axis=1,
                                       keepdims=True))
                lf_ch_r.append(jnp.sum(lf_v * rcolf, axis=1,
                                       keepdims=True))
                act_ok.append(jnp.sum(
                    act_fin * (iota_G_row == g), axis=1, keepdims=True))

            def p3_body(nb, acc):
                sl_nb = pl.ds(nb * BN, BN)
                li_c = li_ref[:, sl_nb]
                pred_c = pred_ref[:, sl_nb]
                for g in range(G):
                    node = lo + g

                    def _upd(args):
                        li_c, pred_c = args
                        l_slot = 2 * node + 1
                        in_l = (li_c == l_slot).astype(jnp.float32)
                        in_r = (li_c == l_slot + 1).astype(jnp.float32)
                        a_ok = (act_ok[g] > 0.5).astype(jnp.float32)
                        rev = (in_l + in_r) * (1.0 - a_ok)
                        rev_i = rev.astype(jnp.int32)
                        li_c = rev_i * node + (1 - rev_i) * li_c
                        sel_l = in_l * a_ok
                        sel_r = in_r * a_ok
                        pred_c = (sel_l * lf_ch_l[g]
                                  + sel_r * lf_ch_r[g]
                                  + (1.0 - sel_l - sel_r) * pred_c)
                        return (li_c, pred_c)

                    li_c, pred_c = jax.lax.cond(
                        node_busy[g] > 0.5, _upd, lambda a: a,
                        (li_c, pred_c))
                li_ref[:, sl_nb] = li_c
                pred_ref[:, sl_nb] = pred_c
                return acc + ll_rows_chunk(nb, pred_c)

            acc_d = jax.lax.fori_loop(
                0, NB, p3_body, jnp.zeros((CP, 1), jnp.float32),
                unroll=False)
            ll = col_to_lanes(acc_d)
        else:
            ll = stats_ll(lf_v, ct_v, rs_v, rq_v, lm_v)
        lw1 = log_w + ll - ll_prev
        prev = {"act": act_fin, "lo": lo, "G": G}

        if d < D - 1:
            # per-chain ESS-gated systematic resampling (as draw_pallas)
            u_row = jnp.zeros((1, C), jnp.float32)
            for c in range(C):
                u_row = u_row + u_res_ref[c, bi * D + d] \
                    * (iota_C_row == c).astype(jnp.float32)
            u_cp = mm(u_row, Ect)[0]
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
            # remap node state so it matches the relabeled rows (li is
            # remapped lazily at the next Pass 1)
            selT = (cPP == take[:, None]).astype(jnp.float32)
            sv_v = mm(selT, (sv_v + 1).astype(jnp.float32)
                      ).astype(jnp.int32) - 1
            sl_v = mm(selT, sl_v)
            lf_v = mm(selT, lf_v)
            ct_v = mm(selT, ct_v)
            rs_v = mm(selT, rs_v)
            rq_v = mm(selT, rq_v)
            lm_v = mm(selT, lm_v)
            pa = prev["act"]
            prev = {"act": mm(selT, pa), "lo": lo, "G": G}
        else:
            log_w = lw1

    # ---- winner selection + stats-based Metropolis refinement ----
    iota_Sp = jax.lax.broadcasted_iota(jnp.int32, (S, p), 1)
    wsel_rows = []
    scal_rows = []
    lfw_rows = []
    for c in range(C):
        cm_lane = (ci_lane == c)
        mxw = jnp.max(jnp.where(cm_lane, log_w, NEG))
        e = jnp.where(cm_lane, jnp.exp(log_w - mxw), 0.0)
        cdfPc = mm(e[None, :], lt_CP)[0]
        total = jnp.sum(e)
        u = u_sel_ref[c, bi] * total
        widx = jnp.clip(jnp.sum(((cdfPc < u) & cm_lane).astype(jnp.int32)),
                        0, P - 1) + c * P
        wsel = (idxCP == widx).astype(jnp.float32)[None, :]     # (1, CP)
        wsel_rows.append(wsel)

        sv_w = mm(wsel, (sv_v + 1).astype(jnp.float32)) - 1.0   # (1, S)
        sl_w = mm(wsel, sl_v)
        lf_w = mm(wsel, lf_v)
        ct_w = mm(wsel, ct_v)
        rs_w = mm(wsel, rs_v)
        rq_w = mm(wsel, rq_v)
        lm_w = mm(wsel, lm_v)                                   # (1, S)

        ls_c = jnp.sum(leaf_sd_C * (jax.lax.broadcasted_iota(
            jnp.int32, (C, 1), 0) == c))
        w_c = w_ref[c, 0]
        leaf_mask = ((sv_w < -0.5) & (ct_w > 0)).astype(jnp.float32)
        prior_center = rs_w / jnp.maximum(ct_w, 1.0) / m
        hiv = 0.5 / (ls_c * ls_c)

        def ll_leaves(lf_x):
            q = lm_w * (rq_w - 2.0 * lf_x * rs_w + lf_x * lf_x * ct_w)
            return -0.5 * w_c * jnp.sum(q)

        def lp_of(lf_x):
            dev = lf_x - prior_center
            return -hiv * jnp.sum(leaf_mask * dev * dev)

        if not rowll:
            # stats-based Metropolis refinement (gauss only; the row-ll
            # gate requires num_refinements == 0)
            ll_c = ll_leaves(lf_w) + lp_of(lf_w)
            eps_scale = 0.3 * ls_c
            for r_i in range(R):
                eps_row = epsr_ref[0, pl.ds(r_i * C + c, 1), :]
                lf_p = lf_w + eps_row * eps_scale * leaf_mask
                ll_p = ll_leaves(lf_p) + lp_of(lf_p)
                acc = jnp.log(u_acc_ref[c, bi * R + r_i]) < (ll_p - ll_c)
                accf = acc.astype(jnp.float32)
                lf_w = accf * lf_p + (1.0 - accf) * lf_w
                ll_c = jnp.where(acc, ll_p, ll_c)
        lfw_rows.append(lf_w)

        # commit winner into the chain's forest
        sv_w_i = sv_w.astype(jnp.int32)
        sv_fo[pl.ds(row_c[c], 1), :] = sv_w_i
        sl_fo[pl.ds(row_c[c], 1), :] = sl_w
        lf_fo[pl.ds(row_c[c], 1), :] = lf_w
        ct_fo[pl.ds(row_c[c], 1), :] = ct_w

        # adaptation (node-level)
        wf_count = jnp.sum(scal_o[c:c + 1, :]
                           * (iota_4_row == 1).astype(jnp.float32))
        iteration = jnp.sum(scal_o[c:c + 1, :]
                            * (iota_4_row == 2).astype(jnp.float32)) + 1.0
        if tuning:
            sv_colv = jnp.zeros((S, 1), jnp.float32)
            eyeS = (jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                    ).astype(jnp.float32)
            sv_colv = jax.lax.dot_general(
                eyeS * sv_w, jnp.ones((S, 1), jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            used = (sv_colv.astype(jnp.int32) == iota_Sp).astype(jnp.float32)
            tcounts = mm(jnp.ones((1, S), jnp.float32), used)
            av_o[c:c + 1, :] = av_o[c:c + 1, :] * spd + tcounts
            wf_count = wf_count + 1.0
        scal_rows.append((wf_count, iteration, ls_c))

    # ---- final row pass: winner routing heal + prediction commit ----
    pa, plo_, pG = prev["act"], prev["lo"], prev["G"]
    phi = 2 ** D - 1
    wsel_C = jnp.concatenate(wsel_rows, axis=0)                 # (C, CP)
    lfw_C = jnp.concatenate(lfw_rows, axis=0)                   # (C, S)
    # winner per-chain heal flags for the last level
    act_w = mm(wsel_C, pa)                                      # (C, pG)
    sd_acc = jnp.zeros((C, 1), jnp.float32)

    def pf_body(nb, sd_acc):
        sl_nb = pl.ds(nb * BN, BN)
        if rowll:
            # row-ll mode: routing was healed and predictions committed
            # by each level's pass 3 and there is no refinement, so the
            # winner's prediction is a direct row extraction.  Padding
            # rows must commit 0 (the next tree's root sums reduce over
            # the whole padded buffer).
            pred = mm(wsel_C, pred_ref[:, sl_nb])
            colp = iota_BN_row[:C, :] + nb * BN
            pred = jnp.where(colp < n, pred, 0.0)
        else:
            li_c = li_ref[:, sl_nb]
            li_w = mm(wsel_C, li_c.astype(jnp.float32)).astype(jnp.int32)
            in_ch = (li_w >= phi) & (li_w < S)
            par = (li_w - 1) >> 1
            actf = jnp.zeros((C, BN), jnp.float32)
            for g in range(pG):
                actf = actf + (par == plo_ + g).astype(jnp.float32) \
                    * act_w[:, g:g + 1]
            li_w = jnp.where(in_ch & (actf < 0.5), par, li_w)
            # prediction = leaf value at the (refined) winner leaf
            pred = jnp.zeros((C, BN), jnp.float32)
            for s in range(S):
                pred = pred + (li_w == s).astype(jnp.float32) \
                    * lfw_C[:, s:s + 1]
        tp_old = tp_i[0, :, sl_nb]
        sum_c = sum_o[:, sl_nb]
        sum_o[:, sl_nb] = sum_c - tp_old + pred
        tp_o[0, :, sl_nb] = pred
        if tuning:
            wfc_col = jnp.concatenate(
                [jnp.full((1, 1), scal_rows[c][0], jnp.float32)
                 for c in range(C)], axis=0)
            wfm_c = wfm_o[:, sl_nb]
            delta = pred - wfm_c
            wfm_new = wfm_c + delta / wfc_col
            wfm2_new = wfm2_o[:, sl_nb] + delta * (pred - wfm_new)
            wfm_o[:, sl_nb] = wfm_new
            wfm2_o[:, sl_nb] = wfm2_new
            col = iota_BN_row[:C, :] + nb * BN
            sd_chunk = jnp.where(
                col < n,
                jnp.sqrt(jnp.maximum(
                    wfm2_new / jnp.maximum(wfc_col, 1.0), 1e-12)),
                0.0)
            sd_acc = sd_acc + jnp.sum(sd_chunk, axis=1, keepdims=True)
        return sd_acc

    sd_acc = jax.lax.fori_loop(0, NB, pf_body, sd_acc, unroll=False)

    for c in range(C):
        wf_count, iteration, ls_c = scal_rows[c]
        new_ls = ls_c
        if tuning:
            sd = jnp.sum(sd_acc * (jax.lax.broadcasted_iota(
                jnp.int32, (C, 1), 0) == c)) / nf
            new_ls = jnp.where(iteration > m, jnp.maximum(sd, 1e-6), ls_c)
        scal_o[c:c + 1, :] = jnp.where(
            iota_4_row == 0, new_ls,
            jnp.where(iota_4_row == 1, wf_count,
                      jnp.where(iota_4_row == 2, iteration, 0.0)))


# ---------------------------------------------------------------------------
# Support gate + host wrapper
# ---------------------------------------------------------------------------


def _vmem_fits(C: int, P: int, n: int, p: int,
               rowll: bool = False) -> bool:
    """Rough VMEM budget for C chains in one big-n kernel instance: the
    (C*P, n) li scratch + (p, n) X + ~9 (C, n) row buffers + slack; the
    row-ll regime adds a second (C*P, n) prediction scratch."""
    CP = C * P
    extra = CP * n * 4 if rowll else 0
    return (CP * n * 4 + extra + p * n * 4 + 9 * C * n * 4
            + 2_000_000) <= 13_000_000


_ROWLL_LIKS = ("bernoulli", "het_abs", "het_exp", "cat_logit")


def bign_supported_reason(cfg: BartConfig, pg: PgbartConfig, X, lik: str,
                          w_scalar: bool, all_cont: bool, x_nan: bool,
                          C_hint: int = 1):
    """None when the big-n kernel covers this configuration, else why not.

    The kernel is only engaged where the ordinary megakernel gates OUT
    (large n); the caller checks that separately.
    """
    if lik != "gauss" and lik not in _ROWLL_LIKS:
        return ("big-n kernel covers the gauss/bernoulli/het/cat_logit "
                f"likelihood codes (lik={lik!r})")
    if lik == "gauss" and not w_scalar:
        return ("big-n kernel needs a scalar per-chain noise precision "
                "(sigma must be a scalar random variable)")
    if lik in _ROWLL_LIKS and pg.num_refinements != 0:
        return ("big-n kernel covers non-Gaussian likelihoods only with "
                "num_refinements=0 (leaf refinement does not collapse to "
                "node statistics at large n; pair with ancestor_sampling "
                "for value mixing)")
    if cfg.response != "constant":
        return f"response={cfg.response!r} (big-n kernel covers 'constant')"
    if cfg.n_outputs != 1:
        return f"n_outputs={cfg.n_outputs} (big-n kernel covers 1)"
    if not all_cont:
        return "big-n kernel covers all-continuous split rules"
    if x_nan:
        return "big-n kernel covers NaN-free X"
    n, p = X.shape
    if p > 512:
        return f"p={p} (big-n kernel covers p <= 512)"
    # even a single chain must fit VMEM (the chains wrapper splits
    # larger chain counts into sequential single-chain kernel calls)
    if not _vmem_fits(C_hint, pg.num_particles, n, p,
                      rowll=lik in _ROWLL_LIKS):
        CP = C_hint * pg.num_particles
        return (f"row state (C*P={CP} x n={n} assignment + X) exceeds the "
                "VMEM budget")
    return None


def _pad_to(a, npad, axis, fill=0.0):
    pad = npad - a.shape[axis]
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths, constant_values=fill)


def _bign_chains_impl(keys, state, X, Y_target, cfg: BartConfig,
                      pg: PgbartConfig, w_chain, tuning: bool,
                      rng_mode: str, lik: str = "gauss",
                      lik_const: float = 0.0, llw=None):
    """Run one PGBART step for C chains in ONE big-n kernel instance.

    ``lik``/``lik_const``: likelihood code (see the kernel docstring);
    ``llw``: (C, n) per-row likelihood data for the het/cat codes
    ((y - mu0)^2 or the other-outputs logsumexp), None otherwise."""
    from ..sampler.pgbart import PgbartState
    from ..ops.trees import Forest
    from ..ops.draw_pallas import _rands_batched, _rands_reference

    C, m, S = state.forest.split_var.shape
    n, p = X.shape
    P = pg.num_particles
    D = cfg.max_depth
    B = pg.batch_size(m, tuning)
    Gtot = 2 ** D - 1
    R = max(pg.num_refinements, 1)
    CP = C * P

    BN = 8192 if n > 16384 else 2048
    NB = max(2, -(-n // BN))
    NPAD = NB * BN

    gen_gumbel = jax.default_backend() != "cpu"
    rands_fn = (_rands_reference if rng_mode == "reference"
                else _rands_batched)
    n_rg = 1 if gen_gumbel else n
    ug, uv, rg, eps, _sb, ures, usel, epsr, uacc = jax.vmap(
        lambda k_: rands_fn(k_, B, P, D, n_rg, Gtot, R, S,
                            pg.num_refinements))(keys)
    if not gen_gumbel:
        # pre-drawn Gumbels cover the REAL rows; padding rows never
        # enter a node mask, so their Gumbel values are irrelevant
        rg = _pad_to(rg, NPAD, axis=4, fill=0.0)
    ug = ug.transpose(1, 0, 2, 3).reshape(B, CP, Gtot)
    uv = uv.transpose(1, 0, 2, 3).reshape(B, CP, Gtot)
    eps = eps.transpose(1, 0, 2, 3, 4).reshape(B, CP, 2 * Gtot)
    rg = (jnp.zeros((B, 1, 1), jnp.float32) if gen_gumbel
          else rg.transpose(1, 2, 0, 3, 4).reshape(B, D * CP, NPAD))
    ures = ures.reshape(C, B * D)
    usel = usel.reshape(C, B)
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
                      jnp.zeros((C,), jnp.float32)], axis=1)
    jt_all = ((state.batch_offset[0]
               + jnp.arange(B, dtype=jnp.int32)) % m)           # (B,)

    tp_mcn = _pad_to(state.tree_pred.reshape(C, m, n).transpose(1, 0, 2),
                     NPAD, axis=2)                              # (m, C, NPAD)
    sum_pad = _pad_to(state.sum_trees.reshape(C, n), NPAD, axis=1)
    yt_pad = _pad_to(Y_target.reshape(1, n), NPAD, axis=1)
    xt_pad = _pad_to(X.T, NPAD, axis=1)
    wfm_pad = _pad_to(state.wf_mean.reshape(C, n), NPAD, axis=1)
    wfm2_pad = _pad_to(state.wf_m2.reshape(C, n), NPAD, axis=1)
    w_chain = w_chain.reshape(C, 1)

    out_shape = [
        jax.ShapeDtypeStruct((C * m, S), jnp.int32),    # sv
        jax.ShapeDtypeStruct((C * m, S), jnp.float32),  # sl
        jax.ShapeDtypeStruct((C * m, S), jnp.float32),  # lf
        jax.ShapeDtypeStruct((C * m, S), jnp.float32),  # ct
        jax.ShapeDtypeStruct((B, C, NPAD), jnp.float32),  # tp_new
        jax.ShapeDtypeStruct((C, NPAD), jnp.float32),   # sum
        jax.ShapeDtypeStruct((C, p), jnp.float32),      # av
        jax.ShapeDtypeStruct((C, NPAD), jnp.float32),   # wfm
        jax.ShapeDtypeStruct((C, NPAD), jnp.float32),   # wfm2
        jax.ShapeDtypeStruct((C, 4), jnp.float32),      # scal
    ]
    rowll = lik in _ROWLL_LIKS
    llw_pad = (_pad_to(llw.reshape(C, n), NPAD, axis=1)
               if llw is not None else jnp.zeros((C, NPAD), jnp.float32))
    kernel = functools.partial(
        _bign_kernel, C=C, B=B, P=P, D=D, S=S, n=n, NPAD=NPAD, BN=BN,
        p=p, m=m, R=R, alpha=float(cfg.alpha), beta=float(cfg.beta),
        tuning=tuning, gen_gumbel=gen_gumbel,
        spd=float(pg.split_prior_decay), lik=lik,
        lik_const=float(lik_const),
    )

    def full(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda b, jt, _z=zeros: _z,
                            memory_space=pltpu.VMEM)

    def per_tree(shape):
        rest = (0,) * (len(shape) - 1)
        return pl.BlockSpec((1,) + shape[1:],
                            lambda b, jt, _r=rest: (b,) + _r,
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tp_spec = pl.BlockSpec((1, C, NPAD), lambda b, jt: (jt[b], 0, 0),
                           memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            smem, smem, smem, smem, smem,
            full((C, 4)), full((C * m, S)), full((C * m, S)),
            full((C * m, S)), full((C * m, S)),
            tp_spec, full((C, NPAD)), full((1, NPAD)), full((p, NPAD)),
            full((C, p)), full((C, NPAD)), full((C, NPAD)),
            full((C, NPAD)),
            per_tree(ug.shape), per_tree(uv.shape), per_tree(eps.shape),
            per_tree(epsr.shape), per_tree(rg.shape),
        ],
        out_specs=[
            full((C * m, S)), full((C * m, S)), full((C * m, S)),
            full((C * m, S)),
            pl.BlockSpec((1, C, NPAD), lambda b, jt: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            full((C, NPAD)), full((C, p)), full((C, NPAD)),
            full((C, NPAD)), full((C, 4)),
        ],
        scratch_shapes=(
            [pltpu.VMEM((CP, NPAD), jnp.int32),
             pltpu.VMEM((C, NPAD), jnp.float32)]
            + ([pltpu.VMEM((CP, NPAD), jnp.float32)] if rowll else [])),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=(jax.default_backend() == "cpu"),
    )(
        jt_all,
        ures, usel, uacc, seed, w_chain,
        scal,
        f.split_var.reshape(C * m, S), f.split_val.reshape(C * m, S),
        f.leaf.reshape(C * m, S), f.count.reshape(C * m, S),
        tp_mcn, sum_pad, yt_pad, xt_pad,
        state.alpha_vec.reshape(C, p),
        wfm_pad, wfm2_pad, llw_pad,
        ug, uv, eps, epsr, rg,
    )
    (sv_o, sl_o, lf_o, ct_o, tp_new, sum_o, av_o, wfm_o, wfm2_o,
     scal_o) = out

    # scatter the B updated trees' predictions back into the (m,) cache
    tp = state.tree_pred.reshape(C, m, n)
    for b in range(int(jt_all.shape[0])):
        tp = jax.lax.dynamic_update_index_in_dim(
            tp, tp_new[b, :, :n], jt_all[b], axis=1)

    forest = Forest(
        sv_o.reshape(C, m, S), sl_o.reshape(C, m, S),
        state.forest.split_set, lf_o.reshape(C, m, S, 1),
        ct_o.reshape(C, m, S), state.forest.slope,
    )
    new_state = PgbartState(
        forest=forest,
        tree_pred=tp.reshape(C, m, n, 1),
        sum_trees=sum_o[:, :n].reshape(C, n, 1),
        alpha_vec=av_o,
        leaf_sd=scal_o[:, 0:1],
        wf_count=scal_o[:, 1],
        wf_mean=wfm_o[:, :n].reshape(C, n, 1),
        wf_m2=wfm2_o[:, :n].reshape(C, n, 1),
        batch_offset=(state.batch_offset + B) % m,
        iteration=state.iteration + B,
    )
    # variable-inclusion counts from the committed forests (outside XLA)
    sv_r = sv_o.reshape(C, m * S)
    vi = (sv_r[:, :, None] == jnp.arange(p, dtype=jnp.int32)[None, None, :]
          ).astype(jnp.float32).sum(axis=1)
    return new_state, vi


# ---------------------------------------------------------------------------
# Public wrapper: custom_vmap routes vmap-over-chains into ONE kernel
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _bign_step_cached(cfg: BartConfig, pg: PgbartConfig, tuning: bool,
                      rng_mode: str, lik: str, lik_const: float,
                      with_llw: bool):
    from jax import custom_batching

    rowll = lik in _ROWLL_LIKS

    def single(key, state, X, Y_target, w_chain, llw):
        lead = lambda a: a[None]
        st1 = jax.tree.map(lead, state)
        out_state, vi = _bign_chains_impl(
            key[None], st1, X, Y_target, cfg, pg, w_chain[None], tuning,
            rng_mode, lik, lik_const,
            None if llw is None else llw[None])
        return jax.tree.map(lambda a: a[0], out_state), vi[0]

    step = custom_batching.custom_vmap(single)

    @step.def_vmap
    def _rule(axis_size, in_batched, key, state, X, Y_target, w_chain,
              llw):
        kb, sb_, xb, yb, wb, lb = in_batched
        n, p_ = X.shape if not xb else X.shape[1:]
        if (xb or yb
                or not _vmem_fits(axis_size, pg.num_particles, n, p_,
                                  rowll=rowll)):
            # per-chain sequential kernel calls (each still row-tiled)
            def bc(x, b):
                return x if b else jax.tree.map(
                    lambda a: jnp.broadcast_to(
                        a, (axis_size,) + jnp.shape(a)), x)
            args = (bc(key, kb),
                    jax.tree.map(lambda a, b: bc(a, b), state, sb_),
                    bc(X, xb), bc(Y_target, yb), bc(w_chain, wb),
                    None if llw is None else bc(llw, lb))
            outs = jax.lax.map(lambda a: single(*a), args)
            return outs, (jax.tree.map(lambda _: True, outs[0]), True)

        def bcl(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + jnp.shape(x))

        keys_C = bcl(key, kb)
        state_C = jax.tree.map(bcl, state, sb_)
        w_C = bcl(w_chain, wb)
        llw_C = None if llw is None else bcl(llw, lb)
        outs = _bign_chains_impl(keys_C, state_C, X, Y_target, cfg, pg,
                                 w_C, tuning, rng_mode, lik, lik_const,
                                 llw_C)
        return outs, (jax.tree.map(lambda _: True, outs[0]), True)

    return step


def pgbart_step_bign(key, state, X, Y_target, cfg: BartConfig,
                     pg: PgbartConfig, w_chain, tuning: bool,
                     rng_mode: str = "batched", lik: str = "gauss",
                     lik_const: float = 0.0, llw=None):
    """One full PGBART MCMC step for LARGE n (one chain; vmap batches all
    chains into one kernel instance).  ``w_chain``: (1,) scalar Gaussian
    precision for this chain (zeros for the row-ll codes); ``llw``:
    optional (n,) per-row likelihood data for the het/cat codes.  See
    the module docstring for scope."""
    step = _bign_step_cached(cfg, pg, bool(tuning), rng_mode, lik,
                             float(lik_const), llw is not None)
    return step(key, state, X, Y_target, w_chain, llw)
