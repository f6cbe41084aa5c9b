"""Whole-draw PGBART megakernel: one ``pallas_call`` per MCMC step.

After the grow/SMC/select fusions (ops/grow_pallas, ops/smc_pallas,
ops/select_pallas) the per-draw cost on TPU is still dominated by kernel
*count*: per draw, B tree updates x D growth rounds x (grow kernel + SMC
kernel + ancestor gather) + B select kernels + the XLA glue committing
each winner into the forest (~80-160 dispatches per draw at default
settings, each paying fixed launch cost at BART's tiny shapes).  This
kernel runs the ENTIRE PGBART step — the Gibbs loop over the B trees of
the batch, each tree's full conditional SMC (D depth-synchronous growth
rounds, ESS-gated systematic resampling, categorical winner selection,
R Metropolis leaf refinements), the forest/sum-of-trees commit, and the
tuning-phase adaptation (split-prior counts, Welford leaf variance) — as
ONE program.

Semantics are identical to ``sampler/pgbart.pgbart_step``'s fused-Gaussian
Pallas path (itself equivalence-tested against the pure-JAX reference
path): the round body is literally ``grow_pallas._grow_math``; the
resampling and selection math mirror ``smc_pallas``/``select_pallas``
line by line.  All randomness is pre-drawn outside with ``jax.random``:

* ``rng="reference"`` replicates ``_update_one_tree``'s exact key-split
  sequence per tree, so the megakernel is bit-comparable to the existing
  kernels given the same top-level key (used by the equivalence tests);
* ``rng="batched"`` draws each random block with one batched call
  (~10 RNG ops per draw instead of ~8 per tree) — statistically
  identical, and the production/bench default.

Mosaic idioms follow grow_pallas (see its module docstring): selection
matmuls instead of gathers, i32 bit patterns for the uint32 subset masks,
f32 blends instead of i1 selects, scalar compare-count instead of
searchsorted, (P,1)->(P,) transposes via a diag matmul.

Scope (callers fall back to ``pgbart_step``'s per-kernel path otherwise):
constant leaf response, n_outputs == 1, fused Gaussian likelihood
(``gauss_w`` given), p <= 128, and the pre-drawn row-Gumbel block
(B*D*P*n floats) small enough for VMEM.

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
from .grow_pallas import _grow_math


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
    jt_ref, scal_ref, u_res_ref, u_sel_ref, u_acc_ref,
    # VMEM inputs
    sv_fi, sl_fi, st_fi, lf_fi, ct_fi, sp_fi, tp_i, sum_i,
    y_ref, x_ref, xt_ref, rules_ref, av_i, llw_ref, wfm_i, wfm2_i,
    ug_ref, uv_ref, rg_ref, eps_ref, sb_ref, epsr_ref,
    # VMEM outputs
    sv_fo, sl_fo, st_fo, lf_fo, ct_fo, sp_fo, tp_o, sum_o, av_o,
    wfm_o, wfm2_o, scal_o,
    # VMEM scratch
    svA, svB, slA, slB, stA, stB, lfA, lfB, ctA, ctB, liA, liB,
    predA, predB, llS,
    *, B: int, P: int, D: int, S: int, n: int, p: int, m: int, R: int,
    alpha: float, beta: float, tuning: bool,
):
    k = 1  # n_outputs; callers gate on this

    # ---- copy persistent state in -> out; out refs are the working set ----
    def copy_body(j, _):
        sv_fo[j, 0, :] = sv_fi[j, 0, :]
        sl_fo[j, 0, :] = sl_fi[j, 0, :]
        st_fo[j, 0, :] = st_fi[j, 0, :]
        lf_fo[j, 0, :] = lf_fi[j, 0, :]
        ct_fo[j, 0, :] = ct_fi[j, 0, :]
        sp_fo[j, 0, :] = sp_fi[j, 0, :]
        tp_o[j, 0, :] = tp_i[j, 0, :]
        return 0

    jax.lax.fori_loop(0, m, copy_body, 0)
    sum_o[:, :] = sum_i[:, :]
    av_o[:, :] = av_i[:, :]
    wfm_o[:, :] = wfm_i[:, :]
    wfm2_o[:, :] = wfm2_i[:, :]

    # ---- shared covariate blocks ----
    xraw = x_ref[:, :]
    xnan = jnp.isnan(xraw)
    x_z = jnp.where(xnan, 0.0, xraw)
    xnan_f = xnan.astype(jnp.float32)
    xtraw = xt_ref[:, :]
    xtnan = jnp.isnan(xtraw)
    xT_z = jnp.where(xtnan, 0.0, xtraw)
    xnanT_f = xtnan.astype(jnp.float32)
    y2 = y_ref[:, :]           # (1, n)
    llw2 = llw_ref[:, :]       # (1, n)
    rules = rules_ref[0, :]
    nf = jnp.float32(n)

    idxP = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)[0]   # (P,)
    nonfrozen = idxP >= 1
    iota_S = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0]
    # cumsum matrices
    lt_P = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (P, P), 1)).astype(jnp.float32)
    lt_p = (jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)).astype(jnp.float32)

    def tree_body(bi, carry):
        leaf_sd, wf_count, iteration = carry
        jt = jt_ref[0, bi]

        tp_jt = tp_o[jt, :, :]                 # (1, n)
        sum_noi = sum_o[:, :] - tp_jt          # (1, n)
        resid = y2 - sum_noi                   # (1, n)

        av = jnp.maximum(av_o[0, :], 1e-12)    # (p,)
        acdf = jax.lax.dot_general(
            av[None, :], lt_p, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        lsd_vec = jnp.full((1,), leaf_sd, jnp.float32)

        # ---- init particles: slot 0 = frozen current tree, rest = root ----
        t_sv = sv_fo[jt, 0, :]
        t_sl = sl_fo[jt, 0, :]
        t_st_i = jax.lax.bitcast_convert_type(st_fo[jt, 0, :], jnp.int32)
        t_lf = lf_fo[jt, 0, :]                 # (S,)
        t_ct = ct_fo[jt, 0, :]
        root_mu = jnp.sum(resid) / nf / m
        fresh_lf = jnp.where(iota_S == 0, root_mu, 0.0)
        fresh_ct = jnp.where(iota_S == 0, nf, 0.0)
        neg1 = jnp.full((S,), -1, jnp.int32)
        t_lf00 = t_lf[0]

        def init_body(pi, _):
            ci = (pi == 0).astype(jnp.int32)
            cf = (pi == 0).astype(jnp.float32)
            svA[pi, 0, :] = ci * t_sv + (1 - ci) * neg1
            slA[pi, 0, :] = cf * t_sl
            stA[pi, 0, :] = jax.lax.bitcast_convert_type(ci * t_st_i, jnp.uint32)
            lfA[pi, 0, :] = cf * t_lf + (1.0 - cf) * fresh_lf
            ctA[pi, 0, :] = cf * t_ct + (1.0 - cf) * fresh_ct
            liA[pi, 0, :] = jnp.zeros((n,), jnp.int32)
            v0 = cf * t_lf00 + (1.0 - cf) * root_mu
            predA[pi, :, :] = jnp.full((1, n), v0, jnp.float32)
            ll0 = -0.5 * jnp.sum(llw2 * (resid - v0) * (resid - v0))
            llS[pi, :, :] = jnp.full((1, 1), ll0, jnp.float32)
            return 0

        jax.lax.fori_loop(0, P, init_body, 0)

        ll = _row_from_col(llS[:, 0, :], P)
        log_w = ll
        ll_prev = ll
        # resample context from the previous round (None before round 0)
        res_do = None
        res_cdf = None
        res_u = None

        bufs = ((svA, slA, stA, lfA, ctA, liA, predA),
                (svB, slB, stB, lfB, ctB, liB, predB))

        for d in range(D):
            src = bufs[d % 2]
            dst = bufs[(d + 1) % 2]
            s_sv, s_sl, s_st, s_lf, s_ct, s_li, s_pred = src
            d_sv, d_sl, d_st, d_lf, d_ct, d_li, d_pred = dst
            lo, hi = 2 ** d - 1, 2 ** (d + 1) - 1
            G = hi - lo
            p_grow = float(alpha * (1.0 + d) ** (-beta))
            rd_do, rd_cdf, rd_u = res_do, res_cdf, res_u

            def grow_one(pi, rd_do=rd_do, rd_cdf=rd_cdf, rd_u=rd_u,
                         d=d, lo=lo, G=G, p_grow=p_grow,
                         s_sv=s_sv, s_sl=s_sl, s_st=s_st, s_lf=s_lf,
                         s_ct=s_ct, s_li=s_li, s_pred=s_pred,
                         d_sv=d_sv, d_sl=d_sl,
                         d_st=d_st, d_lf=d_lf, d_ct=d_ct, d_li=d_li,
                         d_pred=d_pred):
                if rd_do is None:
                    anc = pi
                else:
                    pos = (rd_u + pi.astype(jnp.float32) - 1.0) / (P - 1)
                    cmp = (rd_cdf < pos) & nonfrozen
                    anc_raw = jnp.clip(jnp.sum(cmp.astype(jnp.int32)) + 1,
                                       1, P - 1)
                    anc = jnp.where(rd_do & (pi >= 1), anc_raw, pi)
                frozen = anc == 0
                idx = bi * P + pi
                out = _grow_math(
                    frozen, s_sv[anc, 0, :], s_sl[anc, 0, :], s_st[anc, 0, :],
                    s_lf[anc, :, :], s_ct[anc, 0, :], s_li[anc, 0, :],
                    s_pred[anc, :, :],
                    x_z, xnan_f, xT_z, xnanT_f, resid, rules, acdf, lsd_vec,
                    llw2,
                    ug_ref[idx, 0, lo:lo + G], uv_ref[idx, 0, lo:lo + G],
                    rg_ref[(bi * D + d) * P + pi, 0, :],
                    eps_ref[idx, :, 2 * lo:2 * lo + 2 * G],
                    sb_ref[idx, 0, lo:lo + G],
                    d=d, S=S, n=n, p=p, k=k, m=m, p_grow=p_grow,
                )
                sv_n, sl_n, st_n, lf_n, ct_n, li_n, pred_n, ll_n = out
                d_sv[pi, 0, :] = sv_n
                d_sl[pi, 0, :] = sl_n
                d_st[pi, 0, :] = st_n
                d_lf[pi, :, :] = lf_n
                d_ct[pi, 0, :] = ct_n
                d_li[pi, 0, :] = li_n
                d_pred[pi, :, :] = pred_n
                llS[pi, :, :] = jnp.full((1, 1), ll_n, jnp.float32)
                return 0

            # the grow body is LATENCY-bound (a ~25-step dependency
            # chain of small vector ops — ablations show its cost barely
            # moves when whole op groups are removed); unrolling the
            # particle loop interleaves independent particles'
            # instruction streams so their latencies overlap
            U = 4 if P % 4 == 0 else (2 if P % 2 == 0 else 1)

            def grow_body(bi_u, _):
                for u in range(U):
                    grow_one(bi_u * U + u)
                return 0

            jax.lax.fori_loop(0, P // U, grow_body, 0)

            ll = _row_from_col(llS[:, 0, :], P)
            lw1 = log_w + ll - ll_prev

            if d < D - 1:
                # SMC bookkeeping — mirrors smc_pallas._kernel
                u = u_res_ref[0, bi * D + d]
                neg_inf = jnp.float32(-jnp.inf)
                w_nf = jnp.where(nonfrozen, lw1, neg_inf)
                mx = jnp.max(w_nf)
                e = jnp.where(nonfrozen, jnp.exp(lw1 - mx), 0.0)
                tot = jnp.sum(e)
                probs = e / tot
                log_mean = mx + jnp.log(tot / (P - 1))
                ess = 1.0 / jnp.maximum(jnp.sum(probs * probs), 1e-38)
                do = ess < 0.5 * (P - 1)
                cdf = jax.lax.dot_general(
                    probs[None, :], lt_P,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[0]
                cdf = cdf / cdf[P - 1]
                pos = (u + idxP.astype(jnp.float32) - 1.0) / (P - 1)
                cmp = (cdf[None, :] < pos[:, None]) & nonfrozen[None, :]
                anc = jnp.sum(cmp.astype(jnp.int32), axis=1) + 1
                anc = jnp.clip(anc, 1, P - 1)
                resampled = do & nonfrozen
                take = jnp.where(resampled, anc, idxP)
                log_w = jnp.where(resampled, log_mean, lw1)
                sel = (jax.lax.broadcasted_iota(jnp.int32, (P, P), 0)
                       == take[None, :]).astype(jnp.float32)
                ll_prev = jax.lax.dot_general(
                    ll[None, :], sel,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[0]
                res_do, res_cdf, res_u = do, cdf, u
            else:
                log_w = lw1

        (fin_sv, fin_sl, fin_st, fin_lf, fin_ct, fin_li,
         fin_pred) = bufs[D % 2]

        # ---- categorical winner + refinement — mirrors select_pallas ----
        mx = jnp.max(log_w)
        e = jnp.exp(log_w - mx)
        cdf = jax.lax.dot_general(
            e[None, :], lt_P, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
        u = u_sel_ref[0, bi] * cdf[P - 1]
        widx = jnp.clip(jnp.sum((cdf < u).astype(jnp.int32)), 0, P - 1)
        wsel = (idxP == widx).astype(jnp.float32)
        wsel_i = wsel.astype(jnp.int32)[:, None]

        def pick2(mat_f32):  # (P, Z) -> (Z,)
            return jax.lax.dot_general(
                wsel[None, :], mat_f32,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0]

        sv_w = jnp.sum(fin_sv[:, 0, :] * wsel_i, axis=0)
        st_w = jnp.sum(
            jax.lax.bitcast_convert_type(fin_st[:, 0, :], jnp.int32) * wsel_i,
            axis=0)
        li_w = jnp.sum(fin_li[:, 0, :] * wsel_i, axis=0)
        sl_w = pick2(fin_sl[:, 0, :])
        ct_w = pick2(fin_ct[:, 0, :])
        lf_w = pick2(fin_lf[:, 0, :])
        pred_w = pick2(fin_pred[:, 0, :])

        resid1 = resid[0]
        llw1 = llw2[0]
        leaf_mask = ((sv_w < 0) & (ct_w > 0)).astype(jnp.float32)
        soh = (jax.lax.broadcasted_iota(jnp.int32, (S, n), 0)
               == li_w[None, :]).astype(jnp.float32)

        def ll_of(pred_x):
            diff = resid1 - pred_x
            return -0.5 * jnp.sum(llw1 * diff * diff)

        # MH acceptance = likelihood ratio x Normal(0, leaf_sd) leaf-prior
        # ratio (mirrors select_pallas / sampler.pgbart refine_body)
        hiv = 0.5 / (leaf_sd * leaf_sd)

        def lp_of(lf_x):
            return -hiv * jnp.sum(leaf_mask * lf_x * lf_x)

        ll_c = ll_of(pred_w) + lp_of(lf_w)
        eps_scale = 0.3 * leaf_sd
        for r in range(R):
            lf_p = lf_w + epsr_ref[bi * R + r, 0, :] * eps_scale * leaf_mask
            pred_p = jax.lax.dot_general(
                lf_p[None, :], soh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0]
            ll_p = ll_of(pred_p) + lp_of(lf_p)
            acc = jnp.log(u_acc_ref[0, bi * R + r]) < (ll_p - ll_c)
            accf = acc.astype(jnp.float32)
            lf_w = accf * lf_p + (1.0 - accf) * lf_w
            pred_w = accf * pred_p + (1.0 - accf) * pred_w
            ll_c = jnp.where(acc, ll_p, ll_c)

        # ---- commit winner into the forest + running sums ----
        sv_fo[jt, 0, :] = sv_w
        sl_fo[jt, 0, :] = sl_w
        st_fo[jt, 0, :] = jax.lax.bitcast_convert_type(st_w, jnp.uint32)
        lf_fo[jt, 0, :] = lf_w
        ct_fo[jt, 0, :] = ct_w
        sp_fo[jt, 0, :] = jnp.zeros((S,), jnp.float32)
        tp_o[jt, 0, :] = pred_w
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


def fused_draw_supported(cfg: BartConfig, pg: PgbartConfig, X,
                         gauss_w) -> bool:
    """Whether the whole-draw megakernel covers this configuration."""
    if gauss_w is None or cfg.response != "constant" or cfg.n_outputs != 1:
        return False
    n, p = X.shape
    if p > 128 or n * p > 2_000_000:
        return False
    # the pre-drawn row-Gumbel block must fit VMEM comfortably
    B = max(pg.batch_size(cfg.m, True), pg.batch_size(cfg.m, False))
    if B * cfg.max_depth * pg.num_particles * n * 4 > 6_000_000:
        return False
    return True


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
    from ..sampler.pgbart import PgbartState, split_var_counts

    m, S = state.forest.split_var.shape
    n, p = X.shape
    P = pg.num_particles
    D = cfg.max_depth
    B = pg.batch_size(m, tuning)
    Gtot = 2 ** D - 1
    R = max(pg.num_refinements, 1)

    make = _rands_reference if rng_mode == "reference" else _rands_batched
    ug, uv, rg, eps, sb, ures, usel, epsr, uacc = make(
        key, B, P, D, n, Gtot, R, S, pg.num_refinements)

    f = state.forest
    scal = jnp.stack([state.leaf_sd[0], state.wf_count,
                      state.iteration.astype(jnp.float32)])
    r31 = lambda a: a.reshape(a.shape[0], 1, a.shape[1])  # noqa: E731

    out_shape = [
        jax.ShapeDtypeStruct((m, 1, S), jnp.int32),
        jax.ShapeDtypeStruct((m, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((m, 1, S), jnp.uint32),
        jax.ShapeDtypeStruct((m, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((m, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((m, 1, S), jnp.float32),
        jax.ShapeDtypeStruct((m, 1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, p), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, n), jnp.float32),
        jax.ShapeDtypeStruct((1, 4), jnp.float32),
    ]
    scratch = [
        pltpu.VMEM((P, 1, S), jnp.int32), pltpu.VMEM((P, 1, S), jnp.int32),
        pltpu.VMEM((P, 1, S), jnp.float32), pltpu.VMEM((P, 1, S), jnp.float32),
        pltpu.VMEM((P, 1, S), jnp.uint32), pltpu.VMEM((P, 1, S), jnp.uint32),
        pltpu.VMEM((P, 1, S), jnp.float32), pltpu.VMEM((P, 1, S), jnp.float32),
        pltpu.VMEM((P, 1, S), jnp.float32), pltpu.VMEM((P, 1, S), jnp.float32),
        pltpu.VMEM((P, 1, n), jnp.int32), pltpu.VMEM((P, 1, n), jnp.int32),
        pltpu.VMEM((P, 1, n), jnp.float32), pltpu.VMEM((P, 1, n), jnp.float32),
        pltpu.VMEM((P, 1, 1), jnp.float32),
    ]
    kernel = functools.partial(
        _draw_kernel, B=B, P=P, D=D, S=S, n=n, p=p, m=m, R=R,
        alpha=float(cfg.alpha), beta=float(cfg.beta), tuning=tuning,
    )
    jt_all = (state.batch_offset + jnp.arange(B, dtype=jnp.int32)) % m
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 22,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        scratch_shapes=scratch,
        interpret=(jax.default_backend() == "cpu"),
    )(
        jt_all.reshape(1, B), scal.reshape(1, 3),
        ures.reshape(1, B * D), usel.reshape(1, B), uacc.reshape(1, B * R),
        r31(f.split_var), r31(f.split_val), r31(f.split_set),
        f.leaf.transpose(0, 2, 1), r31(f.count), f.slope.transpose(0, 2, 1),
        state.tree_pred.transpose(0, 2, 1),
        state.sum_trees.T,
        Y_target.reshape(n, 1).T,
        X, X.T, rules.reshape(1, p),
        state.alpha_vec.reshape(1, p),
        gauss_w.reshape(n, 1).T,
        state.wf_mean.T, state.wf_m2.T,
        r31(ug.reshape(B * P, Gtot)), r31(uv.reshape(B * P, Gtot)),
        r31(rg.reshape(B * D * P, n)),
        eps.reshape(B * P, 2 * Gtot, 1).transpose(0, 2, 1),
        r31(sb.reshape(B * P, Gtot)),
        epsr.reshape(B * R, 1, S),
    )
    (sv_o, sl_o, st_o, lf_o, ct_o, sp_o, tp_o, sum_o, av_o,
     wfm_o, wfm2_o, scal_o) = out

    from ..ops.trees import Forest

    forest = Forest(
        sv_o.reshape(m, S), sl_o.reshape(m, S), st_o.reshape(m, S),
        lf_o.transpose(0, 2, 1), ct_o.reshape(m, S),
        sp_o.transpose(0, 2, 1),
    )
    new_state = PgbartState(
        forest=forest,
        tree_pred=tp_o.transpose(0, 2, 1),
        sum_trees=sum_o.T,
        alpha_vec=av_o.reshape(p),
        leaf_sd=scal_o[0, 0].reshape(1),
        wf_count=scal_o[0, 1],
        wf_mean=wfm_o.T,
        wf_m2=wfm2_o.T,
        batch_offset=(state.batch_offset + B) % m,
        iteration=state.iteration + B,
    )
    vi = split_var_counts(forest, p)
    return new_state, vi
