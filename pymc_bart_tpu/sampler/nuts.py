"""No-U-Turn sampler (iterative, multinomial) for the compound step.

The reference's non-BART free RVs are updated by PyMC's NUTS in a
compound step (reference tests/test_bart.py:54-58, SURVEY 3.2).  This is
an in-graph iterative NUTS:

* outer loop doubles the trajectory in a random direction up to
  ``max_tree_depth`` times (lax.while_loop);
* each doubling builds its subtree with a dynamic-bound fori_loop of
  leapfrog steps, carrying a progressive multinomial sample of the
  proposal (log-sum-exp weights);
* the generalized U-turn criterion is checked for every balanced subtree
  via per-level checkpoint slots: when leaf i starts a size-2^h subtree
  (i mod 2^h == 0) its momentum and the cumulative momentum sum are
  stored at level h; when leaf i completes one ((i+1) mod 2^h == 0) the
  subtree momentum sum is compared against both end momenta.

Step-size dual averaging and diagonal mass adaptation reuse the HMC
module's state (hmc.HmcState); ``sample(algorithm="nuts")`` is the
default compound step and ``"hmc"`` selects the jittered-trajectory HMC.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from .hmc import HmcState, init_state, finalize_adaptation  # noqa: F401

_DIVERGENCE = 1000.0


def nuts_step(key, state: HmcState, logp_fn: Callable, logp_params,
              tuning: bool, max_tree_depth: int = 8,
              target_accept: float = 0.8, full_stats: bool = False):
    """One NUTS transition.  ``logp_fn(theta, logp_params) -> scalar``.

    Returns (new_state, accept_prob), or with ``full_stats=True``
    (new_state, dict) carrying the per-draw sampler statistics PyMC's
    NUTS reports (diverging, tree_depth, n_steps, step_size, energy) so
    users can diagnose a bad run the way they would with the reference.
    """
    d = state.theta.shape[0]
    L = max_tree_depth
    step = jnp.exp(state.log_step)
    inv_mass = state.inv_mass

    grad_fn = jax.value_and_grad(lambda t: logp_fn(t, logp_params))

    k_mom, k_loop = jax.random.split(key)
    r0 = jax.random.normal(k_mom, (d,)) / jnp.sqrt(inv_mass)
    logp0, grad0 = grad_fn(state.theta)
    h0 = logp0 - 0.5 * jnp.sum(r0 * r0 * inv_mass)

    def leapfrog(z, r, grad, eps):
        r_half = r + 0.5 * eps * grad
        z_new = z + eps * r_half * inv_mass
        logp_new, grad_new = grad_fn(z_new)
        r_new = r_half + 0.5 * eps * grad_new
        return z_new, r_new, grad_new, logp_new

    pow2 = 2 ** jnp.arange(L, dtype=jnp.int32)  # (L,)

    def is_turning(r_sum, r_a, r_b):
        v = r_sum * inv_mass
        return (jnp.dot(v, r_a) <= 0.0) | (jnp.dot(v, r_b) <= 0.0)

    def build_subtree(key, z, r, grad, eps, n_leaves):
        """Build a subtree of ``n_leaves`` leapfrog steps from (z, r)."""

        def body(i, carry):
            (z, r, grad, r_sum, z_prop, logp_prop, log_w, turning, diverged,
             sum_acc, r_first_ck, rsum_ck, key) = carry
            key, k_sel = jax.random.split(key)
            z, r, grad, logp = leapfrog(z, r, grad, eps)
            energy = logp - 0.5 * jnp.sum(r * r * inv_mass)
            w_leaf = energy - h0
            new_div = ~(w_leaf > -_DIVERGENCE) | ~jnp.isfinite(w_leaf)
            w_leaf = jnp.where(new_div, -jnp.inf, w_leaf)
            sum_acc = sum_acc + jnp.exp(jnp.minimum(w_leaf, 0.0))

            # progressive multinomial proposal within the subtree
            new_log_w = jnp.logaddexp(log_w, w_leaf)
            take_new = (
                jnp.log(jax.random.uniform(k_sel, ())) < w_leaf - new_log_w
            )
            z_prop = jnp.where(take_new, z, z_prop)
            logp_prop = jnp.where(take_new, logp, logp_prop)

            # per-level checkpoints for balanced-subtree U-turn checks
            starts = (i & (pow2 - 1)) == 0                  # (L,)
            r_first_ck = jnp.where(starts[:, None], r[None, :], r_first_ck)
            rsum_ck = jnp.where(starts[:, None], r_sum[None, :], rsum_ck)
            r_sum_new = r_sum + r
            completes = (((i + 1) & (pow2 - 1)) == 0) & (pow2 > 1)
            sub_sums = r_sum_new[None, :] - rsum_ck        # (L, d)
            v = sub_sums * inv_mass[None, :]
            turn_lvl = (
                (jnp.sum(v * r_first_ck, axis=1) <= 0.0)
                | (jnp.sum(v * r[None, :], axis=1) <= 0.0)
            )
            turning = turning | jnp.any(completes & turn_lvl)

            return (z, r, grad, r_sum_new, z_prop, logp_prop, new_log_w,
                    turning, diverged | new_div, sum_acc,
                    r_first_ck, rsum_ck, key)

        init = (z, r, grad, jnp.zeros((d,)), z, -jnp.inf * jnp.ones(()),
                -jnp.inf, jnp.zeros((), bool), jnp.zeros((), bool),
                jnp.zeros(()),
                jnp.zeros((L, d)), jnp.zeros((L, d)), key)
        out = jax.lax.fori_loop(0, n_leaves, body, init)
        (z_e, r_e, grad_e, r_sum, z_prop, logp_prop, log_w, turning,
         diverged, sum_acc, _, _, _) = out
        return (z_e, r_e, grad_e, r_sum, z_prop, logp_prop, log_w, turning,
                diverged, sum_acc)

    def cond(carry):
        (depth, turning, diverged, *_rest) = carry
        return (depth < L) & ~turning & ~diverged

    def body(carry):
        (depth, turning, diverged, z_l, r_l, grad_l, z_r, r_r, grad_r,
         r_sum, z_prop, logp_prop, log_w, sum_acc, n_leaves_tot, key) = carry
        key, k_dir, k_bias, k_sub = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_dir)
        eps = jnp.where(go_right, step, -step)
        z0 = jnp.where(go_right, z_r, z_l)
        r0_ = jnp.where(go_right, r_r, r_l)
        g0 = jnp.where(go_right, grad_r, grad_l)
        n_leaves = jnp.int32(2) ** depth

        (z_e, r_e, grad_e, r_sum_sub, z_ps, logp_ps, log_w_sub, turn_sub,
         div_sub, acc_sub) = build_subtree(k_sub, z0, r0_, g0, eps, n_leaves)

        z_l = jnp.where(go_right, z_l, z_e)
        r_l = jnp.where(go_right, r_l, r_e)
        grad_l = jnp.where(go_right, grad_l, grad_e)
        z_r = jnp.where(go_right, z_e, z_r)
        r_r = jnp.where(go_right, r_e, r_r)
        grad_r = jnp.where(go_right, grad_e, grad_r)

        # biased progressive sampling across the doubling
        ok = ~(turn_sub | div_sub)
        accept_sub = (
            jnp.log(jax.random.uniform(k_bias, ())) < (log_w_sub - log_w)
        ) & ok
        z_prop = jnp.where(accept_sub, z_ps, z_prop)
        logp_prop = jnp.where(accept_sub, logp_ps, logp_prop)
        log_w = jnp.logaddexp(log_w, jnp.where(ok, log_w_sub, -jnp.inf))

        r_sum_new = r_sum + r_sum_sub
        turning = turn_sub | is_turning(r_sum_new, r_l, r_r)
        return (depth + 1, turning, diverged | div_sub, z_l, r_l, grad_l,
                z_r, r_r, grad_r, r_sum_new, z_prop, logp_prop, log_w,
                sum_acc + acc_sub, n_leaves_tot + n_leaves, key)

    init = (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
            jnp.zeros((), bool),
            state.theta, r0, grad0, state.theta, r0, grad0,
            r0, state.theta, logp0, jnp.zeros(()),
            jnp.zeros(()), jnp.zeros((), jnp.int32), k_loop)
    out = jax.lax.while_loop(cond, body, init)
    (depth_f, _turning, diverged_f, _zl, _rl, _gl, _zr, _rr, _gr, _rsum,
     z_prop, logp_prop, _log_w, sum_acc, n_leaves_tot, _key) = out

    theta_new = z_prop
    accept_prob = sum_acc / jnp.maximum(n_leaves_tot.astype(jnp.float32), 1.0)

    if tuning:
        # dual averaging + Welford mass adaptation (same recipe as hmc.py)
        mu = jnp.log(10.0) + jnp.log(0.1)
        count = state.da_count + 1.0
        kappa, gamma, t0 = 0.75, 0.05, 10.0
        eta = 1.0 / (count + t0)
        h = (1.0 - eta) * state.da_h + eta * (target_accept - accept_prob)
        log_step = mu - jnp.sqrt(count) / gamma * h
        w = count ** (-kappa)
        log_step_avg = w * log_step + (1.0 - w) * state.da_log_step_avg
        wf_count = state.wf_count + 1.0
        delta = theta_new - state.wf_mean
        wf_mean = state.wf_mean + delta / wf_count
        wf_m2 = state.wf_m2 + delta * (theta_new - wf_mean)
        var = wf_m2 / jnp.maximum(wf_count - 1.0, 1.0)
        inv_mass_new = jnp.where(wf_count > 50.0, jnp.maximum(var, 1e-6),
                                 state.inv_mass)
        new_state = HmcState(
            theta=theta_new, log_step=log_step,
            da_log_step_avg=log_step_avg, da_h=h, da_count=count,
            wf_count=wf_count, wf_mean=wf_mean, wf_m2=wf_m2,
            inv_mass=inv_mass_new,
        )
    else:
        new_state = dataclasses.replace(state, theta=theta_new)
    if full_stats:
        stats = {
            "accept": accept_prob,
            "diverging": diverged_f,
            "tree_depth": depth_f,
            "n_steps": n_leaves_tot,
            "step_size": step,
            "energy": -logp_prop,
        }
        return new_state, stats
    return new_state, accept_prob
