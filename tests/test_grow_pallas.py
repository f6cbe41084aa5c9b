"""Bit-exact equivalence of the fused Pallas growth kernel vs the pure-JAX
reference path: both consume the same pre-drawn random numbers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pymc_bart_tpu.config import BartConfig
from pymc_bart_tpu.ops.grow_pallas import grow_round_pallas
from pymc_bart_tpu.sampler.pgbart import _grow_round


@pytest.mark.parametrize("d, k, response", [
    # d x k x response core grid, plus k=8 (joint multi-output
    # coverage up to 8 outputs, round-4 VERDICT "Next round" #9)
    (0, 1, "constant"), (1, 1, "constant"), (3, 1, "constant"),
    (0, 2, "constant"), (1, 2, "constant"), (3, 2, "constant"),
    (0, 1, "linear"), (1, 1, "linear"), (3, 1, "linear"),
    (0, 2, "linear"), (1, 2, "linear"), (3, 2, "linear"),
    (0, 1, "mix"), (1, 1, "mix"), (3, 1, "mix"),
    (0, 2, "mix"), (1, 2, "mix"), (3, 2, "mix"),
    (1, 8, "constant"), (3, 8, "constant"), (3, 8, "linear"),
])
def test_pallas_grow_matches_jax(d, k, response):
    rng = np.random.default_rng(d * 10 + k)
    P, n, p = 4, 64, 3
    cfg = BartConfig(m=5, max_depth=4, n_outputs=k, response=response)
    S = cfg.n_nodes
    lo, hi = 2**d - 1, 2 ** (d + 1) - 1
    G = hi - lo

    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    resid = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    rules = jnp.zeros(p, jnp.int32)
    alpha_cdf = jnp.cumsum(jnp.ones(p, jnp.float32))
    leaf_sd = jnp.full((k,), 0.3, jnp.float32)

    # build a valid random particle state: grow a few levels determministically
    sv = np.full((P, S), -1, np.int32)
    sl = np.zeros((P, S), np.float32)
    st = np.zeros((P, S), np.uint32)
    lf = rng.normal(size=(P, S, k)).astype(np.float32)
    ct = np.zeros((P, S), np.float32)
    # nonzero stored slopes exercise the frozen-replay slope passthrough
    # and the slope term of the incremental prediction (zeros for the
    # constant response, whose slope state must stay identically zero)
    sp = (0.1 * rng.normal(size=(P, S, k)).astype(np.float32)
          if response != "constant" else np.zeros((P, S, k), np.float32))
    li = np.zeros((P, n), np.int32)
    for pi in range(P):
        ct[pi, 0] = n
        # route all rows through random splits down to depth d
        for lev in range(d):
            llo, lhi = 2**lev - 1, 2 ** (lev + 1) - 1
            for node in range(llo, lhi):
                rows = np.where(li[pi] == node)[0]
                if rows.size < 4 or rng.random() < 0.3:
                    continue
                var = rng.integers(0, p)
                val = float(np.median(X[rows, var]))
                sv[pi, node] = var
                sl[pi, node] = val
                goleft = np.asarray(X[rows, var]) <= val
                if goleft.all() or (~goleft).all():
                    sv[pi, node] = -1
                    continue
                li[pi, rows[goleft]] = 2 * node + 1
                li[pi, rows[~goleft]] = 2 * node + 2
                ct[pi, 2 * node + 1] = goleft.sum()
                ct[pi, 2 * node + 2] = (~goleft).sum()

    frozen = jnp.asarray(np.arange(P) == 0)
    take = jnp.arange(P, dtype=jnp.int32)

    rands = {
        "u_grow": jnp.asarray(rng.random((P, G)), jnp.float32),
        "u_var": jnp.asarray(rng.random((P, G)), jnp.float32),
        "row_gum": jnp.asarray(rng.gumbel(size=(P, n)), jnp.float32),
        "eps": jnp.asarray(rng.normal(size=(P, 2 * G, k)), jnp.float32),
        "set_bits": jnp.asarray(
            rng.integers(0, 2**32, size=(P, G), dtype=np.uint32)),
        "u_mix": jnp.asarray(rng.random((P, 2 * G)), jnp.float32),
    }

    args = tuple(map(jnp.asarray, (sv, sl, st, lf, ct, sp, li)))

    jax_out = jax.vmap(
        lambda r_, fz, a, b, c, e, f_, g_, h_: _grow_round(
            r_, fz, a, b, c, e, f_, g_, h_, d, X, rules, alpha_cdf,
            leaf_sd, resid, cfg)
    )(rands, frozen, *args)

    llw = jnp.ones((k, n), jnp.float32)  # also exercise the fused ll
    sv_a, sl_a, st_a, lf_a, ct_a, sp_a, li_a = args
    # each particle's current prediction: full leaf response at its
    # row's node (includes the slope term for linear/mix)
    from pymc_bart_tpu.ops.predict import leaf_values_at

    pred_prev = jax.vmap(
        lambda svp, lfp, spp, lip: leaf_values_at(svp, lfp, spp, X, lip)
    )(sv_a, lf_a, sp_a, li_a).transpose(0, 2, 1)  # (P, k, n)
    pl_out = grow_round_pallas(
        take, frozen, sv_a, sl_a, st_a, lf_a.transpose(0, 2, 1), ct_a,
        sp_a.transpose(0, 2, 1), li_a, pred_prev,
        X, resid.T, rules, alpha_cdf, leaf_sd, llw,
        rands["u_grow"], rands["u_var"], rands["row_gum"],
        rands["eps"].transpose(0, 2, 1),
        rands["set_bits"], rands["u_mix"], d=d, cfg=cfg,
    )
    # back to sampler layout for comparison
    pl_out = list(pl_out)
    pl_out[3] = pl_out[3].transpose(0, 2, 1)
    pl_out[5] = pl_out[5].transpose(0, 2, 1)
    pl_out[7] = pl_out[7].transpose(0, 2, 1)

    names = ["split_var", "split_val", "split_set", "leaf", "count",
             "slope", "leaf_idx"]
    for name, a, b in zip(names, jax_out, pl_out[:7]):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            # identical draws; tiny fused-multiply ordering differences only
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6,
                                       err_msg=f"mismatch in {name} d={d}")
        else:
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"mismatch in {name} d={d}")

    # the kernel's fused prediction must equal gather-based prediction
    from pymc_bart_tpu.ops.predict import leaf_values_at

    want_pred = jax.vmap(
        lambda svp, lfp, spp, lip: leaf_values_at(svp, lfp, spp, X, lip)
    )(jax_out[0], jax_out[3], jax_out[5], jax_out[6])
    np.testing.assert_allclose(
        np.asarray(want_pred), np.asarray(pl_out[7]), rtol=1e-5, atol=1e-5)

    # fused Gaussian ll output matches -0.5*sum((resid - pred)^2)
    want_ll = -0.5 * np.sum(
        (np.asarray(resid)[None] - np.asarray(want_pred)) ** 2, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(pl_out[8]), want_ll,
                               rtol=1e-4, atol=1e-4)


def test_pallas_ancestor_take():
    """State blocks are read through the scalar-prefetched ancestor index."""
    rng = np.random.default_rng(0)
    P, n, p, k, d = 3, 32, 2, 1, 0
    cfg = BartConfig(m=3, max_depth=3, n_outputs=k)
    S = cfg.n_nodes
    G = 1

    X = jnp.asarray(rng.normal(size=(n, p)), jnp.float32)
    resid = jnp.asarray(rng.normal(size=(n, k)), jnp.float32)
    rules = jnp.zeros(p, jnp.int32)
    alpha_cdf = jnp.cumsum(jnp.ones(p, jnp.float32))
    leaf_sd = jnp.full((k,), 0.3, jnp.float32)

    sv = jnp.full((P, S), -1, jnp.int32)
    sl = jnp.zeros((P, S), jnp.float32)
    st = jnp.zeros((P, S), jnp.uint32)
    lf = jnp.asarray(rng.normal(size=(P, S, k)), jnp.float32)
    ct = jnp.zeros((P, S), jnp.float32).at[:, 0].set(n)
    sp = jnp.zeros((P, S, k), jnp.float32)
    li = jnp.zeros((P, n), jnp.int32)
    frozen = jnp.asarray(np.arange(P) == 0)

    rands = {
        "u_grow": jnp.ones((P, G), jnp.float32),  # never grow
        "u_var": jnp.asarray(rng.random((P, G)), jnp.float32),
        "row_gum": jnp.asarray(rng.gumbel(size=(P, n)), jnp.float32),
        "eps": jnp.zeros((P, 2 * G, k), jnp.float32),
        "set_bits": jnp.zeros((P, G), jnp.uint32),
    }

    take = jnp.asarray([0, 2, 2], jnp.int32)  # both growers copy particle 2
    pred_prev = jnp.broadcast_to(
        lf[:, 0, :][:, :, None], (P, k, n)).astype(jnp.float32)
    out = grow_round_pallas(
        take, frozen, sv, sl, st, lf.transpose(0, 2, 1), ct,
        sp.transpose(0, 2, 1), li, pred_prev, X, resid.T, rules,
        alpha_cdf, leaf_sd, jnp.zeros((k, n), jnp.float32),
        rands["u_grow"], rands["u_var"],
        rands["row_gum"], rands["eps"].transpose(0, 2, 1),
        rands["set_bits"], d=d, cfg=cfg,
    )
    lf_out = np.asarray(out[3].transpose(0, 2, 1))
    np.testing.assert_array_equal(lf_out[1], np.asarray(lf)[2])
    np.testing.assert_array_equal(lf_out[2], np.asarray(lf)[2])
    np.testing.assert_array_equal(lf_out[0], np.asarray(lf)[0])


@pytest.mark.parametrize("response", ["linear", "mix"])
def test_pallas_path_matches_xla_path_linear(response, monkeypatch):
    """Full pgbart_step: per-round Pallas route (interpret) vs pure XLA
    for the linear/mix responses.  Both consume the same pre-drawn
    randoms; the kernel's constant-free Gaussian ll differs from the
    generic loglik by an additive constant, which cancels in every
    weight use — tree structure must agree exactly."""
    from pymc_bart_tpu.config import PgbartConfig
    from pymc_bart_tpu.sampler import pgbart as pg_mod

    rng = np.random.default_rng(5)
    n, p, m = 48, 3, 6
    X = jnp.asarray(rng.uniform(size=(n, p)), jnp.float32)
    Y = jnp.asarray(
        2.0 * np.asarray(X[:, 0]) + 0.1 * rng.normal(size=n),
        jnp.float32)[:, None]
    cfg = BartConfig(m=m, max_depth=3, response=response)
    pg = PgbartConfig(num_particles=4, batch=(0.5, 0.5), num_refinements=2)
    rules = jnp.zeros(p, jnp.int32)
    gauss_w = jnp.full((n, 1), 4.0, jnp.float32)
    state = pg_mod.init_state(X, Y, cfg)
    key = jax.random.PRNGKey(11)

    def loglik(f, params):
        y, w = params
        return jnp.sum(-0.5 * w * (y - f) ** 2)

    monkeypatch.setenv("PYMC_BART_TPU_PALLAS", "0")
    want, want_vi = pg_mod.pgbart_step(
        key, state, X, Y, rules, cfg, pg, loglik, (Y, gauss_w),
        tuning=False, gauss_w=gauss_w)

    monkeypatch.setenv("PYMC_BART_TPU_PALLAS", "1")
    got, got_vi = pg_mod.pgbart_step(
        key, state, X, Y, rules, cfg, pg, loglik, (Y, gauss_w),
        tuning=False, gauss_w=gauss_w)

    np.testing.assert_array_equal(np.asarray(want.forest.split_var),
                                  np.asarray(got.forest.split_var))
    np.testing.assert_array_equal(np.asarray(want_vi), np.asarray(got_vi))
    np.testing.assert_allclose(np.asarray(want.forest.split_val),
                               np.asarray(got.forest.split_val),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(want.forest.leaf),
                               np.asarray(got.forest.leaf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(want.forest.slope),
                               np.asarray(got.forest.slope),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(want.forest.count),
                                  np.asarray(got.forest.count))
    np.testing.assert_allclose(np.asarray(want.sum_trees),
                               np.asarray(got.sum_trees),
                               rtol=1e-4, atol=1e-4)
