"""Round-3 megakernel generalizations.

1. CHAIN BATCHING: ``jax.vmap`` over ``pgbart_step_fused`` must route all
   chains into ONE kernel instance (via the custom_vmap rule) and compute
   per-chain results identical to separate per-chain calls.
2. FUSED LIKELIHOOD CODES: the bernoulli / heteroscedastic megakernel
   paths are bit-comparable to the plain-XLA sampler path under
   ``rng_mode="reference"`` (same key-split sequence, same closed forms).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.ops.draw_pallas import pgbart_step_fused
from pymc_bart_tpu.sampler import pgbart


def _setup(seed=0, n=48, p=3, m=6, depth=3, particles=4, kind="gauss"):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(size=(n, p)).astype(np.float32))
    f_true = np.sin(3 * np.asarray(X[:, 0]))
    if kind == "bernoulli":
        Y = jnp.asarray(
            rng.binomial(1, 1 / (1 + np.exp(-3 * f_true))).astype(np.float32)
        )[:, None]
    else:
        Y = jnp.asarray(
            f_true + 0.1 * rng.normal(size=n), jnp.float32)[:, None]
    cfg = BartConfig(m=m, max_depth=depth)
    pg = PgbartConfig(num_particles=particles, batch=(0.5, 0.5))
    rules = jnp.zeros(p, jnp.int32)
    state = pgbart.init_state(X, Y, cfg)
    return X, Y, cfg, pg, rules, state


def _stack(state, C):
    return jax.tree.map(lambda a: jnp.broadcast_to(a, (C,) + a.shape), state)


def _assert_states_equal(want, got, c=None):
    pick = (lambda a: a) if c is None else (lambda a: np.asarray(a)[c])
    np.testing.assert_array_equal(np.asarray(want.forest.split_var),
                                  pick(got.forest.split_var))
    np.testing.assert_array_equal(np.asarray(want.forest.split_set),
                                  pick(got.forest.split_set))
    np.testing.assert_array_equal(np.asarray(want.forest.count),
                                  pick(got.forest.count))
    np.testing.assert_allclose(np.asarray(want.forest.leaf),
                               pick(got.forest.leaf), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(want.sum_trees),
                               pick(got.sum_trees), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(want.alpha_vec),
                               pick(got.alpha_vec), rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(want.leaf_sd),
                               pick(got.leaf_sd), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("tuning", [False, True])
def test_vmapped_chains_match_per_chain_calls(tuning):
    """vmap over (key, state) == independent per-chain megakernel calls."""
    C = 3
    X, Y, cfg, pg, rules, state = _setup()
    gauss_w = jnp.full((X.shape[0], 1), 4.0, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(11), C)
    states = _stack(state, C)

    got_state, got_vi = jax.vmap(
        lambda k, s: pgbart_step_fused(
            k, s, X, Y, rules, cfg, pg, gauss_w, tuning)
    )(keys, states)

    for c in range(C):
        want_state, want_vi = pgbart_step_fused(
            keys[c], state, X, Y, rules, cfg, pg, gauss_w, tuning)
        _assert_states_equal(want_state, got_state, c)
        np.testing.assert_array_equal(np.asarray(want_vi),
                                      np.asarray(got_vi)[c])


def test_vmap_routes_to_one_chain_batched_kernel(monkeypatch):
    """The custom_vmap rule must fire (one C-chain kernel instance), and
    must keep firing when the vmap sits under jit + scan (the sample()
    composition)."""
    import pymc_bart_tpu.ops.draw_pallas as dp

    calls = []
    orig = dp._chains_impl

    def spy(keys, *a, **k):
        calls.append(keys.shape[0])
        return orig(keys, *a, **k)

    monkeypatch.setattr(dp, "_chains_impl", spy)
    C = 3
    X, Y, cfg, pg, rules, state = _setup()
    gauss_w = jnp.full((X.shape[0], 1), 4.0, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), C)
    states = _stack(state, C)

    @jax.jit
    def two_steps(keys, states):
        def body(carry, _):
            ks, ss = carry
            ks2 = jax.vmap(lambda k_: jax.random.split(k_)[0])(ks)
            ss2, vi = jax.vmap(
                lambda k, s: pgbart_step_fused(
                    k, s, X, Y, rules, cfg, pg, gauss_w, False)
            )(ks2, ss)
            return (ks2, ss2), vi

        (_, ss), vis = jax.lax.scan(body, (keys, states), None, length=2)
        return ss, vis

    ss, vis = two_steps(keys, states)
    jax.block_until_ready(ss.sum_trees)
    # custom_vmap traces the unbatched fun once for output structure
    # (a C=1 call); the batch rule must then fire with the full C
    assert calls, "custom_vmap rule did not fire under jit+scan"
    assert max(calls) == C
    assert vis.shape == (2, C, X.shape[1])


@pytest.mark.parametrize("lik,tuning", [("bernoulli", False),
                                        ("bernoulli", True),
                                        ("het_abs", False),
                                        ("het_exp", False)])
def test_megakernel_fused_likelihoods_match_xla_path(lik, tuning,
                                                     monkeypatch):
    """Non-Gaussian fused codes: megakernel (rng_mode="reference") vs the
    plain-XLA sampler path — tree STRUCTURE exact, values tight."""
    monkeypatch.setenv("PYMC_BART_TPU_PALLAS", "0")
    monkeypatch.setenv("PYMC_BART_TPU_MEGAKERNEL", "0")
    kind = "bernoulli" if lik == "bernoulli" else "gauss"
    X, Y, cfg, pg, rules, state = _setup(seed=2, kind=kind)
    n = X.shape[0]
    if lik == "bernoulli":
        gauss_w = None
        lik_const = 0.0
    else:
        mu0 = jnp.zeros((n, 1), jnp.float32)
        gauss_w = (Y - mu0) ** 2
        lik_const = 0.05 if lik == "het_abs" else 0.0
    key = jax.random.PRNGKey(9)

    def dummy_loglik(f, params):
        raise AssertionError("closed form should be used")

    want_state, want_vi = pgbart.pgbart_step(
        key, state, X, Y, rules, cfg, pg, dummy_loglik, None, tuning,
        gauss_w=gauss_w, lik=lik, lik_const=lik_const)

    got_state, got_vi = pgbart_step_fused(
        key, state, X, Y, rules, cfg, pg, gauss_w, tuning,
        rng_mode="reference", lik=lik, lik_const=lik_const)

    np.testing.assert_array_equal(np.asarray(want_state.forest.split_var),
                                  np.asarray(got_state.forest.split_var))
    np.testing.assert_array_equal(np.asarray(want_state.forest.split_set),
                                  np.asarray(got_state.forest.split_set))
    np.testing.assert_array_equal(np.asarray(want_vi), np.asarray(got_vi))
    np.testing.assert_array_equal(np.asarray(want_state.forest.count),
                                  np.asarray(got_state.forest.count))
    np.testing.assert_allclose(np.asarray(want_state.forest.leaf),
                               np.asarray(got_state.forest.leaf),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(want_state.sum_trees),
                               np.asarray(got_state.sum_trees),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(want_state.alpha_vec),
                               np.asarray(got_state.alpha_vec))


def test_bernoulli_megakernel_learns():
    """Multi-step smoke on the fused bernoulli path: training accuracy of
    the sign of the logits beats chance after a few dozen steps."""
    X, Y, cfg, pg, rules, state = _setup(seed=5, n=64, m=8,
                                         kind="bernoulli")
    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, k = jax.random.split(key)
        state, _ = pgbart_step_fused(
            k, state, X, Y, rules, cfg, pg, None, tuning=(i < 15),
            lik="bernoulli")
    logits = np.asarray(state.sum_trees)[:, 0]
    acc = float(((logits > 0) == (np.asarray(Y)[:, 0] > 0.5)).mean())
    assert np.isfinite(logits).all()
    assert acc > 0.6


def test_wide_p_megakernel_matches_xla_path(monkeypatch):
    """p > 32 (the round-2 gate) now runs in-kernel via the per-node CDF
    compare-count; equivalence against the XLA path at p = 40.  Uses the
    bernoulli code because its XLA selection path is kernel-aligned."""
    monkeypatch.setenv("PYMC_BART_TPU_PALLAS", "0")
    monkeypatch.setenv("PYMC_BART_TPU_MEGAKERNEL", "0")
    X, Y, cfg, pg, rules, state = _setup(seed=3, n=40, p=40,
                                         kind="bernoulli")
    key = jax.random.PRNGKey(4)

    def dummy_loglik(f, params):
        raise AssertionError("closed form should be used")

    want_state, want_vi = pgbart.pgbart_step(
        key, state, X, Y, rules, cfg, pg, dummy_loglik, None, False,
        gauss_w=None, lik="bernoulli")
    got_state, got_vi = pgbart_step_fused(
        key, state, X, Y, rules, cfg, pg, None, False,
        rng_mode="reference", lik="bernoulli")
    np.testing.assert_array_equal(np.asarray(want_state.forest.split_var),
                                  np.asarray(got_state.forest.split_var))
    np.testing.assert_array_equal(np.asarray(want_vi), np.asarray(got_vi))
    np.testing.assert_allclose(np.asarray(want_state.sum_trees),
                               np.asarray(got_state.sum_trees),
                               rtol=1e-4, atol=1e-4)


def test_specialized_kernel_matches_general():
    """The all_cont / no-NaN static specializations must be bit-equivalent
    to the general kernel on clean continuous data (they only remove ops
    that are no-ops for such data)."""
    X, Y, cfg, pg, rules, state = _setup(seed=7)
    gauss_w = jnp.full((X.shape[0], 1), 4.0, jnp.float32)
    key = jax.random.PRNGKey(3)
    want = pgbart_step_fused(key, state, X, Y, rules, cfg, pg, gauss_w,
                             True, rng_mode="batched")
    got = pgbart_step_fused(key, state, X, Y, rules, cfg, pg, gauss_w,
                            True, rng_mode="batched", all_cont=True,
                            x_nan=False)
    # split_set intentionally differs: the general kernel stores the
    # (unused) random subset masks alongside continuous splits, the
    # specialized kernel stores zeros — routing never reads them for
    # continuous-rule columns.  Everything that matters must be EXACT.
    ws, gs = want[0], got[0]
    np.testing.assert_array_equal(np.asarray(ws.forest.split_var),
                                  np.asarray(gs.forest.split_var))
    np.testing.assert_array_equal(np.asarray(ws.forest.count),
                                  np.asarray(gs.forest.count))
    np.testing.assert_array_equal(np.asarray(ws.forest.split_val),
                                  np.asarray(gs.forest.split_val))
    np.testing.assert_array_equal(np.asarray(ws.forest.leaf),
                                  np.asarray(gs.forest.leaf))
    np.testing.assert_array_equal(np.asarray(ws.sum_trees),
                                  np.asarray(gs.sum_trees))
    np.testing.assert_array_equal(np.asarray(ws.alpha_vec),
                                  np.asarray(gs.alpha_vec))
    np.testing.assert_array_equal(np.asarray(ws.leaf_sd),
                                  np.asarray(gs.leaf_sd))
    np.testing.assert_array_equal(np.asarray(want[1]), np.asarray(got[1]))


def test_megakernel_cat_logit_matches_xla_path(monkeypatch):
    """Separate-trees softmax class update: megakernel vs XLA path."""
    monkeypatch.setenv("PYMC_BART_TPU_PALLAS", "0")
    monkeypatch.setenv("PYMC_BART_TPU_MEGAKERNEL", "0")
    rng = np.random.default_rng(6)
    n, p, k = 48, 3, 3
    X = jnp.asarray(rng.uniform(size=(n, p)).astype(np.float32))
    labels = rng.integers(0, k, n)
    # growth target for class 0: +-2 one-hot column
    Yt = jnp.asarray(4.0 * (labels == 0) - 2.0, jnp.float32)[:, None]
    # logsumexp of the other classes' current (zero) outputs
    logR = jnp.full((n, 1), np.log(k - 1.0), jnp.float32)
    cfg = BartConfig(m=6, max_depth=3)
    pg = PgbartConfig(num_particles=4, batch=(0.5, 0.5))
    rules = jnp.zeros(p, jnp.int32)
    state = pgbart.init_state(X, Yt, cfg)
    key = jax.random.PRNGKey(12)

    def dummy_loglik(f, params):
        raise AssertionError("closed form should be used")

    want_state, want_vi = pgbart.pgbart_step(
        key, state, X, Yt, rules, cfg, pg, dummy_loglik, None, False,
        gauss_w=logR, lik="cat_logit")
    got_state, got_vi = pgbart_step_fused(
        key, state, X, Yt, rules, cfg, pg, logR, False,
        rng_mode="reference", lik="cat_logit")
    np.testing.assert_array_equal(np.asarray(want_state.forest.split_var),
                                  np.asarray(got_state.forest.split_var))
    np.testing.assert_array_equal(np.asarray(want_vi), np.asarray(got_vi))
    np.testing.assert_allclose(np.asarray(want_state.sum_trees),
                               np.asarray(got_state.sum_trees),
                               rtol=1e-4, atol=1e-4)


def test_categorical_separate_trees_e2e():
    """Separate-trees softmax classifier end-to-end: the fused cat_logit
    entries must be detected and the classes recovered."""
    import pymc_bart_tpu as pmb
    from pymc_bart_tpu.sampler.compound import _fused_likelihood

    rng = np.random.default_rng(7)
    n, n_class = 90, 3
    X = rng.normal(size=(n, 3)).astype(np.float32)
    logits = np.stack([2 * X[:, 0], 2 * X[:, 1], -X[:, 0] - X[:, 1]], axis=1)
    Y = np.array([rng.choice(n_class, p=np.exp(l) / np.exp(l).sum())
                  for l in logits]).astype(np.float32)

    with pmb.Model() as model:
        lo = pmb.BART("lo", X, Y, m=8, shape=(n_class, n),
                      separate_trees=True)
        pmb.Categorical("y", p=pmb.math.softmax(lo.T, axis=-1), observed=Y)
        for j in range(n_class):
            det = _fused_likelihood(model, lo, out=j)
            assert det is not None and det["kind"] == "cat_logit", det
        idata = pmb.sample(tune=120, draws=120, chains=1, random_seed=2,
                           batch=(0.5, 0.5))

    post = idata.posterior["lo"].values.mean(axis=(0, 1))  # (3, n)
    acc = float((post.argmax(axis=0) == Y).mean())
    assert acc > 0.6, acc
