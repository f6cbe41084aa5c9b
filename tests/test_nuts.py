"""NUTS kernel tests: moments on known targets, including a correlated
Gaussian where naive HMC with unit mass struggles."""

import numpy as np
import jax
import jax.numpy as jnp

from pymc_bart_tpu.sampler import nuts


def _run(logp, d, n_tune=400, n_draw=800, seed=0):
    state = nuts.init_state(jnp.zeros(d))
    step = jax.jit(
        lambda k, s, tuning: nuts.nuts_step(k, s, logp, None, tuning=tuning),
        static_argnames="tuning",
    )
    key = jax.random.PRNGKey(seed)
    for _ in range(n_tune):
        key, sub = jax.random.split(key)
        state, _ = step(sub, state, True)
    state = nuts.finalize_adaptation(state)
    draws = []
    for _ in range(n_draw):
        key, sub = jax.random.split(key)
        state, acc = step(sub, state, False)
        draws.append(np.asarray(state.theta))
    return np.stack(draws)


def test_nuts_standard_normal():
    draws = _run(lambda t, _: -0.5 * jnp.sum(t**2), d=3)
    assert np.abs(draws.mean(axis=0)).max() < 0.15
    assert np.abs(draws.std(axis=0) - 1.0).max() < 0.15


def test_nuts_correlated_gaussian():
    cov = np.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logp(t, _):
        return -0.5 * t @ prec @ t

    draws = _run(logp, d=2, seed=1)
    emp_cov = np.cov(draws.T)
    assert abs(emp_cov[0, 1] - 0.9) < 0.2, emp_cov
    assert abs(emp_cov[0, 0] - 1.0) < 0.3, emp_cov


def test_nuts_scale_mismatch():
    # scales differing by 100x: mass adaptation must handle it
    scales = jnp.asarray([0.05, 5.0])

    def logp(t, _):
        return -0.5 * jnp.sum((t / scales) ** 2)

    draws = _run(logp, d=2, seed=2)
    assert abs(draws[:, 0].std() - 0.05) < 0.02
    assert abs(draws[:, 1].std() - 5.0) < 1.5
