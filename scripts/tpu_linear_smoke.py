"""TPU smoke + timing for the linear-response per-round Pallas path.

Runs one chain of the per-round sampler (grow_round_pallas with the
round-5 linear sufficient-statistics extension) on friedman data at
bench-like shapes, and the same config with PYMC_BART_TPU_PALLAS=0 for
the XLA comparison when --xla is passed.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.sampler import pgbart

print("backend:", jax.default_backend(), jax.devices())

response = sys.argv[1] if len(sys.argv) > 1 else "linear"
rng = np.random.default_rng(0)
n, p, m = 1000, 10, 50
X = jnp.asarray(rng.uniform(size=(n, p)), jnp.float32)
f = (10 * np.sin(np.pi * np.asarray(X[:, 0]) * np.asarray(X[:, 1]))
     + 20 * (np.asarray(X[:, 2]) - 0.5) ** 2 + 10 * np.asarray(X[:, 3])
     + 5 * np.asarray(X[:, 4]))
Y = jnp.asarray(f + rng.normal(0, 1.0, n), jnp.float32)[:, None]
cfg = BartConfig(m=m, max_depth=6, response=response)
pg = PgbartConfig(num_particles=20, batch=(0.1, 0.1))
rules = jnp.zeros(p, jnp.int32)
gauss_w = jnp.full((n, 1), 1.0, jnp.float32)
state = pgbart.init_state(X, Y, cfg)


def loglik(fv, params):
    y, w = params
    return jnp.sum(-0.5 * w * (y - fv) ** 2)


def chain(key, st, steps, tuning):
    def body(carry, k):
        s, _ = carry
        s, vi = pgbart.pgbart_step(k, s, X, Y, rules, cfg, pg, loglik,
                                   (Y, gauss_w), tuning, gauss_w=gauss_w)
        return (s, vi), None
    keys = jax.random.split(key, steps)
    (st, vi), _ = jax.lax.scan(body, (st, jnp.zeros(p)), keys)
    return st, vi


STEPS = 100
run = jax.jit(lambda k, s: chain(k, s, STEPS, False))

t0 = time.perf_counter()
st, vi = run(jax.random.PRNGKey(0), state)
jax.block_until_ready(st.sum_trees)
print(f"compile+first {STEPS} steps: {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
st, vi = run(jax.random.PRNGKey(1), st)
jax.block_until_ready(st.sum_trees)
dt = time.perf_counter() - t0
rmse = float(np.sqrt(np.mean((np.asarray(st.sum_trees)[:, 0] - f) ** 2)))
print(f"steady ({response}): {STEPS/dt:.1f} draws/s (1 chain)  "
      f"rmse={rmse:.3f}")
print("vi:", np.asarray(vi).astype(int))
