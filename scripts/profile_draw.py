"""Decompose the per-draw time of the fused megakernel path on TPU.

Times (per draw, 4 vmapped chains, bench.py shapes):
  (a) the full pgbart_step_fused scan        — what bench.py measures
  (b) the batched RNG block generation alone — _rands_batched
  (c) split_var_counts alone
  (d) a scan over the bare pallas_call with pre-drawn randoms
so (a) - (b) - (c) ~ kernel time and the rest is glue.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.sampler import pgbart
from pymc_bart_tpu.ops import draw_pallas

N, P_COV, M, PARTICLES, CHAINS, STEPS = 1000, 10, 50, 20, 4, 100

rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(N, P_COV)), jnp.float32)
Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
cfg = BartConfig(m=M, max_depth=6)
pg = PgbartConfig(num_particles=PARTICLES, batch=(0.1, 0.1))
rules = jnp.zeros(P_COV, jnp.int32)
gauss_w = jnp.full((N, 1), 1.0, jnp.float32)

state0 = pgbart.init_state(X, Y, cfg)
states = jax.tree.map(lambda a: jnp.broadcast_to(a, (CHAINS,) + a.shape), state0)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / STEPS * 1e3:.3f} ms/draw ({dt:.3f}s total)")
    return out


# (a) full step scan
@jax.jit
def full_scan(keys, states):
    def body(st, k):
        st, vi = jax.vmap(
            lambda kk, ss: draw_pallas.pgbart_step_fused(
                kk, ss, X, Y, rules, cfg, pg, gauss_w, False,
                rng_mode="kernel"))(k, st)
        return st, vi

    return jax.lax.scan(body, states, keys)[0]


keys = jnp.stack([jax.random.split(jax.random.PRNGKey(i), CHAINS)
                  for i in range(STEPS)])
timeit("full step", full_scan, keys, states)

# (b) RNG alone
B = pg.batch_size(M, False)
D = cfg.max_depth
Gtot = 2 ** D - 1
R = max(pg.num_refinements, 1)


@jax.jit
def rng_scan(keys):
    def body(c, k):
        out = jax.vmap(lambda kk: draw_pallas._rands_batched(
            kk, B, PARTICLES, D, N, Gtot, R, cfg.n_nodes,
            pg.num_refinements))(k)
        return c, jax.tree.map(lambda a: a.sum(), out)

    return jax.lax.scan(body, 0.0, keys)[1]


timeit("rng alone", rng_scan, keys)


# (c) split_var_counts alone
@jax.jit
def vi_scan(states):
    def body(c, _):
        vi = jax.vmap(lambda f: pgbart.split_var_counts(f, P_COV))(states.forest)
        return c + vi.sum(), None

    return jax.lax.scan(body, 0.0, jnp.arange(STEPS))[0]


timeit("split_var_counts", vi_scan, states)
