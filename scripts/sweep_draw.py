"""Ablation sweep of the megakernel: where does the draw time go?

Times pgbart_step_fused (4 vmapped chains, bench shapes) while varying
one knob at a time; the scaling exponents identify the dominant cost.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.ops import draw_pallas
from pymc_bart_tpu.sampler import pgbart

N, P_COV, CHAINS, STEPS = 1000, 10, 4, 40

rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(N, P_COV)), jnp.float32)
Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
rules = jnp.zeros(P_COV, jnp.int32)
gauss_w = jnp.full((N, 1), 1.0, jnp.float32)


def run(tag, m=50, depth=6, particles=20, refinements=5, batch=0.1):
    cfg = BartConfig(m=m, max_depth=depth)
    pg = PgbartConfig(num_particles=particles, batch=(batch, batch),
                      num_refinements=refinements)
    state0 = pgbart.init_state(X, Y, cfg)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (CHAINS,) + a.shape), state0)

    @jax.jit
    def scan(keys, states):
        def body(st, k):
            st, vi = jax.vmap(
                lambda kk, ss: draw_pallas.pgbart_step_fused(
                    kk, ss, X, Y, rules, cfg, pg, gauss_w, False))(k, st)
            return st, None

        return jax.lax.scan(body, states, keys)[0]

    keys = jnp.stack([jax.random.split(jax.random.PRNGKey(i), CHAINS)
                      for i in range(STEPS)])
    out = scan(keys, states)
    jax.block_until_ready(out.sum_trees)
    t0 = time.perf_counter()
    out = scan(keys, out)
    jax.block_until_ready(out.sum_trees)
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt / STEPS * 1e3:.3f} ms/draw", flush=True)


run("base (m50 D6 P20 R5 B5)")
run("R0   (no refinement)", refinements=0)

run("D5", depth=5)
run("P10", particles=10)

run("B10 (batch 0.2)", batch=0.2)
