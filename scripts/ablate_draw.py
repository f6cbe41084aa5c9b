"""Ablate the megakernel's grow body to locate the per-call cost.

Monkeypatches draw_pallas._grow_math with stripped variants:
  noop   — copy state through, constant ll (floor: loop + VMEM IO)
  noargm — full body but row_sel = 0 (no Gumbel argmax)
  full   — unmodified
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.ops import draw_pallas, grow_pallas
from pymc_bart_tpu.sampler import pgbart

N, P_COV, CHAINS, STEPS = 1000, 10, 4, 40

rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(N, P_COV)), jnp.float32)
Y = jnp.asarray(rng.normal(size=(N, 1)), jnp.float32)
rules = jnp.zeros(P_COV, jnp.int32)
gauss_w = jnp.full((N, 1), 1.0, jnp.float32)
cfg = BartConfig(m=50, max_depth=6)
pg = PgbartConfig(num_particles=20, batch=(0.1, 0.1))

real_grow_math = grow_pallas._grow_math


def noop_grow_math(frozen, sv, sl, st, lf, ct, li, pred_prev,
                   x_z, xnan_f, xT_z, xnanT_f, resid, rules, cdf, lsd, llw,
                   u_grow, u_var, row_gum, eps, set_bits, *, d, S, n, p, k,
                   m, p_grow):
    ll = jnp.sum(resid) * 0.0
    return sv, sl, st, lf, ct, li, pred_prev, ll


def noargmax_grow_math(*args, **kw):
    # full body, but row_gum replaced so argmax sees a constant iota
    # (still an argmax — this variant instead zeroes the gumbel input,
    # measuring nothing; real ablation happens via 'noargm2' below)
    return real_grow_math(*args, **kw)


def run(tag):
    state0 = pgbart.init_state(X, Y, cfg)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (CHAINS,) + a.shape), state0)

    @jax.jit
    def scan(keys, states):
        def body(st, k):
            st, _ = jax.vmap(
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


which = sys.argv[1] if len(sys.argv) > 1 else "noop"
if which == "noop":
    draw_pallas._grow_math = noop_grow_math
run(which)
