"""TPU smoke: vmapped-chain PGBART step on both Pallas paths.

Validates that (a) the whole-draw megakernel and (b) the per-round
grow/SMC/select kernel path compile and execute under a chain vmap on the
real chip — the configuration bench.py times.  Tiny shapes for fast
compiles.  Run: python scripts/tpu_vmap_smoke.py [mega|rounds|both]

``both`` re-execs each mode in its OWN subprocess: the kernel choice is
read from PYMC_BART_TPU_MEGAKERNEL at trace time, so flipping the env
var inside one process would silently reuse the first mode's cached
trace and never exercise the second path.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

mode = sys.argv[1] if len(sys.argv) > 1 else "both"

if mode == "both":
    for sub in ("mega", "rounds", "bign", "bignbern"):
        rc = subprocess.run([sys.executable, os.path.abspath(__file__), sub])
        if rc.returncode != 0:
            sys.exit(rc.returncode)
    sys.exit(0)

import jax
import jax.numpy as jnp

from pymc_bart_tpu.config import BartConfig, PgbartConfig
from pymc_bart_tpu.sampler import pgbart

n, p, chains = 256, 5, 2
rng = np.random.default_rng(0)
X = jnp.asarray(rng.uniform(size=(n, p)).astype(np.float32))
Y = jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32))
rules = jnp.zeros(p, jnp.int32)
cfg = BartConfig(m=4, max_depth=4)
pg = PgbartConfig(num_particles=8, batch=(0.5, 0.5))
gauss_w = jnp.ones((n, 1), jnp.float32)


def loglik(f, params):
    (y,) = params
    return jnp.sum(-0.5 * (y - f) ** 2)


def run(tag, gw, pg_=None, Y_=None, **kw):
    t0 = time.perf_counter()
    pgc = pg_ or pg
    Yv = Y if Y_ is None else Y_

    def step(key, st):
        return pgbart.pgbart_step(key, st, X, Yv, rules, cfg, pgc,
                                  loglik, (Yv,), False, gauss_w=gw, **kw)

    st0 = pgbart.init_state(X, Y, cfg)
    sts = jax.tree.map(lambda a: jnp.broadcast_to(a, (chains,) + a.shape), st0)
    keys = jax.random.split(jax.random.PRNGKey(0), chains)
    sts, vi = jax.jit(jax.vmap(step))(keys, sts)
    jax.block_until_ready(sts.sum_trees)
    print(f"{tag}: OK compile+run {time.perf_counter() - t0:.1f}s "
          f"sum_trees finite={bool(jnp.isfinite(sts.sum_trees).all())} "
          f"vi={np.asarray(vi).sum(1)}")


print("backend:", jax.default_backend(), jax.devices())
if mode == "mega":
    run("megakernel(vmap)", gauss_w)
elif mode == "rounds":
    os.environ["PYMC_BART_TPU_MEGAKERNEL"] = "0"
    run("grow-rounds(vmap)", gauss_w)
elif mode == "bign":
    # force the row-tiled big-n kernel at smoke shapes: explicit BIGN=1
    # overrides the megakernel-coverage early-return when PALLAS=0
    os.environ["PYMC_BART_TPU_BIGN"] = "1"
    os.environ["PYMC_BART_TPU_PALLAS"] = "0"
    run("bign(vmap)", gauss_w, w_scalar=True, all_cont=True, x_nan=False)
elif mode == "bignbern":
    # row-ll regime of the big-n kernel (bernoulli; needs R=0)
    os.environ["PYMC_BART_TPU_BIGN"] = "1"
    os.environ["PYMC_BART_TPU_PALLAS"] = "0"
    pg0 = PgbartConfig(num_particles=8, batch=(0.5, 0.5),
                       num_refinements=0)
    Yb = (Y > 0).astype(jnp.float32)
    run("bign-bernoulli(vmap)", None, pg_=pg0, Y_=Yb, lik="bernoulli",
        all_cont=True, x_nan=False)
else:
    raise SystemExit(f"unknown mode {mode!r}")
