"""Multi-host rehearsal: 2-process ``jax.distributed`` CPU run.

Real pods are unavailable in CI, but ``jax.distributed`` works
multi-process on CPU: two subprocesses with 4 virtual devices each form
a global 8-device mesh, ``initialize_distributed`` brings the cluster
up, and ``sample()`` runs chains over the global "chains" axis with the
posterior gathered to every host over the (simulated) DCN
(SURVEY 5.8; BASELINE scaling target).  The multi-host result must be
IDENTICAL to a single-process 8-device run — chains are keyed by
fold_in(root_key, chain), so placement cannot change the draws.

Skipped automatically when localhost sockets are unavailable.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from pymc_bart_tpu.parallel.mesh import initialize_distributed
initialize_distributed(coordinator_address=f"localhost:{port}",
                       num_processes=2, process_id=pid)
import numpy as np
from jax.sharding import Mesh
import pymc_bart_tpu as pmb

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4
mesh = Mesh(np.array(jax.devices()), ("chains",))

rng = np.random.default_rng(0)
X = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
Y = (2 * np.sin(3 * X[:, 0]) + 0.3 * rng.normal(size=64)).astype(np.float32)
with pmb.Model():
    mu = pmb.BART("mu", X, Y, m=5)
    pmb.Normal("y", mu, 0.5, observed=Y)
    idata = pmb.sample(tune=20, draws=20, chains=8, random_seed=0,
                       mesh=mesh, store_trees=False)
post = idata.posterior["mu"].values
assert post.shape == (8, 20, 64)
np.save(os.path.join(outdir, f"mh_{pid}.npy"), post)
print("MULTIHOST_OK", pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    try:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
    finally:
        s.close()


@pytest.mark.slow
def test_two_process_sample_matches_single_process(tmp_path):
    try:
        port = _free_port()
    except OSError:
        pytest.skip("localhost sockets unavailable")
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        if pr.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"distributed runtime unavailable: {out[-400:]}")
        assert pr.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {pid}" in out

    # both hosts hold the FULL gathered posterior, and it equals the
    # single-process 8-device run bit-for-bit
    post0 = np.load(tmp_path / "mh_0.npy")
    post1 = np.load(tmp_path / "mh_1.npy")
    np.testing.assert_array_equal(post0, post1)

    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices for the single-process check")
    import pymc_bart_tpu as pmb

    mesh = Mesh(np.array(jax.devices()[:8]), ("chains",))
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    Y = (2 * np.sin(3 * X[:, 0]) + 0.3 * rng.normal(size=64)
         ).astype(np.float32)
    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=5)
        pmb.Normal("y", mu, 0.5, observed=Y)
        idata = pmb.sample(tune=20, draws=20, chains=8, random_seed=0,
                           mesh=mesh, store_trees=False)
    np.testing.assert_allclose(idata.posterior["mu"].values, post0,
                               rtol=1e-6, atol=1e-6)
