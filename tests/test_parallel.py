"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

import pymc_bart_tpu as pmb
from pymc_bart_tpu.parallel import mesh as pmesh


def test_make_mesh_axes():
    mesh = pmesh.make_mesh()
    assert mesh.axis_names == ("chains", "data")
    assert mesh.devices.size == len(jax.devices())
    mesh2 = pmesh.make_mesh(n_chain_shards=4, n_data_shards=2)
    assert mesh2.devices.shape == (4, 2)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sample_sharded_chains():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 2))
    Y = rng.normal(size=40)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("chains",))
    with pmb.Model():
        mu = pmb.BART("mu", X, Y, m=4, max_depth=3)
        sigma = pmb.HalfNormal("sigma", 1.0)
        pmb.Normal("y", mu, sigma, observed=Y)
        idata = pmb.sample(tune=5, draws=5, chains=8, random_seed=0,
                           num_particles=4, mesh=mesh)
    assert idata.posterior["mu"].shape == (8, 5, 40)
    # chains must differ (independent streams)
    mus = idata.posterior["mu"].values[:, -1, :]
    assert np.unique(mus.round(4), axis=0).shape[0] > 1
