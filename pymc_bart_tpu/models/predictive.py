"""Posterior-predictive sampling, including out-of-sample prediction.

Reference call stack (SURVEY 3.3): ``pm.sample_posterior_predictive``
invokes ``BARTRV.rng_fn`` which predicts with the stored trees on the
op's covariates — so out-of-sample prediction works by mutating a
``pm.Data`` container (reference bart.py:47-65, tests/test_bart.py:84-104).
Here: if a BART variable's ``Data`` covariates changed since sampling,
its posterior values are recomputed draw-for-draw from the stored
forests with one fused vmapped kernel; observation nodes are then
sampled per draw with a vmapped RNG.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.posterior import predict_draw_indices
from .expr import evaluate
from .inference_data import DataArray, Dataset, InferenceData
from .model import Model


def sample_prior_predictive(
    samples: int = 500,
    model: Optional[Model] = None,
    var_names=None,
    random_seed: Optional[int] = None,
) -> InferenceData:
    """Sample free RVs from their priors and the observation nodes given
    those draws (the ``pm.sample_prior_predictive`` surface).

    A BART variable contributes its pre-sampling support value — the
    constant ``Y.mean()`` vector — exactly as the reference's ``rng_fn``
    does before any trees exist (reference pymc_bart/bart.py:54-63: with
    ``all_trees`` empty it returns ``np.full(size, self.Y.mean())``).

    Returns an InferenceData with ``prior`` (free RVs, BART values,
    deterministics) and ``prior_predictive`` (observed nodes) groups,
    each shaped (chain=1, draw=samples, ...).
    """
    model = Model.get_context(model)
    if random_seed is None:
        random_seed = np.random.default_rng().integers(0, 2**31 - 1)
    key = jax.random.PRNGKey(int(random_seed))

    data_env = {name: jnp.asarray(d.get_value(), jnp.float32)
                for name, d in model.data_vars.items()}
    bart_vals = {
        brv.name: jnp.full(brv.shape, float(np.mean(brv.Y)), jnp.float32)
        for brv in model.bart_rvs
    }

    def one_draw(k):
        env = dict(data_env)
        env.update(bart_vals)
        out = dict(bart_vals)
        n_nodes = len(model.free_rvs) + len(model.observed_rvs)
        keys = jax.random.split(k, max(n_nodes, 1))
        ki = 0
        for rv in model.free_rvs:  # declaration order = dependency order
            params = tuple(evaluate(p, env) for p in rv.params)
            val = rv.dist.sample(keys[ki], rv.shape or (), *params)
            ki += 1
            env[rv.name] = val
            out[rv.name] = val
        for det in model.deterministics:
            env[det.name] = evaluate(det.expr, env)
            out[det.name] = env[det.name]
        obs_out = {}
        for orv in model.observed_rvs:
            params = tuple(evaluate(p, env) for p in orv.params)
            if orv.dist.__name__ == "CategoricalDist":
                shape = np.shape(orv.observed)
            else:
                shape = tuple(orv.observed.shape)
                params = tuple(jnp.broadcast_to(p, shape) for p in params)
            obs_out[orv.name] = orv.dist.sample(keys[ki], shape, *params)
            ki += 1
        return out, obs_out

    prior_d, pp_d = jax.vmap(one_draw)(jax.random.split(key, samples))
    prior_d = jax.device_get(prior_d)
    pp_d = jax.device_get(pp_d)

    def to_ds(d: Dict[str, np.ndarray]) -> Dataset:
        group_vars = {}
        for name, v in d.items():
            if var_names is not None and name not in var_names:
                continue
            v = np.asarray(v)[None]  # (chain=1, draw, ...)
            dims = ["chain", "draw"] + [
                f"{name}_dim_{i}" for i in range(v.ndim - 2)]
            group_vars[name] = DataArray(v, dims, name=name)
        return Dataset(group_vars)

    out = InferenceData()
    out.add_group("prior", to_ds(prior_d))
    out.add_group("prior_predictive", to_ds(pp_d))
    out._model = model
    return out


def sample_posterior_predictive(
    idata: InferenceData,
    model: Optional[Model] = None,
    var_names=None,
    sample_vars=None,
    predictions: bool = False,
    extend_inferencedata: bool = True,
    random_seed: Optional[int] = None,
) -> InferenceData:
    """Sample the observation nodes given posterior draws.

    ``sample_vars`` (reference tests/test_bart.py:101) may include BART
    variable names to also return their (possibly recomputed
    out-of-sample) values.
    """
    if model is None:
        model = getattr(idata, "_model", None)
    model = Model.get_context(model)
    if random_seed is None:
        random_seed = np.random.default_rng().integers(0, 2**31 - 1)
    key = jax.random.PRNGKey(int(random_seed))

    requested = sample_vars or var_names

    post = idata.posterior
    some = next(iter(post.keys()))
    chains, draws = post[some].values.shape[:2]
    total = chains * draws

    # flattened posterior environment
    env_flat: Dict[str, np.ndarray] = {}
    for name in post.keys():
        v = np.asarray(post[name].values)
        env_flat[name] = v.reshape((total,) + v.shape[2:])

    # recompute BART values if covariates changed (out-of-sample)
    for brv in model.bart_rvs:
        X_cur = np.asarray(brv.current_X(), np.float64)
        pf = brv.all_trees
        if pf is None:
            continue
        ref = pf[0] if isinstance(pf, list) else pf
        # NaN-aware equality: nan_to_num would conflate a NaN covariate
        # with a literal 0.0 and silently reuse stale in-sample values
        same = (X_cur.shape == ref.X_train.shape) and np.array_equal(
            np.asarray(X_cur, np.float32), np.asarray(ref.X_train, np.float32),
            equal_nan=True,
        )
        if not same:
            idx = np.arange(ref.n_total)
            if isinstance(pf, list):  # separate trees: one store per output
                pred = np.concatenate(
                    [predict_draw_indices(p_, X_cur, idx) for p_ in pf],
                    axis=-1)  # (total, n_new, k)
            else:
                pred = predict_draw_indices(pf, X_cur, idx)
            if len(brv.shape) == 1:
                env_flat[brv.name] = pred[..., 0]
            else:
                env_flat[brv.name] = np.swapaxes(pred, -1, -2)

    data_env = {name: jnp.asarray(d.get_value(), jnp.float32)
                for name, d in model.data_vars.items()}

    target_obs = [
        orv for orv in model.observed_rvs
        if requested is None or orv.name in requested
    ]

    def one_draw(env_draw, k):
        env = dict(data_env)
        env.update(env_draw)
        for det in model.deterministics:
            env[det.name] = evaluate(det.expr, env)
        out = {}
        keys = jax.random.split(k, max(len(target_obs), 1))
        for i, orv in enumerate(target_obs):
            params = tuple(evaluate(p, env) for p in orv.params)
            shapes = [np.shape(p) if not hasattr(p, "shape") else p.shape
                      for p in params]
            if orv.dist.__name__ == "CategoricalDist":
                shape = shapes[0][:-1]
            else:
                try:
                    shape = np.broadcast_shapes(*shapes, orv.observed.shape)
                except ValueError:
                    shape = np.broadcast_shapes(*shapes)
            params = tuple(
                jnp.broadcast_to(p, shape) if orv.dist.__name__ != "CategoricalDist"
                else p
                for p in params
            )
            out[orv.name] = orv.dist.sample(keys[i], shape, *params)
        return out

    env_flat_j = {k_: jnp.asarray(v) for k_, v in env_flat.items()}
    draw_keys = jax.random.split(key, total)
    sampled = jax.vmap(one_draw)(env_flat_j, draw_keys)
    sampled = jax.device_get(sampled)

    group_vars: Dict[str, DataArray] = {}
    for name, v in sampled.items():
        v = np.asarray(v).reshape((chains, draws) + np.asarray(v).shape[1:])
        dims = ["chain", "draw"] + [f"{name}_dim_{i}" for i in range(v.ndim - 2)]
        group_vars[name] = DataArray(v, dims, name=name)
    # include requested non-observed vars (e.g. recomputed BART values)
    if requested is not None:
        for name in requested:
            if name in group_vars or name not in env_flat:
                continue
            v = env_flat[name].reshape((chains, draws) + env_flat[name].shape[1:])
            dims = ["chain", "draw"] + [f"{name}_dim_{i}" for i in range(v.ndim - 2)]
            group_vars[name] = DataArray(v, dims, name=name)

    group_name = "predictions" if predictions else "posterior_predictive"
    ds = Dataset(group_vars)
    if extend_inferencedata:
        idata.add_group(group_name, ds)
        return idata
    out = InferenceData()
    out.add_group(group_name, ds)
    return out
