"""Posterior tree storage and the fused sum-of-trees prediction driver.

Replaces the reference's per-instance ``Manager().list()`` of TreeArrays
(reference ``pymc_bart/bart.py:130-132``) with device-array stacks of the
whole posterior forest, and the reference's Python loop
``for sample: for tree: pred += tree.predict(X)``
(reference ``pymc_bart/utils.py:92-94``) with one vmapped gather kernel
over the selected draws.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import BartConfig
from ..ops.predict import forest_predict, forest_predict_excluded
from ..ops.trees import Forest


@dataclasses.dataclass
class PosteriorForests:
    """All sampled forests of one BART RV: arrays (chains, draws, m, S[, k]).

    This is the ``all_trees`` equivalent attached to a fitted BART RV.
    """

    split_var: np.ndarray
    split_val: np.ndarray
    split_set: np.ndarray
    leaf: np.ndarray
    count: np.ndarray
    slope: np.ndarray
    config: BartConfig
    rules: np.ndarray  # int32[p]
    X_train: np.ndarray

    @property
    def n_chains(self) -> int:
        return self.split_var.shape[0]

    @property
    def n_draws(self) -> int:
        return self.split_var.shape[1]

    @property
    def n_total(self) -> int:
        return self.n_chains * self.n_draws

    @property
    def n_outputs(self) -> int:
        return self.leaf.shape[-1]

    def flat(self) -> "PosteriorForests":
        """Merge (chains, draws) into one draw axis."""
        def f(a):
            return a.reshape((-1,) + a.shape[2:])
        return dataclasses.replace(
            self, split_var=f(self.split_var), split_val=f(self.split_val),
            split_set=f(self.split_set), leaf=f(self.leaf), count=f(self.count),
            slope=f(self.slope),
        )

    def select(self, idx: np.ndarray) -> Forest:
        """Gather draws by flat index into a stacked Forest (len(idx), m, S)."""
        src = self.flat() if self.split_var.ndim == 4 else self
        return Forest(
            jnp.asarray(src.split_var[idx]),
            jnp.asarray(src.split_val[idx]),
            jnp.asarray(src.split_set[idx]),
            jnp.asarray(src.leaf[idx]),
            jnp.asarray(src.count[idx]),
            jnp.asarray(src.slope[idx]),
        )


@partial(jax.jit, static_argnames=("depth",))
def _predict_draws(forests: Forest, X, rules, depth: int):
    """(draws, m, S) forests -> (draws, n, k) sum-of-trees predictions."""
    return jax.vmap(lambda sv, sl, ss, lf, ct, sp: forest_predict(
        Forest(sv, sl, ss, lf, ct, sp), X, rules, depth))(
        forests.split_var, forests.split_val, forests.split_set,
        forests.leaf, forests.count, forests.slope)


@partial(jax.jit, static_argnames=("depth",))
def _predict_draws_excluded(forests: Forest, X, rules, excluded_mask, depth: int):
    return jax.vmap(lambda sv, sl, ss, lf, ct, sp: forest_predict_excluded(
        Forest(sv, sl, ss, lf, ct, sp), X, rules, excluded_mask, depth))(
        forests.split_var, forests.split_val, forests.split_set,
        forests.leaf, forests.count, forests.slope)


def predict_draw_indices(all_trees: PosteriorForests, X, idx,
                         excluded: Optional[Sequence[int]] = None) -> np.ndarray:
    """Predictions of specific flat draw indices: (len(idx), n, k)."""
    X = jnp.asarray(np.ascontiguousarray(np.asarray(X, np.float32)))
    rules = jnp.asarray(all_trees.rules)
    sel = all_trees.select(np.asarray(idx))
    depth = all_trees.config.max_depth
    if excluded is not None and len(excluded) > 0:
        mask = np.zeros(X.shape[1], bool)
        mask[np.asarray(excluded, int)] = True
        out = _predict_draws_excluded(sel, X, rules, jnp.asarray(mask), depth)
    else:
        out = _predict_draws(sel, X, rules, depth)
    return np.asarray(out)


@partial(jax.jit, static_argnames=("depth",))
def _predict_draws_multimask(forests: Forest, X, rules, masks, depth: int):
    """vmap the excluded-predict over a batch of exclusion masks:
    (n_masks, p) bool -> (n_masks, draws, n, k).  One device program
    computes every mask's predictions (e.g. all PDP panels at once)."""
    return jax.vmap(
        lambda mask: _predict_draws_excluded(forests, X, rules, mask, depth)
    )(masks)


def predict_draw_indices_multimask(all_trees: PosteriorForests, X, idx,
                                   masks: np.ndarray) -> np.ndarray:
    """Predictions of flat draw indices under several exclusion masks.

    masks: bool (n_masks, p).  Returns (n_masks, len(idx), n, k).
    """
    X = jnp.asarray(np.ascontiguousarray(np.asarray(X, np.float32)))
    rules = jnp.asarray(all_trees.rules)
    sel = all_trees.select(np.asarray(idx))
    out = _predict_draws_multimask(sel, X, rules, jnp.asarray(masks),
                                   all_trees.config.max_depth)
    return np.asarray(out)


def sample_posterior(all_trees, X, rng=None, size=None,
                     excluded: Optional[Sequence[int]] = None) -> np.ndarray:
    """Generate samples from the BART posterior — reference
    ``_sample_posterior`` semantics (reference ``pymc_bart/utils.py:29-96``):
    draw indices are chosen uniformly at random from the stored draws, and
    the result has shape ``(*size, n_obs, n_outputs)``.

    ``all_trees`` may be a single ``PosteriorForests`` or a list of them
    (one per output — the reference's list-of-RVs layout,
    ``utils.py:70-85``).
    """
    if rng is None:
        rng = np.random.default_rng()
    if size is None:
        size_iter = ()
    elif isinstance(size, int):
        size_iter = (size,)
    else:
        size_iter = tuple(size)
    flatten_size = int(np.prod(size_iter)) if size_iter else 1

    if isinstance(all_trees, (list, tuple)):
        n_out = len(all_trees)
        parts = []
        for pf in all_trees:
            idx = rng.integers(0, pf.n_total, size=flatten_size)
            pred = predict_draw_indices(pf, X, idx, excluded)  # (fs, n, k=1)
            parts.append(pred[..., 0])
        stacked = np.stack(parts, axis=-1)  # (fs, n, n_out)
        return stacked.reshape((*size_iter, -1, n_out))

    idx = rng.integers(0, all_trees.n_total, size=flatten_size)
    pred = predict_draw_indices(all_trees, X, idx, excluded)  # (fs, n, k)
    return pred.reshape((*size_iter, -1, all_trees.n_outputs))
