"""Per-node sufficient statistics as MXU-friendly one-hot matmuls.

The particle-growth kernel needs, per particle per round, the row count and
residual sum of every node slot (SURVEY 7.3 item 3: "per-leaf sufficient
statistics at speed").  Instead of scatter-adds (slow on TPU), rows are
binned with a one-hot membership matrix and reduced on the MXU:

    onehot[n, S] = (leaf_idx[:, None] == iota[None, :])
    counts[S]    = sum_n onehot
    sums[S, k]   = onehot^T @ R
"""

from __future__ import annotations

import jax.numpy as jnp


def node_stats(leaf_idx, resid, n_nodes: int):
    """Row counts and residual sums per node slot.

    Args:
      leaf_idx: int32[n] node slot of each row.
      resid: float32[n, k] residuals.
      n_nodes: static number of node slots S.

    Returns:
      counts: float32[S]; sums: float32[S, k]
    """
    onehot = (leaf_idx[:, None] == jnp.arange(n_nodes, dtype=jnp.int32)[None, :])
    onehot = onehot.astype(jnp.float32)
    counts = onehot.sum(axis=0)
    sums = jnp.einsum("ns,nk->sk", onehot, resid, preferred_element_type=jnp.float32)
    return counts, sums


def node_counts(leaf_idx, n_nodes: int):
    """Row counts per node slot: float32[S]."""
    onehot = (leaf_idx[:, None] == jnp.arange(n_nodes, dtype=jnp.int32)[None, :])
    return onehot.astype(jnp.float32).sum(axis=0)
