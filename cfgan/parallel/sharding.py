"""Sharding helpers: batch-sharded activations, replicated parameters.

Training steps are compiled with `jax.jit` under a mesh: the batch is laid
out along the "data" axis, parameters/optimizer state are replicated, and XLA
inserts the gradient `psum` over ICI automatically during sharding
propagation.  (The PyTorch reference has no parallelism at all to translate —
this layer is designed from the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives.)
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_sharding(mesh: Mesh, axis: str = "data", ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dimension over `axis`; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place every array in `tree` with its leading dim sharded over `axis`."""

    def _put(x):
        return jax.device_put(x, batch_sharding(mesh, axis, x.ndim))

    return jax.tree_util.tree_map(_put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params / optimizer state) over the mesh."""
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
