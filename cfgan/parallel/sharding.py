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


def channel_sharding_spec(mesh: Mesh, tree, axis: str = "model",
                          min_dim: int = 2):
    """NamedSharding tree that shards each float leaf's LAST dimension
    (output channels / features) over `axis` when divisible, replicating
    everything else — a weight-sharded (tensor/FSDP-style) layout for the
    2-D ("data", "model") mesh.  XLA inserts the all-gathers/reduce-scatters
    during sharding propagation."""
    size = mesh.shape[axis]

    def spec(x):
        if (
            hasattr(x, "ndim") and x.ndim >= 1
            and hasattr(x, "shape") and x.shape[-1] % size == 0
            and x.shape[-1] >= min_dim * size
        ):
            return NamedSharding(
                mesh, P(*([None] * (x.ndim - 1) + [axis]))
            )
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, tree)


def shard_leaves(tree, sharding_tree):
    return jax.tree_util.tree_map(jax.device_put, tree, sharding_tree)
