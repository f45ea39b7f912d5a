"""Device mesh / runtime layer.

The reference is strictly single-process single-device (SURVEY.md section 2.9:
no torch.distributed, no NCCL/MPI anywhere).  This module is the TPU-native
capability uplift: a `jax.sharding.Mesh` over all chips of a slice, with the
batch ("data") axis as the default parallel axis.  Collectives ride ICI via
XLA's sharding propagation; multi-host pods initialize over DCN through
`jax.distributed.initialize`.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def local_device_count() -> int:
    return jax.local_device_count()


def create_mesh(
    mesh_shape: tuple[int, ...] | None = None,
    axis_names: tuple[str, ...] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    With the default 1-D ("data",) mesh this gives pure batch data
    parallelism; the models here are a few M parameters, so parameters are
    replicated and gradients reduce over ICI (SURVEY.md section 2.9).  The
    axis layout leaves room for ("data", "model") meshes for larger models.
    """
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        n = len(devices)
        if len(axis_names) == 1:
            mesh_shape = (n,)
        else:
            # fill the first axis, replicate the rest
            mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def multihost_initialize(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Initialize the multi-host (DCN) runtime for pod slices.

    No-op on a single host.  On TPU pods the runtime discovers the topology
    automatically; explicit arguments support CPU/GPU clusters.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
