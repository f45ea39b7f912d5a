"""Device-resident data pipeline.

The reference feeds the GPU through multi-worker DataLoaders with per-batch
host->device copies (`mnist/data_utils.py:27`).  On TPU the datasets here are
tiny (MNIST is 47 MB as uint8), so the fastest feed is no feed at all: the
whole dataset lives in HBM, shuffling is a device-side permutation, and the
training loop is a `lax.scan` over batch *indices* — zero host involvement
per step.

`epoch_batches` reproduces DataLoader(shuffle=True, drop_last=True)
semantics: a fresh permutation per epoch, truncated to full batches.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def device_put_dataset(mesh, *arrays):
    """Place dataset arrays replicated in HBM (each chip gathers its own
    batch shard by index, so replication keeps the gather local)."""
    from cfgan.parallel.sharding import replicate

    return tuple(replicate(mesh, jnp.asarray(a)) for a in arrays)


def epoch_perm(key, n: int, batch_size: int) -> jnp.ndarray:
    """(steps, batch_size) int32 index matrix for one shuffled epoch."""
    steps = n // batch_size
    perm = jax.random.permutation(key, n)[: steps * batch_size]
    return perm.reshape(steps, batch_size).astype(jnp.int32)


def num_steps(n: int, batch_size: int) -> int:
    return n // batch_size


class HostIterator:
    """Simple host-side minibatch iterator for non-scanned loops (eval)."""

    def __init__(self, arrays, batch_size: int, shuffle: bool = False, seed: int = 0,
                 drop_last: bool = False):
        self.arrays = [np.asarray(a) for a in arrays]
        self.n = len(self.arrays[0])
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)

    def __iter__(self):
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        end = (self.n // self.batch_size) * self.batch_size if self.drop_last else self.n
        for lo in range(0, end, self.batch_size):
            sel = idx[lo : lo + self.batch_size]
            yield tuple(a[sel] for a in self.arrays)

    def __len__(self):
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)


class DevicePrefetcher:
    """Host->HBM double-buffered prefetch for datasets that do NOT fit in
    device memory (the TPU-native replacement for the reference's
    multi-worker DataLoader + pinned-memory copies, SURVEY.md section 2.9).

    `jax.device_put` dispatches asynchronously, so keeping `buffer_size`
    in-flight transfers ahead of the consumer overlaps PCIe/host work with
    device compute — the same effect as torch's pin_memory+non_blocking
    without threads."""

    def __init__(self, host_iter, buffer_size: int = 2, sharding=None):
        self.host_iter = host_iter
        self.buffer_size = max(1, buffer_size)
        self.sharding = sharding

    def _put(self, batch):
        if self.sharding is not None:
            return tuple(jax.device_put(a, self.sharding) for a in batch)
        return tuple(jax.device_put(a) for a in batch)

    def __iter__(self):
        import collections

        queue = collections.deque()
        it = iter(self.host_iter)
        try:
            for _ in range(self.buffer_size):
                queue.append(self._put(next(it)))
        except StopIteration:
            pass
        while queue:
            out = queue.popleft()
            try:
                queue.append(self._put(next(it)))
            except StopIteration:
                pass
            yield out

    def __len__(self):
        return len(self.host_iter)
