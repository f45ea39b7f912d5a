"""Explicit PRNG-key discipline.

The reference relies on global seeding (`torch.manual_seed`,
`np.random.seed`; e.g. `moons/trainer.py:34-36`).  JAX keys are threaded
explicitly; `RngStream` is a tiny convenience for deriving named keys without
ever reusing one.
"""
from __future__ import annotations

import jax


class RngStream:
    """Deterministic named key derivation from a root seed.

    >>> rng = RngStream(42)
    >>> k1 = rng.next("mask")     # unique every call
    >>> kf = rng.fixed("init")    # same key every call (for param init)
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._root = jax.random.key(seed_or_key)
        else:
            self._root = seed_or_key
        self._counts: dict[str, int] = {}

    def fixed(self, name: str) -> jax.Array:
        return jax.random.fold_in(self._root, _stable_hash(name))

    def next(self, name: str = "") -> jax.Array:
        c = self._counts.get(name, 0)
        self._counts[name] = c + 1
        return jax.random.fold_in(self.fixed(name), c)

    def split(self, n: int) -> jax.Array:
        key = self.next("split")
        return jax.random.split(key, n)


def _stable_hash(name: str) -> int:
    # Python's hash() is salted per process; use a simple stable FNV-1a.
    h = 2166136261
    for b in name.encode():
        h = ((h ^ b) * 16777619) & 0x7FFFFFFF
    return h
