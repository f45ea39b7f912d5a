"""Checkpointing: parameter pytrees + model metadata.

Replaces the reference's `torch.save(state_dict)` stage-boundary checkpoints
(`mnist/trainer.py:36,163`, `house trainer.py:121-130`).  Two requirements
carry over:

* stage-level skip-if-exists resume (`mnist/main.py:24-28`), and
* data-normalization statistics are part of the model contract — the house
  pipeline checkpoints its fitted MinMaxScaler with the classifier
  (`house trainer.py:121-130`) because eval and serving need it.

Format: one msgpack file (flax serialization) for the array pytree plus a
JSON sidecar for metadata (normalization stats, class bins, config echo).
Orbax is used when available for sharded/async multi-host checkpoints.
"""
from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class _NumpyJSON(json.JSONEncoder):
    def default(self, o):
        if isinstance(o, (np.integer,)):
            return int(o)
        if isinstance(o, (np.floating,)):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


def save(path: str, tree, metadata: dict[str, Any] | None = None) -> str:
    """Serialize `tree` (any pytree of arrays) to `path` (a directory)."""
    os.makedirs(path, exist_ok=True)
    blob = serialization.to_bytes(_to_host(tree))
    with open(os.path.join(path, "checkpoint.msgpack"), "wb") as f:
        f.write(blob)
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, cls=_NumpyJSON, indent=1)
    return path


def exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "checkpoint.msgpack"))


def restore(path: str, target):
    """Restore into the structure of `target` (a template pytree).

    Shapes are validated leaf-by-leaf: flax's from_bytes checks structure
    but not array shapes, and a silently mis-shaped load would surface as a
    confusing broadcast error deep inside a jitted step."""
    with open(os.path.join(path, "checkpoint.msgpack"), "rb") as f:
        blob = f.read()
    state_dict = serialization.msgpack_restore(blob)
    # backward compat: GANState gained the optional `g_ema` field (round 3);
    # checkpoints written before it lack the key — inject the template's
    # value (None for EMA-less configs) so old train_state dirs restore
    if isinstance(state_dict, dict) and "g_ema" not in state_dict:
        from cfgan.train.state import GANState

        if isinstance(target, GANState):
            if target.g_ema is not None:
                # ADVICE r3: an EMA-enabled recipe resuming from a pre-EMA
                # checkpoint would silently continue with the template's
                # (init-params) EMA — make that loud instead of silent
                import warnings

                warnings.warn(
                    f"checkpoint at {path!r} predates the g_ema field but the "
                    "target state carries an EMA: resuming will REINITIALIZE "
                    "the EMA from the template's params, not the trained "
                    "average", stacklevel=2)
            state_dict["g_ema"] = serialization.to_state_dict(target.g_ema)
    restored = serialization.from_state_dict(target, state_dict)
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(target)):
        if hasattr(want, "shape") and getattr(got, "shape", None) != want.shape:
            raise ValueError(
                f"checkpoint at {path!r}: leaf shape {getattr(got, 'shape', None)} "
                f"does not match template shape {want.shape}"
            )
    return restored


def load_metadata(path: str) -> dict[str, Any] | None:
    p = os.path.join(path, "metadata.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_train_state(path: str, state, epoch: int,
                     history: dict | None = None,
                     metadata: dict[str, Any] | None = None) -> str:
    """Mid-run checkpoint of a full GANState (G/D params, optimizer states,
    BN/spectral stats, step counter) + the loop position.

    Capability uplift over the reference, which only saves bare
    `state_dict`s at stage boundaries (`house trainer.py:121-130`): together
    with the loop's stateless per-epoch PRNG derivation
    (`fold_in(key, 2*epoch)`), restoring this checkpoint continues training
    BIT-IDENTICALLY to the uninterrupted run (pinned by
    tests/test_checkpoint.py::test_midrun_resume_is_bit_identical).
    """
    meta = dict(metadata or {})
    meta["epoch"] = int(epoch)
    if history is not None:
        meta["history"] = {
            k: [float(v) for v in vs] if isinstance(vs, list) else float(vs)
            for k, vs in history.items()
        }
    return save(path, state, metadata=meta)


def restore_train_state(path: str, template):
    """Returns (state, next_epoch, history) from a `save_train_state`
    checkpoint; `template` is a structurally-matching GANState (e.g. the
    freshly-built bundle's)."""
    state = restore(path, template)
    meta = load_metadata(path) or {}
    return state, int(meta.get("epoch", -1)) + 1, meta.get("history", {})


def save_sharded(path: str, tree, metadata: dict[str, Any] | None = None) -> str:
    """Orbax-backed checkpoint for sharded / multi-host states: each leaf is
    written with its sharding preserved (every host writes only its shards).
    Falls back to the msgpack format on a single host without orbax."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return save(path, tree, metadata)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(os.path.abspath(path), "orbax"), tree, force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(metadata, f, cls=_NumpyJSON, indent=1)
    return path


def restore_sharded(path: str, target):
    """Restore an orbax checkpoint into `target`'s structure (and shardings,
    when `target` leaves carry them)."""
    orbax_dir = os.path.join(os.path.abspath(path), "orbax")
    if not os.path.isdir(orbax_dir):
        return restore(path, target)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(orbax_dir, target)
