"""Image patch-grid masks.

Reproduces the reference's mask subsystem (`mnist/trainer.py:45-72` and
`mnist/eval_utils.py:204-288`): the image is divided into a grid of
patch_size x patch_size cells; a binary patch-level mask is drawn (iid
Bernoulli(0.5), a fixed count of modifiable patches per sample, or a
user-specified patch-index list) then upsampled nearest-neighbor to pixel
resolution.

Everything is vectorized and shape-static so it lives *inside* the jitted
train step (the reference builds masks with a Python per-sample loop when a
fixed count is requested).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def patch_grid_dims(h: int, w: int, patch_size: int) -> tuple[int, int]:
    return h // patch_size, w // patch_size


def upsample_patch_mask(patch_mask, patch_size: int, channels: int = 1):
    """Nearest-neighbor upsample of (B, ph, pw) patch mask to
    (B, H, W, C) pixels — integer-factor repeat == F.interpolate(nearest)."""
    m = jnp.repeat(jnp.repeat(patch_mask, patch_size, axis=1), patch_size, axis=2)
    return jnp.broadcast_to(m[..., None], m.shape + (channels,))


def random_patch_mask(
    key,
    batch: int,
    image_hw: tuple[int, int],
    patch_size: int,
    num_modifiable: int | None = None,
    channels: int = 1,
    shared: bool = False,
):
    """Random patch mask.

    num_modifiable=None: iid Bernoulli(0.5) per patch.
    num_modifiable=k < total: exactly k modifiable patches per sample (top-k
    of a random uniform draw — a vectorized randperm).
    num_modifiable >= total: every patch modifiable (all-ones).
    shared=True: one mask broadcast across the batch
    (`eval_utils.py:233-245` "shared" policy).
    """
    h, w = image_hw
    ph, pw = patch_grid_dims(h, w, patch_size)
    total = ph * pw
    rows = 1 if shared else batch
    if num_modifiable is not None and num_modifiable >= total:
        flat = jnp.ones((rows, total), jnp.float32)
    elif num_modifiable is None:
        flat = jax.random.randint(key, (rows, total), 0, 2).astype(jnp.float32)
    else:
        scores = jax.random.uniform(key, (rows, total))
        thresh = -jnp.sort(-scores, axis=1)[:, num_modifiable - 1 : num_modifiable]
        flat = (scores >= thresh).astype(jnp.float32)
    if shared:
        flat = jnp.broadcast_to(flat, (batch, total))
    return upsample_patch_mask(flat.reshape(batch, ph, pw), patch_size, channels)


def patch_indices_to_mask(
    patch_idx: Sequence[int] | jnp.ndarray,
    batch: int,
    image_hw: tuple[int, int],
    patch_size: int,
    channels: int = 1,
):
    """User-specified patch indices -> pixel mask (row-major patch numbering,
    as displayed by the numbered patch-grid overlay in the reference UI,
    `mnist/eval_utils.py:443-484`)."""
    h, w = image_hw
    ph, pw = patch_grid_dims(h, w, patch_size)
    flat = jnp.zeros((ph * pw,), jnp.float32)
    idx = jnp.asarray(patch_idx, jnp.int32)
    if idx.size:
        flat = flat.at[idx].set(1.0)
    flat = jnp.broadcast_to(flat, (batch, ph * pw))
    return upsample_patch_mask(flat.reshape(batch, ph, pw), patch_size, channels)
