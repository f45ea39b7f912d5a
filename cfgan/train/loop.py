"""Host-side training loops around the compiled epoch runners."""
from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from cfgan.data.pipeline import epoch_perm


def train_countergan_loop(
    bundle,
    x_train,
    y_train,
    *,
    epochs: int,
    batch_size: int,
    seed: int = 42,
    log: Callable[[str], None] = print,
    log_every: int = 1,
    history: dict | None = None,
    mesh=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    epoch_cb: Callable[[int, Any], None] | None = None,
):
    """Runs `epochs` compiled epochs; returns (final state, history).

    One host sync per epoch (metric means), mirroring the reference's
    per-epoch summary lines (`moons/trainer.py:110-118`) without its
    per-batch `.item()` stalls.

    Pass a `jax.sharding.Mesh` to train data-parallel: the dataset is laid
    out along the mesh's first axis, parameters/optimizer state are
    replicated, and the same compiled epoch runs with XLA-inserted gradient
    reductions over ICI (capability uplift over the single-device reference,
    SURVEY.md section 2.9).

    Mid-run resume (capability uplift — the reference checkpoints only at
    stage boundaries, `house trainer.py:121-130`): with `checkpoint_dir`
    set and `checkpoint_every > 0`, the FULL train state (params, optimizer
    states, BN/spectral stats, PRNG position via the epoch index) is saved
    every K epochs; an interrupted run restarted with the same arguments
    resumes from the last checkpoint and — because per-epoch keys are
    derived statelessly as fold_in(key, 2*epoch) — produces a continuation
    bit-identical to the uninterrupted run.

    `epoch_cb(epoch_1based, state)` is called after every epoch — the
    snapshot-selection hook (`cfgan.train.selection.SnapshotSelector`).
    The callback must not keep device references to `state` beyond the
    call (the scanned epoch donates its input state); host-copy anything
    it keeps."""
    from cfgan.core import checkpoint as ckpt

    state = bundle.state
    start_epoch = 0
    history = history if history is not None else {}
    if resume and checkpoint_dir and ckpt.exists(checkpoint_dir):
        state, start_epoch, saved_hist = ckpt.restore_train_state(
            checkpoint_dir, bundle.state
        )
        for k, vs in saved_hist.items():
            history.setdefault(k, vs)
        log(f"[CounteRGAN] resuming from {checkpoint_dir} at epoch "
            f"{start_epoch + 1}/{epochs}")
    if mesh is not None:
        from cfgan.parallel.sharding import replicate, shard_batch

        state = replicate(mesh, state)
        x, y = shard_batch(mesh, (jnp.asarray(x_train), jnp.asarray(y_train)),
                           axis=mesh.axis_names[0])
    else:
        x = jnp.asarray(x_train)
        y = jnp.asarray(y_train)
    n = len(y_train)
    key = jax.random.key(seed)
    t0 = time.perf_counter()
    for epoch in range(start_epoch, epochs):
        k_perm = jax.random.fold_in(key, 2 * epoch)
        k_step = jax.random.fold_in(key, 2 * epoch + 1)
        perm = epoch_perm(k_perm, n, batch_size)
        state, metrics = bundle.epoch_fn(state, x, y, perm, k_step)
        for k, v in metrics.items():
            history.setdefault(k, []).append(float(v))
        if log_every and (epoch + 1) % log_every == 0:
            d = {k: history[k][-1] for k in ("d_loss", "g_loss") if k in history}
            extras = {
                k: history[k][-1]
                for k in ("flip_rate", "g_cls", "d_real_p", "d_fake_p")
                if k in history
            }
            line = ", ".join(f"{k}={v:.4f}" for k, v in {**d, **extras}.items())
            log(f"[CounteRGAN] epoch {epoch+1}/{epochs} :: {line}")
        if (checkpoint_dir and checkpoint_every
                and (epoch + 1) % checkpoint_every == 0):
            ckpt.save_train_state(checkpoint_dir, state, epoch,
                                  history=history)
        if epoch_cb is not None:
            epoch_cb(epoch + 1, state)
    history["wall_time_s"] = time.perf_counter() - t0
    return state, history


def plot_loss_curves(history: dict, path: str, keys=("g_loss", "d_loss", "g_cls")):
    """Loss-curve PNG matching the reference's gan_losses.png
    (`mnist/trainer.py:149-160`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots(figsize=(8, 6))
    labels = {"g_loss": "Generator Loss", "d_loss": "Discriminator Loss",
              "g_cls": "Classifier Loss (g_cls)"}
    for k in keys:
        if k in history and isinstance(history[k], list):
            ax.plot(history[k], label=labels.get(k, k),
                    linestyle="--" if k == "g_cls" else "-")
    ax.set_xlabel("Epoch")
    ax.set_ylabel("Loss")
    ax.legend()
    ax.set_title("CounterGAN Losses")
    fig.savefig(path)
    plt.close(fig)
    return path
