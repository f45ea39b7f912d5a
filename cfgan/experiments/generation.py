"""Plain-generation GAN experiments (the four non-CounteRGAN reference
families) behind one CLI:

    python -m cfgan.experiments.generation --preset simple_gan_moons
    python -m cfgan.experiments.generation --preset simple_gan_mnist
    python -m cfgan.experiments.generation --preset cgan_moons
    python -m cfgan.experiments.generation --preset wgan_gp_mnist
    python -m cfgan.experiments.generation --preset dcgan_mnist

Each run reproduces the reference folder's artifacts: loss plot, fixed-noise
sample grid (images) or real-vs-generated scatter (moons), and a training
GIF when sampling per epoch (`simple_gan/mnist/mnist_gan.py:141-155`,
`dconv_gan/mnist/mnist_dcgan.py:187-230`,
`simple_gan/moons/make_moons_gan.py:95-138`).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from cfgan.core import checkpoint as ckpt
from cfgan.data.pipeline import epoch_perm
from cfgan.data.registry import load_dataset
from cfgan.eval.samples import (
    make_gif,
    save_image_grid,
    save_loss_plot,
    save_scatter,
    to_uint8_grid,
)
from cfgan.experiments.presets import PRESETS
from cfgan.train.gan_builders import build_gan

GENERATION_PRESETS = (
    "simple_gan_moons", "simple_gan_mnist", "cgan_moons",
    "wgan_gp_mnist", "dcgan_mnist",
)


def _resize_images(x: np.ndarray, size: int) -> np.ndarray:
    """28 -> `size` bilinear resize on host (dcgan input prep,
    `mnist_dcgan.py:42-46`)."""
    return np.asarray(
        jax.image.resize(
            jnp.asarray(x), (x.shape[0], size, size, x.shape[-1]), "bilinear"
        )
    )


def _fixed_noise(bundle, seed: int = 7, per_class: int = 8, total: int = 64):
    key = jax.random.key(seed)
    if bundle.num_classes:
        n = per_class * bundle.num_classes
        z = jax.random.normal(key, (n, bundle.latent_dim))
        labels = jnp.tile(jnp.arange(bundle.num_classes), per_class)
        return z, jax.nn.one_hot(labels, bundle.num_classes), labels
    return jax.random.normal(key, (total, bundle.latent_dim)), None, None


def run(preset: str, epochs: int | None = None, limit: int | None = None,
        out_dir: str | None = None, seed: int | None = None):
    cfg = PRESETS[preset]
    if epochs is not None:
        from cfgan.core.config import replace

        cfg = cfg.replace(gan=replace(cfg.gan, epochs=epochs))
    seed = cfg.seed if seed is None else seed
    out_dir = out_dir or os.path.join(cfg.out_dir, cfg.name)
    os.makedirs(out_dir, exist_ok=True)

    data = load_dataset(cfg.data, limit=limit)
    x, y = data["train"]
    is_image = x.ndim == 4
    if cfg.data.resize_to:
        x = _resize_images(x, cfg.data.resize_to)
    num_classes = data["num_classes"]

    bundle = build_gan(cfg.gan, num_classes=num_classes, seed=seed)
    x_j = jnp.asarray(x)
    y_j = jnp.asarray(y)

    z_fix, oh_fix, lab_fix = _fixed_noise(bundle)
    state = bundle.state
    key = jax.random.key(seed)
    history: dict[str, list] = {}
    frames = []
    sample_epochs = max(1, cfg.gan.epochs // 10)
    t0 = time.perf_counter()
    for epoch in range(cfg.gan.epochs):
        k_perm = jax.random.fold_in(key, 2 * epoch)
        k_step = jax.random.fold_in(key, 2 * epoch + 1)
        perm = epoch_perm(k_perm, len(y), cfg.data.batch_size)
        state, metrics = bundle.epoch_fn(state, x_j, y_j, perm, k_step)
        for k, v in metrics.items():
            history.setdefault(k, []).append(float(v))
        if (epoch + 1) % sample_epochs == 0 or epoch == cfg.gan.epochs - 1:
            line = ", ".join(
                f"{k}={history[k][-1]:.4f}" for k in ("d_loss", "g_loss",
                                                      "d_real", "d_fake")
            )
            print(f"[{preset}] epoch {epoch+1}/{cfg.gan.epochs} :: {line}")
            if is_image:
                g_vars = state.g.variables()
                fake = bundle.sample_fn(g_vars, z_fix, oh_fix)
                frames.append(to_uint8_grid(np.asarray(fake), nrow=8))
    history["wall_time_s"] = time.perf_counter() - t0

    # ---- artifacts ----
    g_vars = state.g.variables()
    save_loss_plot(history, os.path.join(out_dir, "loss.png"))
    ckpt.save(os.path.join(out_dir, "generator"), dict(g_vars))
    fake = np.asarray(bundle.sample_fn(g_vars, z_fix, oh_fix))
    if is_image:
        save_image_grid(fake, os.path.join(out_dir, "samples.png"),
                        nrow=bundle.num_classes or 8)
        if len(frames) > 1:
            make_gif(frames, os.path.join(out_dir, "training_animation.gif"),
                     fps=5)
        # real-vs-fake side panel (`mnist_dcgan.py:202-230`)
        save_image_grid(np.asarray(x[:64]),
                        os.path.join(out_dir, "real_samples.png"), nrow=8)
    else:
        save_scatter(
            x, fake, os.path.join(out_dir, "generated.png"),
            labels=None if lab_fix is None else np.asarray(lab_fix),
        )
    print(f"[{preset}] done in {history['wall_time_s']:.1f}s -> {out_dir}")
    return state, history


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", required=True, choices=GENERATION_PRESETS)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--out-dir", type=str, default=None)
    args = ap.parse_args()
    from cfgan.core.logging import setup_compile_cache

    setup_compile_cache()  # persistent XLA cache (remote compiles cost minutes)
    run(args.preset, epochs=args.epochs, limit=args.limit,
        out_dir=args.out_dir)


if __name__ == "__main__":
    main()
