"""Classifier pretraining (CounteRGAN stage 1).

Covers the three reference variants:
* mnist (`mnist/trainer.py:8-39`): Adam + CE over epochs, best-val-acc
  checkpoint selection;
* house (`house trainer.py:18-176`): AdamW, class-weighted CE, stratified
  val split, ReduceLROnPlateau, early stopping;
* moons (`moons/trainer.py:13-29`): 1000 full-batch Adam steps.

The epoch is a single `lax.scan`; validation accuracy is one jitted pass.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cfgan.core.config import ClassifierConfig
from cfgan.data.pipeline import epoch_perm
from cfgan.train.state import NetState, adam_like_torch


def ce_loss(logits, labels, class_weights=None):
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if class_weights is not None:
        w = jnp.take(class_weights, labels)
        # torch weighted CE: sum(w_i * l_i) / sum(w_i)
        return jnp.sum(w * losses) / jnp.sum(w)
    return jnp.mean(losses)


def make_classifier_step(model, tx, class_weights=None):
    def step(state: NetState, x, y, key, lr_scale):
        def loss_fn(params):
            out = model.apply(
                {"params": params, **state.stats},
                x,
                train=True,
                mutable=list(state.stats.keys()) or False,
                rngs={"dropout": key},
            )
            if state.stats:
                logits, new_stats = out
            else:
                logits, new_stats = out, state.stats
            return ce_loss(logits, y, class_weights), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # ReduceLROnPlateau semantics: scale the *update* (Adam's step is
        # proportional to lr, so post-scaling the update == scaling lr).
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(params=new_params, opt_state=new_opt, stats=new_stats),
            loss,
        )

    return step


def make_eval_fn(model):
    @jax.jit
    def logits_fn(params, stats, x):
        return model.apply({"params": params, **stats}, x, train=False)

    def accuracy(state: NetState, x, y, batch: int = 4096):
        correct = 0
        for lo in range(0, len(y), batch):
            lg = logits_fn(state.params, state.stats, x[lo : lo + batch])
            correct += int(jnp.sum(jnp.argmax(lg, 1) == y[lo : lo + batch]))
        return correct / len(y)

    return logits_fn, accuracy


def train_classifier(
    model,
    cfg: ClassifierConfig,
    train_set,
    valid_set=None,
    *,
    seed: int = 42,
    num_classes: int | None = None,
    log: Callable[[str], None] = print,
):
    """Returns (best NetState, history dict)."""
    x_train, y_train = train_set
    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train)
    key = jax.random.key(seed)
    k_init, key = jax.random.split(key)

    variables = model.init(
        {"params": k_init, "dropout": k_init}, x_train[:2], train=False
    )
    class_weights = None
    if cfg.class_weighted and num_classes:
        # sklearn compute_class_weight("balanced"): n / (k * bincount)
        counts = np.bincount(np.asarray(y_train), minlength=num_classes)
        class_weights = jnp.asarray(len(y_train) / (num_classes * counts),
                                    jnp.float32)
    tx = adam_like_torch(cfg.lr, weight_decay=cfg.weight_decay)
    state = NetState.create(variables, tx)
    step = make_classifier_step(model, tx, class_weights)
    _, accuracy = make_eval_fn(model)

    history = {"val_acc": [], "loss": []}

    if cfg.steps is not None:
        # full-batch regime (moons)
        @partial(jax.jit, donate_argnums=(0,))
        def run(state, key):
            def body(carry, i):
                st = carry
                st, loss = step(st, x_train, y_train, jax.random.fold_in(key, i),
                                1.0)
                return st, loss

            return jax.lax.scan(body, state, jnp.arange(cfg.steps))

        state, losses = run(state, key)
        history["loss"] = list(np.asarray(losses))
        return state, history

    # epoch regime
    bs = cfg.batch_size
    n = len(y_train)

    @partial(jax.jit, donate_argnums=(0,))
    def run_epoch(state, perm, key, lr_scale):
        def body(carry, inp):
            st = carry
            i, idx = inp
            st, loss = step(
                st,
                jnp.take(x_train, idx, axis=0),
                jnp.take(y_train, idx, axis=0),
                jax.random.fold_in(key, i),
                lr_scale,
            )
            return st, loss

        steps = perm.shape[0]
        return jax.lax.scan(body, state, (jnp.arange(steps), perm))

    def snapshot(st):
        # run_epoch donates its input state; a kept "best" reference would
        # alias buffers that the next epoch invalidates -> copy them
        return jax.tree_util.tree_map(jnp.array, st)

    best_acc, best_state = -1.0, state
    lr_scale = 1.0
    plateau_wait, stop_wait = 0, 0
    for epoch in range(cfg.epochs):
        key, k_perm, k_drop = jax.random.split(key, 3)
        perm = epoch_perm(k_perm, n, min(bs, n))
        state, losses = run_epoch(state, perm, k_drop, lr_scale)
        mean_loss = float(jnp.mean(losses))
        history["loss"].append(mean_loss)
        if valid_set is not None and valid_set[0] is not None:
            acc = accuracy(state, jnp.asarray(valid_set[0]), np.asarray(valid_set[1]))
            history["val_acc"].append(acc)
            log(f"[Classifier] Epoch {epoch+1}/{cfg.epochs} | loss {mean_loss:.4f}"
                f" | Val Acc: {acc:.4f}")
            if acc > best_acc:
                best_acc, best_state = acc, snapshot(state)
                plateau_wait, stop_wait = 0, 0
            else:
                plateau_wait += 1
                stop_wait += 1
                if cfg.lr_plateau and plateau_wait >= 10:
                    lr_scale *= 0.1
                    plateau_wait = 0
                    log(f"[Classifier] plateau: lr scale -> {lr_scale:g}")
                if (cfg.early_stop_patience
                        and stop_wait >= cfg.early_stop_patience):
                    log(f"[Classifier] early stop at epoch {epoch+1}")
                    break
        else:
            log(f"[Classifier] Epoch {epoch+1}/{cfg.epochs} | loss {mean_loss:.4f}")
            best_state = state
    return best_state, history


def plot_classifier_curves(history: dict, path: str):
    """Loss/val-acc curves (`house trainer.py:157-176`)."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(10, 4))
    axes[0].plot(history.get("loss", []))
    axes[0].set_title("train loss")
    axes[0].set_xlabel("epoch")
    if history.get("val_acc"):
        axes[1].plot(history["val_acc"])
        axes[1].set_title("validation accuracy")
        axes[1].set_xlabel("epoch")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path
