"""Split epoch-parity tracing: TPU capture + detached CPU torch replay.

The north-star parity claim (BASELINE.json) is epoch-1 loss equivalence
with the eager PyTorch reference (`conditional_counteRGAN/mnist/
trainer.py:76-137`).  `run_parity_trace` (oracles.py) drives both sides
in one process, which forces the JAX side onto XLA CPU — ~2-3 min/step at
reference width on this 1-core host, i.e. ~47 h for the 379-step epoch.

This module splits the trace so the compiled cfgan side runs on the real
TPU chip (seconds for the whole epoch, `highest` matmul precision so f32
matmuls/convs are true f32) and exits, releasing the chip; the eager
torch oracle then replays the identical step sequence CPU-only in a
detached process.  Cross-side determinism rests on two facts:

* jax PRNG (threefry) is bit-identical across platforms, so the replay
  re-derives the same shuffles/targets/masks the compiled step consumed
  on the TPU (asserted against saved step-0 samples);
* the oracle consumes only *numpy weights* copied from the captured
  initial state, never live JAX state.

The capture file holds: initial G/D/classifier weight pytrees, per-step
d/g losses from the scanned epoch, final function-relevant params (for
drift), and the eval-mode probe counterfactuals.
"""
from __future__ import annotations

import pickle
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from cfgan.testing.oracles import ParityTrace
from cfgan.train.countergan import make_epoch_runner, sample_targets


def _np_tree(tree):
    """Detach a (possibly frozen) pytree to plain-dict numpy for pickling."""
    try:
        from flax.core import unfreeze

        tree = unfreeze(tree)
    except Exception:
        pass
    return jax.tree.map(np.asarray, tree)


def capture_epoch(
    bundle,
    clf_state,
    x_train,
    y_train,
    *,
    batch_size: int,
    num_classes: int,
    mask_fn,
    resample_target: bool,
    seed: int,
    epochs: int = 1,
    max_steps: int | None = None,
) -> dict:
    """Run the scanned production epoch runner (device-resident data, one
    lax.scan) and capture everything the torch replay needs.  Uses the
    same PRNG schedule as `run_parity_trace` so traces are comparable."""
    from cfgan.data.pipeline import epoch_perm

    epoch_fn = make_epoch_runner(bundle.step_fn, donate=False, reduce=False)
    init = {
        "g_params": _np_tree(bundle.state.g.params),
        "g_stats": _np_tree(bundle.state.g.stats),
        "d_params": _np_tree(bundle.state.d.params),
        "d_stats": _np_tree(bundle.state.d.stats),
        "clf_params": _np_tree(clf_state.params),
        "clf_stats": _np_tree(clf_state.stats),
    }
    state = bundle.state
    X, Y = jnp.asarray(x_train), jnp.asarray(y_train)
    n = len(y_train)
    key = jax.random.key(seed)

    d_j, g_j = [], []
    perms = []
    gstep = 0
    for epoch in range(epochs):
        k_perm = jax.random.fold_in(key, 2 * epoch)
        k_step = jax.random.fold_in(key, 2 * epoch + 1)
        perm = epoch_perm(k_perm, n, batch_size)
        if max_steps is not None and gstep + perm.shape[0] > max_steps:
            perm = perm[: max_steps - gstep]
        if perm.shape[0] == 0:
            break
        state, stacked = epoch_fn(state, X, Y, perm, k_step)
        d_j.extend(np.asarray(stacked["d_loss"]).tolist())
        g_j.extend(np.asarray(stacked["g_loss"]).tolist())
        perms.append(np.asarray(perm))
        gstep += perm.shape[0]
        if max_steps is not None and gstep >= max_steps:
            break

    # step-0 samples, saved so the replay can assert its re-derived PRNG
    # stream matches what the compiled step consumed on the TPU
    k_step0 = jax.random.fold_in(key, 1)
    k_t0, k_m0, _ = jax.random.split(jax.random.fold_in(k_step0, 0), 3)
    xb0 = np.asarray(x_train)[perms[0][0]]
    t0 = np.asarray(sample_targets(
        k_t0, jnp.asarray(np.asarray(y_train)[perms[0][0]]),
        num_classes, resample_target,
    ))
    m0 = np.asarray(mask_fn(k_m0, jnp.asarray(xb0)))

    # eval-mode probe (same key schedule as run_parity_trace)
    xs, ys = np.asarray(x_train), np.asarray(y_train)
    xp, yp = xs[:batch_size], ys[:batch_size]
    kp = jax.random.fold_in(key, 10_000)
    k_t, k_m, k_cf = jax.random.split(kp, 3)
    tp = np.asarray(sample_targets(k_t, jnp.asarray(yp), num_classes, True))
    mp = np.asarray(mask_fn(k_m, jnp.asarray(xp)))
    cf_jax = np.asarray(bundle.cf_fn(
        {"params": state.g.params, **state.g.stats},
        jnp.asarray(xp), jnp.asarray(tp), jnp.asarray(mp),
    )[0])

    return {
        "init": init,
        "final": {
            "g_params": _np_tree(state.g.params),
            "d_params": _np_tree(state.d.params),
        },
        "d_jax": np.asarray(d_j),
        "g_jax": np.asarray(g_j),
        "probe": {"x": xp, "t": tp, "mask": mp, "cf_jax": cf_jax},
        "step0": {"t": t0, "mask": m0},
        "meta": {
            "seed": seed, "batch_size": batch_size, "epochs": epochs,
            "max_steps": max_steps, "num_classes": num_classes,
            "resample_target": resample_target, "n": n,
            "steps": gstep,
            "platform": jax.devices()[0].platform,
        },
    }


def _state_like(g_params, d_params, g_stats=None, d_stats=None):
    return SimpleNamespace(
        g=SimpleNamespace(params=g_params, stats=g_stats or {}),
        d=SimpleNamespace(params=d_params, stats=d_stats or {}),
    )


def replay_epoch(capture: dict, oracle_factory, x_train, y_train, *,
                 mask_fn, progress=None) -> ParityTrace:
    """Replay the captured epoch through an eager torch oracle on CPU.

    `oracle_factory(bundle_like, clf_state_like)` must build the oracle
    from the shims (they expose `.state.{g,d}.{params,stats}` and
    `.params/.stats` respectively, backed by the captured numpy trees).
    """
    from cfgan.data.pipeline import epoch_perm

    meta = capture["meta"]
    init = capture["init"]
    bundle_like = SimpleNamespace(state=_state_like(
        init["g_params"], init["d_params"],
        init["g_stats"], init["d_stats"],
    ))
    clf_like = SimpleNamespace(params=init["clf_params"],
                               stats=init["clf_stats"])
    oracle = oracle_factory(bundle_like, clf_like)

    n, bs = meta["n"], meta["batch_size"]
    num_classes = meta["num_classes"]
    key = jax.random.key(meta["seed"])
    xs, ys = np.asarray(x_train), np.asarray(y_train)
    assert len(ys) == n, f"dataset changed: {len(ys)} vs captured {n}"

    d_t, g_t = [], []
    gstep = 0
    total = meta["steps"]
    for epoch in range(meta["epochs"]):
        if gstep >= total:
            break
        k_perm = jax.random.fold_in(key, 2 * epoch)
        k_step = jax.random.fold_in(key, 2 * epoch + 1)
        perm = np.asarray(epoch_perm(k_perm, n, bs))
        for i in range(perm.shape[0]):
            if gstep >= total:
                break
            idx = perm[i]
            xb, yb = xs[idx], ys[idx]
            k_t, k_m, k_g = jax.random.split(
                jax.random.fold_in(k_step, gstep), 3
            )
            t = np.asarray(sample_targets(
                k_t, jnp.asarray(yb), num_classes, meta["resample_target"]
            ))
            mask = np.asarray(mask_fn(k_m, jnp.asarray(xb)))
            if gstep == 0:
                # PRNG cross-platform determinism check vs the capture
                np.testing.assert_array_equal(t, capture["step0"]["t"])
                np.testing.assert_array_equal(mask, capture["step0"]["mask"])
            m = oracle.step(xb, yb, t, mask, k_g=k_g)
            d_t.append(m["d_loss"])
            g_t.append(m["g_loss"])
            gstep += 1
            if progress is not None and gstep % progress == 0:
                dj = capture["d_jax"][gstep - 1]
                gj = capture["g_jax"][gstep - 1]
                print(f"[replay] step {gstep}/{total} "
                      f"|dΔ|={abs(dj - m['d_loss']):.3e} "
                      f"|gΔ|={abs(gj - m['g_loss']):.3e}", flush=True)

    final = _state_like(capture["final"]["g_params"],
                        capture["final"]["d_params"])
    drift = []
    for a, b in oracle.param_pairs(final):
        scale = max(float(np.max(np.abs(b))), 1e-12)
        max_abs = float(np.max(np.abs(a - b)))
        drift.append((max_abs, max_abs / scale))

    pr = capture["probe"]
    cf_torch = oracle.cf_eval(pr["x"], pr["t"], pr["mask"])
    cf_delta = float(np.max(np.abs(pr["cf_jax"] - cf_torch)))

    return ParityTrace(
        d_jax=capture["d_jax"][: len(d_t)], d_torch=np.asarray(d_t),
        g_jax=capture["g_jax"][: len(g_t)], g_torch=np.asarray(g_t),
        param_drift=drift, cf_delta=cf_delta,
    )


def save_capture(path: str, capture: dict) -> None:
    with open(path, "wb") as f:
        pickle.dump(capture, f, protocol=4)


def load_capture(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
