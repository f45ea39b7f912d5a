"""Localize the f32 batch-scaling cliff inside the CounteRGAN train step.

tools/conv_op_bench.py showed the isolated 28x28/64-ch conv op scales FINE
with batch (f32 fwd 26.9 -> 44.5 -> 52.7 TFLOP/s from 128 -> 512), while the
full fused step (results/conv_cliff/conv_cliff.json) goes superlinear
(4.1 -> 10.3 -> 23.2 ms/step).  So the cliff is a property of the composite
XLA program, not of the conv kernel.  This tool times each component of the
step separately at each batch size to find which one stops scaling:

  g_fwd      generator forward (14 convs + BN + label plane)
  g_fwdbwd   generator forward + backward wrt params (no clf/D)
  clf_path   frozen-classifier CE forward + backward wrt x_cf
  d_fwd2b    discriminator forward on the 2B real+fake batch
  d_fwdbwd   discriminator forward + backward wrt params (2B)
  step       the full fused production step (train/countergan.py)
  epoch/step the scanned production epoch / steps (cross-check vs
             results/conv_cliff/conv_cliff.json)

Timing: reps dispatches back-to-back, fence by fetching a scalar from the
LAST output (axon's block_until_ready returns prematurely for scanned
programs; queue order makes the final fetch a fence for the whole run).
Dispatch overhead (~0.1-0.3 ms) amortizes across reps and cancels in the
scaling ratios this tool exists to measure.

Writes results/conv_cliff/step_scale_profile.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from bench import fence  # noqa: E402  (fetch-fence; bench.py docstring)

STEPS = 20


def make_bundle(compute_dtype: str):
    from cfgan.core.config import CounterGANConfig, MaskConfig
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan
    from cfgan.train.state import NetState, adam_like_torch

    cfg = CounterGANConfig(
        lr_g=5e-5, lr_d=1e-5, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=2.5, lambda_mask=2.0, adv_loss="bce",
        reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
        resample_target=False, num_res_blocks=6, hidden_dim=64,
        mask=MaskConfig(kind="patch", patch_size=7,
                        num_modifiable_patches=10),
        compute_dtype=compute_dtype,
    )
    clf_model = CNNClassifier()
    clf_state = NetState.create(
        clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                       train=False),
        adam_like_torch(1e-3),
    )
    bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=0,
                                    diagnostics=False)
    return cfg, clf_model, clf_state, bundle


def timed(call, reps: int = 30):
    """ms per dispatch: warm once, then reps back-to-back, fence the last."""
    fence(call(0))
    t0 = time.perf_counter()
    out = None
    for i in range(1, reps + 1):
        out = call(i)
    fence(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dtypes", default="float32",
                    help="comma list: float32,bfloat16")
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--out",
                    default="results/conv_cliff/step_scale_profile.json")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    rows = []
    for dt_name in args.dtypes.split(","):
        cfg, clf_model, clf_state, bundle = make_bundle(dt_name)
        g_model, d_model = bundle.g_model, bundle.d_model
        state = bundle.state
        clf_vars = {"params": clf_state.params, **clf_state.stats}
        cd = jnp.dtype(dt_name)

        # mirror builders.build_mnist_countergan EXACTLY: raw apply fns
        # wrapped in the production mixed-precision boundary, fed f32
        # arrays (the wrapper owns the casts; feeding pre-cast bf16 inputs
        # against f32 BN running-stat refs is not a production path)
        from cfgan.train.builders import make_mixed_precision

        def raw_g_forward(params, stats, x, t, t_oh, mask, key):
            return g_model.apply({"params": params, **stats}, x, t, mask,
                                 train=True, mutable=["batch_stats"])

        def raw_d_forward(params, stats, x, t, t_oh, train):
            return d_model.apply({"params": params, **stats}, x, t), stats

        g_forward = make_mixed_precision(raw_g_forward, dt_name)
        d_forward = make_mixed_precision(raw_d_forward, dt_name)
        g_params, g_stats = state.g.params, state.g.stats
        d_params, d_stats = state.d.params, state.d.stats

        @jax.jit
        def g_fwd(x, t, m):
            return g_forward(g_params, g_stats, x, t, None, m, None)

        @jax.jit
        def g_fwdbwd(x, t, m):
            def loss(p):
                (raw, masked), _ = g_forward(p, g_stats, x, t, None, m,
                                             None)
                return jnp.sum(masked.astype(jnp.float32) ** 2)
            return jax.grad(loss)(g_params)

        @jax.jit
        def g_fwdbwd_x(x, t, m):
            # backward wrt the INPUT only (transposed-conv dx path, no dK
            # reductions) — splits the generator backward cliff between
            # its two conv-gradient computations
            def loss(xx):
                (raw, masked), _ = g_forward(g_params, g_stats, xx, t,
                                             None, m, None)
                return jnp.sum(masked.astype(jnp.float32) ** 2)
            return jax.grad(loss)(x)

        # microcosm: 6 chained 64->64 conv3x3 (+ optional batch-norm
        # math) in plain lax — no flax, no label plane, no mask.  If the
        # no-BN stack's backward goes superlinear too, the cliff is the
        # conv gradient inside ANY fused chain; if only the BN stack does,
        # it's the batch-stats reductions interleaving with dK.
        def make_stack_loss(use_bn):
            def loss(ks, x):
                x = x.astype(cd)
                for i in range(ks.shape[0]):
                    x = jax.lax.conv_general_dilated(
                        x, ks[i].astype(cd), (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    if use_bn:
                        mu = x.mean((0, 1, 2))
                        var = x.var((0, 1, 2))
                        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
                    x = jax.nn.leaky_relu(x, 0.2)
                return jnp.sum(x.astype(jnp.float32) ** 2)
            return loss

        stack_conv = jax.jit(jax.grad(make_stack_loss(False)))
        stack_convbn = jax.jit(jax.grad(make_stack_loss(True)))
        ks6 = jax.random.normal(jax.random.key(5), (6, 3, 3, 64, 64),
                                jnp.float32) * 0.05

        @jax.jit
        def clf_path(xcf, t):
            def loss(xc):
                lg = clf_model.apply(clf_vars, xc.astype(cd), train=False)
                lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=1)
                return -jnp.mean(lp[jnp.arange(xc.shape[0]), t])
            return jax.grad(loss)(xcf)

        @jax.jit
        def d_fwd2b(x2, t2):
            return d_forward(d_params, d_stats, x2, t2, None, True)[0]

        @jax.jit
        def d_fwdbwd(x2, t2):
            def loss(p):
                s, _ = d_forward(p, d_stats, x2, t2, None, True)
                return jnp.mean(s.astype(jnp.float32) ** 2)
            return jax.grad(loss)(d_params)

        for batch in batches:
            rng = np.random.RandomState(0)
            x = jnp.asarray(rng.uniform(-1, 1, (batch, 28, 28, 1))
                            .astype(np.float32))
            y = jnp.asarray(rng.randint(0, 10, batch).astype(np.int32))
            t = jnp.asarray(rng.randint(0, 10, batch).astype(np.int32))
            m = jnp.ones((batch, 28, 28, 1), jnp.float32)
            x2 = jnp.concatenate([x, x], 0)
            t2 = jnp.concatenate([y, t], 0)
            key = jax.random.key(7)

            from cfgan.data.pipeline import epoch_perm
            n = batch * STEPS
            xe = jnp.asarray(rng.uniform(-1, 1, (n, 28, 28, 1))
                             .astype(np.float32))
            ye = jnp.asarray(rng.randint(0, 10, n).astype(np.int32))
            perm = epoch_perm(jax.random.key(3), n, batch)

            # bundle.step_fn is the raw Python step (epoch_fn jits it inside
            # the scan) — jit it here for a standalone per-dispatch measure.
            # Fresh state copies per program: epoch_fn donates its state
            # argument, so sharing bundle.state across programs/batches
            # would hit deleted buffers.
            step_jit = jax.jit(bundle.step_fn)
            fresh = lambda: jax.tree_util.tree_map(jnp.array, bundle.state)
            st = {"v": fresh()}

            def step_call(i):
                st["v"], metrics = step_jit(
                    st["v"], x, y, jax.random.fold_in(key, i))
                return metrics["d_loss"]

            se = {"v": fresh()}

            def epoch_call(i):
                se["v"], metrics = bundle.epoch_fn(
                    se["v"], xe, ye, perm, jax.random.fold_in(key, i))
                return metrics["d_loss"]

            row = {"batch": batch, "dtype": dt_name}
            row["g_fwd_ms"] = round(timed(
                lambda i: g_fwd(x + i * 1e-6, t, m)[0][0]), 4)
            row["g_fwdbwd_ms"] = round(timed(
                lambda i: g_fwdbwd(x + i * 1e-6, t, m)), 4)
            row["g_fwdbwd_x_ms"] = round(timed(
                lambda i: g_fwdbwd_x(x + i * 1e-6, t, m)), 4)
            x64 = jnp.broadcast_to(x, (batch, 28, 28, 64)) * 1.0
            row["stack6conv_bwd_ms"] = round(timed(
                lambda i: stack_conv(ks6, x64 + i * 1e-6)), 4)
            row["stack6convbn_bwd_ms"] = round(timed(
                lambda i: stack_convbn(ks6, x64 + i * 1e-6)), 4)
            row["clf_path_ms"] = round(timed(
                lambda i: clf_path(x + i * 1e-6, t)), 4)
            row["d_fwd2b_ms"] = round(timed(
                lambda i: d_fwd2b(x2 + i * 1e-6, t2)), 4)
            row["d_fwdbwd_ms"] = round(timed(
                lambda i: d_fwdbwd(x2 + i * 1e-6, t2)), 4)
            row["step_ms"] = round(timed(step_call, reps=30), 4)
            row["epoch_ms_per_step"] = round(
                timed(epoch_call, reps=3) / STEPS, 4)
            rows.append(row)
            print(row, flush=True)
            os.makedirs(os.path.dirname(args.out), exist_ok=True)
            with open(args.out, "w") as f:
                json.dump({"device": str(jax.devices()[0]),
                           "steps_per_epoch": STEPS, "rows": rows}, f,
                          indent=1)


if __name__ == "__main__":
    main()
