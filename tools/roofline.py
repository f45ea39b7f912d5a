"""Roofline / utilization analysis of the flagship train step (or, with
--serving, the fused counterfactual serving path).

Quantifies "how close to speed-of-light" the fused MNIST CounteRGAN step is:
pulls XLA's own cost model for the compiled step (FLOPs + HBM bytes), times
the step, and reports achieved FLOP/s and effective HBM bandwidth against
the chip's peaks, plus the step's arithmetic intensity vs the machine
balance point (which side of the roofline it sits on).

--serving analyzes the production serving program instead
(`cfgan.serve.engine.CounterfactualEngine._serve`: G forward -> clamp ->
classifier on x_cf AND x -> softmax probs, one fused XLA program).

The reference has no comparable analysis (it publishes no performance
numbers at all, SURVEY.md section 6).

Usage:  python tools/roofline.py [--batch 128] [--dtype float32|bfloat16]
                                 [--serving]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# peak numbers per chip (public spec sheets)
PEAKS = {
    # name: (bf16 TFLOP/s, HBM GB/s)
    "v5e": (197.0, 819.0),
    "v4": (275.0, 1228.0),
    "cpu": (None, None),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--chip", default="v5e", choices=sorted(PEAKS))
    ap.add_argument("--serving", action="store_true",
                    help="analyze the fused CF serving path instead of the "
                         "train step")
    args = ap.parse_args()

    from bench import _setup_compile_cache

    _setup_compile_cache()  # env var alone is ignored on this platform
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfgan.core.config import CounterGANConfig, MaskConfig
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan
    from cfgan.train.state import NetState, adam_like_torch

    cfg = CounterGANConfig(
        adv_loss="bce", reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
        resample_target=False, num_res_blocks=6, hidden_dim=64,
        compute_dtype=args.dtype,
        mask=MaskConfig(kind="patch", patch_size=7, num_modifiable_patches=10),
    )
    clf_model = CNNClassifier()
    clf_state = NetState.create(
        clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                       train=False),
        adam_like_torch(1e-3),
    )
    bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (args.batch, 28, 28, 1))
                    .astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, args.batch).astype(np.int32))
    key = jax.random.key(0)

    if args.serving:
        from cfgan.serve.engine import CounterfactualEngine

        engine = CounterfactualEngine.from_bundle(bundle, clf_model,
                                                  clf_state)
        mask = jnp.ones((args.batch, 28, 28, 1), jnp.float32)
        fn_args = (engine.g_vars, x, y, mask, key)
        program = "serving_cf"
        compiled = jax.jit(engine._serve).lower(*fn_args).compile()
    else:
        fn_args = (bundle.state, x, y, key)
        program = "train_step"
        compiled = jax.jit(
            bundle.step_fn, donate_argnums=(0,)
        ).lower(*fn_args).compile()
    # ONE compile per run: the cost model and the timing below share this
    # executable (donation preserved on the train path — a nested
    # jit(jitted_fn).lower() would drop it and cold-compile twice)
    fn = compiled
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", float("nan")))
        bytes_acc = float(cost.get("bytes accessed", float("nan")))
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        flops = bytes_acc = float("nan")

    # timed run (per-step dispatch; the scanned epoch is slightly faster,
    # see bench.py — this keeps the cost model and the timing on the SAME
    # executable)
    from bench import fence  # the shared axon timing fence (scalar fetch)

    if args.serving:
        for _ in range(3):
            m = fn(*fn_args)
        fence(m)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            m = fn(*fn_args)
        fence(m)
        dt = (time.perf_counter() - t0) / args.steps
    else:
        state = bundle.state
        for _ in range(3):
            state, m = fn(state, x, y, key)
        fence(m)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = fn(state, x, y, key)
        fence(m)
        dt = (time.perf_counter() - t0) / args.steps

    achieved_tflops = flops / dt / 1e12
    achieved_bw = bytes_acc / dt / 1e9
    intensity = flops / bytes_acc if bytes_acc else float("nan")
    peak_tflops, peak_bw = PEAKS[args.chip]
    out = {
        "backend": jax.default_backend(),
        "program": program,
        "batch": args.batch,
        "compute_dtype": args.dtype,
        "step_ms": round(dt * 1e3, 3),
        "images_per_sec": round(args.batch / dt),
        "xla_flops_per_step": flops,
        "xla_bytes_per_step": bytes_acc,
        "achieved_tflops": round(achieved_tflops, 2),
        "achieved_hbm_gbps": round(achieved_bw, 1),
        "arithmetic_intensity_flop_per_byte": round(intensity, 1),
    }
    if peak_tflops:
        out["pct_of_bf16_peak_flops"] = round(
            100 * achieved_tflops / peak_tflops, 1)
        out["pct_of_hbm_peak_bw"] = round(100 * achieved_bw / peak_bw, 1)
        out["machine_balance_flop_per_byte"] = round(
            peak_tflops * 1e12 / (peak_bw * 1e9), 1)
        out["bound"] = ("compute" if intensity >
                        peak_tflops * 1e12 / (peak_bw * 1e9) else "memory")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
