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

--latency measures true ON-CHIP single-call serving latency: N serving
calls are chained inside one compiled `lax.scan` (the carry is x_cf fed
back as the next input, so the device cannot overlap iterations), and the
per-call figure is (t(2N) - t(N)) / N — the subtraction cancels the
per-dispatch constant (host dispatch + the ~26 ms network-relay RTT this
environment adds), which is what made the round-2 "single-digit ms on a
locally attached chip" claim an extrapolation rather than a measurement.

Usage:  python tools/roofline.py [--batch 128] [--dtype float32|bfloat16]
                                 [--serving | --latency]
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
    ap.add_argument("--bulk", action="store_true",
                    help="measure CounterfactualEngine._serve_bulk (scanned "
                         "chunked serving) throughput, chunk=--batch")
    ap.add_argument("--bulk-chunks", type=int, default=64,
                    help="number of chunks in the bulk scan")
    ap.add_argument("--latency", action="store_true",
                    help="measure on-chip single-call serving latency via a "
                         "chained in-jit scan (batches 1/8/%(default)s unless "
                         "--batch is given)")
    ap.add_argument("--latency-iters", type=int, default=200,
                    help="chain length N for --latency (timed at N and 2N)")
    ap.add_argument("--family", default=None,
                    help="roofline a generation-family train step instead "
                         "of the flagship (preset name, e.g. wgan_gp_mnist "
                         "or dcgan_mnist) — VERDICT r4 #7: achieved-vs-peak "
                         "for the non-flagship families")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (e.g. cpu — the axon "
                         "sitecustomize pins the env default, so CPU smokes "
                         "need this to stay off the shared TPU)")
    args = ap.parse_args()

    from bench import _setup_compile_cache

    _setup_compile_cache()  # env var alone is ignored on this platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from cfgan.core.config import CounterGANConfig, MaskConfig
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan
    from cfgan.train.state import NetState, adam_like_torch

    rng = np.random.RandomState(0)
    key = jax.random.key(0)

    if args.family:
        # non-flagship family roofline (reference-preset widths, production
        # batch unless --batch overrides): same cost-model + fetch-fenced
        # timing as the flagship path below
        from cfgan.experiments.presets import PRESETS
        from cfgan.train.gan_builders import build_gan

        shapes = {"simple_gan_moons": ((2,), 0),
                  "simple_gan_mnist": ((28, 28, 1), 0),
                  "cgan_moons": ((2,), 2),
                  "wgan_gp_mnist": ((28, 28, 1), 10),
                  "dcgan_mnist": ((64, 64, 1), 0)}
        if args.family not in shapes:
            ap.error(f"--family must be one of {sorted(shapes)}")
        tail, ncls = shapes[args.family]
        fam_cfg = PRESETS[args.family]
        batch = args.batch if args.batch != 128 else fam_cfg.data.batch_size
        from cfgan.core.config import replace as cfg_replace

        gan_cfg = cfg_replace(fam_cfg.gan, compute_dtype=args.dtype)
        bundle = build_gan(gan_cfg, num_classes=ncls, seed=0)
        x = jnp.asarray(rng.uniform(-1, 1, (batch, *tail)).astype(np.float32))
        y = jnp.asarray(rng.randint(0, max(1, ncls), batch).astype(np.int32))
        args.batch = batch
        program = f"train_step_{args.family}"
        fn_args = (bundle.state, x, y, key)
        compiled = jax.jit(
            bundle.step_fn, donate_argnums=(0,)
        ).lower(*fn_args).compile()

    if not args.family:
        cfg = CounterGANConfig(
            adv_loss="bce", reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
            resample_target=False, num_res_blocks=6, hidden_dim=64,
            compute_dtype=args.dtype,
            mask=MaskConfig(kind="patch", patch_size=7,
                            num_modifiable_patches=10),
        )
        clf_model = CNNClassifier()
        clf_state = NetState.create(
            clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                           train=False),
            adam_like_torch(1e-3),
        )
        bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=0)

        x = jnp.asarray(rng.uniform(-1, 1, (args.batch, 28, 28, 1))
                        .astype(np.float32))
        y = jnp.asarray(rng.randint(0, 10, args.batch).astype(np.int32))

    if args.bulk:
        from bench import fence
        from cfgan.serve.engine import CounterfactualEngine

        engine = CounterfactualEngine.from_bundle(bundle, clf_model,
                                                  clf_state)
        nc, chunk = args.bulk_chunks, args.batch
        xs = jnp.broadcast_to(x[:chunk][None], (nc, chunk, 28, 28, 1))
        ts = jnp.broadcast_to(y[:chunk][None], (nc, chunk))
        ms = jnp.ones((nc, chunk, 28, 28, 1), jnp.float32)
        out = engine._serve_bulk(engine.g_vars, xs, ts, ms, key)
        fence(out[2][0, 0, 0])
        reps = 5
        t0 = time.perf_counter()
        for i in range(reps):
            out = engine._serve_bulk(engine.g_vars, xs, ts, ms,
                                     jax.random.fold_in(key, i))
        fence(out[2][0, 0, 0])
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "backend": jax.default_backend(),
            "program": "serve_bulk_scan",
            "compute_dtype": args.dtype,
            "chunk": chunk, "n_chunks": nc,
            "samples_per_dispatch": nc * chunk,
            "dispatch_ms": round(dt * 1e3, 2),
            "cf_per_sec": round(nc * chunk / dt),
        }, indent=1))
        return

    if args.latency:
        from bench import fence
        from cfgan.serve.engine import CounterfactualEngine

        engine = CounterfactualEngine.from_bundle(bundle, clf_model,
                                                  clf_state)
        n = args.latency_iters
        results = []
        for b in ([args.batch] if args.batch != 128 else [1, 8, 128]):
            xb, yb = x[:b], y[:b]  # b is always <= args.batch here
            mb = jnp.ones((b, 28, 28, 1), jnp.float32)

            def chained(g_vars, x0, tgt, mask, key, iters):
                def body(carry, i):
                    x_cf, _, probs, probs_orig = engine._serve(
                        g_vars, carry, tgt, mask, jax.random.fold_in(key, i))
                    # carry = x_cf: each call's input is the previous call's
                    # output, so the device executes the N calls serially.
                    # probs_orig is folded into the per-iter output so XLA
                    # cannot dead-code-eliminate the original-input
                    # classifier pass the real serving program runs.
                    return x_cf, probs[0, 0] + probs_orig[0, 0]
                xf, ps = jax.lax.scan(body, x0, jnp.arange(iters))
                return xf, ps[-1]

            timings = {}
            for iters in (n, 2 * n):
                f = jax.jit(chained, static_argnums=(5,))
                _, p = f(engine.g_vars, xb, yb, mb, key, iters)  # compile
                fence(p)
                reps = 3
                t0 = time.perf_counter()
                for _ in range(reps):
                    _, p = f(engine.g_vars, xb, yb, mb, key, iters)
                fence(p)
                timings[iters] = (time.perf_counter() - t0) / reps
            per_call_ms = (timings[2 * n] - timings[n]) / n * 1e3
            results.append({
                "batch": b,
                "on_chip_latency_ms_per_call": round(per_call_ms, 4),
                "cf_per_sec_sequential": round(b / (per_call_ms / 1e3)),
                "dispatch_plus_relay_overhead_ms": round(
                    (2 * timings[n] - timings[2 * n]) * 1e3, 1),
            })
            print(f"[latency] batch {b}: {per_call_ms:.3f} ms/call on-chip",
                  file=sys.stderr)
        print(json.dumps({
            "backend": jax.default_backend(),
            "program": "serving_cf_chained_scan",
            "compute_dtype": args.dtype,
            "chain_iters": n,
            "method": "(t(2N)-t(N))/N over a data-dependent lax.scan chain; "
                      "cancels host dispatch + network-relay RTT",
            "results": results,
        }, indent=1))
        return

    if args.family:
        pass  # compiled/fn_args/program built in the family branch above
    elif args.serving:
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
