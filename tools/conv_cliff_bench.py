"""Conv-tiling-cliff experiment: time the flagship scanned epoch at
batch {128, 256, 512} x conv impl {xla, matmul} x dtype {f32, bf16}.

Context (BASELINE.md "Batch scaling", VERDICT r3 next-step #4): XLA's conv
tilings regress 2.8-3.6x when the batch doubles past 128 at the generator's
28x28/64-ch shapes, capping training throughput at batch 128.  The
"matmul" impl (`cfgan.ops.conv`, `CounterGANConfig.conv_impl`) lowers the
fourteen hot 3x3 convs to shifted-tap matmuls so XLA tiles them with its
dot path instead.  This tool measures whether that removes the cliff
(success = f32@256 >= f32@128's img/s) or pins the kernel-level bound.

Run on the TPU: python tools/conv_cliff_bench.py
CPU smoke:      python tools/conv_cliff_bench.py --smoke
Writes results/conv_cliff/conv_cliff.json and prints the table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _setup_compile_cache, fence, log  # noqa: E402


def measure(batch: int, conv_impl: str | None, dtype: str,
            steps: int, hidden: int, blocks: int, reps: int = 3,
            micro: int = 0) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfgan.core.config import CounterGANConfig, MaskConfig
    from cfgan.data.pipeline import epoch_perm
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan
    from cfgan.train.state import NetState, adam_like_torch

    cfg = CounterGANConfig(
        lr_g=5e-5, lr_d=1e-5, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=2.5, lambda_mask=2.0, adv_loss="bce",
        reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
        resample_target=False, num_res_blocks=blocks, hidden_dim=hidden,
        mask=MaskConfig(kind="patch", patch_size=7,
                        num_modifiable_patches=10),
        compute_dtype=dtype,
        ema_decay=0.999,
        conv_impl=conv_impl,
        g_microbatch=micro,
    )
    clf_model = CNNClassifier()
    clf_state = NetState.create(
        clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                       train=False),
        adam_like_torch(1e-3),
    )
    bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=0,
                                    diagnostics=False)
    rng = np.random.RandomState(0)
    n = batch * steps
    x = jnp.asarray(rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, n).astype(np.int32))
    key = jax.random.key(2)
    perm = epoch_perm(jax.random.key(3), n, batch)

    state = bundle.state
    t0 = time.perf_counter()
    state, metrics = bundle.epoch_fn(state, x, y, perm, key)
    fence(metrics["d_loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(reps):
        state, metrics = bundle.epoch_fn(state, x, y, perm,
                                         jax.random.fold_in(key, i))
    fence(metrics["d_loss"])
    dt = (time.perf_counter() - t0) / reps
    row = {
        "batch": batch,
        "conv_impl": conv_impl or "xla",
        "dtype": dtype,
        "g_microbatch": micro,
        "ms_per_step": round(dt / steps * 1e3, 3),
        "images_per_sec": round(n / dt, 1),
        "compile_s": round(compile_s, 1),
    }
    log(f"[cliff] {row}")
    return row


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny widths on CPU to validate plumbing")
    ap.add_argument("--batches", default="128,256,512")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--impls", default="xla,matmul")
    ap.add_argument("--micro", default="0",
                    help="comma list of g_microbatch values (0 = off); the "
                         "grid crosses these with batches/dtypes/impls — "
                         "the VMEM-spill probe from NOTES.md #4")
    ap.add_argument("--merge", action="store_true",
                    help="merge rows into an existing conv_cliff.json "
                         "instead of overwriting (dedup by config tuple)")
    ap.add_argument("--out", default="results/conv_cliff")
    args = ap.parse_args()

    import jax

    if args.smoke:
        jax.config.update("jax_platforms", "cpu")
    _setup_compile_cache()

    steps = 4 if args.smoke else 40
    hidden = 8 if args.smoke else 64
    blocks = 1 if args.smoke else 6
    batches = ([32] if args.smoke else
               [int(b) for b in args.batches.split(",")])
    dtypes = (["float32"] if args.smoke else args.dtypes.split(","))
    impls = [None if s == "xla" else s for s in args.impls.split(",")]

    micros = [0] if args.smoke else [int(m) for m in args.micro.split(",")]

    rows = []
    for dtype in dtypes:
        for batch in batches:
            for impl in impls:
                for micro in micros:
                    rows.append(measure(batch, impl, dtype, steps, hidden,
                                        blocks, reps=1 if args.smoke else 3,
                                        micro=micro))
    os.makedirs(args.out, exist_ok=True)
    out_path = os.path.join(args.out, "conv_cliff.json")
    if args.merge and os.path.exists(out_path):
        with open(out_path) as f:
            old = json.load(f)
        seen = {(r["batch"], r["conv_impl"], r["dtype"],
                 r.get("g_microbatch", 0)) for r in rows}
        rows = [r for r in old.get("rows", [])
                if (r["batch"], r["conv_impl"], r["dtype"],
                    r.get("g_microbatch", 0)) not in seen] + rows
    payload = {"device": str(jax.devices()[0]), "rows": rows,
               "steps_per_epoch": steps,
               "note": "scanned production epoch, fetch-fenced"}
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
