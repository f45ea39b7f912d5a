"""Full-epoch MNIST parity: TPU capture + detached CPU torch replay.

Closes the epoch-1 north star literally: every step of MNIST epoch 1 at
full reference width (`conditional_counteRGAN/mnist/trainer.py:76-137`,
batch 128, ch 64, 6 resblocks), compared step-by-step against the eager
PyTorch oracle.  A single-process XLA-CPU run takes ~47 h on this 1-core
host; splitting lets the compiled side use the TPU for seconds and exit
(the axon chip is exclusive — a long-lived holder would block all other
TPU work), then the torch replay grinds CPU-only for ~1 h detached.

Usage:
  python tools/parity_epoch_full.py capture \
      [--out results/parity/mnist_full_capture.pkl]      # on the TPU
  nohup python tools/parity_epoch_full.py replay \
      [--capture ...] [--out results/parity] &           # CPU, detached
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CH, NRB, BATCH = 64, 6, 128  # reference width (`mnist/config.py:3-29`)
SEED = 3
MAX_STEPS = None  # whole epoch


def do_capture(path: str, platform: str) -> None:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    # true-f32 MXU passes so the compiled side is comparable with torch f32
    jax.config.update("jax_default_matmul_precision", "highest")
    from bench import _setup_compile_cache

    _setup_compile_cache()

    from cfgan.testing.split_trace import capture_epoch, save_capture
    from tools.parity_report import mnist_mask_fn, setup_mnist

    t0 = time.time()
    print(f"[capture] platform={jax.devices()[0].platform} "
          f"setup at ch={CH} nrb={NRB} ...", file=sys.stderr)
    bundle, clf_state, _cfg, (xtr, ytr) = setup_mnist(CH, NRB)
    print(f"[capture] setup done in {time.time()-t0:.0f}s; "
          f"n={len(ytr)} -> {len(ytr)//BATCH} steps", file=sys.stderr)
    cap = capture_epoch(
        bundle, clf_state, xtr, ytr, batch_size=BATCH, num_classes=10,
        mask_fn=mnist_mask_fn, resample_target=False, seed=SEED,
        epochs=1, max_steps=MAX_STEPS,
    )
    save_capture(path, cap)
    print(f"[capture] done in {time.time()-t0:.0f}s: "
          f"{cap['meta']['steps']} steps captured on "
          f"{cap['meta']['platform']} -> {path}", file=sys.stderr)


def do_replay(capture_path: str, out_dir: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from cfgan.testing import MnistCounterganOracle
    from cfgan.testing.split_trace import load_capture, replay_epoch
    from tools.parity_report import (
        mnist_cfg,
        mnist_mask_fn,
        write_report,
        write_trace,
    )
    from cfgan.data.mnist import load_mnist

    t0 = time.time()
    cap = load_capture(capture_path)
    (xtr, ytr), _, _ = load_mnist(valid_fraction=0.1)
    cfg = mnist_cfg(CH, NRB)
    print(f"[replay] {cap['meta']['steps']} torch steps at reference "
          f"width ...", file=sys.stderr)
    trace = replay_epoch(
        cap,
        lambda bundle_like, clf_like: MnistCounterganOracle(
            bundle_like, clf_like, cfg
        ),
        xtr, ytr, mask_fn=mnist_mask_fn, progress=10,
    )
    os.makedirs(out_dir, exist_ok=True)
    summary = write_trace(out_dir, "mnist_full", trace)
    summary.update(hidden_dim=CH, num_res_blocks=NRB, batch=BATCH,
                   jax_platform=cap["meta"]["platform"])
    summary_path = os.path.join(out_dir, "summary.json")
    full = {}
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            full = json.load(f)
    full["mnist_full"] = summary
    with open(summary_path, "w") as f:
        json.dump(full, f, indent=1)
    if all(k in full for k in ("moons", "house", "mnist")):
        write_report(out_dir, full)
    print(f"[replay] done in {time.time()-t0:.0f}s: {summary}",
          file=sys.stderr)
    print(json.dumps(summary))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["capture", "replay"])
    ap.add_argument("--capture", default="results/parity/mnist_full_capture.pkl")
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default="",
                    help="capture platform override (default: whatever "
                         "jax picks — the TPU under axon)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny width + 6 steps, for validating the "
                         "capture/replay plumbing end-to-end on CPU")
    args = ap.parse_args()
    if args.smoke:
        global CH, NRB, MAX_STEPS
        CH, NRB, MAX_STEPS = 8, 1, 6
    if args.mode == "capture":
        out = args.out or args.capture
        os.makedirs(os.path.dirname(out), exist_ok=True)
        do_capture(out, args.platform)
    else:
        do_replay(args.capture, args.out or "results/parity")


if __name__ == "__main__":
    main()
