"""Per-op shootout: XLA conv vs Pallas kernel vs matmul decomposition.

Isolates the single 3x3/SAME/stride-1 conv at the flagship generator's hot
shape (28x28, Cin=Cout=64 — `mnist/models/generator.py:25-86` runs 14 of
them per forward) and times forward and forward+backward per impl, batch
and dtype.  This is the kernel-level measurement VERDICT r3 #4 asks for:
either the Pallas kernel beats XLA at batch>=256 f32 (cliff removed) or
this profile proves the XLA conv is already at the op-level bound.

Timing: ITERS conv applications chained through a lax.scan carry inside
ONE jitted call (output feeds the next input, so the device cannot
overlap or elide iterations); wall time of that call / ITERS.

Writes results/conv_cliff/conv_op_bench.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from cfgan.ops.conv import (
    conv3x3_same_matmul,
    conv_flops,
    make_conv3x3_same_pallas,
)

H = W = 28
CIN = COUT = 64
ITERS = 100


def xla_conv(x, k):
    # f32 accumulation requested explicitly for f32 inputs; for bf16 leave
    # it implicit (the MXU accumulates f32 anyway, and an explicit f32
    # preferred_element_type breaks the conv transpose rule under bf16
    # cotangents) — this matches flax nn.Conv, i.e. the production path.
    pet = jnp.float32 if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    ).astype(x.dtype)


def chained(fn, grad: bool):
    """ITERS serialized applications of fn (or its vjp) in one program."""
    scale = 0.05  # keep the carry from blowing up

    if not grad:
        def body(carry, _):
            y, k = carry
            return (fn(y, k) * scale, k), None
    else:
        def body(carry, _):
            y, k = carry
            dx, dk = jax.grad(
                lambda xx, kk: jnp.sum(fn(xx, kk).astype(jnp.float32) ** 2),
                argnums=(0, 1))(y, k)
            return (dx.astype(y.dtype) * scale, k + dk.astype(k.dtype) * 0), None

    @jax.jit
    def run(x, k):
        (y, _), _ = jax.lax.scan(body, (x, k), None, length=ITERS)
        return jnp.float32(y.astype(jnp.float32).sum())

    return run


def timed(run, x, k, reps: int = 4):
    """Per-op ms.  The fetch of the scalar output is the completion fence:
    on the axon remote runtime `block_until_ready` returns prematurely for
    scanned programs (the r4 interim artifact's impossible 4000+ TFLOP/s
    rows were timed with it).  A direct A/B on this runtime showed NO
    result caching for repeat (program, same-buffer) executions, but each
    rep still feeds a distinct pre-fenced input as hygiene, and we take
    the min over reps to shed RPC jitter."""
    xs = [(x * (1.0 + 1e-4 * r)).astype(x.dtype) for r in range(reps)]
    jax.block_until_ready(xs)
    float(run(xs[0], k))  # compile + warm
    times = []
    for r in range(1, reps):
        t0 = time.perf_counter()
        float(run(xs[r], k))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS * 1e3  # ms per op


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--impls", default="xla,matmul",
                    help="comma list of xla,matmul,pallas_tb8,pallas_tb32 "
                    "(pallas excluded by default: the remote Mosaic compile "
                    "of the conv kernel hangs on this backend — see "
                    "results/conv_cliff/NOTES.md)")
    ap.add_argument("--out", default="results/conv_cliff/conv_op_bench.json")
    args = ap.parse_args()

    dev = jax.devices()[0]
    rows = []
    key = jax.random.PRNGKey(0)
    all_impls = {
        "xla": xla_conv,
        "pallas_tb8": make_conv3x3_same_pallas(tile_b=8),
        "pallas_tb32": make_conv3x3_same_pallas(tile_b=32),
        "matmul": conv3x3_same_matmul,
    }
    impls = {n: all_impls[n] for n in args.impls.split(",")}
    for dtype in (jnp.float32, jnp.bfloat16):
        for batch in (128, 256, 512):
            x = jax.random.normal(key, (batch, H, W, CIN), dtype)
            k = jax.random.normal(key, (3, 3, CIN, COUT), dtype) * 0.05
            flops = conv_flops(batch, (H, W), CIN, COUT)
            for name, fn in impls.items():
                row = {"batch": batch, "dtype": x.dtype.name, "impl": name}
                try:
                    row["fwd_ms"] = round(timed(chained(fn, False), x, k), 4)
                    row["fwd_tflops"] = round(flops / row["fwd_ms"] / 1e9, 2)
                    row["fwdbwd_ms"] = round(timed(chained(fn, True), x, k), 4)
                except Exception as e:  # noqa: BLE001 - record, keep going
                    row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
                rows.append(row)
                print(row, flush=True)
                with open(args.out, "w") as f:
                    json.dump({"device": str(dev),
                               "shape": f"{H}x{W}x{CIN}->{COUT}",
                               "iters": ITERS, "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
