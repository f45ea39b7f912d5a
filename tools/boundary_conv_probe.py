"""Pin the f32 batch-scaling cliff to specific conv shapes' dx gradients.

step_scale_profile.py showed the CounteRGAN generator's backward is the
whole train-step cliff, with the grad-wrt-input (transposed-conv) path
carrying most of it at batch 256 while a pure 64-ch conv chain's backward
still scales fine there.  The generator differs from that chain at its
BOUNDARIES: conv_in consumes the 12-channel concat[x, label-plane, mask]
and conv_out emits 1 channel (`mnist/models/generator.py:25-86`), so their
dx computations are lane-starved transposed convs (64->12 and 1->64).

This probe times fwd + grad-wrt-x of a single 3x3/SAME conv per
(cin -> cout) at each batch: dx has x's shape, so ITERS applications chain
through one lax.scan carry (serialized on device, no dispatch overhead),
fenced by fetching the scalar sum.  Writes
results/conv_cliff/boundary_conv_probe.json.
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

H = W = 28
ITERS = 100
SHAPES = [(12, 64), (64, 1), (64, 64), (1, 64)]
BATCHES = (128, 256, 512)


def make_run(cin: int, cout: int):
    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)

    def dx_of(x, k):
        return jax.grad(
            lambda xx: jnp.sum(conv(xx, k).astype(jnp.float32) ** 2))(x)

    @jax.jit
    def run(x, k):
        def body(carry, _):
            xx, kk = carry
            return (dx_of(xx, kk) * 0.05, kk), None
        (y, _), _ = jax.lax.scan(body, (x, k), None, length=ITERS)
        return jnp.float32(y.astype(jnp.float32).sum())

    return run


def timed(run, x, k, reps: int = 4):
    xs = [(x * (1.0 + 1e-4 * r)).astype(x.dtype) for r in range(reps)]
    jax.block_until_ready(xs)
    float(run(xs[0], k))  # compile + warm
    times = []
    for r in range(1, reps):
        t0 = time.perf_counter()
        float(run(xs[r], k))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS * 1e3


def main() -> None:
    rows = []
    for cin, cout in SHAPES:
        run = make_run(cin, cout)
        for batch in BATCHES:
            x = jax.random.normal(jax.random.key(0), (batch, H, W, cin),
                                  jnp.float32)
            k = jax.random.normal(jax.random.key(1), (3, 3, cin, cout),
                                  jnp.float32) * 0.05
            row = {"cin": cin, "cout": cout, "batch": batch,
                   "fwd_dx_ms": round(timed(run, x, k), 4)}
            rows.append(row)
            print(row, flush=True)
            os.makedirs("results/conv_cliff", exist_ok=True)
            with open("results/conv_cliff/boundary_conv_probe.json",
                      "w") as f:
                json.dump({"device": str(jax.devices()[0]),
                           "iters": ITERS, "dtype": "float32",
                           "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
