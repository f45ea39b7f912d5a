"""MXU-native 3x3 convolution via shifted-tap matmul decomposition.

Motivation (BASELINE.md "Batch scaling" + VERDICT r3 next-step #4): XLA's
conv algorithm hits a tiling cliff at the flagship generator's shapes
(28x28 images, 64 channels) when the batch doubles past 128 — the conv
fusions take 2.8-3.6x the time for 2x the batch, capping training at
batch 128.  This module lowers the SAME-padded stride-1 3x3 conv (the
resblock hot path: `mnist/models/generator.py:25-86` has 14 of them per
forward) to NINE accumulated matmuls

    y = sum_{dy,dx} shift(x, dy, dx) @ K[dy, dx]      # (B*H*W, Cin)@(Cin, Cout)

which XLA tiles with its mature dot-general path (M = B*H*W is huge and
lane-aligned; K = Cin, N = Cout) instead of its conv tilings.  Each tap is
a window of the padded input, so peak memory stays ~1x the activation (no
im2col 9x blowup), the taps fuse into the dot operands, and the decomposed
form differentiates naturally (d/dx gives nine transposed-kernel matmuls —
the conv transpose — and d/dK nine (Cin, M)@(M, Cout) reductions).

Numerics: identical contraction terms as lax.conv, different reduction
order (f32 deltas ~1e-6 relative; pinned by tests/test_ops_conv.py).
Select per model with `CounterGANConfig.conv_impl = "matmul"`; benchmark
with tools/conv_cliff_bench.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv3x3_same_matmul(x: jax.Array, kernel: jax.Array,
                        bias: jax.Array | None = None) -> jax.Array:
    """SAME-padded stride-1 3x3 NHWC convolution as 9 accumulated matmuls.

    `kernel` is flax nn.Conv layout (3, 3, Cin, Cout).  Accumulation runs
    in f32 (preferred_element_type) regardless of the compute dtype, like
    the MXU conv path.
    """
    b, h, w, cin = x.shape
    kh, kw, kcin, cout = kernel.shape
    if (kh, kw) != (3, 3) or kcin != cin:
        raise ValueError(f"conv3x3_same_matmul: kernel {kernel.shape} does "
                         f"not match input {x.shape}")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            tap = jax.lax.dynamic_slice(
                xp, (0, dy, dx, 0), (b, h, w, cin)
            ).reshape(b * h * w, cin)
            t = jax.lax.dot_general(
                tap, kernel[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t
    y = acc.astype(x.dtype).reshape(b, h, w, cout)
    if bias is not None:
        y = y + bias
    return y


def conv_flops(batch: int, hw: tuple[int, int], cin: int, cout: int,
               k: int = 3) -> int:
    """MACs*2 of one SAME conv — for CostEstimates and roofline math."""
    return 2 * batch * int(np.prod(hw)) * cin * cout * k * k
