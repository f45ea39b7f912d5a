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


# ---------------------------------------------------------- pallas kernel
def _pallas_conv3x3_kernel(xp_ref, k_ref, out_ref, acc_ref):
    """One grid step: TILE_B padded images (TILE_B, H+2, W+2, Cin) in VMEM
    -> (TILE_B, H, W, Cout).  Nine (TILE_B*H*W, Cin)@(Cin, Cout) MXU dots
    accumulate into an f32 VMEM scratch; the halo never leaves VMEM."""
    tb, hp, wp, cin = xp_ref.shape
    h, w = hp - 2, wp - 2
    cout = out_ref.shape[-1]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            tap = xp_ref[:, dy:dy + h, dx:dx + w, :].reshape(tb * h * w, cin)
            acc_ref[:] += jax.lax.dot_general(
                tap, k_ref[dy, dx],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[:] = acc_ref[:].astype(out_ref.dtype).reshape(tb, h, w, cout)


def _conv3x3_pallas_fwd(x: jax.Array, kernel: jax.Array,
                        tile_b: int = 8, interpret: bool = False
                        ) -> jax.Array:
    """SAME/stride-1 3x3 NHWC conv as a Pallas TPU kernel (forward only;
    use `conv3x3_same_pallas` for the differentiable op)."""
    from jax.experimental import pallas as pl

    # the Mosaic TPU compiler is the only real backend; everywhere else
    # (CPU tests, the virtual device mesh) run the interpreter
    interpret = interpret or jax.default_backend() != "tpu"
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    tile_b = min(tile_b, b)
    pad_b = (-b) % tile_b
    xp = jnp.pad(x, ((0, pad_b), (1, 1), (1, 1), (0, 0)))
    nb = xp.shape[0]

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
        scratch = [pltpu.VMEM((tile_b * h * w, cout), jnp.float32)]
        kwargs = dict(scratch_shapes=scratch)
        # Cin/Cout=64 pads to 128 VMEM lanes, so the double-buffered
        # blocks cost ~2x their logical bytes — the default 16M scoped
        # budget overflows at tile_b=8/batch 128 (measured 16.64M).
        # Raise the cap (v5e has 128M VMEM per core).
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        mem = dict(memory_space=vmem)
    except ImportError:  # pragma: no cover - CPU-only builds
        kwargs, mem = {}, {}
        interpret = True

    y = pl.pallas_call(
        _pallas_conv3x3_kernel,
        grid=(nb // tile_b,),
        in_specs=[
            pl.BlockSpec((tile_b, h + 2, w + 2, cin),
                         lambda i: (i, 0, 0, 0), **mem),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0), **mem),
        ],
        out_specs=pl.BlockSpec((tile_b, h, w, cout),
                               lambda i: (i, 0, 0, 0), **mem),
        out_shape=jax.ShapeDtypeStruct((nb, h, w, cout), x.dtype),
        interpret=interpret,
        **kwargs,
    )(xp, kernel)
    return y[:b]


def make_conv3x3_same_pallas(tile_b: int = 8, interpret: bool = False):
    """Differentiable Pallas 3x3/SAME conv: Pallas forward, matmul-
    decomposition backward (custom_vjp — the transposed conv for dx, nine
    tap-reduction matmuls for dK).  `interpret=True` runs the kernel in
    the Pallas interpreter (CPU tests)."""

    @jax.custom_vjp
    def conv(x, kernel):
        return _conv3x3_pallas_fwd(x, kernel, tile_b=tile_b,
                                   interpret=interpret)

    def fwd(x, kernel):
        return conv(x, kernel), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        # dx: SAME conv of g with the spatially flipped, channel-transposed
        # kernel; dK[dy,dx] = tap(x, dy, dx)^T @ g
        k_t = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
        dx = conv3x3_same_matmul(g, k_t.astype(g.dtype))
        b, h, w, cin = x.shape
        cout = g.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        gm = g.reshape(b * h * w, cout)
        dk = []
        for dy in range(3):
            row = []
            for dxx in range(3):
                tap = jax.lax.dynamic_slice(
                    xp, (0, dy, dxx, 0), (b, h, w, cin)
                ).reshape(b * h * w, cin)
                row.append(jax.lax.dot_general(
                    tap, gm, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(kernel.dtype))
            dk.append(jnp.stack(row))
        return dx.astype(x.dtype), jnp.stack(dk)

    conv.defvjp(fwd, bwd)
    return conv
