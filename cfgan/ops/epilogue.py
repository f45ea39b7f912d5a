"""Fused counterfactual epilogue as a Pallas TPU kernel with custom VJP.

The op computed here is the CounteRGAN step's elementwise tail, executed on
every train/eval/serve batch across all three pipelines:

    masked  = raw * mask
    x_cf    = clip(x + masked, lo, hi)
    l1_sum  = sum_j |masked[i, j]|               (proximity, per sample)
    l2_sq   = sum_j masked[i, j]^2               (moons L2 term, per sample)
    pen_sum = sum_j |raw[i, j] * (1 - mask[i, j])|   (outside-mask penalty)

One VMEM pass produces the counterfactual AND all three per-sample loss
reductions (the jnp formulation re-reads `raw`/`mask` once per term), and the
hand-written backward kernel regenerates sign()/in-range indicators from the
saved inputs instead of storing them — HBM traffic for the backward drops
from 4 tensor reads + 2 writes to 3 reads + 2 writes with zero residual
tensors.  On non-TPU backends (and for batch shapes that don't tile) the
identical-semantics jnp path runs instead; `tests/test_ops_epilogue.py` pins
value- and gradient-equivalence of the two.

Kernel style follows /opt/skills/guides/pallas_guide.md: whole-row blocks in
VMEM, grid over batch tiles, per-sample reductions emitted as (TILE_B, 1)
column vectors.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e30


def _pick_tile(b: int, max_tile: int = 256) -> int:
    for t in (max_tile, 128, 64, 32, 16, 8, 4, 2, 1):
        if t <= b and b % t == 0:
            return t
    return 1


def _use_pallas(x) -> bool:
    try:
        platform = x.devices().pop().platform if hasattr(x, "devices") else (
            jax.default_backend()
        )
    except Exception:
        platform = jax.default_backend()
    return platform == "tpu"


# ------------------------------------------------------------------ kernels
def _fwd_kernel(lo, hi, x_ref, raw_ref, mask_ref,
                cf_ref, l1_ref, l2_ref, pen_ref):
    x = x_ref[:]
    raw = raw_ref[:]
    mask = mask_ref[:]
    masked = raw * mask
    u = x + masked
    cf_ref[:] = jnp.clip(u, lo, hi)
    l1_ref[:] = jnp.sum(jnp.abs(masked), axis=1, keepdims=True)
    l2_ref[:] = jnp.sum(masked * masked, axis=1, keepdims=True)
    pen_ref[:] = jnp.sum(jnp.abs(raw * (1.0 - mask)), axis=1, keepdims=True)


def _bwd_kernel(lo, hi, x_ref, raw_ref, mask_ref,
                gcf_ref, gl1_ref, gl2_ref, gpen_ref,
                dx_ref, draw_ref):
    x = x_ref[:]
    raw = raw_ref[:]
    mask = mask_ref[:]
    masked = raw * mask
    u = x + masked
    inr = ((u >= lo) & (u <= hi)).astype(x.dtype)
    du = gcf_ref[:] * inr
    dmasked = du + gl1_ref[:] * jnp.sign(masked) + 2.0 * gl2_ref[:] * masked
    inv = 1.0 - mask
    dx_ref[:] = du
    draw_ref[:] = dmasked * mask + gpen_ref[:] * jnp.sign(raw * inv) * inv


def _pallas_fwd(x2, raw2, mask2, lo, hi):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = x2.shape
    tb = _pick_tile(b)
    row = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_kernel, lo, hi),
        grid=(b // tb,),
        in_specs=[row, row, row],
        out_specs=(row, col, col, col),
        out_shape=(
            jax.ShapeDtypeStruct((b, n), x2.dtype),
            jax.ShapeDtypeStruct((b, 1), x2.dtype),
            jax.ShapeDtypeStruct((b, 1), x2.dtype),
            jax.ShapeDtypeStruct((b, 1), x2.dtype),
        ),
    )(x2, raw2, mask2)


def _pallas_bwd(x2, raw2, mask2, gcf, gl1, gl2, gpen, lo, hi):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n = x2.shape
    tb = _pick_tile(b)
    row = pl.BlockSpec((tb, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    col = pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_bwd_kernel, lo, hi),
        grid=(b // tb,),
        in_specs=[row, row, row, row, col, col, col],
        out_specs=(row, row),
        out_shape=(
            jax.ShapeDtypeStruct((b, n), x2.dtype),
            jax.ShapeDtypeStruct((b, n), x2.dtype),
        ),
    )(x2, raw2, mask2, gcf, gl1, gl2, gpen)


# ---------------------------------------------------------------- jnp path
def _jnp_fwd(x2, raw2, mask2, lo, hi):
    masked = raw2 * mask2
    cf = jnp.clip(x2 + masked, lo, hi)
    l1 = jnp.sum(jnp.abs(masked), axis=1, keepdims=True)
    l2 = jnp.sum(masked * masked, axis=1, keepdims=True)
    pen = jnp.sum(jnp.abs(raw2 * (1.0 - mask2)), axis=1, keepdims=True)
    return cf, l1, l2, pen


def _jnp_bwd(x2, raw2, mask2, gcf, gl1, gl2, gpen, lo, hi):
    masked = raw2 * mask2
    u = x2 + masked
    inr = ((u >= lo) & (u <= hi)).astype(x2.dtype)
    du = gcf * inr
    dmasked = du + gl1 * jnp.sign(masked) + 2.0 * gl2 * masked
    inv = 1.0 - mask2
    draw = dmasked * mask2 + gpen * jnp.sign(raw2 * inv) * inv
    return du, draw


# ------------------------------------------------------------------ public
@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def cf_epilogue(x, raw, mask, lo: float = -_INF, hi: float = _INF,
                use_pallas: bool | None = None):
    """Returns (x_cf, l1_sum, l2_sumsq, pen_sum); the sums are (B,) vectors.

    `x`/`raw`/`mask` may be any (B, ...) shape; reductions run over all
    non-batch axes.  Differentiable in `raw` and `x`; `mask` is data (its
    cotangent is zero — masks are sampled, never learned)."""
    cf, l1, l2, pen = _epilogue_fwd_impl(x, raw, mask, lo, hi, use_pallas)
    return cf, l1, l2, pen


def _epilogue_fwd_impl(x, raw, mask, lo, hi, use_pallas):
    b = x.shape[0]
    x2 = x.reshape(b, -1)
    raw2 = raw.reshape(b, -1)
    mask2 = mask.reshape(b, -1)
    fwd = _pallas_fwd if (
        use_pallas if use_pallas is not None else _use_pallas(x)
    ) else _jnp_fwd
    cf, l1, l2, pen = fwd(x2, raw2, mask2, lo, hi)
    return cf.reshape(x.shape), l1[:, 0], l2[:, 0], pen[:, 0]


def _cf_epilogue_fwd(x, raw, mask, lo, hi, use_pallas):
    out = _epilogue_fwd_impl(x, raw, mask, lo, hi, use_pallas)
    return out, (x, raw, mask)


def _cf_epilogue_bwd(lo, hi, use_pallas, res, cts):
    x, raw, mask = res
    gcf, gl1, gl2, gpen = cts
    b = x.shape[0]
    x2 = x.reshape(b, -1)
    raw2 = raw.reshape(b, -1)
    mask2 = mask.reshape(b, -1)
    gcf2 = gcf.reshape(b, -1)
    bwd = _pallas_bwd if (
        use_pallas if use_pallas is not None else _use_pallas(x)
    ) else _jnp_bwd
    dx2, draw2 = bwd(x2, raw2, mask2, gcf2,
                     gl1[:, None], gl2[:, None], gpen[:, None], lo, hi)
    return dx2.reshape(x.shape), draw2.reshape(raw.shape), jnp.zeros_like(mask)


cf_epilogue.defvjp(_cf_epilogue_fwd, _cf_epilogue_bwd)


def epilogue_terms(l1_sum, l2_sumsq, pen_sum, n_features: int,
                   reg_reduction: str = "per_sample_norm"):
    """Reduce per-sample sums to the scalar CounteRGAN loss terms, matching
    `cfgan.losses.countergan.proximity_l1/l2` and `mask_penalty` exactly."""
    if reg_reduction == "mean_abs":
        l1 = jnp.mean(l1_sum) / n_features
    else:
        l1 = jnp.mean(l1_sum)
    l2 = jnp.mean(jnp.sqrt(l2_sumsq + 1e-24))
    pen = jnp.mean(pen_sum) / n_features
    return l1, l2, pen
