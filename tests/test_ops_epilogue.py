"""Fused counterfactual epilogue: pallas (interpret) == jnp == naive autodiff,
for values AND gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.losses import countergan as cg
from cfgan.ops.epilogue import cf_epilogue, epilogue_terms


def _data(b=16, shape=(28, 28, 1), seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(-0.9, 0.9, (b, *shape)).astype(np.float32))
    raw = jnp.asarray(rng.normal(0, 0.3, (b, *shape)).astype(np.float32))
    mask = jnp.asarray(
        (rng.uniform(0, 1, (b, *shape)) > 0.5).astype(np.float32)
    )
    return x, raw, mask


def _naive(x, raw, mask, lo, hi):
    masked = raw * mask
    cf = jnp.clip(x + masked, lo, hi)
    flat = masked.reshape(masked.shape[0], -1)
    l1 = jnp.sum(jnp.abs(flat), axis=1)
    l2 = jnp.sum(flat * flat, axis=1)
    pen = jnp.sum(
        jnp.abs((raw * (1 - mask)).reshape(raw.shape[0], -1)), axis=1
    )
    return cf, l1, l2, pen


def test_jnp_path_matches_naive_values():
    x, raw, mask = _data()
    got = cf_epilogue(x, raw, mask, -1.0, 1.0, False)
    want = _naive(x, raw, mask, -1.0, 1.0)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-6)


def test_custom_vjp_matches_autodiff():
    x, raw, mask = _data(seed=1)

    def loss_custom(raw_):
        cf, l1, l2, pen = cf_epilogue(x, raw_, mask, -1.0, 1.0, False)
        return (jnp.sum(cf * jnp.cos(cf)) + 0.3 * jnp.mean(l1)
                + 0.2 * jnp.mean(jnp.sqrt(l2 + 1e-24)) + 0.7 * jnp.mean(pen))

    def loss_naive(raw_):
        cf, l1, l2, pen = _naive(x, raw_, mask, -1.0, 1.0)
        return (jnp.sum(cf * jnp.cos(cf)) + 0.3 * jnp.mean(l1)
                + 0.2 * jnp.mean(jnp.sqrt(l2 + 1e-24)) + 0.7 * jnp.mean(pen))

    v1, g1 = jax.value_and_grad(loss_custom)(raw)
    v2, g2 = jax.value_and_grad(loss_naive)(raw)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


def test_grad_wrt_x_clamp_indicator():
    x, raw, mask = _data(seed=2)

    def f(x_):
        cf, *_ = cf_epilogue(x_, raw, mask, -1.0, 1.0, False)
        return jnp.sum(cf)

    g = jax.grad(f)(x)
    u = x + raw * mask
    inside = (u >= -1.0) & (u <= 1.0)
    np.testing.assert_allclose(np.asarray(g)[np.asarray(inside)], 1.0)
    np.testing.assert_allclose(np.asarray(g)[~np.asarray(inside)], 0.0)


def test_pallas_interpret_matches_jnp():
    from jax.experimental.pallas import tpu as pltpu

    x, raw, mask = _data(b=8, shape=(28, 28, 1), seed=3)
    want = cf_epilogue(x, raw, mask, -1.0, 1.0, False)
    with pltpu.force_tpu_interpret_mode():
        got = cf_epilogue(x, raw, mask, -1.0, 1.0, True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-5, atol=1e-6)

    def loss(fn_flag):
        def inner(raw_):
            cf, l1, l2, pen = cf_epilogue(x, raw_, mask, -1.0, 1.0, fn_flag)
            return jnp.sum(cf**2) + jnp.mean(l1) + jnp.mean(pen)
        return inner

    g_jnp = jax.grad(loss(False))(raw)
    with pltpu.force_tpu_interpret_mode():
        g_pl = jax.grad(loss(True))(raw)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_jnp),
                               rtol=1e-5, atol=1e-6)


def test_epilogue_terms_match_loss_module():
    x, raw, mask = _data(seed=4)
    masked = raw * mask
    _, l1s, l2s, pens = cf_epilogue(x, raw, mask, -1.0, 1.0, False)
    n = int(np.prod(x.shape[1:]))
    for reduction in ("mean_abs", "per_sample_norm"):
        l1, l2, pen = epilogue_terms(l1s, l2s, pens, n, reduction)
        np.testing.assert_allclose(
            float(l1), float(cg.proximity_l1(masked, reduction)), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(l2), float(cg.proximity_l2(masked)), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(pen), float(cg.mask_penalty(raw, mask)), rtol=1e-6
        )


def test_no_clamp_mode():
    x, raw, mask = _data(seed=5)
    cf, *_ = cf_epilogue(x, raw, mask)  # default +-inf
    np.testing.assert_allclose(np.asarray(cf), np.asarray(x + raw * mask),
                               rtol=1e-6)
