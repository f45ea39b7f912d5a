"""The shifted-tap matmul conv lowering (cfgan.ops.conv) must be a drop-in
replacement for lax.conv on the 3x3/SAME/stride-1 hot path: same params,
same init, same outputs (to reduction-order tolerance), same gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from cfgan.nn.layers import Conv
from cfgan.ops.conv import conv3x3_same_matmul


def test_matmul_conv_matches_lax_conv():
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 28, 28, 5))
    kernel = jax.random.normal(jax.random.fold_in(key, 2), (3, 3, 5, 7)) * 0.1
    bias = jax.random.normal(jax.random.fold_in(key, 3), (7,)) * 0.1
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    got = conv3x3_same_matmul(x, kernel, bias)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_conv_module_impl_matmul_same_params_and_outputs():
    """Conv(impl='matmul') initializes BIT-IDENTICAL params (same names,
    shapes, init RNG derivation) and computes the same function."""
    x = jax.random.normal(jax.random.key(9), (2, 28, 28, 3))
    ref = Conv(8, 3, 1, 1)
    alt = Conv(8, 3, 1, 1, impl="matmul")
    v_ref = ref.init(jax.random.key(42), x)
    v_alt = alt.init(jax.random.key(42), x)
    jax.tree_util.tree_map(np.testing.assert_array_equal, v_ref, v_alt)

    y_ref = ref.apply(v_ref, x)
    y_alt = alt.apply(v_ref, x)  # ref params through the matmul path
    np.testing.assert_allclose(y_alt, y_ref, atol=2e-5, rtol=2e-5)


def test_conv_impl_matmul_gradients_match():
    x = jax.random.normal(jax.random.key(3), (2, 14, 14, 4))
    ref = Conv(6, 3, 1, 1)
    alt = Conv(6, 3, 1, 1, impl="matmul")
    v = ref.init(jax.random.key(1), x)

    def loss(mod, variables, xin):
        return jnp.sum(mod.apply(variables, xin) ** 2)

    g_ref_p, g_ref_x = jax.grad(lambda vv, xx: loss(ref, vv, xx),
                                argnums=(0, 1))(v, x)
    g_alt_p, g_alt_x = jax.grad(lambda vv, xx: loss(alt, vv, xx),
                                argnums=(0, 1))(v, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-4, rtol=5e-4),
        g_ref_p, g_alt_p)
    np.testing.assert_allclose(g_alt_x, g_ref_x, atol=5e-4, rtol=5e-4)


def test_pallas_conv_forward_matches_lax_conv():
    """The Pallas kernel (interpret mode on CPU) == lax.conv, including
    the batch-padding path (b=5 pads to the tile size)."""
    from cfgan.ops.conv import make_conv3x3_same_pallas

    key = jax.random.key(11)
    for b in (8, 5, 2):
        x = jax.random.normal(jax.random.fold_in(key, b), (b, 14, 14, 6))
        kernel = jax.random.normal(jax.random.fold_in(key, 100 + b),
                                   (3, 3, 6, 8)) * 0.1
        want = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = make_conv3x3_same_pallas(tile_b=4, interpret=True)(x, kernel)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_pallas_conv_custom_vjp_matches_lax_grads():
    from cfgan.ops.conv import make_conv3x3_same_pallas

    x = jax.random.normal(jax.random.key(1), (4, 10, 10, 5))
    kernel = jax.random.normal(jax.random.key(2), (3, 3, 5, 7)) * 0.1
    conv = make_conv3x3_same_pallas(tile_b=2, interpret=True)

    def loss_p(xx, kk):
        return jnp.sum(conv(xx, kk) ** 2)

    def loss_ref(xx, kk):
        y = jax.lax.conv_general_dilated(
            xx, kk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y ** 2)

    gx, gk = jax.grad(loss_p, argnums=(0, 1))(x, kernel)
    gx_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, kernel)
    np.testing.assert_allclose(gx, gx_ref, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(gk, gk_ref, atol=5e-4, rtol=5e-4)


def test_conv_module_impl_pallas_end_to_end():
    """Conv(impl='pallas') — same params as the default, same function
    (interpret-mode kernel on CPU)."""
    x = jax.random.normal(jax.random.key(9), (3, 12, 12, 4))
    ref = Conv(6, 3, 1, 1)
    alt = Conv(6, 3, 1, 1, impl="pallas")
    v_ref = ref.init(jax.random.key(42), x)
    v_alt = alt.init(jax.random.key(42), x)
    jax.tree_util.tree_map(np.testing.assert_array_equal, v_ref, v_alt)
    np.testing.assert_allclose(alt.apply(v_ref, x), ref.apply(v_ref, x),
                               atol=2e-5, rtol=2e-5)


def test_conv_impl_falls_back_for_other_geometries():
    """Strided/valid convs ignore impl='matmul' and still work."""
    x = jax.random.normal(jax.random.key(5), (2, 28, 28, 3))
    mod = Conv(8, 4, 2, 1, impl="matmul")  # DCGAN-style 4x4 stride 2
    v = mod.init(jax.random.key(0), x)
    y = mod.apply(v, x)
    assert y.shape == (2, 14, 14, 8)


def test_generator_conv_impl_is_checkpoint_compatible():
    """A full ImageResidualGenerator: params initialized under one impl
    load and run under the other (identical trees), outputs match."""
    from cfgan.models.generators import ImageResidualGenerator

    x = jax.random.normal(jax.random.key(7), (2, 28, 28, 1))
    t = jnp.array([3, 5])
    m = jnp.ones_like(x)
    g_ref = ImageResidualGenerator(base_ch=8, n_resblocks=2)
    g_alt = ImageResidualGenerator(base_ch=8, n_resblocks=2,
                                   conv_impl="matmul")
    v_ref = g_ref.init(jax.random.key(0), x, t, m, train=False)
    v_alt = g_alt.init(jax.random.key(0), x, t, m, train=False)
    jax.tree_util.tree_map(np.testing.assert_array_equal, v_ref, v_alt)
    raw_ref, _ = g_ref.apply(v_ref, x, t, m, train=False)
    raw_alt, _ = g_alt.apply(v_ref, x, t, m, train=False)
    np.testing.assert_allclose(raw_alt, raw_ref, atol=5e-5, rtol=5e-5)


def test_pallas_impl_gates_lane_starved_channels():
    """impl='pallas' routes Cin<16 / Cout<16 convs to lax.conv (the 3-ch
    conv_in OOM'd Mosaic's 16M scoped-VMEM stack on real TPU); the 64->64
    hot path keeps the kernel.  Pinned via pallas_call presence in the
    lowered jaxpr."""
    def has_pallas(cin, cout):
        mod = Conv(cout, 3, 1, 1, impl="pallas")
        x = jnp.zeros((2, 8, 8, cin))
        v = mod.init(jax.random.key(0), x)
        return "pallas_call" in str(jax.make_jaxpr(mod.apply)(v, x))

    assert not has_pallas(3, 64)    # conv_in shape
    assert not has_pallas(64, 1)    # conv_out shape
    assert has_pallas(64, 64)       # resblock hot path
