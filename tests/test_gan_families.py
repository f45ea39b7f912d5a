"""Plain-generation family steps: one compiled step/epoch per family,
finite losses, and schedule semantics (G-before-D, n_critic gating)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.core.config import GANConfig
from cfgan.data.moons import load_moons2
from cfgan.data.pipeline import epoch_perm
from cfgan.train.gan_builders import build_gan


def _leaf0(tree):
    return np.asarray(jax.tree_util.tree_leaves(tree)[0])


def test_simple_mlp_epoch():
    x, y = load_moons2(seed=0, n_samples=200)
    b = build_gan(GANConfig(family="simple_mlp", latent_dim=32), seed=1)
    perm = epoch_perm(jax.random.key(2), len(y), 50)
    state, m = b.epoch_fn(b.state, jnp.asarray(x), jnp.asarray(y), perm,
                          jax.random.key(3))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    fake = b.sample_fn(state.g.variables(), jnp.zeros((4, 32)))
    assert fake.shape == (4, 2)


def test_cgan_mlp_step_conditions_on_labels():
    x, y = load_moons2(seed=0, n_samples=64)
    b = build_gan(GANConfig(family="cgan_mlp", latent_dim=32), num_classes=2,
                  seed=1)
    state, m = b.step_fn(b.state, jnp.asarray(x[:32]), jnp.asarray(y[:32]),
                         jax.random.key(0))
    assert np.isfinite(float(m["d_loss"]))
    oh = jax.nn.one_hot(jnp.array([0, 1]), 2)
    f0 = b.sample_fn(state.g.variables(), jnp.ones((2, 32)), oh)
    # class conditioning must change the output for the same z
    assert not np.allclose(f0[0], f0[1])


def test_mlp_image_g_before_d():
    """simple_gan/mnist order: G parameters must move even on step 1 (they
    update BEFORE D sees the batch)."""
    b = build_gan(
        GANConfig(family="mlp_image", latent_dim=100, g_before_d=True),
        seed=1,
    )
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (8, 28, 28, 1)).astype(np.float32))
    y = jnp.zeros((8,), jnp.int32)
    g0 = _leaf0(b.state.g.params)
    state, m = b.step_fn(b.state, x, y, jax.random.key(0))
    assert not np.allclose(g0, _leaf0(state.g.params))
    assert np.isfinite(float(m["g_loss"]))


@pytest.mark.slow
def test_wgan_gp_n_critic_schedule():
    """G updates only on steps where step % n_critic == 0."""
    b = build_gan(
        GANConfig(family="wgan_gp", latent_dim=8, hidden_dim=16, n_critic=2,
                  lr_g=1e-3, lr_d=1e-3, beta1=0.0, beta2=0.9),
        num_classes=10, seed=1,
    )
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (4, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray([0, 1, 2, 3])
    step = jax.jit(b.step_fn)
    # step 0: G updates
    s1, m1 = step(b.state, x, y, jax.random.key(0))
    g_after_0 = _leaf0(s1.g.params)
    assert not np.allclose(_leaf0(b.state.g.params), g_after_0)
    # step 1: 1 % 2 != 0 -> G frozen, g_loss reported as 0
    s2, m2 = step(s1, x, y, jax.random.key(1))
    np.testing.assert_allclose(g_after_0, _leaf0(s2.g.params))
    assert float(m2["g_loss"]) == 0.0
    assert np.isfinite(float(m2["d_loss"]))


@pytest.mark.slow
def test_dcgan_step_64px():
    b = build_gan(GANConfig(family="dcgan", latent_dim=16, hidden_dim=8),
                  seed=1)
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (4, 64, 64, 1)).astype(np.float32))
    y = jnp.zeros((4,), jnp.int32)
    state, m = b.step_fn(b.state, x, y, jax.random.key(0))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    fake = b.sample_fn(state.g.variables(), jnp.zeros((2, 16)))
    assert fake.shape == (2, 64, 64, 1)
    assert float(jnp.max(jnp.abs(fake))) <= 1.0  # tanh output


@pytest.mark.slow
def test_legacy_fixed_target_delta_countergan():
    """Legacy stack: delta G (mask-free), unconditional conv D, clipped log
    losses, ONE fixed target class for the whole run."""
    from cfgan.core.config import CounterGANConfig
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan
    from cfgan.train.state import NetState, adam_like_torch

    cfg = CounterGANConfig(
        adv_loss="clipped_log", reg_reduction="mean_abs",
        clamp_cf=(-1.0, 1.0), fixed_target=5, resample_target=False,
        lambda_cls=3.0, lambda_reg_l1=0.05, lambda_mask=0.0, hidden_dim=8,
    )
    clf = CNNClassifier()
    clf_state = NetState.create(
        clf.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)), train=False),
        adam_like_torch(1e-3),
    )
    b = build_mnist_countergan(cfg, clf, clf_state, seed=0, legacy_delta=True)
    x = jnp.asarray(np.random.RandomState(0)
                    .uniform(-1, 1, (8, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).randint(0, 10, 8))
    state, m = jax.jit(b.step_fn)(b.state, x, y, jax.random.key(2))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    # every generated counterfactual targets class 5
    assert float(m["flip_rate"]) >= 0.0  # metric exists under fixed target
    # delta generator: raw == masked (no mask), output bounded by tanh
    x_cf, raw, masked = b.cf_fn(
        b.state.g.variables(), x, jnp.full((8,), 5, jnp.int32),
        jnp.ones_like(x),
    )
    np.testing.assert_allclose(np.asarray(raw), np.asarray(masked))
    assert float(jnp.max(jnp.abs(raw))) <= 1.0


def test_separate_d_passes_call_pattern():
    """BN discriminators must score real and fake in SEPARATE train-mode
    passes, and the G phase must also use train-mode batch statistics
    (concatenated real+fake through BatchNorm lets the discriminator win via
    batch statistics — collapsed DCGAN until fixed)."""
    from cfgan.train.gan import make_gan_step
    from cfgan.train.state import GANState, NetState, adam_like_torch

    B, LD = 4, 3

    def g_apply(params, stats, z, cond, key):
        return z @ params["w"], stats

    for separate, want in ((True, [(B, True), (B, True), (B, True)]),
                           (False, [(2 * B, True), (B, False)])):
        calls = []

        def d_apply(params, stats, xx, cond, train):
            calls.append((int(xx.shape[0]), bool(train)))
            return (xx @ params["v"]).sum(1, keepdims=True), stats

        tx = adam_like_torch(1e-3)
        gp = {"w": jnp.ones((LD, LD))}
        dp = {"v": jnp.ones((LD, 1))}
        state = GANState(
            g=NetState(params=gp, stats={}, opt_state=tx.init(gp)),
            d=NetState(params=dp, stats={}, opt_state=tx.init(dp)),
            step=jnp.zeros((), jnp.int32),
        )
        step = make_gan_step(
            g_apply=g_apply, d_apply=d_apply, tx_g=tx, tx_d=tx,
            latent_dim=LD, loss="nonsaturating",
            separate_d_passes=separate,
        )
        x = jnp.ones((B, LD))
        y = jnp.zeros((B,), jnp.int32)
        jax.jit(step)(state, x, y, jax.random.key(0))  # trace records calls
        assert calls == want, (separate, calls)


@pytest.mark.parametrize("family,ncls,tail", [
    ("simple_mlp", 0, (2,)),
    ("cgan_mlp", 2, (2,)),
    ("mlp_image", 0, (28, 28, 1)),
    ("dcgan", 0, (64, 64, 1)),
    ("wgan_gp", 10, (28, 28, 1)),
])
def test_bf16_step_all_families(family, ncls, tail):
    """Every generation family trains under compute_dtype='bfloat16'
    (mixed precision: bf16 fwd+bwd, f32 params/opt/losses — same policy as
    the CounteRGAN builders): finite losses, f32 state preserved."""
    b = build_gan(
        GANConfig(family=family, latent_dim=16, hidden_dim=16,
                  compute_dtype="bfloat16",
                  n_critic=2 if family == "wgan_gp" else 1),
        num_classes=ncls, seed=1,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, *tail)).astype(np.float32))
    y = jnp.asarray(rng.randint(0, max(1, ncls), 8).astype(np.int32))
    st, m = jax.jit(b.step_fn)(b.state, x, y, jax.random.key(0))
    assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
    leaf = jax.tree_util.tree_leaves(st.g.params)[0]
    assert leaf.dtype == jnp.float32  # params stay f32
