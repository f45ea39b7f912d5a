"""Full train-step parity for the three simple MLP families vs eager
PyTorch oracles, completing per-family step parity coverage (WGAN-GP,
DCGAN, CounteRGAN moons/MNIST/tabular live in their own files):

* simple moons GAN (`simple_gan/moons/make_moons_gan.py:49-93`): D then G,
  non-saturating log losses on sigmoid probs, Adam 1e-3;
* moons cGAN (`conditional_gan/moons/make_moons_cgan.py:83-135`): same with
  one-hot label concat (the reference's fake-labels-always-0 bug at :98 is
  fixed in cfgan, so the oracle also draws over the full range);
* simple MNIST MLP GAN (`simple_gan/mnist/mnist_gan.py:113-142`): G updated
  BEFORE D, BatchNorm1d(eps=0.8 quirk) in G.

The oracles replay cfgan's documented conventions where they deviate from
the reference (module docstring of `cfgan/train/gan.py`): the D-phase fake
is reused for the G update, and the D loss SUMS its real/fake terms.
Weights are copied from the initialized cfgan state; the same JAX PRNG
draws (z, fake labels) are fed to both sides.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from cfgan.core.config import GANConfig
from cfgan.testing.oracles import _t, copy_linear
from cfgan.train.gan_builders import build_gan

B = 8


def _log(p):
    return torch.log(torch.clamp(p, min=1e-12))


def _latent(seed, b, ld, conditional=False, num_classes=0):
    """Re-derive the step's PRNG draws exactly as `make_gan_step` does."""
    key = jax.random.key(seed)
    k_z, k_c, _, _ = jax.random.split(jax.random.fold_in(key, 0), 4)
    z = np.asarray(jax.random.normal(k_z, (b, ld), jnp.float32))
    if not conditional:
        return z, None
    t = np.asarray(jax.random.randint(k_c, (b,), 0, num_classes))
    return z, t


def test_simple_mlp_one_step_parity():
    cfg = GANConfig(family="simple_mlp", latent_dim=8, hidden_dim=32,
                    lr_g=1e-3, lr_d=1e-3)
    bundle = build_gan(cfg, seed=2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, 2).astype(np.float32))
    y = jnp.zeros((B,), jnp.int32)
    z, _ = _latent(7, B, 8)

    gp, dp = bundle.state.g.params, bundle.state.d.params
    # NB flax assigns names in construction order: the one-line generator
    # `Linear(out)(relu(Linear(hidden)(z)))` makes Linear_0 the OUT layer
    tg = tnn.Sequential(tnn.Linear(8, 32), tnn.ReLU(), tnn.Linear(32, 2))
    copy_linear(tg[0], gp["Linear_1"])
    copy_linear(tg[2], gp["Linear_0"])
    td = tnn.Sequential(tnn.Linear(2, 32), tnn.ReLU(), tnn.Linear(32, 1),
                        tnn.Sigmoid())
    copy_linear(td[0], dp["Linear_0"])
    copy_linear(td[2], dp["Linear_1"])
    opt_g = torch.optim.Adam(tg.parameters(), lr=1e-3)
    opt_d = torch.optim.Adam(td.parameters(), lr=1e-3)

    # ---- torch replay: D (sum of log terms), then G through updated D ----
    fake = tg(torch.tensor(z))
    d_loss = (-_log(td(_t(x))).mean() - _log(1 - td(fake.detach())).mean())
    opt_d.zero_grad(); d_loss.backward(); opt_d.step()
    g_loss = -_log(td(fake)).mean()
    opt_g.zero_grad(); g_loss.backward(); opt_g.step()

    state, metrics = jax.jit(bundle.step_fn)(bundle.state, x, y,
                                             jax.random.key(7))
    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=1e-5)
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.g.params["Linear_1"]["kernel"]),
        tg[0].weight.detach().numpy().T, atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(state.d.params["Linear_0"]["kernel"]),
        td[0].weight.detach().numpy().T, atol=5e-6)


def test_cgan_mlp_one_step_parity():
    C = 3
    cfg = GANConfig(family="cgan_mlp", latent_dim=8, hidden_dim=32,
                    lr_g=1e-3, lr_d=1e-3)
    bundle = build_gan(cfg, num_classes=C, seed=4)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, 2).astype(np.float32))
    y = jnp.asarray(rng.randint(0, C, B))
    z, t = _latent(11, B, 8, conditional=True, num_classes=C)
    y_oh = torch.tensor(np.eye(C, dtype=np.float32)[np.asarray(y)])
    t_oh = torch.tensor(np.eye(C, dtype=np.float32)[t])

    gp, dp = bundle.state.g.params, bundle.state.d.params
    # construction-order naming: Linear_0 is the generator's OUT layer
    tg = tnn.Sequential(tnn.Linear(8 + C, 32), tnn.ReLU(), tnn.Linear(32, 2))
    copy_linear(tg[0], gp["Linear_1"])
    copy_linear(tg[2], gp["Linear_0"])
    td = tnn.Sequential(tnn.Linear(2 + C, 32), tnn.ReLU(),
                        tnn.Linear(32, 1), tnn.Sigmoid())
    copy_linear(td[0], dp["Linear_0"])
    copy_linear(td[2], dp["Linear_1"])
    opt_g = torch.optim.Adam(tg.parameters(), lr=1e-3)
    opt_d = torch.optim.Adam(td.parameters(), lr=1e-3)

    # fake batch conditioned on the full-range labels t (bug at
    # make_moons_cgan.py:98 fixed on both sides)
    fake = tg(torch.cat([torch.tensor(z), t_oh], dim=1))
    real_p = td(torch.cat([_t(x), y_oh], dim=1))
    fake_p = td(torch.cat([fake.detach(), t_oh], dim=1))
    d_loss = -_log(real_p).mean() - _log(1 - fake_p).mean()
    opt_d.zero_grad(); d_loss.backward(); opt_d.step()
    g_loss = -_log(td(torch.cat([fake, t_oh], dim=1))).mean()
    opt_g.zero_grad(); g_loss.backward(); opt_g.step()

    state, metrics = jax.jit(bundle.step_fn)(bundle.state, x, y,
                                             jax.random.key(11))
    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=1e-5)
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state.g.params["Linear_1"]["kernel"]),
        tg[0].weight.detach().numpy().T, atol=5e-6)
    np.testing.assert_allclose(
        np.asarray(state.d.params["Linear_0"]["kernel"]),
        td[0].weight.detach().numpy().T, atol=5e-6)


class TorchMLPImageG(tnn.Module):
    """Mirror of `MLPImageGenerator` (`mnist_gan.py:41-64`), including the
    BatchNorm1d(width, 0.8) quirk (the 0.8 lands on eps)."""

    def __init__(self, ld):
        super().__init__()
        self.l0 = tnn.Linear(ld, 128)
        self.l1 = tnn.Linear(128, 256)
        self.b1 = tnn.BatchNorm1d(256, 0.8)
        self.l2 = tnn.Linear(256, 512)
        self.b2 = tnn.BatchNorm1d(512, 0.8)
        self.l3 = tnn.Linear(512, 1024)
        self.b3 = tnn.BatchNorm1d(1024, 0.8)
        self.l4 = tnn.Linear(1024, 784)

    def forward(self, z):
        a = tnn.functional.leaky_relu
        h = a(self.l0(z), 0.2)
        h = a(self.b1(self.l1(h)), 0.2)
        h = a(self.b2(self.l2(h)), 0.2)
        h = a(self.b3(self.l3(h)), 0.2)
        return torch.tanh(self.l4(h))


def test_mlp_image_g_before_d_one_step_parity():
    LD = 16
    cfg = GANConfig(family="mlp_image", latent_dim=LD, lr_g=2e-4, lr_d=2e-4,
                    g_before_d=True)
    bundle = build_gan(cfg, seed=6)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 28, 28, 1)).astype(np.float32))
    y = jnp.zeros((B,), jnp.int32)
    z, _ = _latent(13, B, LD)

    gp = bundle.state.g.params
    gs = bundle.state.g.stats["batch_stats"]
    tg = TorchMLPImageG(LD)
    for i, tl in enumerate([tg.l0, tg.l1, tg.l2, tg.l3, tg.l4]):
        copy_linear(tl, gp[f"Linear_{i}"])
    for i, bn in enumerate([tg.b1, tg.b2, tg.b3]):
        bn.weight.data = _t(gp[f"BatchNorm_{i}"]["scale"])
        bn.bias.data = _t(gp[f"BatchNorm_{i}"]["bias"])
        bn.running_mean.data = _t(gs[f"BatchNorm_{i}"]["mean"])
        bn.running_var.data = _t(gs[f"BatchNorm_{i}"]["var"])
    dp = bundle.state.d.params
    td = tnn.Sequential(tnn.Linear(784, 512), tnn.LeakyReLU(0.2),
                        tnn.Linear(512, 256), tnn.LeakyReLU(0.2),
                        tnn.Linear(256, 1), tnn.Sigmoid())
    copy_linear(td[0], dp["Linear_0"])
    copy_linear(td[2], dp["Linear_1"])
    copy_linear(td[4], dp["Linear_2"])
    opt_g = torch.optim.Adam(tg.parameters(), lr=2e-4)
    opt_d = torch.optim.Adam(td.parameters(), lr=2e-4)

    # ---- torch replay: ONE G forward (BN stats advance once); G update
    # through the CURRENT D; then D update on the detached fake ----
    fake = tg(torch.tensor(z)).view(B, -1)
    g_loss = -_log(td(fake)).mean()
    opt_g.zero_grad(); g_loss.backward(); opt_g.step()
    xt = _t(x).reshape(B, -1)
    d_loss = -_log(td(xt)).mean() - _log(1 - td(fake.detach())).mean()
    opt_d.zero_grad(); d_loss.backward(); opt_d.step()

    state, metrics = jax.jit(bundle.step_fn)(bundle.state, x, y,
                                             jax.random.key(13))
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=2e-5)
    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state.g.params["Linear_0"]["kernel"]),
        tg.l0.weight.detach().numpy().T, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(state.d.params["Linear_0"]["kernel"]),
        td[0].weight.detach().numpy().T, atol=2e-5)
    # G BN running stats advanced exactly once (the single G forward)
    np.testing.assert_allclose(
        np.asarray(state.g.stats["batch_stats"]["BatchNorm_0"]["mean"]),
        tg.b1.running_mean.detach().numpy(), atol=1e-5)
