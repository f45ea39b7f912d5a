"""WGAN-GP train-step parity vs a PyTorch oracle — pins the
reference-faithful data flow rebuilt in round 2
(`conditional_gan/mnist/mnist_wgan_conditional.py:129-168`):

* critic phase: FRESH z, fakes conditioned on the REAL class labels
  (no grad to G), gradient-penalty interpolates conditioned on those same
  labels, AdamW(lr, betas=(0, .9), wd=.01);
* generator phase: another fresh z with RANDOM labels, its own train-mode
  forward (G BN running stats advance twice on G-update batches).

Noise/labels/interpolation draws are re-derived from the compiled step's
own PRNG streams and fed to the torch replay.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cfgan.core.config import GANConfig
from cfgan.testing.oracles import _t, copy_linear
from cfgan.train.gan_builders import build_gan

GS = 16   # generator_size
CS = 16   # critic_size
LD = 8
B = 8
C = 10
GP_LAMBDA = 10.0


def _copy_convT(tc, p):
    # flax transpose_kernel=True stores (kh, kw, out, in); torch wants
    # (in, out, kh, kw)
    tc.weight.data = torch.tensor(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
    )
    tc.bias.data = torch.tensor(np.asarray(p["bias"]))


def _copy_conv(tc, p):
    tc.weight.data = torch.tensor(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
    )
    tc.bias.data = torch.tensor(np.asarray(p["bias"]))


class TorchWGANG(tnn.Module):
    def __init__(self):
        super().__init__()
        self.latent_embed = tnn.Linear(LD, GS // 2)
        self.cond_embed = tnn.Linear(C, GS // 2)
        self.t0 = tnn.ConvTranspose2d(GS, GS, 4, 1, 0)
        self.b0 = tnn.BatchNorm2d(GS)
        self.t1 = tnn.ConvTranspose2d(GS, GS // 2, 3, 2, 1)
        self.b1 = tnn.BatchNorm2d(GS // 2)
        self.t2 = tnn.ConvTranspose2d(GS // 2, GS // 4, 4, 2, 1)
        self.b2 = tnn.BatchNorm2d(GS // 4)
        self.t3 = tnn.ConvTranspose2d(GS // 4, 1, 4, 2, 1)

    def forward(self, z, oh):
        h = torch.cat([self.latent_embed(z), self.cond_embed(oh)], 1)
        h = h.reshape(-1, GS, 1, 1)
        h = F.relu(self.b0(self.t0(h)))
        h = F.relu(self.b1(self.t1(h)))
        h = F.relu(self.b2(self.t2(h)))
        return torch.tanh(self.t3(h))


class TorchWGANCritic(tnn.Module):
    def __init__(self):
        super().__init__()
        self.cond_embed = tnn.Linear(C, CS * 4)
        self.c0 = tnn.Conv2d(1, CS // 4, 3, 2)
        self.n0 = tnn.InstanceNorm2d(CS // 4, affine=True)
        self.c1 = tnn.Conv2d(CS // 4, CS // 2, 3, 2)
        self.n1 = tnn.InstanceNorm2d(CS // 2, affine=True)
        self.c2 = tnn.Conv2d(CS // 2, CS, 3, 2)
        self.n2 = tnn.InstanceNorm2d(CS, affine=True)
        self.fc0 = tnn.Linear(CS * 4 + CS * 4, CS)
        self.fc_out = tnn.Linear(CS, 1)

    def forward(self, x, oh):
        h = F.leaky_relu(self.n0(self.c0(x)), 0.2)
        h = F.leaky_relu(self.n1(self.c1(h)), 0.2)
        h = F.leaky_relu(self.n2(self.c2(h)), 0.2)
        # NHWC flatten order (cfgan reshapes NHWC)
        h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)
        h = torch.cat([h, self.cond_embed(oh)], 1)
        return self.fc_out(F.leaky_relu(self.fc0(h), 0.2))


@pytest.mark.slow
def test_wgan_gp_one_step_parity():
    bundle = build_gan(
        GANConfig(family="wgan_gp", latent_dim=LD, hidden_dim=GS,
                  n_critic=1, lr_g=1e-4, lr_d=1e-4, beta1=0.0, beta2=0.9,
                  gp_lambda=GP_LAMBDA),
        num_classes=C, seed=3,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray(rng.randint(0, C, B))
    key = jax.random.key(11)

    # re-derive the step's internal draws (fold_in(key, step=0), split 4)
    k_z, k_c, k_gp, k_z2 = jax.random.split(jax.random.fold_in(key, 0), 4)
    z = np.asarray(jax.random.normal(k_z, (B, LD), jnp.float32))
    t = np.asarray(jax.random.randint(k_c, (B,), 0, C))
    eps = np.asarray(jax.random.uniform(k_gp, (B, 1, 1, 1), jnp.float32))
    z2 = np.asarray(jax.random.normal(k_z2, (B, LD), jnp.float32))

    # ---- torch mirrors with copied weights ----
    gp_ = bundle.state.g.params
    tg = TorchWGANG()
    copy_linear(tg.latent_embed, gp_["latent_embed"])
    copy_linear(tg.cond_embed, gp_["cond_embed"])
    for tt_, name in ((tg.t0, "tconv0"), (tg.t1, "tconv1"),
                      (tg.t2, "tconv2"), (tg.t3, "tconv_out")):
        _copy_convT(tt_, gp_[name]["ConvTranspose_0"])
    gs_ = bundle.state.g.stats["batch_stats"]
    for bn_t, name in ((tg.b0, "bn_tconv0"), (tg.b1, "bn_tconv1"),
                       (tg.b2, "bn_tconv2")):
        bn_t.weight.data = _t(gp_[name]["scale"])
        bn_t.bias.data = _t(gp_[name]["bias"])
        bn_t.running_mean.data = _t(gs_[name]["mean"])
        bn_t.running_var.data = _t(gs_[name]["var"])

    dp = bundle.state.d.params
    td = TorchWGANCritic()
    copy_linear(td.cond_embed, dp["cond_embed"])
    for tc, name in ((td.c0, "conv0"), (td.c1, "conv1"), (td.c2, "conv2")):
        _copy_conv(tc, dp[name]["Conv_0"])
    for tn, name in ((td.n0, "in0"), (td.n1, "in1"), (td.n2, "in2")):
        tn.weight.data = _t(dp[name]["scale"])
        tn.bias.data = _t(dp[name]["bias"])
    copy_linear(td.fc0, dp["fc0"])
    copy_linear(td.fc_out, dp["fc_out"])

    # reference optimizers: AdamW lr 1e-4 betas (0, .9), torch default wd .01
    opt_d = torch.optim.AdamW(td.parameters(), lr=1e-4, betas=(0.0, 0.9))
    opt_g = torch.optim.AdamW(tg.parameters(), lr=1e-4, betas=(0.0, 0.9))

    xt = _t(x).permute(0, 3, 1, 2).contiguous()
    yt = torch.tensor(np.asarray(y), dtype=torch.long)
    oh_y = F.one_hot(yt, C).float()
    oh_t = F.one_hot(torch.tensor(t, dtype=torch.long), C).float()

    # ---- torch replay: critic phase (real labels, fresh z, no grad) ----
    with torch.no_grad():
        fake = tg(torch.tensor(z), oh_y)  # train mode: BN stats advance
    real_s = td(xt, oh_y)
    fake_s = td(fake, oh_y)
    eps_t = torch.tensor(eps).permute(0, 3, 1, 2)
    x_hat = (eps_t * xt + (1 - eps_t) * fake).requires_grad_(True)
    d_interp = td(x_hat, oh_y)
    grads = torch.autograd.grad(d_interp.sum(), x_hat, create_graph=True)[0]
    norms = (grads.reshape(B, -1).pow(2).sum(1) + 1e-12).sqrt()
    gp_term = ((norms - 1.0) ** 2).mean()
    d_loss = -real_s.mean() + fake_s.mean() + GP_LAMBDA * gp_term
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()

    # ---- torch replay: G phase (fresh z2, RANDOM labels, own forward) ----
    fake2 = tg(torch.tensor(z2), oh_t)  # train mode again
    g_loss = -td(fake2, oh_t).mean()
    opt_g.zero_grad()
    g_loss.backward()
    opt_g.step()

    # ---- the compiled step ----
    state, metrics = jax.jit(bundle.step_fn)(bundle.state, x, y, key)

    # the GP double-backward amplifies f32 reduction noise; observed delta
    # ~6e-5 on a ~5.3 loss (1e-5 relative)
    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=3e-4)
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(state.g.params["latent_embed"]["kernel"]),
        tg.latent_embed.weight.detach().numpy().T, atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.d.params["conv0"]["Conv_0"]["kernel"]),
        td.c0.weight.detach().numpy().transpose(2, 3, 1, 0), atol=5e-5,
    )
    # G BN running stats advanced TWICE (critic-phase + G-phase forwards)
    np.testing.assert_allclose(
        np.asarray(state.g.stats["batch_stats"]["bn_tconv0"]["mean"]),
        tg.b0.running_mean.detach().numpy(), atol=1e-5,
    )
