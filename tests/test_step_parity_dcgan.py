"""DCGAN train-step parity vs a PyTorch oracle (`dconv_gan/mnist/
mnist_dcgan.py:140-175`): the classic 3-phase loop — D on real, D on the
detached fake (same generator forward reused for the G update, exactly like
the reference's single `fake = netG(noise)`), then G through the updated D
with real labels — with BatchNorm in BOTH nets scored in separate train-mode
passes.

Also pins the documented BN deviation precisely: cfgan stores D's running
stats after its two D-phase passes and DISCARDS the third (G-phase) side
update that eager torch performs; the test asserts cfgan's stored stats
equal the torch snapshot taken right after the D update.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cfgan.core.config import GANConfig
from cfgan.testing.oracles import _t
from cfgan.train.gan_builders import build_gan

GH = 8
LD = 16
B = 8


def _copy_convT(tc, p):
    tc.weight.data = torch.tensor(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
    )


def _copy_conv(tc, p):
    tc.weight.data = torch.tensor(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
    )


class TorchDCGANG(tnn.Module):
    def __init__(self):
        super().__init__()
        chans = [(LD, GH * 8, 4, 1, 0), (GH * 8, GH * 4, 4, 2, 1),
                 (GH * 4, GH * 2, 4, 2, 1), (GH * 2, GH, 4, 2, 1)]
        self.tconvs = tnn.ModuleList(
            [tnn.ConvTranspose2d(i, o, k, s, p, bias=False)
             for i, o, k, s, p in chans]
        )
        self.bns = tnn.ModuleList(
            [tnn.BatchNorm2d(o) for _, o, *_ in chans]
        )
        self.out = tnn.ConvTranspose2d(GH, 1, 4, 2, 1, bias=False)

    def forward(self, z):
        h = z.reshape(-1, LD, 1, 1)
        for tc, bn in zip(self.tconvs, self.bns):
            h = F.relu(bn(tc(h)))
        return torch.tanh(self.out(h))


class TorchDCGAND(tnn.Module):
    def __init__(self):
        super().__init__()
        self.c0 = tnn.Conv2d(1, GH, 4, 2, 1, bias=False)
        chans = [(GH, GH * 2), (GH * 2, GH * 4), (GH * 4, GH * 8)]
        self.convs = tnn.ModuleList(
            [tnn.Conv2d(i, o, 4, 2, 1, bias=False) for i, o in chans]
        )
        self.bns = tnn.ModuleList([tnn.BatchNorm2d(o) for _, o in chans])
        self.out = tnn.Conv2d(GH * 8, 1, 4, 1, 0, bias=False)

    def forward(self, x):
        h = F.leaky_relu(self.c0(x), 0.2)
        for c, bn in zip(self.convs, self.bns):
            h = F.leaky_relu(bn(c(h)), 0.2)
        return torch.sigmoid(self.out(h)).view(-1)


@pytest.mark.slow
def test_dcgan_one_step_parity():
    bundle = build_gan(
        GANConfig(family="dcgan", latent_dim=LD, hidden_dim=GH,
                  lr_g=2e-4, lr_d=2e-4, beta1=0.5, beta2=0.999),
        seed=3,
    )
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 64, 64, 1)).astype(np.float32))
    y = jnp.zeros((B,), jnp.int32)
    key = jax.random.key(9)
    k_z, _, _, _ = jax.random.split(jax.random.fold_in(key, 0), 4)
    z = np.asarray(jax.random.normal(k_z, (B, LD), jnp.float32))

    # ---- torch mirrors with copied weights (+ BN running stats) ----
    gp = bundle.state.g.params
    gs = bundle.state.g.stats["batch_stats"]
    tg = TorchDCGANG()
    for i in range(4):
        _copy_convT(tg.tconvs[i], gp[f"tconv{i}"]["ConvTranspose_0"])
        tg.bns[i].weight.data = _t(gp[f"bn{i}"]["scale"])
        tg.bns[i].bias.data = _t(gp[f"bn{i}"]["bias"])
        tg.bns[i].running_mean.data = _t(gs[f"bn{i}"]["mean"])
        tg.bns[i].running_var.data = _t(gs[f"bn{i}"]["var"])
    _copy_convT(tg.out, gp["tconv_out"]["ConvTranspose_0"])

    dp = bundle.state.d.params
    ds = bundle.state.d.stats["batch_stats"]
    td = TorchDCGAND()
    _copy_conv(td.c0, dp["conv0"]["Conv_0"])
    for i in range(3):
        _copy_conv(td.convs[i], dp[f"conv{i+1}"]["Conv_0"])
        td.bns[i].weight.data = _t(dp[f"bn{i+1}"]["scale"])
        td.bns[i].bias.data = _t(dp[f"bn{i+1}"]["bias"])
        td.bns[i].running_mean.data = _t(ds[f"bn{i+1}"]["mean"])
        td.bns[i].running_var.data = _t(ds[f"bn{i+1}"]["var"])
    _copy_conv(td.out, dp["conv_out"]["Conv_0"])

    opt_d = torch.optim.Adam(td.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_g = torch.optim.Adam(tg.parameters(), lr=2e-4, betas=(0.5, 0.999))
    xt = _t(x).permute(0, 3, 1, 2).contiguous()

    # ---- torch replay: D on real, D on detached fake (separate passes) ----
    fake = tg(torch.tensor(z))  # ONE G forward, reused below (like netG)
    real_p = td(xt)
    fake_p = td(fake.detach())
    d_loss = (-torch.log(torch.clamp(real_p, min=1e-12)).mean()
              - torch.log(torch.clamp(1 - fake_p, min=1e-12)).mean())
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()
    # snapshot D running stats after the two D-phase passes — cfgan stores
    # exactly these (the G-phase side update is discarded by design)
    d_bn_mean_after_d = td.bns[0].running_mean.detach().clone().numpy()

    # ---- torch replay: G through updated D, train-mode batch stats ----
    score = td(fake)  # also updates torch D running stats (discarded side)
    g_loss = -torch.log(torch.clamp(score, min=1e-12)).mean()
    opt_g.zero_grad()
    g_loss.backward()
    opt_g.step()

    # ---- the compiled step ----
    state, metrics = jax.jit(bundle.step_fn)(bundle.state, x, y, key)

    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=1e-4)
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(state.g.params["tconv0"]["ConvTranspose_0"]["kernel"]),
        tg.tconvs[0].weight.detach().numpy().transpose(2, 3, 1, 0),
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.d.params["conv1"]["Conv_0"]["kernel"]),
        td.convs[0].weight.detach().numpy().transpose(2, 3, 1, 0),
        atol=5e-5,
    )
    # G BN running stats advanced once (the single G forward)
    np.testing.assert_allclose(
        np.asarray(state.g.stats["batch_stats"]["bn0"]["mean"]),
        tg.bns[0].running_mean.detach().numpy(), atol=1e-5,
    )
    # D running stats == post-D-phase snapshot (third update discarded)
    np.testing.assert_allclose(
        np.asarray(state.d.stats["batch_stats"]["bn1"]["mean"]),
        d_bn_mean_after_d, atol=1e-5,
    )
