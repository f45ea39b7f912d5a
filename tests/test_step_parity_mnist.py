"""Full MNIST CounteRGAN train-step parity vs a PyTorch oracle: conv
generator with BatchNorm + label planes, bias-free conditional conv
discriminator, CNN classifier, BCE adversarial losses, Adam — one complete
alternating D/G update must produce the same losses, parameters and BN
running statistics as eager PyTorch with copied weights
(the image-family counterpart of tests/test_step_parity.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cfgan.core.config import CounterGANConfig, MaskConfig
from cfgan.masks.patch import random_patch_mask
from cfgan.models.classifiers import CNNClassifier
from cfgan.train.builders import build_mnist_countergan
from cfgan.train.countergan import sample_targets
from cfgan.train.state import NetState, adam_like_torch

CH = 8
NRB = 1
B = 16


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def _copy_conv(tc, p):
    tc.weight.data = torch.tensor(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
    )
    if tc.bias is not None:
        tc.bias.data = torch.tensor(np.asarray(p["bias"]))


def _copy_linear(tl, p):
    tl.weight.data = _t(p["kernel"]).t().contiguous()
    tl.bias.data = _t(p["bias"])


class TorchG(tnn.Module):
    def __init__(self):
        super().__init__()
        self.emb = tnn.Embedding(10, 784)
        self.cin = tnn.Conv2d(3, CH, 3, 1, 1)
        self.blocks = tnn.ModuleList([
            tnn.ModuleDict({
                "c1": tnn.Conv2d(CH, CH, 3, 1, 1), "b1": tnn.BatchNorm2d(CH),
                "c2": tnn.Conv2d(CH, CH, 3, 1, 1), "b2": tnn.BatchNorm2d(CH),
            }) for _ in range(NRB)
        ])
        self.mid = tnn.Conv2d(CH, CH, 3, 1, 1)
        self.out = tnn.Conv2d(CH, 1, 3, 1, 1)

    def forward(self, x, t, m):
        plane = self.emb(t).view(-1, 1, 28, 28)
        z = F.leaky_relu(self.cin(torch.cat([x, plane, m], 1)), 0.2)
        for blk in self.blocks:
            h = F.leaky_relu(blk["b1"](blk["c1"](z)), 0.2)
            z = z + 0.1 * blk["b2"](blk["c2"](h))
        z = F.leaky_relu(self.mid(z), 0.2)
        raw = self.out(z) * 0.1
        return raw, raw * m


class TorchD(tnn.Module):
    """Mirror of CondConvDiscriminator: label plane concat, bias-free
    strided convs, global average pool, linear logit head."""

    def __init__(self):
        super().__init__()
        self.emb = tnn.Embedding(10, 784)
        chans = [(2, CH), (CH, CH * 2), (CH * 4, CH * 4)]
        self.convs = tnn.ModuleList([
            tnn.Conv2d(2, CH, 3, 2, 1, bias=False),
            tnn.Conv2d(CH, CH * 2, 3, 2, 1, bias=False),
            tnn.Conv2d(CH * 2, CH * 4, 3, 2, 1, bias=False),
            tnn.Conv2d(CH * 4, CH * 4, 3, 2, 1, bias=False),
        ])
        self.fc = tnn.Linear(CH * 4, 1)

    def forward(self, x, t):
        h = torch.cat([x, self.emb(t).view(-1, 1, 28, 28)], 1)
        for c in self.convs:
            h = F.leaky_relu(c(h), 0.2)
        return self.fc(h.mean(dim=(2, 3)))


class TorchClf(tnn.Module):
    def __init__(self):
        super().__init__()
        self.c1 = tnn.Conv2d(1, 32, 3, 1, 1)
        self.c2 = tnn.Conv2d(32, 64, 3, 2, 1)
        self.c3 = tnn.Conv2d(64, 128, 3, 2, 1)
        self.f1 = tnn.Linear(128 * 7 * 7, 256)
        self.f2 = tnn.Linear(256, 10)

    def forward(self, x):
        h = F.relu(self.c1(x))
        h = F.relu(self.c2(h))
        h = F.relu(self.c3(h))
        # NHWC flatten order (our CNNClassifier reshapes NHWC)
        h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)
        return self.f2(F.relu(self.f1(h)))


def _build_torch(bundle, clf_state):
    gp = bundle.state.g.params
    gs = bundle.state.g.stats["batch_stats"]
    tg = TorchG()
    tg.emb.weight.data = _t(gp["embed"]["embedding"])
    _copy_conv(tg.cin, gp["conv_in"]["Conv_0"])
    for i, blk in enumerate(tg.blocks):
        rp, rs = gp[f"res{i}"], gs[f"res{i}"]
        _copy_conv(blk["c1"], rp["conv1"]["Conv_0"])
        _copy_conv(blk["c2"], rp["conv2"]["Conv_0"])
        for bn_t, name in ((blk["b1"], "bn1"), (blk["b2"], "bn2")):
            bn_t.weight.data = _t(rp[name]["scale"])
            bn_t.bias.data = _t(rp[name]["bias"])
            bn_t.running_mean.data = _t(rs[name]["mean"])
            bn_t.running_var.data = _t(rs[name]["var"])
    _copy_conv(tg.mid, gp["conv_mid"]["Conv_0"])
    _copy_conv(tg.out, gp["conv_out"]["Conv_0"])

    dp = bundle.state.d.params
    td = TorchD()
    td.emb.weight.data = _t(dp["cond_embed"]["embedding"])
    for i in range(4):
        _copy_conv(td.convs[i], dp[f"conv{i}"]["Conv_0"])
    _copy_linear(td.fc, dp["adv_head"])

    cp = clf_state.params
    tc = TorchClf()
    _copy_conv(tc.c1, cp["Conv_0"]["Conv_0"])
    _copy_conv(tc.c2, cp["Conv_1"]["Conv_0"])
    _copy_conv(tc.c3, cp["Conv_2"]["Conv_0"])
    _copy_linear(tc.f1, cp["Linear_0"])
    _copy_linear(tc.f2, cp["Linear_1"])
    return tg, td, tc


@pytest.mark.slow
def test_mnist_one_step_parity():
    cfg = CounterGANConfig(
        lr_g=5e-5, lr_d=1e-5, lambda_adv=1.0, lambda_cls=1.0,
        lambda_reg_l1=2.5, lambda_reg_l2=0.0, lambda_mask=2.0,
        adv_loss="bce", reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
        resample_target=False, num_res_blocks=NRB, hidden_dim=CH,
        mask=MaskConfig(kind="patch", patch_size=7,
                        num_modifiable_patches=10),
    )
    clf_model = CNNClassifier()
    clf_state = NetState.create(
        clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                       train=False),
        adam_like_torch(1e-3),
    )
    bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=7)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, B))
    key = jax.random.key(3)

    # re-derive the step's internal samples (fold_in(key, step=0) convention)
    k_t, k_m, k_g = jax.random.split(jax.random.fold_in(key, 0), 3)
    t = sample_targets(k_t, y, 10, resample=False)
    mask = random_patch_mask(k_m, B, (28, 28), 7, 10, channels=1)

    tg, td, tc = _build_torch(bundle, clf_state)
    xt = _t(x).permute(0, 3, 1, 2).contiguous()
    mt = _t(mask).permute(0, 3, 1, 2).contiguous()
    yt = torch.tensor(np.asarray(y), dtype=torch.long)
    tt = torch.tensor(np.asarray(t), dtype=torch.long)
    opt_d = torch.optim.Adam(td.parameters(), lr=cfg.lr_d)
    opt_g = torch.optim.Adam(tg.parameters(), lr=cfg.lr_g)
    bce = tnn.BCEWithLogitsLoss()

    # ---- torch replay: one alternating update, same semantics ----
    raw, masked = tg(xt, tt, mt)
    x_cf = torch.clamp(xt + masked, -1, 1)
    scores = td(torch.cat([xt, x_cf.detach()], 0), torch.cat([yt, tt], 0))
    real_s, fake_s = scores[:B], scores[B:]
    d_loss = bce(real_s, torch.ones_like(real_s)) + bce(
        fake_s, torch.zeros_like(fake_s)
    )
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()

    adv = bce(td(x_cf, tt), torch.ones(B, 1))
    cls = F.cross_entropy(tc(x_cf), tt)
    l1 = masked.abs().mean()
    pen = (raw * (1 - mt)).abs().mean()
    g_loss = (cfg.lambda_adv * adv + cfg.lambda_cls * cls
              + cfg.lambda_reg_l1 * l1 + cfg.lambda_mask * pen)
    opt_g.zero_grad()
    g_loss.backward()
    opt_g.step()

    # ---- our compiled step ----
    state, metrics = jax.jit(bundle.step_fn)(bundle.state, x, y, key)

    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=3e-5)
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(state.g.params["conv_in"]["Conv_0"]["kernel"]),
        tg.cin.weight.detach().numpy().transpose(2, 3, 1, 0), atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.d.params["conv0"]["Conv_0"]["kernel"]),
        td.convs[0].weight.detach().numpy().transpose(2, 3, 1, 0), atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.g.params["embed"]["embedding"]),
        tg.emb.weight.detach().numpy(), atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.g.stats["batch_stats"]["res0"]["bn1"]["mean"]),
        tg.blocks[0]["b1"].running_mean.detach().numpy(), atol=1e-5,
    )
