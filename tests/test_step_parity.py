"""Full CounteRGAN train-step parity vs a PyTorch oracle (moons pipeline).

BASELINE.md demands epoch-1 loss equivalence with the reference's eager
PyTorch semantics.  This test copies our initialized weights into torch
mirrors of the moons models, re-derives the step's sampled targets/mask with
the same PRNG helpers, replays one alternating D/G update in torch (same
order, losses, Adam hyperparameters, one spectral-norm power iteration on
the batched real+fake pass), and checks that losses AND updated parameters
agree to float32 tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cfgan.core.config import ClassifierConfig, CounterGANConfig
from cfgan.models.classifiers import MLPClassifier
from cfgan.train.builders import build_moons_countergan
from cfgan.train.classifier import train_classifier
from cfgan.train.countergan import sample_targets
from cfgan.masks.feature import random_feature_mask
from cfgan.train.state import NetState, adam_like_torch

HID = 32


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


# --------------------------------------------------------- torch mirrors
class TorchMoonsG(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fcs = tnn.ModuleList([tnn.Linear(2 + 3 + 2, HID),
                                   tnn.Linear(HID, HID),
                                   tnn.Linear(HID, HID // 2)])
        self.bns = tnn.ModuleList([tnn.BatchNorm1d(HID),
                                   tnn.BatchNorm1d(HID),
                                   tnn.BatchNorm1d(HID // 2)])
        self.out = tnn.Linear(HID // 2, 2)

    def forward(self, x, oh, mask):
        h = torch.cat([x, oh, mask], 1)
        for fc, bn in zip(self.fcs, self.bns):
            h = F.relu(bn(fc(h)))
        raw = self.out(h)
        return raw, raw * mask


class TorchSpectralD(tnn.Module):
    """Manual spectral norm matching cfgan.nn.layers.SpectralLinear: one
    power iteration per *batch* on the train pass, u carried as a buffer."""

    def __init__(self, dims=(HID, HID // 2, HID // 2)):
        super().__init__()
        widths = [2 + 3, *dims, 1]
        self.fcs = tnn.ModuleList(
            [tnn.Linear(i, o) for i, o in zip(widths[:-1], widths[1:])]
        )
        self.us = [None] * len(self.fcs)

    def layer(self, i, h, update):
        W = self.fcs[i].weight  # (out, in); our kernel K = W^T
        u = self.us[i]
        if update:
            with torch.no_grad():
                v = F.normalize(W.t() @ u, dim=0, eps=1e-30)
                u = F.normalize(W @ v, dim=0, eps=1e-30)
                self.us[i] = u
        else:
            with torch.no_grad():
                v = F.normalize(W.t() @ u, dim=0, eps=1e-30)
        sigma = torch.einsum("i,oi,o->", v.detach(), W, u.detach())
        return h @ (W / sigma).t() + self.fcs[i].bias

    def forward(self, x, oh, update):
        h = torch.cat([x, oh], 1)
        for i in range(len(self.fcs) - 1):
            h = F.leaky_relu(self.layer(i, h, update), 0.2)
        return self.layer(len(self.fcs) - 1, h, update)


class TorchClf(tnn.Module):
    def __init__(self):
        super().__init__()
        self.f1, self.f2, self.f3 = (tnn.Linear(2, 32), tnn.Linear(32, 32),
                                     tnn.Linear(32, 3))

    def forward(self, x):
        return self.f3(F.relu(self.f2(F.relu(self.f1(x)))))


def _copy_linear(tl, p):
    tl.weight.data = _t(p["kernel"]).t().contiguous()
    tl.bias.data = _t(p["bias"])


def _build_torch(bundle, clf_state):
    gp = bundle.state.g.params
    tg = TorchMoonsG()
    for i in range(3):
        _copy_linear(tg.fcs[i], gp[f"Linear_{i}"])
        bn = gp[f"BatchNorm_{i}"]
        tg.bns[i].weight.data = _t(bn["scale"])
        tg.bns[i].bias.data = _t(bn["bias"])
    _copy_linear(tg.out, gp["Linear_3"])

    dp = bundle.state.d.params
    du = bundle.state.d.stats["spectral_stats"]
    td = TorchSpectralD()
    for i, name in enumerate(["sn0", "sn1", "sn2", "sn_out"]):
        _copy_linear(td.fcs[i], dp[name])
        td.us[i] = _t(du[name]["u"])

    cp = clf_state.params
    tc = TorchClf()
    for tl, name in ((tc.f1, "Linear_0"), (tc.f2, "Linear_1"),
                     (tc.f3, "Linear_2")):
        _copy_linear(tl, cp[name])
    return tg, td, tc


@pytest.mark.slow
def test_one_step_loss_and_param_parity(moons_data):
    (xtr, ytr), _, _ = moons_data
    cfg = CounterGANConfig(
        lr_g=1e-3, lr_d=1e-3, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=5.0, lambda_reg_l2=5.0, lambda_mask=3.0,
    )
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=30), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(cfg, clf_model, clf_state, seed=11)
    x = jnp.asarray(xtr[:64])
    y = jnp.asarray(ytr[:64])
    key = jax.random.key(5)

    # re-derive the step's internal samples (same fold_in convention)
    k_t, k_m, k_g = jax.random.split(jax.random.fold_in(key, 0), 3)
    t = sample_targets(k_t, y, 3, resample=True)
    mask = random_feature_mask(k_m, 64, 2, ())

    tg, td, tc = _build_torch(bundle, clf_state)
    xt, yt = _t(x), torch.tensor(np.asarray(y), dtype=torch.long)
    tt = torch.tensor(np.asarray(t), dtype=torch.long)
    mt = _t(mask)
    oh_y = F.one_hot(yt, 3).float()
    oh_t = F.one_hot(tt, 3).float()

    opt_d = torch.optim.Adam(td.parameters(), lr=cfg.lr_d)
    opt_g = torch.optim.Adam(tg.parameters(), lr=cfg.lr_g)

    # ---- torch replay: D update (batched real+fake, one power iter) ----
    raw, masked = tg(xt, oh_t, mt)
    x_cf = xt + masked
    scores = td(torch.cat([xt, x_cf.detach()], 0),
                torch.cat([oh_y, oh_t], 0), update=True)
    real_s, fake_s = scores[:64], scores[64:]
    d_loss = -real_s.mean() + fake_s.mean()
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()

    # ---- torch replay: G update through the updated D ----
    adv = -td(x_cf, oh_t, update=False).mean()
    cls = F.cross_entropy(tc(x_cf), tt)
    l1 = masked.abs().sum(1).mean()
    l2 = (masked.pow(2).sum(1) + 1e-24).sqrt().mean()
    pen = (raw * (1 - mt)).abs().mean()
    g_loss = (cfg.lambda_adv * adv + cfg.lambda_cls * cls
              + cfg.lambda_reg_l1 * l1 + cfg.lambda_reg_l2 * l2
              + cfg.lambda_mask * pen)
    opt_g.zero_grad()
    g_loss.backward()
    opt_g.step()

    # ---- our compiled step ----
    state, metrics = jax.jit(bundle.step_fn)(bundle.state, x, y, key)

    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=2e-5)
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=2e-4)
    # updated parameters agree (first + last generator layer, one D layer)
    np.testing.assert_allclose(
        np.asarray(state.g.params["Linear_0"]["kernel"]),
        tg.fcs[0].weight.detach().numpy().T, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.g.params["Linear_3"]["kernel"]),
        tg.out.weight.detach().numpy().T, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(state.d.params["sn0"]["kernel"]),
        td.fcs[0].weight.detach().numpy().T, atol=2e-5,
    )
    # BN running stats advanced identically (momentum 0.1 torch convention)
    np.testing.assert_allclose(
        np.asarray(state.g.stats["batch_stats"]["BatchNorm_0"]["mean"]),
        tg.bns[0].running_mean.detach().numpy(), atol=1e-5,
    )
