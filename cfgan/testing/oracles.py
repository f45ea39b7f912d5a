"""PyTorch oracles for CounteRGAN step/epoch parity.

The BASELINE.json north star is epoch-1 loss equivalence with the eager
PyTorch reference.  These classes rebuild the reference training semantics
in torch (`conditional_counteRGAN/moons/trainer.py:58-108`,
`conditional_counteRGAN/mnist/trainer.py:89-137`) with weights copied from a
cfgan `CounterGANBundle`, so the compiled JAX step can be replayed against
eager PyTorch step-by-step over whole epochs: same data order, same sampled
targets/masks (re-derived from the same JAX PRNG streams), same optimizer
and BatchNorm semantics.

`run_parity_trace` drives BOTH sides — the scanned production epoch runner
on the cfgan side, a per-batch eager loop on the torch side — and returns
per-step |Δd_loss| / |Δg_loss| traces plus final parameter drift.

torch runs on CPU and is an oracle only; nothing in the cfgan runtime
imports this module.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cfgan.train.countergan import make_epoch_runner, sample_targets


def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float32)


def copy_linear(tl, p):
    """flax Dense {kernel (in,out), bias} -> torch Linear."""
    tl.weight.data = _t(p["kernel"]).t().contiguous()
    tl.bias.data = _t(p["bias"])


def copy_conv(tc, p):
    """flax Conv {kernel (kh,kw,in,out)} -> torch Conv2d (out,in,kh,kw)."""
    tc.weight.data = torch.tensor(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
    )
    if tc.bias is not None:
        tc.bias.data = torch.tensor(np.asarray(p["bias"]))


# =============================================================== moons family
class TorchMoonsG(tnn.Module):
    """Mirror of MoonsResidualGenerator (`moons/models/generator.py:4-24`
    semantics): concat[x, onehot, mask] -> 3x (Linear+BN1d+ReLU) -> Linear."""

    def __init__(self, hidden: int = 32, input_dim: int = 2,
                 num_classes: int = 3):
        super().__init__()
        widths = [input_dim + num_classes + input_dim, hidden, hidden,
                  hidden // 2]
        self.fcs = tnn.ModuleList(
            [tnn.Linear(i, o) for i, o in zip(widths[:-1], widths[1:])]
        )
        self.bns = tnn.ModuleList([tnn.BatchNorm1d(w) for w in widths[1:]])
        self.out = tnn.Linear(hidden // 2, input_dim)

    def forward(self, x, oh, mask):
        h = torch.cat([x, oh, mask], 1)
        for fc, bn in zip(self.fcs, self.bns):
            h = F.relu(bn(fc(h)))
        raw = self.out(h)
        return raw, raw * mask


class TorchSpectralD(tnn.Module):
    """Spectral-norm MLP discriminator matching cfgan's SpectralLinear
    semantics (one power iteration per *batch* on the train pass, `u`
    carried; torch reference: `moons/models/discriminator.py:6-22`)."""

    def __init__(self, hidden_dims, in_dim: int):
        super().__init__()
        widths = [in_dim, *hidden_dims, 1]
        self.fcs = tnn.ModuleList(
            [tnn.Linear(i, o) for i, o in zip(widths[:-1], widths[1:])]
        )
        self.us = [None] * len(self.fcs)

    def layer(self, i, h, update):
        W = self.fcs[i].weight  # (out, in); cfgan kernel K = W^T
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


class TorchMoonsClf(tnn.Module):
    """Mirror of MLPClassifier (`moons/models/nn_classifier.py:3-15`)."""

    def __init__(self, hidden: int = 32, input_dim: int = 2,
                 num_classes: int = 3):
        super().__init__()
        self.f1 = tnn.Linear(input_dim, hidden)
        self.f2 = tnn.Linear(hidden, hidden)
        self.f3 = tnn.Linear(hidden, num_classes)

    def forward(self, x):
        return self.f3(F.relu(self.f2(F.relu(self.f1(x)))))


# =============================================================== mnist family
class TorchMnistG(tnn.Module):
    """Mirror of ImageResidualGenerator (`mnist/models/generator.py:5-86`):
    label plane, damped resblocks, residual scaling."""

    def __init__(self, ch: int, nrb: int, num_classes: int = 10,
                 scaling: float = 0.1):
        super().__init__()
        self.scaling = scaling
        self.emb = tnn.Embedding(num_classes, 784)
        self.cin = tnn.Conv2d(3, ch, 3, 1, 1)
        self.blocks = tnn.ModuleList([
            tnn.ModuleDict({
                "c1": tnn.Conv2d(ch, ch, 3, 1, 1), "b1": tnn.BatchNorm2d(ch),
                "c2": tnn.Conv2d(ch, ch, 3, 1, 1), "b2": tnn.BatchNorm2d(ch),
            }) for _ in range(nrb)
        ])
        self.mid = tnn.Conv2d(ch, ch, 3, 1, 1)
        self.out = tnn.Conv2d(ch, 1, 3, 1, 1)

    def forward(self, x, t, m):
        plane = self.emb(t).view(-1, 1, 28, 28)
        z = F.leaky_relu(self.cin(torch.cat([x, plane, m], 1)), 0.2)
        for blk in self.blocks:
            h = F.leaky_relu(blk["b1"](blk["c1"](z)), 0.2)
            z = z + 0.1 * blk["b2"](blk["c2"](h))
        z = F.leaky_relu(self.mid(z), 0.2)
        raw = self.out(z) * self.scaling
        return raw, raw * m


class TorchMnistD(tnn.Module):
    """Mirror of CondConvDiscriminator (`mnist/models/discriminator.py:5-38`):
    label plane concat, bias-free strided convs, global avg pool, logit
    head."""

    def __init__(self, ch: int, num_classes: int = 10):
        super().__init__()
        self.emb = tnn.Embedding(num_classes, 784)
        self.convs = tnn.ModuleList([
            tnn.Conv2d(2, ch, 3, 2, 1, bias=False),
            tnn.Conv2d(ch, ch * 2, 3, 2, 1, bias=False),
            tnn.Conv2d(ch * 2, ch * 4, 3, 2, 1, bias=False),
            tnn.Conv2d(ch * 4, ch * 4, 3, 2, 1, bias=False),
        ])
        self.fc = tnn.Linear(ch * 4, 1)

    def forward(self, x, t):
        h = torch.cat([x, self.emb(t).view(-1, 1, 28, 28)], 1)
        for c in self.convs:
            h = F.leaky_relu(c(h), 0.2)
        return self.fc(h.mean(dim=(2, 3)))


class TorchMnistClf(tnn.Module):
    """Mirror of CNNClassifier (`mnist/models/classifier.py:4-28`), NHWC
    flatten order to match the cfgan reshape."""

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
        h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)
        return self.f2(F.relu(self.f1(h)))


# ================================================================== oracles
class MoonsCounterganOracle:
    """Eager replay of `moons/trainer.py:58-108` (WGAN-style D, 4-term G
    loss with both L1 and L2 proximity) with weights copied from a cfgan
    bundle.  Torch optimizer + BN + spectral-u state persist across steps."""

    def __init__(self, bundle, clf_state, cfg, num_classes: int = 3):
        self.cfg = cfg
        self.num_classes = num_classes
        hidden = cfg.hidden_dim
        gp = bundle.state.g.params
        self.tg = TorchMoonsG(hidden=hidden, num_classes=num_classes)
        for i in range(3):
            copy_linear(self.tg.fcs[i], gp[f"Linear_{i}"])
            bn = gp[f"BatchNorm_{i}"]
            self.tg.bns[i].weight.data = _t(bn["scale"])
            self.tg.bns[i].bias.data = _t(bn["bias"])
        copy_linear(self.tg.out, gp["Linear_3"])

        dp = bundle.state.d.params
        du = bundle.state.d.stats["spectral_stats"]
        self.td = TorchSpectralD(
            (hidden, hidden // 2, hidden // 2), in_dim=2 + num_classes
        )
        for i, name in enumerate(["sn0", "sn1", "sn2", "sn_out"]):
            copy_linear(self.td.fcs[i], dp[name])
            self.td.us[i] = _t(du[name]["u"])

        cp = clf_state.params
        self.tc = TorchMoonsClf(num_classes=num_classes)
        for tl, name in ((self.tc.f1, "Linear_0"), (self.tc.f2, "Linear_1"),
                         (self.tc.f3, "Linear_2")):
            copy_linear(tl, cp[name])
        self.tc.eval()

        self.opt_d = torch.optim.Adam(self.td.parameters(), lr=cfg.lr_d)
        self.opt_g = torch.optim.Adam(self.tg.parameters(), lr=cfg.lr_g)

    def step(self, x, y, t, mask, k_g=None):
        cfg = self.cfg
        b = x.shape[0]
        xt, mt = _t(x), _t(mask)
        yt = torch.tensor(np.asarray(y), dtype=torch.long)
        tt = torch.tensor(np.asarray(t), dtype=torch.long)
        oh_y = F.one_hot(yt, self.num_classes).float()
        oh_t = F.one_hot(tt, self.num_classes).float()

        raw, masked = self.tg(xt, oh_t, mt)
        x_cf = xt + masked
        scores = self.td(torch.cat([xt, x_cf.detach()], 0),
                         torch.cat([oh_y, oh_t], 0), update=True)
        real_s, fake_s = scores[:b], scores[b:]
        d_loss = -real_s.mean() + fake_s.mean()
        self.opt_d.zero_grad()
        d_loss.backward()
        self.opt_d.step()

        adv = -self.td(x_cf, oh_t, update=False).mean()
        cls = F.cross_entropy(self.tc(x_cf), tt)
        l1 = masked.abs().sum(1).mean()
        l2 = (masked.pow(2).sum(1) + 1e-24).sqrt().mean()
        pen = (raw * (1 - mt)).abs().mean()
        g_loss = (cfg.lambda_adv * adv + cfg.lambda_cls * cls
                  + cfg.lambda_reg_l1 * l1 + cfg.lambda_reg_l2 * l2
                  + cfg.lambda_mask * pen)
        self.opt_g.zero_grad()
        g_loss.backward()
        self.opt_g.step()
        return {"d_loss": d_loss.item(), "g_loss": g_loss.item()}

    def param_pairs(self, state):
        """(jax_array, torch_array) pairs for drift measurement.

        Deliberately excludes biases that feed directly into BatchNorm (and
        the BN running means that absorb them): their true gradient is
        mathematically ZERO (BN subtracts the batch mean), so both
        implementations compute ~1e-10 float noise with arbitrary signs and
        Adam's bias-corrected first step turns any nonzero gradient into a
        full ±lr kick — an arbitrary random walk present in the eager
        reference itself, with no effect on the function (BN cancels the
        bias).  Functional parity is measured by `cf_eval` instead.
        """
        return [
            (np.asarray(state.g.params["Linear_0"]["kernel"]),
             self.tg.fcs[0].weight.detach().numpy().T),
            (np.asarray(state.g.params["Linear_3"]["kernel"]),
             self.tg.out.weight.detach().numpy().T),
            (np.asarray(state.g.params["Linear_3"]["bias"]),
             self.tg.out.bias.detach().numpy()),
            (np.asarray(state.d.params["sn0"]["kernel"]),
             self.td.fcs[0].weight.detach().numpy().T),
            (np.asarray(state.g.params["BatchNorm_0"]["scale"]),
             self.tg.bns[0].weight.detach().numpy()),
        ]

    def cf_eval(self, x, t, mask):
        """Eval-mode counterfactual (running stats), the functional parity
        probe (`moons/eval_utils.py` semantics: x + masked, no clamp)."""
        self.tg.eval()
        with torch.no_grad():
            xt, mt = _t(x), _t(mask)
            oh_t = F.one_hot(
                torch.tensor(np.asarray(t), dtype=torch.long),
                self.num_classes,
            ).float()
            _, masked = self.tg(xt, oh_t, mt)
            out = (xt + masked).numpy()
        self.tg.train()
        return out


class MnistCounterganOracle:
    """Eager replay of `mnist/trainer.py:89-137` (BCE-with-logits D, 4-term
    G loss, clamp to [-1,1], mean-abs reductions) with weights copied from a
    cfgan bundle."""

    def __init__(self, bundle, clf_state, cfg, num_classes: int = 10):
        self.cfg = cfg
        ch, nrb = cfg.hidden_dim, cfg.num_res_blocks
        gp = bundle.state.g.params
        gs = bundle.state.g.stats["batch_stats"]
        self.tg = TorchMnistG(ch, nrb, num_classes=num_classes,
                              scaling=cfg.residual_scaling)
        self.tg.emb.weight.data = _t(gp["embed"]["embedding"])
        copy_conv(self.tg.cin, gp["conv_in"]["Conv_0"])
        for i, blk in enumerate(self.tg.blocks):
            rp, rs = gp[f"res{i}"], gs[f"res{i}"]
            copy_conv(blk["c1"], rp["conv1"]["Conv_0"])
            copy_conv(blk["c2"], rp["conv2"]["Conv_0"])
            for bn_t, name in ((blk["b1"], "bn1"), (blk["b2"], "bn2")):
                bn_t.weight.data = _t(rp[name]["scale"])
                bn_t.bias.data = _t(rp[name]["bias"])
                bn_t.running_mean.data = _t(rs[name]["mean"])
                bn_t.running_var.data = _t(rs[name]["var"])
        copy_conv(self.tg.mid, gp["conv_mid"]["Conv_0"])
        copy_conv(self.tg.out, gp["conv_out"]["Conv_0"])

        dp = bundle.state.d.params
        self.td = TorchMnistD(ch, num_classes=num_classes)
        self.td.emb.weight.data = _t(dp["cond_embed"]["embedding"])
        for i in range(4):
            copy_conv(self.td.convs[i], dp[f"conv{i}"]["Conv_0"])
        copy_linear(self.td.fc, dp["adv_head"])

        cp = clf_state.params
        self.tc = TorchMnistClf()
        copy_conv(self.tc.c1, cp["Conv_0"]["Conv_0"])
        copy_conv(self.tc.c2, cp["Conv_1"]["Conv_0"])
        copy_conv(self.tc.c3, cp["Conv_2"]["Conv_0"])
        copy_linear(self.tc.f1, cp["Linear_0"])
        copy_linear(self.tc.f2, cp["Linear_1"])
        self.tc.eval()

        self.opt_d = torch.optim.Adam(self.td.parameters(), lr=cfg.lr_d)
        self.opt_g = torch.optim.Adam(self.tg.parameters(), lr=cfg.lr_g)
        self.bce = tnn.BCEWithLogitsLoss()

    def step(self, x, y, t, mask, k_g=None):
        cfg = self.cfg
        b = x.shape[0]
        xt = _t(x).permute(0, 3, 1, 2).contiguous()
        mt = _t(mask).permute(0, 3, 1, 2).contiguous()
        yt = torch.tensor(np.asarray(y), dtype=torch.long)
        tt = torch.tensor(np.asarray(t), dtype=torch.long)

        raw, masked = self.tg(xt, tt, mt)
        x_cf = torch.clamp(xt + masked, -1, 1)
        scores = self.td(torch.cat([xt, x_cf.detach()], 0),
                         torch.cat([yt, tt], 0))
        real_s, fake_s = scores[:b], scores[b:]
        d_loss = self.bce(real_s, torch.ones_like(real_s)) + self.bce(
            fake_s, torch.zeros_like(fake_s)
        )
        self.opt_d.zero_grad()
        d_loss.backward()
        self.opt_d.step()

        adv = self.bce(self.td(x_cf, tt), torch.ones(b, 1))
        cls = F.cross_entropy(self.tc(x_cf), tt)
        l1 = masked.abs().mean()
        pen = (raw * (1 - mt)).abs().mean()
        g_loss = (cfg.lambda_adv * adv + cfg.lambda_cls * cls
                  + cfg.lambda_reg_l1 * l1 + cfg.lambda_mask * pen)
        self.opt_g.zero_grad()
        g_loss.backward()
        self.opt_g.step()
        return {"d_loss": d_loss.item(), "g_loss": g_loss.item()}

    def param_pairs(self, state):
        """Function-relevant parameter pairs (see the moons oracle's note on
        why BN-cancelled biases / running means are excluded — here that is
        conv1's bias inside each resblock)."""
        return [
            (np.asarray(state.g.params["conv_in"]["Conv_0"]["kernel"]),
             self.tg.cin.weight.detach().numpy().transpose(2, 3, 1, 0)),
            (np.asarray(state.g.params["embed"]["embedding"]),
             self.tg.emb.weight.detach().numpy()),
            (np.asarray(state.g.params["res0"]["conv1"]["Conv_0"]["kernel"]),
             self.tg.blocks[0]["c1"].weight.detach().numpy()
             .transpose(2, 3, 1, 0)),
            (np.asarray(state.g.params["conv_out"]["Conv_0"]["kernel"]),
             self.tg.out.weight.detach().numpy().transpose(2, 3, 1, 0)),
            (np.asarray(state.d.params["conv0"]["Conv_0"]["kernel"]),
             self.td.convs[0].weight.detach().numpy().transpose(2, 3, 1, 0)),
        ]

    def cf_eval(self, x, t, mask):
        """Eval-mode counterfactual with clamp (`mnist/trainer.py:97`)."""
        self.tg.eval()
        with torch.no_grad():
            xt = _t(x).permute(0, 3, 1, 2).contiguous()
            mt = _t(mask).permute(0, 3, 1, 2).contiguous()
            tt = torch.tensor(np.asarray(t), dtype=torch.long)
            _, masked = self.tg(xt, tt, mt)
            out = torch.clamp(xt + masked, -1, 1).permute(0, 2, 3, 1).numpy()
        self.tg.train()
        return out


# ============================================================== house family
class TorchFiLMBlock(tnn.Module):
    """Linear-BN-FiLM-ReLU-Linear-BN-FiLM + skip with ONE shared FiLM
    (`house models/generator.py:19-35`)."""

    def __init__(self, hidden: int, cond_dim: int):
        super().__init__()
        self.fc1 = tnn.Linear(hidden, hidden)
        self.bn1 = tnn.BatchNorm1d(hidden)
        self.fc2 = tnn.Linear(hidden, hidden)
        self.bn2 = tnn.BatchNorm1d(hidden)
        self.gamma = tnn.Linear(cond_dim, hidden)
        self.beta = tnn.Linear(cond_dim, hidden)

    def film(self, h, cond):
        return self.gamma(cond) * h + self.beta(cond)

    def forward(self, h, cond):
        out = F.relu(self.film(self.bn1(self.fc1(h)), cond))
        out = self.film(self.bn2(self.fc2(out)), cond)
        return h + out


class TorchTabularG(tnn.Module):
    """Mirror of TabularResidualGenerator (`house models/generator.py:38-91`):
    FiLM residual blocks, 0.1-scaled continuous head, per-categorical-feature
    logits heads sampled with EXPLICIT-noise Gumbel-Softmax (soft or hard/
    straight-through forward value)."""

    def __init__(self, input_dim: int, hidden: int, num_classes: int,
                 n_blocks: int, cont_idx, cat_info,
                 residual_scaling: float = 0.1):
        super().__init__()
        cond_dim = num_classes + input_dim
        self.scaling = residual_scaling
        self.fc_in = tnn.Linear(input_dim + cond_dim, hidden)
        self.blocks = tnn.ModuleList(
            [TorchFiLMBlock(hidden, cond_dim) for _ in range(n_blocks)]
        )
        self.fc_cont = tnn.Linear(hidden, len(cont_idx))
        self.fc_cat = tnn.ModuleDict(
            {str(i): tnn.Linear(hidden, len(v)) for i, v in cat_info.items()}
        )

    def forward(self, x, t_oh, mask, noise, tau, hard: bool = False):
        cond = torch.cat([t_oh, mask], 1)
        h = F.relu(self.fc_in(torch.cat([x, cond], 1)))
        for blk in self.blocks:
            h = blk(h, cond)
        cont = self.fc_cont(h) * self.scaling
        logits, samples = {}, {}
        for i in sorted(int(k) for k in self.fc_cat):
            lg = self.fc_cat[str(i)](h)
            logits[i] = lg
            # F.gumbel_softmax with EXPLICIT noise
            y = F.softmax((lg + noise[i]) / tau, dim=-1)
            if hard:
                oh = F.one_hot(y.argmax(-1), y.shape[-1]).float()
                y = oh + y - y.detach()  # straight-through
            samples[i] = y
        return cont, logits, samples


class TorchTabularClf(tnn.Module):
    """Mirror of TabularClassifier (`house models/nn_classifier.py:4-32`):
    Linear -> LeakyReLU(.1) -> BN -> Dropout; eval mode only (dropout off,
    BN running stats) — the classifier is frozen during GAN training."""

    def __init__(self, input_dim: int, num_classes: int):
        super().__init__()
        widths = [(input_dim, 256), (256, 256), (256, 128), (128, 64)]
        self.fcs = tnn.ModuleList([tnn.Linear(i, o) for i, o in widths])
        self.bns = tnn.ModuleList([tnn.BatchNorm1d(o) for _, o in widths])
        self.out = tnn.Linear(64, num_classes)

    def forward(self, x):
        for fc, bn in zip(self.fcs, self.bns):
            x = bn(F.leaky_relu(fc(x), 0.1))
        return self.out(x)


class TabularCounterganOracle:
    """Eager replay of `house trainer.py:240-316` (FiLM generator with
    Gumbel-Softmax heads, residual assembly, spectral-norm D, WGAN-style D
    loss, 4-term G loss with per-sample L1 norms) with weights copied from
    a cfgan bundle built with `explicit_gumbel=True`: both sides derive the
    SAME per-step Gumbel noise from the step key via
    `derive_gumbel_noise(k_g, ...)` (`cfgan/models/tabular.py`)."""

    def __init__(self, bundle, clf_state, cfg, schema, stats,
                 num_classes: int = 4):
        from cfgan.models.tabular import build_cat_norm_values

        self.cfg = cfg
        self.schema = schema
        self.num_classes = num_classes
        self.cat_norm_values = build_cat_norm_values(
            schema.categorical_info, stats
        )
        H = cfg.hidden_dim

        gp = bundle.state.g.params
        self.tg = TorchTabularG(
            schema.input_dim, H, num_classes, cfg.num_res_blocks,
            schema.continuous_idx, schema.categorical_info,
            residual_scaling=cfg.residual_scaling,
        )
        copy_linear(self.tg.fc_in, gp["fc_in"])
        for i, blk in enumerate(self.tg.blocks):
            bp = gp[f"block{i}"]
            copy_linear(blk.fc1, bp["fc1"])
            copy_linear(blk.fc2, bp["fc2"])
            copy_linear(blk.gamma, bp["film"]["gamma"])
            copy_linear(blk.beta, bp["film"]["beta"])
            for bn_t, name in ((blk.bn1, "bn1"), (blk.bn2, "bn2")):
                bn_t.weight.data = _t(bp[name]["scale"])
                bn_t.bias.data = _t(bp[name]["bias"])
        copy_linear(self.tg.fc_cont, gp["fc_cont"])
        for i in schema.categorical_info:
            copy_linear(self.tg.fc_cat[str(i)], gp[f"fc_cat_{i}"])

        dp = bundle.state.d.params
        du = bundle.state.d.stats["spectral_stats"]
        self.td = TorchSpectralD(
            (H, H * 2, H * 4), in_dim=schema.input_dim + num_classes
        )
        for i, name in enumerate(["sn0", "sn1", "sn2", "sn_out"]):
            copy_linear(self.td.fcs[i], dp[name])
            self.td.us[i] = _t(du[name]["u"])

        cp = clf_state.params
        cs = clf_state.stats.get("batch_stats", {})
        self.tc = TorchTabularClf(schema.input_dim, num_classes)
        for i in range(4):
            copy_linear(self.tc.fcs[i], cp[f"Linear_{i}"])
            self.tc.bns[i].weight.data = _t(cp[f"BatchNorm_{i}"]["scale"])
            self.tc.bns[i].bias.data = _t(cp[f"BatchNorm_{i}"]["bias"])
            if cs:
                self.tc.bns[i].running_mean.data = _t(
                    cs[f"BatchNorm_{i}"]["mean"])
                self.tc.bns[i].running_var.data = _t(
                    cs[f"BatchNorm_{i}"]["var"])
        copy_linear(self.tc.out, cp["Linear_4"])
        self.tc.eval()

        self.opt_d = torch.optim.Adam(self.td.parameters(), lr=cfg.lr_d)
        self.opt_g = torch.optim.Adam(self.tg.parameters(), lr=cfg.lr_g)

    def _noise(self, k_g, batch):
        from cfgan.models.tabular import derive_gumbel_noise

        noise = derive_gumbel_noise(k_g, batch, self.schema.categorical_info)
        return {i: _t(n) for i, n in noise.items()}

    def _assemble(self, x, cont, samples, mask):
        residual = torch.zeros_like(x)
        for i, fidx in enumerate(self.schema.continuous_idx):
            residual[:, fidx] = cont[:, i]
        for fidx, onehot in samples.items():
            nv = torch.tensor(np.asarray(self.cat_norm_values[fidx]),
                              dtype=torch.float32)
            residual[:, fidx] = onehot.matmul(nv) - x[:, fidx]
        return residual, residual * mask

    def step(self, x, y, t, mask, k_g=None):
        cfg = self.cfg
        b = x.shape[0]
        xt, mt = _t(x), _t(mask)
        yt = torch.tensor(np.asarray(y), dtype=torch.long)
        tt = torch.tensor(np.asarray(t), dtype=torch.long)
        oh_y = F.one_hot(yt, self.num_classes).float()
        oh_t = F.one_hot(tt, self.num_classes).float()
        noise = self._noise(k_g, b)

        cont, _, samples = self.tg(xt, oh_t, mt, noise, cfg.gumbel_tau)
        raw, masked = self._assemble(xt, cont, samples, mt)
        x_cf = xt + masked  # no clamp (`house trainer.py:281-283`)

        scores = self.td(torch.cat([xt, x_cf.detach()], 0),
                         torch.cat([oh_y, oh_t], 0), update=True)
        d_loss = -scores[:b].mean() + scores[b:].mean()
        self.opt_d.zero_grad()
        d_loss.backward()
        self.opt_d.step()

        adv = -self.td(x_cf, oh_t, update=False).mean()
        cls = F.cross_entropy(self.tc(x_cf), tt)
        l1 = torch.norm(masked, p=1, dim=1).mean()
        pen = (raw * (1 - mt)).abs().mean()
        g_loss = (cfg.lambda_adv * adv + cfg.lambda_cls * cls
                  + cfg.lambda_reg_l1 * l1 + cfg.lambda_mask * pen)
        self.opt_g.zero_grad()
        g_loss.backward()
        self.opt_g.step()
        return {"d_loss": d_loss.item(), "g_loss": g_loss.item()}

    def param_pairs(self, state):
        """Function-relevant pairs (BN-cancelled biases excluded — see the
        moons oracle's note; here that is fc1/fc2 biases inside each FiLM
        block)."""
        return [
            (np.asarray(state.g.params["fc_in"]["kernel"]),
             self.tg.fc_in.weight.detach().numpy().T),
            (np.asarray(state.g.params["fc_cont"]["kernel"]),
             self.tg.fc_cont.weight.detach().numpy().T),
            (np.asarray(state.g.params["block0"]["film"]["gamma"]["kernel"]),
             self.tg.blocks[0].gamma.weight.detach().numpy().T),
            (np.asarray(
                state.g.params[f"fc_cat_{max(self.schema.categorical_info)}"]
                ["kernel"]),
             self.tg.fc_cat[str(max(self.schema.categorical_info))]
             .weight.detach().numpy().T),
            (np.asarray(state.d.params["sn0"]["kernel"]),
             self.td.fcs[0].weight.detach().numpy().T),
        ]

    def cf_probe(self, bundle, state, x, t, mask, key):
        """Eval-mode hard-Gumbel counterfactuals from BOTH sides with the
        same derived noise, clamped to [0,1] (`house eval_utils.py:126-181`).
        The tabular cf_fn takes the extra (key, hard) args, so the probe
        owns both calls."""
        cf_jax = np.asarray(bundle.cf_fn(
            {"params": state.g.params, **state.g.stats},
            jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask), key,
            hard=True,
        )[0])
        self.tg.eval()
        with torch.no_grad():
            xt, mt = _t(x), _t(mask)
            oh_t = F.one_hot(
                torch.tensor(np.asarray(t), dtype=torch.long),
                self.num_classes,
            ).float()
            noise = self._noise(key, x.shape[0])
            cont, _, samples = self.tg(xt, oh_t, mt, noise,
                                       self.cfg.gumbel_tau, hard=True)
            _, masked = self._assemble(xt, cont, samples, mt)
            cf_torch = torch.clamp(xt + masked, 0.0, 1.0).numpy()
        self.tg.train()
        return cf_jax, cf_torch


# ============================================================== trace driver
@dataclass
class ParityTrace:
    """Per-step loss traces from both sides + final parameter drift."""

    d_jax: np.ndarray
    d_torch: np.ndarray
    g_jax: np.ndarray
    g_torch: np.ndarray
    param_drift: list = field(default_factory=list)  # (max_abs, rel) pairs
    cf_delta: float = float("nan")  # eval-mode x_cf max|Δ| on a probe batch

    @property
    def d_delta(self):
        return np.abs(self.d_jax - self.d_torch)

    @property
    def g_delta(self):
        return np.abs(self.g_jax - self.g_torch)

    def summary(self) -> dict:
        return {
            "steps": int(len(self.d_jax)),
            "d_delta_max": float(self.d_delta.max()),
            "d_delta_mean": float(self.d_delta.mean()),
            "g_delta_max": float(self.g_delta.max()),
            "g_delta_mean": float(self.g_delta.mean()),
            "param_drift_max_abs": float(
                max(p for p, _ in self.param_drift)
            ),
            "param_drift_max_rel": float(
                max(r for _, r in self.param_drift)
            ),
            "cf_eval_delta_max": float(self.cf_delta),
        }


def run_parity_trace(
    bundle,
    oracle,
    x_train,
    y_train,
    *,
    epochs: int = 1,
    batch_size: int,
    num_classes: int,
    mask_fn,  # (key, x_batch) -> mask (the bundle's sampler, re-derived)
    resample_target: bool,
    fixed_target=None,
    seed: int = 42,
    max_steps: int | None = None,
    return_state: bool = False,
) -> ParityTrace:
    """Run the SCANNED cfgan epoch runner and the eager torch oracle over
    the same shuffled epochs (same perms, same per-step target/mask
    samples, re-derived from the identical PRNG streams the compiled step
    uses) and collect per-step loss traces.

    This is the production path on the cfgan side — `make_epoch_runner`'s
    lax.scan with `reduce=False` — not a per-step re-jit.
    """
    from cfgan.data.pipeline import epoch_perm

    epoch_fn = make_epoch_runner(bundle.step_fn, donate=False, reduce=False)
    state = bundle.state
    X = jnp.asarray(x_train)
    Y = jnp.asarray(y_train)
    n = len(y_train)
    key = jax.random.key(seed)

    d_j, d_t, g_j, g_t = [], [], [], []
    gstep = 0
    done = False
    for epoch in range(epochs):
        k_perm = jax.random.fold_in(key, 2 * epoch)
        k_step = jax.random.fold_in(key, 2 * epoch + 1)
        perm = epoch_perm(k_perm, n, batch_size)
        steps = perm.shape[0]
        if max_steps is not None and gstep + steps > max_steps:
            perm = perm[: max_steps - gstep]
            steps = perm.shape[0]
            done = True
        if steps == 0:
            break

        state, stacked = epoch_fn(state, X, Y, perm, k_step)
        d_j.extend(np.asarray(stacked["d_loss"]).tolist())
        g_j.extend(np.asarray(stacked["g_loss"]).tolist())

        perm_np = np.asarray(perm)
        xs, ys = np.asarray(x_train), np.asarray(y_train)
        for i in range(steps):
            idx = perm_np[i]
            xb, yb = xs[idx], ys[idx]
            # re-derive the compiled step's internal samples: the step does
            # fold_in(k_step, state.step) with the GLOBAL step counter
            k_t, k_m, k_g = jax.random.split(
                jax.random.fold_in(k_step, gstep), 3
            )
            if fixed_target is not None:
                t = np.full(yb.shape, fixed_target, np.int64)
            else:
                t = np.asarray(sample_targets(
                    k_t, jnp.asarray(yb), num_classes, resample_target
                ))
            mask = np.asarray(mask_fn(k_m, jnp.asarray(xb)))
            m = oracle.step(xb, yb, t, mask, k_g=k_g)
            d_t.append(m["d_loss"])
            g_t.append(m["g_loss"])
            gstep += 1
        if done:
            break

    drift = []
    for a, b in oracle.param_pairs(state):
        scale = max(float(np.max(np.abs(b))), 1e-12)
        max_abs = float(np.max(np.abs(a - b)))
        drift.append((max_abs, max_abs / scale))

    # functional parity: eval-mode counterfactuals of the trained G on a
    # fixed probe batch must agree (this is the metric that matters — it is
    # invariant to the BN-cancelled-bias random walk, see `param_pairs`)
    xs, ys = np.asarray(x_train), np.asarray(y_train)
    xp, yp = xs[:batch_size], ys[:batch_size]
    kp = jax.random.fold_in(key, 10_000)
    k_t, k_m, k_cf = jax.random.split(kp, 3)
    tp = np.asarray(sample_targets(k_t, jnp.asarray(yp), num_classes, True))
    mp = np.asarray(mask_fn(k_m, jnp.asarray(xp)))
    if hasattr(oracle, "cf_probe"):
        # families whose cf_fn needs extra args (tabular: key + hard Gumbel)
        cf_jax, cf_torch = oracle.cf_probe(bundle, state, xp, tp, mp, k_cf)
    else:
        cf_jax = np.asarray(bundle.cf_fn(
            {"params": state.g.params, **state.g.stats},
            jnp.asarray(xp), jnp.asarray(tp), jnp.asarray(mp),
        )[0])
        cf_torch = oracle.cf_eval(xp, tp, mp)
    cf_delta = float(np.max(np.abs(cf_jax - cf_torch)))

    trace = ParityTrace(
        d_jax=np.asarray(d_j), d_torch=np.asarray(d_t),
        g_jax=np.asarray(g_j), g_torch=np.asarray(g_t), param_drift=drift,
        cf_delta=cf_delta,
    )
    if return_state:
        # the trained cfgan state, for end-state (distribution-level)
        # comparisons past the per-step chaos horizon; the oracle holds its
        # own trained torch modules
        return trace, state
    return trace
