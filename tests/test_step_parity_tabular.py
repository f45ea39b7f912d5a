"""Full tabular (KC-house) CounteRGAN train-step parity vs a PyTorch oracle:
FiLM residual generator with Gumbel-Softmax categorical heads, residual
assembly (continuous scatter + one-hot->normalized-scalar), spectral-norm
discriminator, frozen MLP classifier, WGAN-style D loss and the 4-term G
loss — one complete alternating update must produce the same losses and
parameters as eager PyTorch (`house trainer.py:240-316`).

The Gumbel draw is the one nondeterminism the frameworks cannot share, so
identical noise is INJECTED into both sides (gumbel_softmax's `noise`
parameter / an explicit-noise torch reimplementation of F.gumbel_softmax).
This completes step-level parity coverage for all three flagship families
(moons: test_step_parity.py, MNIST: test_step_parity_mnist.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from cfgan.core.config import CounterGANConfig
from cfgan.data.kc_house import KC_SCHEMA
from cfgan.masks.feature import random_feature_mask
from cfgan.models.classifiers import TabularClassifier
from cfgan.models.generators import TabularResidualGenerator
from cfgan.models.discriminators import SpectralMLPDiscriminator
from cfgan.models.tabular import assemble_residual, build_cat_norm_values
from cfgan.testing.oracles import (
    TorchSpectralD,
    TorchTabularClf,
    TorchTabularG,
    copy_linear,
    _t,
)
from cfgan.train.countergan import make_countergan_step, sample_targets
from cfgan.train.state import GANState, NetState, adam_like_torch

H = 32
C = 4
D_IN = KC_SCHEMA.input_dim
B = 32
TAU = 0.5
N_BLOCKS = 5


@pytest.mark.slow
def test_tabular_one_step_parity():
    cfg = CounterGANConfig(
        lr_g=1e-3, lr_d=1e-3, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=1.0, lambda_reg_l2=0.0, lambda_mask=1.0,
        resample_target=True, hidden_dim=H, num_res_blocks=N_BLOCKS,
        gumbel_tau=TAU,
    )
    schema = KC_SCHEMA
    cat_norm_values = build_cat_norm_values(schema.categorical_info, None)

    g_model = TabularResidualGenerator(
        input_dim=D_IN, hidden_dim=H, num_classes=C,
        continuous_idx=schema.continuous_idx,
        categorical_info=schema.categorical_info,
        n_blocks=N_BLOCKS, tau=TAU,
    )
    d_model = SpectralMLPDiscriminator(hidden_dims=(H, H * 2, H * 4))
    clf_model = TabularClassifier()

    x0 = jnp.zeros((2, D_IN))
    oh0 = jnp.zeros((2, C))
    kg, kd, kc = jax.random.split(jax.random.key(7), 3)
    g_vars = g_model.init({"params": kg, "gumbel": kg}, x0, oh0, x0,
                          train=False)
    d_vars = d_model.init({"params": kd}, x0, oh0)
    clf_vars = clf_model.init({"params": kc, "dropout": kc}, x0, train=False)
    tx_g = adam_like_torch(cfg.lr_g)
    tx_d = adam_like_torch(cfg.lr_d)
    state = GANState(
        g=NetState.create(g_vars, tx_g),
        d=NetState.create(d_vars, tx_d),
        step=jnp.zeros((), jnp.int32),
    )

    # ---- batch + the step's internal samples (re-derived) ----
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, D_IN)).astype(np.float32))
    y = jnp.asarray(rng.randint(0, C, B))
    key = jax.random.key(5)
    k_t, k_m, k_g = jax.random.split(jax.random.fold_in(key, 0), 3)
    t = sample_targets(k_t, y, C, resample=True)
    mask = random_feature_mask(k_m, B, D_IN, schema.immutable_idx)

    # identical injected Gumbel noise for both frameworks
    noise_np = {
        i: rng.gumbel(size=(B, len(v))).astype(np.float32)
        for i, v in sorted(schema.categorical_info.items())
    }

    def g_forward(params, stats_, xx, tt, t_oh, mm, kk):
        (cont, logits, samples), new_stats = g_model.apply(
            {"params": params, **stats_}, xx, t_oh, mm,
            temperature=TAU, hard=False, train=True,
            mutable=["batch_stats"],
            gumbel_noise={i: jnp.asarray(n) for i, n in noise_np.items()},
        )
        raw = assemble_residual(xx, cont, samples, schema.continuous_idx,
                                cat_norm_values)
        return (raw, raw * mm), new_stats

    def d_forward(params, stats_, xx, tt, t_oh, train):
        if train:
            scores, new_stats = d_model.apply(
                {"params": params, **stats_}, xx, t_oh, update_stats=True,
                mutable=["spectral_stats"],
            )
            return scores, new_stats
        return (
            d_model.apply({"params": params, **stats_}, xx, t_oh,
                          update_stats=False),
            stats_,
        )

    clf_frozen = {"params": clf_vars["params"], **{
        k: v for k, v in clf_vars.items() if k != "params"
    }}

    def clf_forward(xx):
        return clf_model.apply(clf_frozen, xx, train=False)

    step = make_countergan_step(
        cfg=cfg, num_classes=C, g_forward=g_forward, d_forward=d_forward,
        clf_forward=clf_forward, tx_g=tx_g, tx_d=tx_d,
        mask_sampler=lambda k, xx: mask,  # pre-derived above
    )

    # ---- torch mirrors with copied weights ----
    gp = state.g.params
    tg = TorchTabularG(D_IN, H, C, N_BLOCKS, schema.continuous_idx,
                       schema.categorical_info)
    copy_linear(tg.fc_in, gp["fc_in"])
    for i, blk in enumerate(tg.blocks):
        bp = gp[f"block{i}"]
        copy_linear(blk.fc1, bp["fc1"])
        copy_linear(blk.fc2, bp["fc2"])
        copy_linear(blk.gamma, bp["film"]["gamma"])
        copy_linear(blk.beta, bp["film"]["beta"])
        for bn_t, name in ((blk.bn1, "bn1"), (blk.bn2, "bn2")):
            bn_t.weight.data = _t(bp[name]["scale"])
            bn_t.bias.data = _t(bp[name]["bias"])
    copy_linear(tg.fc_cont, gp["fc_cont"])
    for i in schema.categorical_info:
        copy_linear(tg.fc_cat[str(i)], gp[f"fc_cat_{i}"])

    dp = state.d.params
    du = state.d.stats["spectral_stats"]
    td = TorchSpectralD((H, H * 2, H * 4), in_dim=D_IN + C)
    for i, name in enumerate(["sn0", "sn1", "sn2", "sn_out"]):
        copy_linear(td.fcs[i], dp[name])
        td.us[i] = _t(du[name]["u"])

    cp = clf_vars["params"]
    cs = clf_vars["batch_stats"]
    tc = TorchTabularClf(D_IN, C)
    for i in range(4):
        copy_linear(tc.fcs[i], cp[f"Linear_{i}"])
        tc.bns[i].weight.data = _t(cp[f"BatchNorm_{i}"]["scale"])
        tc.bns[i].bias.data = _t(cp[f"BatchNorm_{i}"]["bias"])
        tc.bns[i].running_mean.data = _t(cs[f"BatchNorm_{i}"]["mean"])
        tc.bns[i].running_var.data = _t(cs[f"BatchNorm_{i}"]["var"])
    copy_linear(tc.out, cp["Linear_4"])
    tc.eval()

    opt_d = torch.optim.Adam(td.parameters(), lr=cfg.lr_d)
    opt_g = torch.optim.Adam(tg.parameters(), lr=cfg.lr_g)

    # ---- torch replay (house trainer.py:256-316 semantics) ----
    xt, mt = _t(x), _t(mask)
    yt = torch.tensor(np.asarray(y), dtype=torch.long)
    tt = torch.tensor(np.asarray(t), dtype=torch.long)
    oh_y = F.one_hot(yt, C).float()
    oh_t = F.one_hot(tt, C).float()
    tnoise = {i: torch.tensor(n) for i, n in noise_np.items()}

    cont, logits, samples = tg(xt, oh_t, mt, tnoise, TAU)
    residual = torch.zeros_like(xt)
    for i, fidx in enumerate(schema.continuous_idx):
        residual[:, fidx] = cont[:, i]
    for fidx, onehot in samples.items():
        nv = torch.tensor(np.asarray(cat_norm_values[fidx]))
        residual[:, fidx] = onehot.matmul(nv) - xt[:, fidx]
    masked = residual * mt
    x_cf = xt + masked

    scores = td(torch.cat([xt, x_cf.detach()], 0),
                torch.cat([oh_y, oh_t], 0), update=True)
    d_loss = -scores[:B].mean() + scores[B:].mean()
    opt_d.zero_grad()
    d_loss.backward()
    opt_d.step()

    adv = -td(x_cf, oh_t, update=False).mean()
    cls = F.cross_entropy(tc(x_cf), tt)
    l1 = torch.norm(masked, p=1, dim=1).mean()
    pen = (residual * (1 - mt)).abs().mean()
    g_loss = (cfg.lambda_adv * adv + cfg.lambda_cls * cls
              + cfg.lambda_reg_l1 * l1 + cfg.lambda_mask * pen)
    opt_g.zero_grad()
    g_loss.backward()
    opt_g.step()

    # ---- our compiled step ----
    new_state, metrics = jax.jit(step)(state, x, y, key)

    np.testing.assert_allclose(float(metrics["d_loss"]), d_loss.item(),
                               atol=3e-5)
    np.testing.assert_allclose(float(metrics["g_loss"]), g_loss.item(),
                               atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.g.params["fc_in"]["kernel"]),
        tg.fc_in.weight.detach().numpy().T, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.g.params["fc_cat_8"]["kernel"]),  # grade head
        tg.fc_cat["8"].weight.detach().numpy().T, atol=3e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.d.params["sn0"]["kernel"]),
        td.fcs[0].weight.detach().numpy().T, atol=3e-5,
    )
