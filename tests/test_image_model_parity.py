"""ImageResidualGenerator forward parity vs a PyTorch mirror with copied
weights — pins the conv geometry, label-plane embedding, damped resblocks and
0.1 output scaling of the flagship image generator
(reference `mnist/models/generator.py:25-86`)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cfgan.models.generators import ImageResidualGenerator

CH = 16
NRB = 2


class TorchMirror(tnn.Module):
    def __init__(self):
        super().__init__()
        self.emb = tnn.Embedding(10, 784)
        self.cin = tnn.Conv2d(3, CH, 3, 1, 1)
        self.blocks = tnn.ModuleList()
        for _ in range(NRB):
            self.blocks.append(tnn.ModuleDict({
                "c1": tnn.Conv2d(CH, CH, 3, 1, 1),
                "b1": tnn.BatchNorm2d(CH),
                "c2": tnn.Conv2d(CH, CH, 3, 1, 1),
                "b2": tnn.BatchNorm2d(CH),
            }))
        self.mid = tnn.Conv2d(CH, CH, 3, 1, 1)
        self.out = tnn.Conv2d(CH, 1, 3, 1, 1)

    def forward(self, x, t, m):  # NCHW
        plane = self.emb(t).view(-1, 1, 28, 28)
        z = F.leaky_relu(self.cin(torch.cat([x, plane, m], 1)), 0.2)
        for blk in self.blocks:
            h = F.leaky_relu(blk["b1"](blk["c1"](z)), 0.2)
            z = z + 0.1 * blk["b2"](blk["c2"](h))
        z = F.leaky_relu(self.mid(z), 0.2)
        raw = self.out(z) * 0.1
        return raw, raw * m


def _copy_conv(tc, p):
    # flax HWIO -> torch OIHW
    tc.weight.data = torch.tensor(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy()
    )
    tc.bias.data = torch.tensor(np.asarray(p["bias"]))


def test_forward_parity_eval_mode():
    g = ImageResidualGenerator(base_ch=CH, n_resblocks=NRB)
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (4, 28, 28, 1)).astype(np.float32)
    t = np.asarray([1, 3, 5, 9], np.int32)
    m = (rng.uniform(0, 1, (4, 28, 28, 1)) > 0.4).astype(np.float32)
    variables = g.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t),
                       jnp.asarray(m), train=False)
    p = variables["params"]

    tm = TorchMirror().eval()
    tm.emb.weight.data = torch.tensor(np.asarray(p["embed"]["embedding"]))
    _copy_conv(tm.cin, p["conv_in"]["Conv_0"])
    for i, blk in enumerate(tm.blocks):
        rp = p[f"res{i}"]
        _copy_conv(blk["c1"], rp["conv1"]["Conv_0"])
        _copy_conv(blk["c2"], rp["conv2"]["Conv_0"])
        for bn_t, bn_name in ((blk["b1"], "bn1"), (blk["b2"], "bn2")):
            bn_t.weight.data = torch.tensor(np.asarray(rp[bn_name]["scale"]))
            bn_t.bias.data = torch.tensor(np.asarray(rp[bn_name]["bias"]))
            st = variables["batch_stats"][f"res{i}"][bn_name]
            bn_t.running_mean.data = torch.tensor(np.asarray(st["mean"]))
            bn_t.running_var.data = torch.tensor(np.asarray(st["var"]))
    _copy_conv(tm.mid, p["conv_mid"]["Conv_0"])
    _copy_conv(tm.out, p["conv_out"]["Conv_0"])

    raw_j, masked_j = g.apply(variables, jnp.asarray(x), jnp.asarray(t),
                              jnp.asarray(m), train=False)
    with torch.no_grad():
        raw_t, masked_t = tm(
            torch.tensor(x.transpose(0, 3, 1, 2)),
            torch.tensor(t, dtype=torch.long),
            torch.tensor(m.transpose(0, 3, 1, 2)),
        )
    np.testing.assert_allclose(
        np.asarray(raw_j)[..., 0], raw_t.numpy()[:, 0], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(masked_j)[..., 0], masked_t.numpy()[:, 0], atol=1e-5
    )
