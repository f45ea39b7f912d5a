"""TabularResidualGenerator forward parity vs a PyTorch mirror with copied
weights — pins the FiLM residual blocks (shared FiLM instance used at both
sites, `house models/generator.py:27,31-34`), the conditioning layout
cond = [target_onehot, mask], the 0.1 continuous scaling and the
per-categorical logits heads.  The stochastic Gumbel sampling is pinned
separately in tests/test_gumbel.py; here we compare the deterministic
outputs (cont_residual, cat_logits) in eval mode."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from cfgan.models.generators import TabularResidualGenerator

DIM = 6
HID = 16
NCLS = 3
CONT = (0, 2, 4)
CAT = {1: (0.0, 1.0, 2.0), 3: (0.0, 1.0), 5: (1.0, 2.0, 3.0, 4.0)}
NBLK = 2


class TorchFiLM(tnn.Module):
    def __init__(self):
        super().__init__()
        self.gamma = tnn.Linear(NCLS + DIM, HID)
        self.beta = tnn.Linear(NCLS + DIM, HID)

    def forward(self, h, cond):
        return self.gamma(cond) * h + self.beta(cond)


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.film = TorchFiLM()  # ONE film used at both sites
        self.fc1 = tnn.Linear(HID, HID)
        self.bn1 = tnn.BatchNorm1d(HID)
        self.fc2 = tnn.Linear(HID, HID)
        self.bn2 = tnn.BatchNorm1d(HID)

    def forward(self, h, cond):
        out = F.relu(self.film(self.bn1(self.fc1(h)), cond))
        out = self.film(self.bn2(self.fc2(out)), cond)
        return h + out


class TorchTabG(tnn.Module):
    def __init__(self):
        super().__init__()
        self.fc_in = tnn.Linear(DIM + NCLS + DIM, HID)
        self.blocks = tnn.ModuleList([TorchBlock() for _ in range(NBLK)])
        self.fc_cont = tnn.Linear(HID, len(CONT))
        self.heads = tnn.ModuleDict(
            {str(i): tnn.Linear(HID, len(v)) for i, v in CAT.items()}
        )

    def forward(self, x, oh, mask):
        cond = torch.cat([oh, mask], 1)
        h = F.relu(self.fc_in(torch.cat([x, cond], 1)))
        for blk in self.blocks:
            h = blk(h, cond)
        cont = self.fc_cont(h) * 0.1
        logits = {i: self.heads[str(i)](h) for i in CAT}
        return cont, logits


def _copy_linear(tl, p):
    tl.weight.data = torch.tensor(np.asarray(p["kernel"]).T.copy())
    tl.bias.data = torch.tensor(np.asarray(p["bias"]))


def test_forward_parity_eval_mode():
    g = TabularResidualGenerator(
        input_dim=DIM, hidden_dim=HID, num_classes=NCLS,
        continuous_idx=CONT, categorical_info=CAT, n_blocks=NBLK,
    )
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (5, DIM)).astype(np.float32)
    oh = np.eye(NCLS, dtype=np.float32)[rng.randint(0, NCLS, 5)]
    mask = (rng.uniform(0, 1, (5, DIM)) > 0.5).astype(np.float32)
    variables = g.init(
        {"params": jax.random.key(0), "gumbel": jax.random.key(1)},
        jnp.asarray(x), jnp.asarray(oh), jnp.asarray(mask), train=False,
    )
    p = variables["params"]
    bs = variables["batch_stats"]

    tm = TorchTabG().eval()
    _copy_linear(tm.fc_in, p["fc_in"])
    for i, blk in enumerate(tm.blocks):
        bp, bst = p[f"block{i}"], bs[f"block{i}"]
        _copy_linear(blk.film.gamma, bp["film"]["gamma"])
        _copy_linear(blk.film.beta, bp["film"]["beta"])
        _copy_linear(blk.fc1, bp["fc1"])
        _copy_linear(blk.fc2, bp["fc2"])
        for bn_t, name in ((blk.bn1, "bn1"), (blk.bn2, "bn2")):
            bn_t.weight.data = torch.tensor(np.asarray(bp[name]["scale"]))
            bn_t.bias.data = torch.tensor(np.asarray(bp[name]["bias"]))
            bn_t.running_mean.data = torch.tensor(np.asarray(bst[name]["mean"]))
            bn_t.running_var.data = torch.tensor(np.asarray(bst[name]["var"]))
    _copy_linear(tm.fc_cont, p["fc_cont"])
    for i in CAT:
        _copy_linear(tm.heads[str(i)], p[f"fc_cat_{i}"])

    cont_j, logits_j, _ = g.apply(
        variables, jnp.asarray(x), jnp.asarray(oh), jnp.asarray(mask),
        train=False, rngs={"gumbel": jax.random.key(2)},
    )
    with torch.no_grad():
        cont_t, logits_t = tm(torch.tensor(x), torch.tensor(oh),
                              torch.tensor(mask))
    np.testing.assert_allclose(np.asarray(cont_j), cont_t.numpy(), atol=1e-5)
    for i in CAT:
        np.testing.assert_allclose(np.asarray(logits_j[i]),
                                   logits_t[i].numpy(), atol=1e-5)
