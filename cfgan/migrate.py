"""Import the PyTorch reference's trained checkpoints into cfgan.

Migration aid for users switching from the reference
(`flash4242/Promptable-Counterfactual-GAN`) to this framework: the
reference commits trained `state_dict` checkpoints
(`house_sales_kc_usa/{generator_model,clf_model}.pt` saved at
`house trainer.py:375` / `trainer.py:121-130`,
`mnist/results/generator.pt` at `mnist/trainer.py:163`,
`mnist/models/classifier.pt`, `moons/results/{generator,classifier}.pt`
at `moons/main.py:19-40`).  These loaders map each state_dict onto the
corresponding cfgan flax variable tree so the trained models carry over
without retraining — and so the reference's committed eval numbers can be
reproduced by cfgan's eval stack running the reference's own weights
(`tools/reference_weights_eval.py`).

Safety: checkpoints are loaded with `torch.load(weights_only=True)` only —
tensors are deserialized but no pickled code ever executes, so untrusted
`.pt` files cannot run code on import.

Layout conversions (torch -> flax):
  Linear  weight (out, in)        -> kernel (in, out)           [transpose]
  Conv2d  weight (O, I, kh, kw)   -> kernel (kh, kw, I, O)      [permute]
  BatchNorm weight/bias           -> params  scale/bias
            running_mean/var      -> batch_stats mean/var
  Embedding weight (n, d)         -> embedding (n, d)           [as-is]
Flatten boundaries need care: torch flattens NCHW, cfgan flattens NHWC, so
the first Linear after a flatten has its input columns permuted from
(C,H,W) order to (H,W,C) order.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "load_state_dict",
    "import_house_generator",
    "import_house_classifier",
    "import_moons_generator",
    "import_moons_classifier",
    "import_mnist_generator",
    "import_mnist_legacy_classifier",
    "validate_against",
]


def load_state_dict(path: str) -> dict:
    """torch.load(weights_only=True) -> {key: np.ndarray} (float32)."""
    import torch  # local import: torch is an oracle/migration dep only

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.detach().numpy(), np.float32)
            for k, v in sd.items() if hasattr(v, "numpy")}


# ------------------------------------------------------------ converters
def _lin(sd, k):
    return {"kernel": sd[f"{k}.weight"].T.copy(), "bias": sd[f"{k}.bias"]}


def _conv(sd, k):
    # torch (O, I, kh, kw) -> flax (kh, kw, I, O); our Conv wrapper nests
    # the flax nn.Conv as submodule "Conv_0"
    return {"Conv_0": {
        "kernel": np.transpose(sd[f"{k}.weight"], (2, 3, 1, 0)).copy(),
        "bias": sd[f"{k}.bias"],
    }}


def _bn_params(sd, k):
    return {"scale": sd[f"{k}.weight"], "bias": sd[f"{k}.bias"]}


def _bn_stats(sd, k):
    return {"mean": sd[f"{k}.running_mean"], "var": sd[f"{k}.running_var"]}


def _lin_after_nchw_flatten(sd, k, chw: tuple[int, int, int]):
    """First Linear after a torch NCHW flatten: permute its input columns
    to cfgan's NHWC flatten order."""
    c, h, w = chw
    wt = sd[f"{k}.weight"]  # (out, C*H*W) in (C,H,W) column order
    wt = wt.reshape(wt.shape[0], c, h, w).transpose(0, 2, 3, 1)
    wt = wt.reshape(wt.shape[0], h * w * c)
    return {"kernel": wt.T.copy(), "bias": sd[f"{k}.bias"]}


# ------------------------------------------------------------- house (2.5)
def import_house_generator(path: str, n_blocks: int = 5,
                           cat_indices=(0, 1, 4, 5, 6, 7, 8)) -> dict:
    """`house_sales_kc_usa/generator_model.pt` (FiLM ResidualGenerator,
    `house models/generator.py:38-91`) -> TabularResidualGenerator
    variables {'params', 'batch_stats'}."""
    sd = load_state_dict(path)
    params = {"fc_in": _lin(sd, "fc_in"), "fc_cont": _lin(sd, "fc_cont")}
    stats = {}
    for i in range(n_blocks):
        t = f"blocks.{i}"
        params[f"block{i}"] = {
            "fc1": _lin(sd, f"{t}.fc1"),
            "fc2": _lin(sd, f"{t}.fc2"),
            "bn1": _bn_params(sd, f"{t}.bn1"),
            "bn2": _bn_params(sd, f"{t}.bn2"),
            "film": {"gamma": _lin(sd, f"{t}.film.gamma"),
                     "beta": _lin(sd, f"{t}.film.beta")},
        }
        stats[f"block{i}"] = {"bn1": _bn_stats(sd, f"{t}.bn1"),
                              "bn2": _bn_stats(sd, f"{t}.bn2")}
    for idx in cat_indices:
        params[f"fc_cat_{idx}"] = _lin(sd, f"fc_cat_logits.{idx}")
    return {"params": params, "batch_stats": stats}


def import_house_classifier(path: str) -> dict:
    """`house_sales_kc_usa/clf_model.pt` (NNClassifier,
    `house models/nn_classifier.py:4-32`: nn.Sequential with Linears at
    net.{0,4,8,12,15} and BatchNorms at net.{2,6,10,14}) ->
    TabularClassifier variables."""
    sd = load_state_dict(path)
    lin_idx, bn_idx = (0, 4, 8, 12), (2, 6, 10, 14)
    params = {f"Linear_{i}": _lin(sd, f"net.{n}")
              for i, n in enumerate(lin_idx)}
    params["Linear_4"] = _lin(sd, "net.15")
    for i, n in enumerate(bn_idx):
        params[f"BatchNorm_{i}"] = _bn_params(sd, f"net.{n}")
    stats = {f"BatchNorm_{i}": _bn_stats(sd, f"net.{n}")
             for i, n in enumerate(bn_idx)}
    return {"params": params, "batch_stats": stats}


# ------------------------------------------------------------- moons (2.6)
def import_moons_generator(path: str) -> dict:
    """`moons/results/generator.pt` (`moons/models/generator.py:4-24`:
    Linears at net.{0,3,6,9}, BatchNorms at net.{1,4,7}) ->
    MoonsResidualGenerator variables."""
    sd = load_state_dict(path)
    params = {f"Linear_{i}": _lin(sd, f"net.{n}")
              for i, n in enumerate((0, 3, 6, 9))}
    for i, n in enumerate((1, 4, 7)):
        params[f"BatchNorm_{i}"] = _bn_params(sd, f"net.{n}")
    stats = {f"BatchNorm_{i}": _bn_stats(sd, f"net.{n}")
             for i, n in enumerate((1, 4, 7))}
    return {"params": params, "batch_stats": stats}


def import_moons_classifier(path: str) -> dict:
    """`moons/results/classifier.pt` (`moons/models/nn_classifier.py:3-15`:
    Linears at net.{0,2,4}) -> MLPClassifier variables."""
    sd = load_state_dict(path)
    return {"params": {f"Linear_{i}": _lin(sd, f"net.{n}")
                       for i, n in enumerate((0, 2, 4))}}


# ------------------------------------------------------------- mnist (2.4)
def import_mnist_generator(path: str, n_resblocks: int = 6) -> dict:
    """`mnist/results/generator.pt` (ResidualGenerator,
    `mnist/models/generator.py:25-86`) -> ImageResidualGenerator
    variables.  Channel order of the conv_in input (x, label-plane, mask)
    is identical in both frameworks, so only the layout permutes."""
    sd = load_state_dict(path)
    params = {
        "embed": {"embedding": sd["embed.weight"]},
        "conv_in": _conv(sd, "conv_in"),
        "conv_mid": _conv(sd, "conv_mid"),
        "conv_out": _conv(sd, "conv_out"),
    }
    stats = {}
    for i in range(n_resblocks):
        t = f"resblocks.{i}"
        params[f"res{i}"] = {
            "conv1": _conv(sd, f"{t}.conv1"),
            "conv2": _conv(sd, f"{t}.conv2"),
            "bn1": _bn_params(sd, f"{t}.bn1"),
            "bn2": _bn_params(sd, f"{t}.bn2"),
        }
        stats[f"res{i}"] = {"bn1": _bn_stats(sd, f"{t}.bn1"),
                            "bn2": _bn_stats(sd, f"{t}.bn2")}
    return {"params": params, "batch_stats": stats}


def import_mnist_legacy_classifier(path: str) -> dict:
    """`mnist/models/classifier.pt` (legacy MaxPool CNN,
    `mnist/modules/classifier.py:4-30`: convs at net.{0,3}, Linears at
    net.{7,9}) -> LegacyCNNClassifier variables.  net.7 sits after a
    torch NCHW flatten of a (64, 7, 7) activation; its columns are
    permuted to the NHWC flatten order cfgan uses."""
    sd = load_state_dict(path)
    # the wrapper modules auto-name as Conv_0/Conv_1, each nesting its flax
    # nn.Conv as another "Conv_0" level
    return {"params": {
        "Conv_0": _conv(sd, "net.0"),
        "Conv_1": _conv(sd, "net.3"),
        "Linear_0": _lin_after_nchw_flatten(sd, "net.7", (64, 7, 7)),
        "Linear_1": _lin(sd, "net.9"),
    }}


# ------------------------------------------------------------- validation
def validate_against(imported: dict, template: dict, name: str = "import"):
    """Check the imported tree has exactly the template's structure and leaf
    shapes (template = `model.init(...)`).  Raises ValueError listing every
    mismatch; returns the imported tree on success."""
    import jax

    flat_i = dict(jax.tree_util.tree_flatten_with_path(imported)[0])
    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    errs = []
    for k in sorted(set(flat_i) | set(flat_t), key=str):
        if k not in flat_i:
            errs.append(f"missing leaf {jax.tree_util.keystr(k)}")
        elif k not in flat_t:
            errs.append(f"unexpected leaf {jax.tree_util.keystr(k)}")
        elif tuple(flat_i[k].shape) != tuple(flat_t[k].shape):
            errs.append(
                f"shape mismatch at {jax.tree_util.keystr(k)}: "
                f"imported {tuple(flat_i[k].shape)} vs model "
                f"{tuple(flat_t[k].shape)}")
    if errs:
        raise ValueError(f"{name}: " + "; ".join(errs))
    return imported
