"""Layer-level numerical parity vs PyTorch with copied weights.

These pin the geometry/semantics of every primitive in SURVEY.md section 2.8
so the compiled models are drop-in equivalents of the reference's modules.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as tnn

from cfgan.nn.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    Embed,
    InstanceNorm,
    Linear,
    SpectralLinear,
)

RNG = np.random.RandomState(0)


def _init(mod, *args, **kw):
    return mod.init(jax.random.key(0), *args, **kw)


def test_linear_matches_torch():
    x = RNG.randn(4, 7).astype(np.float32)
    tl = tnn.Linear(7, 5)
    lin = Linear(5)
    params = _init(lin, jnp.asarray(x))
    params = {"params": {
        "kernel": jnp.asarray(tl.weight.detach().numpy().T),
        "bias": jnp.asarray(tl.bias.detach().numpy()),
    }}
    ours = np.asarray(lin.apply(params, jnp.asarray(x)))
    theirs = tl(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv_matches_torch():
    x = RNG.randn(2, 9, 9, 3).astype(np.float32)
    tc = tnn.Conv2d(3, 8, 3, stride=2, padding=1)
    conv = Conv(8, 3, 2, 1)
    params = _init(conv, jnp.asarray(x))
    kernel = tc.weight.detach().numpy().transpose(2, 3, 1, 0)  # OIHW->HWIO
    params = {"params": {"Conv_0": {
        "kernel": jnp.asarray(kernel),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    theirs = tc(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=1e-4)


@pytest.mark.parametrize("k,s,p,hw", [(4, 2, 1, 7), (4, 1, 0, 1), (3, 2, 1, 4)])
def test_conv_transpose_matches_torch(k, s, p, hw):
    x = RNG.randn(2, hw, hw, 6).astype(np.float32)
    tc = tnn.ConvTranspose2d(6, 4, k, stride=s, padding=p)
    conv = ConvTranspose(4, k, s, p)
    params = _init(conv, jnp.asarray(x))
    flat = jax.tree_util.tree_leaves_with_path(params)
    # torch weight (in, out, kh, kw); flax transpose_kernel=True wants (kh, kw, out, in)
    kernel = tc.weight.detach().numpy().transpose(2, 3, 1, 0)
    params = {"params": {"ConvTranspose_0": {
        "kernel": jnp.asarray(kernel),
        "bias": jnp.asarray(tc.bias.detach().numpy()),
    }}}
    ours = np.asarray(conv.apply(params, jnp.asarray(x)))
    theirs = tc(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    assert ours.shape == theirs.transpose(0, 2, 3, 1).shape
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=1e-4)


def test_batchnorm_train_eval_matches_torch():
    x1 = RNG.randn(16, 5).astype(np.float32) * 2 + 1
    x2 = RNG.randn(16, 5).astype(np.float32)
    tb = tnn.BatchNorm1d(5)
    bn = BatchNorm()
    variables = _init(bn, jnp.asarray(x1), use_running_average=False)

    # two train steps (running stats update), then one eval step
    v = variables
    for x in (x1, x2):
        ours, mut = bn.apply(v, jnp.asarray(x), use_running_average=False,
                             mutable=["batch_stats"])
        v = {"params": v.get("params", {}), **mut}
        theirs = tb(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)

    tb.eval()
    x3 = RNG.randn(16, 5).astype(np.float32)
    ours_eval = bn.apply(v, jnp.asarray(x3), use_running_average=True)
    theirs_eval = tb(torch.tensor(x3)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours_eval), theirs_eval, atol=1e-4)


def test_instance_norm_matches_torch():
    x = RNG.randn(2, 6, 6, 4).astype(np.float32)
    tin = tnn.InstanceNorm2d(4, affine=True)
    with torch.no_grad():
        tin.weight.copy_(torch.tensor(RNG.randn(4).astype(np.float32)))
        tin.bias.copy_(torch.tensor(RNG.randn(4).astype(np.float32)))
    inorm = InstanceNorm()
    params = {"params": {
        "scale": jnp.asarray(tin.weight.detach().numpy()),
        "bias": jnp.asarray(tin.bias.detach().numpy()),
    }}
    ours = np.asarray(inorm.apply(params, jnp.asarray(x)))
    theirs = tin(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), atol=1e-4)


def test_spectral_linear_matches_torch():
    """After the same number of power iterations from the same u0, the
    spectrally-normalized outputs must match."""
    x = RNG.randn(8, 6).astype(np.float32)
    tl = tnn.Linear(6, 3)
    sn = tnn.utils.spectral_norm(tl, n_power_iterations=1)

    lin = SpectralLinear(3)
    variables = _init(lin, jnp.asarray(x), update_stats=False)
    # copy weights AND torch's initial u
    # .copy() matters: torch updates weight_u in place and jnp.asarray can be
    # zero-copy on CPU, silently aliasing the buffer
    u0 = sn.weight_u.detach().numpy().copy()  # (out,)
    v = {
        "params": {
            "kernel": jnp.asarray(tl.weight_orig.detach().numpy().T),
            "bias": jnp.asarray(tl.bias.detach().numpy()),
        },
        "spectral_stats": {"u": jnp.asarray(u0)},
    }
    for i in range(3):
        theirs = sn(torch.tensor(x)).detach().numpy()  # 1 PI per forward
        ours, mut = lin.apply(v, jnp.asarray(x), update_stats=True,
                              mutable=["spectral_stats"])
        v = {"params": v["params"], **mut}
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4,
                                   err_msg=f"step {i}")


def test_embedding_lookup():
    emb = Embed(10, 16)
    v = _init(emb, jnp.asarray([0, 1]))
    out = emb.apply(v, jnp.asarray([3, 7, 3]))
    assert out.shape == (3, 16)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(out[2]))


def test_torch_default_init_statistics():
    """Linear kernel init must be U(+-1/sqrt(fan_in)) like torch."""
    lin = Linear(64)
    x = jnp.zeros((1, 100))
    params = lin.init(jax.random.key(0), x)["params"]
    k = np.asarray(params["kernel"])
    bound = 1 / np.sqrt(100)
    assert abs(k.max() - bound) < 0.01 * bound * 10
    assert k.min() > -bound - 1e-6 and k.max() < bound + 1e-6
    assert abs(k.std() - bound / np.sqrt(3)) < 0.05 * bound


def test_max_pool2d_matches_torch():
    """torch nn.MaxPool2d(2) semantics incl. odd sizes (floor mode drops the
    trailing row/col)."""
    from cfgan.nn.layers import max_pool2d

    rng = np.random.RandomState(0)
    for hw in (28, 7, 9):  # even, odd, odd
        x = rng.randn(3, hw, hw, 5).astype(np.float32)
        ours = np.asarray(max_pool2d(jnp.asarray(x)))
        theirs = (
            torch.nn.MaxPool2d(2)(torch.tensor(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_array_equal(ours, theirs)
    # explicit stride != window
    x = rng.randn(2, 8, 8, 1).astype(np.float32)
    ours = np.asarray(max_pool2d(jnp.asarray(x), window=3, stride=2))
    theirs = (
        torch.nn.MaxPool2d(3, stride=2)(torch.tensor(x).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(ours, theirs)


def test_legacy_cnn_classifier_matches_torch():
    """Weight-for-weight logits parity of the legacy MaxPool classifier
    (`mnist/modules/classifier.py:4-30`)."""
    import torch.nn as tnn
    import torch.nn.functional as F

    from cfgan.models.classifiers import LegacyCNNClassifier

    model = LegacyCNNClassifier()
    x = np.random.RandomState(0).uniform(-1, 1, (4, 28, 28, 1)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))

    class TorchLegacy(tnn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = tnn.Conv2d(1, 32, 3, padding=1)
            self.c2 = tnn.Conv2d(32, 64, 3, padding=1)
            self.f1 = tnn.Linear(64 * 7 * 7, 128)
            self.f2 = tnn.Linear(128, 10)

        def forward(self, x):
            h = F.max_pool2d(F.relu(self.c1(x)), 2)
            h = F.max_pool2d(F.relu(self.c2(h)), 2)
            h = h.permute(0, 2, 3, 1).reshape(h.shape[0], -1)  # NHWC flatten
            return self.f2(F.relu(self.f1(h)))

    t = TorchLegacy()
    p = variables["params"]

    def cp_conv(tc, pp):
        tc.weight.data = torch.tensor(
            np.asarray(pp["kernel"]).transpose(3, 2, 0, 1).copy())
        tc.bias.data = torch.tensor(np.asarray(pp["bias"]))

    cp_conv(t.c1, p["Conv_0"]["Conv_0"])
    cp_conv(t.c2, p["Conv_1"]["Conv_0"])
    t.f1.weight.data = torch.tensor(np.asarray(p["Linear_0"]["kernel"]).T.copy())
    t.f1.bias.data = torch.tensor(np.asarray(p["Linear_0"]["bias"]))
    t.f2.weight.data = torch.tensor(np.asarray(p["Linear_1"]["kernel"]).T.copy())
    t.f2.bias.data = torch.tensor(np.asarray(p["Linear_1"]["bias"]))
    theirs = t(torch.tensor(x).permute(0, 3, 1, 2)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
