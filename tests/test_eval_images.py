"""Image eval visuals: plumbing tests with a lightweight synthetic cf_fn /
clf_fn pair (no training needed)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.eval.images import (
    counterfactual_grid,
    heatmap_panels,
    patch_grid_overlay,
    user_modification_example,
)

H = W = 14
C_CLASSES = 4


def cf_fn(g_vars, x, target, mask, key=None):
    """Residual = +0.1 inside the mask, sign keyed to the target parity."""
    sign = (2.0 * (target % 2).astype(x.dtype) - 1.0)[:, None, None, None]
    raw = 0.1 * sign * jnp.ones_like(x)
    masked = raw * mask
    return jnp.clip(x + masked, -1, 1), raw, masked


_W = jax.random.normal(jax.random.key(0), (H * W, C_CLASSES))


def clf_fn(x):
    return x.reshape(x.shape[0], -1) @ _W


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (32, H, W, 1)).astype(np.float32)
    y = rng.randint(0, C_CLASSES, 32)
    # ensure every class appears
    y[:C_CLASSES] = np.arange(C_CLASSES)
    return x, y


def test_counterfactual_grid(data, tmp_path):
    x, y = data
    path = str(tmp_path / "grid.png")
    flips = counterfactual_grid(cf_fn, clf_fn, {}, x, y, C_CLASSES, path)
    assert flips.shape == (C_CLASSES, C_CLASSES)
    assert os.path.exists(path)


def test_heatmap_panels(data, tmp_path):
    x, y = data
    out = heatmap_panels(
        cf_fn, clf_fn, {}, x[:4], y[:4], np.array([1, 2, 3, 0]),
        np.ones((4, H, W, 1), np.float32), str(tmp_path), max_samples=4,
    )
    assert out["preds"].shape == (4,)
    assert os.path.exists(tmp_path / "sample_0.png")
    assert os.path.exists(tmp_path / "batch_overview.png")


def test_patch_grid_overlay(data, tmp_path):
    x, _ = data
    p = patch_grid_overlay(x[0], 7, str(tmp_path / "patches.png"),
                           highlight=[0, 3])
    assert os.path.exists(p)


def test_user_modification_example_confines_residual(data, tmp_path):
    x, _ = data
    res = user_modification_example(
        cf_fn, clf_fn, {}, x[0], target=1, patch_indices=[0],
        patch_size=7, path=str(tmp_path / "um.png"),
    )
    assert os.path.exists(tmp_path / "um.png")
    assert 0.0 <= res["confidence"] <= 1.0
    # patch 0 is the top-left 7x7 block; residual must vanish elsewhere
    r = res["residual"][..., 0]
    assert np.abs(r[:7, :7]).max() > 0
    outside = r.copy()
    outside[:7, :7] = 0
    np.testing.assert_allclose(outside, 0.0)


def test_patch_budget_curve(data, tmp_path):
    from cfgan.eval.mask_analysis import patch_budget_curve

    x, y = data
    df = patch_budget_curve(cf_fn, clf_fn, {}, x, y, C_CLASSES, 7,
                            budgets=[1, 2, 4], out_dir=str(tmp_path),
                            max_samples=16)
    assert list(df["n_patches"]) == [1, 2, 4]
    assert df["flip_rate"].between(0, 1).all()
    assert (df["frac_area"].diff().dropna() > 0).all()
    assert os.path.exists(tmp_path / "patch_budget_curve.png")
