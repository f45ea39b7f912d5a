"""Mask subsystem: patch grids, nearest upsampling (vs torch
F.interpolate), fixed-count selection, immutable feature handling."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cfgan.masks.feature import immutable_complement_mask, random_feature_mask
from cfgan.masks.patch import (
    patch_indices_to_mask,
    random_patch_mask,
    upsample_patch_mask,
)


def test_upsample_matches_torch_interpolate_nearest():
    rng = np.random.RandomState(0)
    pm = (rng.rand(4, 4, 4) > 0.5).astype(np.float32)
    ours = np.asarray(upsample_patch_mask(jnp.asarray(pm), 7, channels=1))
    theirs = F.interpolate(torch.tensor(pm)[:, None], size=(28, 28), mode="nearest")
    assert ours.shape == (4, 28, 28, 1)
    np.testing.assert_array_equal(ours[..., 0], theirs[:, 0].numpy())


def test_random_patch_mask_fixed_count():
    key = jax.random.key(0)
    m = random_patch_mask(key, 8, (28, 28), 7, num_modifiable=10)
    assert m.shape == (8, 28, 28, 1)
    # patch-level count: pool back down and count ones
    patches = m[:, ::7, ::7, 0]
    counts = np.asarray(patches.reshape(8, -1).sum(axis=1))
    np.testing.assert_array_equal(counts, np.full(8, 10))
    # mask must be constant within each 7x7 patch
    m_np = np.asarray(m[..., 0])
    for b in range(8):
        for i in range(4):
            for j in range(4):
                patch = m_np[b, i * 7 : (i + 1) * 7, j * 7 : (j + 1) * 7]
                assert patch.min() == patch.max()


def test_random_patch_mask_bernoulli_when_none():
    key = jax.random.key(1)
    m = random_patch_mask(key, 512, (28, 28), 7, num_modifiable=None)
    frac = float(m.mean())
    assert 0.45 < frac < 0.55  # iid Bernoulli(0.5)


def test_patch_indices_to_mask_row_major():
    m = patch_indices_to_mask([0, 5, 15], 2, (28, 28), 7)
    m_np = np.asarray(m[..., 0])
    assert m_np[0, 0, 0] == 1.0  # patch 0: top-left
    assert m_np[0, 7, 7] == 1.0  # patch 5 = row1,col1
    assert m_np[0, 21, 21] == 1.0  # patch 15 = row3,col3
    assert m_np[0, 0, 7] == 0.0  # patch 1 not selected
    assert m_np.sum() == 2 * 3 * 49


def test_feature_mask_immutables_always_zero():
    key = jax.random.key(2)
    m = random_feature_mask(key, 256, 17, immutable_idx=(13, 14, 11, 12))
    m_np = np.asarray(m)
    assert m_np[:, [11, 12, 13, 14]].sum() == 0.0
    assert 0.4 < m_np[:, [0, 1, 2]].mean() < 0.6


def test_immutable_complement_mask():
    m = np.asarray(immutable_complement_mask(4, 6, immutable_idx=(2, 4)))
    np.testing.assert_array_equal(m[0], [1, 1, 0, 1, 0, 1])


def test_device_prefetcher_matches_host_iterator():
    from cfgan.data.pipeline import DevicePrefetcher, HostIterator
    import numpy as np
    import jax

    x = np.arange(40, dtype=np.float32).reshape(10, 4)
    y = np.arange(10, dtype=np.int32)
    host = HostIterator([x, y], batch_size=3)
    pre = DevicePrefetcher(HostIterator([x, y], batch_size=3), buffer_size=2)
    got = list(pre)
    want = list(host)
    assert len(got) == len(want) == len(pre)
    for (gx, gy), (wx, wy) in zip(got, want):
        assert isinstance(gx, jax.Array)
        np.testing.assert_array_equal(np.asarray(gx), wx)
        np.testing.assert_array_equal(np.asarray(gy), wy)


def test_random_patch_mask_full_budget_is_all_ones():
    import jax
    from cfgan.masks.patch import random_patch_mask

    m = random_patch_mask(jax.random.key(0), 3, (28, 28), 7, 16)
    assert float(m.min()) == 1.0
    m = random_patch_mask(jax.random.key(0), 3, (28, 28), 7, 99)
    assert float(m.min()) == 1.0


def test_ones_fraction_mask_mixing():
    """MaskConfig.ones_fraction: per-sample replacement of the training mask
    by the family's fully-modifiable mask; identity at 0.0."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfgan.train.builders import _with_ones_fraction

    base = lambda key, x: jnp.zeros_like(x)  # degenerate base for contrast
    x = jnp.ones((64, 5))
    key = jax.random.key(0)

    assert _with_ones_fraction(base, 0.0) is base  # identity, no wrapping

    m_all = _with_ones_fraction(base, 1.0)(key, x)
    np.testing.assert_array_equal(np.asarray(m_all), np.ones((64, 5)))

    full = lambda xx: jnp.concatenate(
        [jnp.zeros((xx.shape[0], 1)), jnp.ones((xx.shape[0], 4))], axis=1)
    m_imm = _with_ones_fraction(base, 1.0, full)(key, x)
    np.testing.assert_array_equal(np.asarray(m_imm[:, 0]), np.zeros(64))
    np.testing.assert_array_equal(np.asarray(m_imm[:, 1:]), np.ones((64, 4)))

    m_half = np.asarray(_with_ones_fraction(base, 0.5)(key, x))
    rows = m_half.sum(axis=1)
    assert set(np.unique(rows)) == {0.0, 5.0}  # whole-row replacement
    assert 10 < (rows == 5.0).sum() < 54  # ~Bernoulli(0.5) of 64
