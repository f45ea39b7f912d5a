"""Checkpoint round-trip: params + metadata (normalization stats travel with
the model, `house trainer.py:121-130` contract)."""
import jax
import jax.numpy as jnp
import numpy as np

from cfgan.core import checkpoint as ckpt
from cfgan.data.transforms import NormStats, fit_minmax


def test_roundtrip_params_and_metadata(tmp_path):
    tree = {
        "params": {
            "dense": {"kernel": jnp.arange(12.0).reshape(3, 4),
                      "bias": jnp.ones((4,))},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros((4,)),
                               "var": jnp.ones((4,))}},
    }
    stats = fit_minmax(np.asarray([[0.0, 2.0], [10.0, 4.0]]))
    path = str(tmp_path / "net")
    assert not ckpt.exists(path)
    ckpt.save(path, tree, metadata={"stats": stats.to_metadata(),
                                    "bins": [1, 2, 3]})
    assert ckpt.exists(path)

    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    restored = ckpt.restore(path, template)
    for want, got in zip(jax.tree_util.tree_leaves(tree),
                         jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    meta = ckpt.load_metadata(path)
    assert meta["bins"] == [1, 2, 3]
    st2 = NormStats.from_metadata(meta["stats"])
    np.testing.assert_allclose(np.asarray(st2.data_min), stats.data_min)
    np.testing.assert_allclose(np.asarray(st2.data_max), stats.data_max)


def test_restore_rejects_shape_mismatch(tmp_path):
    path = str(tmp_path / "net")
    ckpt.save(path, {"w": jnp.zeros((3, 3))})
    try:
        ckpt.restore(path, {"w": jnp.zeros((4, 4))})
        raised = False
    except Exception:
        raised = True
    assert raised


def test_sharded_roundtrip_on_mesh():
    from cfgan.parallel.mesh import create_mesh
    from cfgan.parallel.sharding import replicate, shard_batch
    import tempfile

    mesh = create_mesh()
    x = np.arange(64.0, dtype=np.float32).reshape(8, 8)
    (xs,) = shard_batch(mesh, (x,))
    (r,) = replicate(mesh, (jnp.ones((3,)),))
    tree = {"sharded": xs, "replicated": r}
    with tempfile.TemporaryDirectory() as d:
        ckpt.save_sharded(d, tree, metadata={"k": 1})
        restored = ckpt.restore_sharded(d, tree)
        np.testing.assert_array_equal(np.asarray(restored["sharded"]), x)
        np.testing.assert_array_equal(np.asarray(restored["replicated"]),
                                      np.ones((3,)))
        assert ckpt.load_metadata(d)["k"] == 1
