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


def test_midrun_resume_is_bit_identical(moons_data):
    """Interrupt a CounteRGAN run at epoch 2 of 4 and resume from the
    mid-run checkpoint: the continuation must be BIT-identical to the
    uninterrupted run (params, opt state, BN/spectral stats, step counter,
    and logged history all line up)."""
    import jax.numpy as jnp
    from cfgan.core.config import ClassifierConfig, CounterGANConfig
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.train.builders import build_moons_countergan
    from cfgan.train.classifier import train_classifier
    from cfgan.train.loop import train_countergan_loop
    import tempfile

    (xtr, ytr), _, _ = moons_data
    cfg = CounterGANConfig(lambda_cls=2.0, lambda_reg_l1=5.0,
                           lambda_reg_l2=5.0, lambda_mask=3.0)
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )

    def fresh_bundle():
        return build_moons_countergan(cfg, clf_model, clf_state, seed=9)

    # uninterrupted 4-epoch run
    ref_state, ref_hist = train_countergan_loop(
        fresh_bundle(), xtr, ytr, epochs=4, batch_size=64, seed=5,
        log=lambda s: None,
    )

    with tempfile.TemporaryDirectory() as d:
        # "interrupted" run: 2 epochs, checkpoint written at epoch 2
        train_countergan_loop(
            fresh_bundle(), xtr, ytr, epochs=2, batch_size=64, seed=5,
            log=lambda s: None, checkpoint_dir=d, checkpoint_every=2,
        )
        from cfgan.core import checkpoint as ckpt

        assert ckpt.exists(d)
        # restart with the full target: resumes at epoch 3
        logs = []
        res_state, res_hist = train_countergan_loop(
            fresh_bundle(), xtr, ytr, epochs=4, batch_size=64, seed=5,
            log=logs.append, checkpoint_dir=d, checkpoint_every=2,
        )
        assert any("resuming" in l for l in logs)

    for want, got in zip(jax.tree_util.tree_leaves(ref_state),
                         jax.tree_util.tree_leaves(res_state)):
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    assert int(res_state.step) == int(ref_state.step)
    np.testing.assert_array_equal(ref_hist["d_loss"], res_hist["d_loss"])
    np.testing.assert_array_equal(ref_hist["g_loss"], res_hist["g_loss"])


def test_resume_false_ignores_existing_train_state(moons_data):
    """`--fresh` semantics (round-4 fix): with resume=False the loop must
    NOT silently continue from an old train_state checkpoint — a completed
    old run would otherwise make a 'fresh' retrain a no-op."""
    import tempfile

    from cfgan.core.config import ClassifierConfig, CounterGANConfig
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.train.builders import build_moons_countergan
    from cfgan.train.classifier import train_classifier
    from cfgan.train.loop import train_countergan_loop

    (xtr, ytr), _, _ = moons_data
    cfg = CounterGANConfig(lambda_cls=2.0, lambda_reg_l1=5.0,
                           lambda_reg_l2=5.0, lambda_mask=3.0)
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )

    def fresh_bundle():
        return build_moons_countergan(cfg, clf_model, clf_state, seed=9)

    with tempfile.TemporaryDirectory() as d:
        # a COMPLETED 2-epoch run leaves a train_state at epoch 2
        train_countergan_loop(
            fresh_bundle(), xtr, ytr, epochs=2, batch_size=64, seed=5,
            log=lambda s: None, checkpoint_dir=d, checkpoint_every=2,
        )
        logs = []
        state, hist = train_countergan_loop(
            fresh_bundle(), xtr, ytr, epochs=2, batch_size=64, seed=5,
            log=logs.append, checkpoint_dir=d, checkpoint_every=2,
            resume=False,
        )
        assert not any("resuming" in l for l in logs)
        assert len(hist["d_loss"]) == 2  # actually trained 2 epochs
        assert int(state.step) > 0


def test_pre_ema_train_state_checkpoint_restores(tmp_path, moons_data):
    """Round-2 `train_state` checkpoints were written before GANState grew
    the optional `g_ema` field; restoring one into a fresh (EMA-less)
    template must still work (restore injects the template's None)."""
    import os

    from flax import serialization

    from cfgan.core.config import ClassifierConfig, CounterGANConfig
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.train.builders import build_moons_countergan
    from cfgan.train.classifier import train_classifier

    (xtr, ytr), _, _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=10), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(CounterGANConfig(), clf_model, clf_state,
                                    seed=2)
    # simulate the OLD on-disk format: state dict without the g_ema key
    sd = serialization.to_state_dict(jax.tree_util.tree_map(
        np.asarray, bundle.state))
    assert "g_ema" in sd
    sd.pop("g_ema")
    path = str(tmp_path / "old_state")
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "checkpoint.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(sd))

    restored = ckpt.restore(path, bundle.state)
    assert restored.g_ema is None
    for a, b in zip(jax.tree_util.tree_leaves(bundle.state.g.params),
                    jax.tree_util.tree_leaves(restored.g.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
