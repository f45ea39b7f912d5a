"""Multi-chip data parallelism on the virtual 8-device CPU mesh.

The reference has zero distributed code (SURVEY.md section 2.9); these tests
pin the capability uplift: batch sharded over the 'data' axis, params
replicated, gradients psum'd by XLA during sharding propagation, and results
identical to single-device execution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cfgan.core.config import ClassifierConfig, CounterGANConfig
from cfgan.data.pipeline import epoch_perm
from cfgan.models.classifiers import MLPClassifier
from cfgan.parallel.mesh import create_mesh
from cfgan.parallel.sharding import batch_sharding, replicate, shard_batch
from cfgan.train.builders import build_moons_countergan
from cfgan.train.classifier import train_classifier


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_and_replicate_placement():
    mesh = create_mesh()
    x = np.arange(64 * 4, dtype=np.float32).reshape(64, 4)
    (xs,) = shard_batch(mesh, (x,))
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh, "data", 2), 2)
    (xr,) = replicate(mesh, (jnp.ones((3, 3)),))
    assert xr.sharding.is_fully_replicated


def test_sharded_epoch_matches_single_device(moons_data):
    """One compiled CounteRGAN epoch: identical metrics whether the batch is
    sharded over 8 devices or kept on one."""
    (xtr, ytr), _, _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(
        CounterGANConfig(), clf_model, clf_state, seed=7
    )
    x, y = jnp.asarray(xtr), jnp.asarray(ytr)
    perm = epoch_perm(jax.random.key(3), len(ytr), 64)
    key = jax.random.key(4)

    _, m_single = bundle.epoch_fn(bundle.state, x, y, perm, key)

    mesh = create_mesh()
    bundle2 = build_moons_countergan(
        CounterGANConfig(), clf_model, clf_state, seed=7
    )
    xs, ys = shard_batch(mesh, (np.asarray(x), np.asarray(y)))
    state_r = replicate(mesh, bundle2.state)
    _, m_shard = bundle2.epoch_fn(state_r, xs, ys, perm, key)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_shard[k]), rtol=2e-4, atol=1e-5,
            err_msg=k,
        )


def test_sharded_tabular_epoch_matches_single_device():
    """The tabular CounteRGAN program (scatter-based residual assembly,
    Gumbel rng under jit, spectral-norm D with carried power iteration) is
    structurally unlike the dense image/moons steps — pin that it compiles
    and runs data-parallel over the mesh with metrics equal to one device."""
    from cfgan.data.kc_house import load_kc_house
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.train.state import NetState, adam_like_torch

    (xtr, ytr), _, stats, _, schema = load_kc_house(seed=0)
    tclf = TabularClassifier(num_classes=4)
    tclf_state = NetState.create(
        tclf.init({"params": jax.random.key(0), "dropout": jax.random.key(0)},
                  jnp.asarray(xtr[:2])),
        adam_like_torch(1e-3),
    )
    cfg = CounterGANConfig(hidden_dim=16, num_res_blocks=2)

    n, batch = 256, 64
    x = jnp.asarray(xtr[:n], jnp.float32)
    y = jnp.asarray(ytr[:n], jnp.int32)
    perm = epoch_perm(jax.random.key(3), n, batch)
    key = jax.random.key(4)

    b1 = build_tabular_countergan(cfg, tclf, tclf_state, schema, stats,
                                  num_classes=4, seed=3)
    _, m_single = b1.epoch_fn(b1.state, x, y, perm, key)

    mesh = create_mesh()
    b2 = build_tabular_countergan(cfg, tclf, tclf_state, schema, stats,
                                  num_classes=4, seed=3)
    xs, ys = shard_batch(mesh, (np.asarray(x), np.asarray(y)))
    state_r = replicate(mesh, b2.state)
    new_state, m_shard = b2.epoch_fn(state_r, xs, ys, perm, key)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_shard[k]), rtol=2e-4, atol=1e-5,
            err_msg=k,
        )
    # spectral-norm power-iteration state must come back replicated too
    for leaf in jax.tree_util.tree_leaves(new_state.d.stats):
        assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_wgan_gp_epoch_matches_single_device():
    """WGAN-GP's gradient-penalty double-backward (grad-of-grad through the
    critic at random interpolates) plus the lax.cond n_critic schedule is
    the last structurally distinct compiled program — pin it on the mesh
    (`mnist_wgan_conditional.py:146-154` rebuilt in train/gan.py)."""
    from cfgan.core.config import GANConfig
    from cfgan.train.gan_builders import build_gan

    cfg = GANConfig(family="wgan_gp", latent_dim=8, hidden_dim=16,
                    n_critic=2, gp_lambda=10.0)
    rng = np.random.RandomState(0)
    n, batch = 128, 32
    x = rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32)
    y = rng.randint(0, 10, n).astype(np.int32)
    perm = epoch_perm(jax.random.key(5), n, batch)
    key = jax.random.key(6)

    b1 = build_gan(cfg, num_classes=10, seed=9)
    _, m_single = b1.epoch_fn(b1.state, jnp.asarray(x), jnp.asarray(y),
                              perm, key)

    mesh = create_mesh()
    b2 = build_gan(cfg, num_classes=10, seed=9)
    xs, ys = shard_batch(mesh, (x, y))
    state_r = replicate(mesh, b2.state)
    new_state, m_shard = b2.epoch_fn(state_r, xs, ys, perm, key)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_shard[k]), rtol=2e-4, atol=1e-4,
            err_msg=k,
        )
    leaf = jax.tree_util.tree_leaves(new_state.g.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_train_loop_mesh_option(moons_data):
    """train_countergan_loop(mesh=...) runs data-parallel end-to-end."""
    from cfgan.train.loop import train_countergan_loop

    (xtr, ytr), _, _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=30), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(CounterGANConfig(), clf_model, clf_state,
                                    seed=5)
    mesh = create_mesh()
    state, hist = train_countergan_loop(
        bundle, xtr, ytr, epochs=2, batch_size=64, seed=0, mesh=mesh,
        log_every=0,
    )
    assert np.isfinite(hist["g_loss"][-1])
    leaf = jax.tree_util.tree_leaves(state.g.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_serving_matches_single_device(moons_data):
    """CounterfactualEngine.shard(mesh): generate/generate_bulk run the
    SAME fused serving program SPMD over the 8-device mesh with results
    equal to the unsharded engine, including odd batch sizes that need
    mesh-multiple padding."""
    from cfgan.serve.engine import CounterfactualEngine

    (xtr, ytr), (xte, yte), _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(
        CounterGANConfig(), clf_model, clf_state, seed=3
    )
    eng = CounterfactualEngine.from_bundle(bundle, clf_model, clf_state)
    eng_sh = CounterfactualEngine.from_bundle(
        bundle, clf_model, clf_state).shard(create_mesh())

    for b in (1, 5, 16, 100):
        x = np.asarray(xte[:b], np.float32)
        ref = eng.generate(x, target=1)
        got = eng_sh.generate(x, target=1)
        np.testing.assert_allclose(got.x_cf, ref.x_cf, atol=1e-6)
        np.testing.assert_array_equal(got.pred, ref.pred)

    # bulk path: chunk sharded over the mesh axis inside the scan
    x = np.asarray(xte[:100], np.float32)
    ref = eng.generate_bulk(x, target=2, chunk=16)
    got = eng_sh.generate_bulk(x, target=2, chunk=16)
    np.testing.assert_allclose(got.x_cf, ref.x_cf, atol=1e-6)
    np.testing.assert_array_equal(got.pred, ref.pred)

    # bulk chunk must split evenly across the mesh axis
    with pytest.raises(ValueError):
        eng_sh.generate_bulk(x, target=2, chunk=12)


def test_sharded_tabular_serving_matches_single_device():
    """Sharded serving for the tabular program shape: per-row Gumbel
    derivation + hard-Gumbel argmax + scatter residual assembly under
    GSPMD must equal the unsharded engine exactly (the per-row noise
    derivation makes results invariant to padding AND placement)."""
    from cfgan.data.kc_house import load_kc_house
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.serve.engine import CounterfactualEngine
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.train.state import NetState, adam_like_torch

    (xtr, ytr), _, stats, _, schema = load_kc_house(seed=0)
    tclf = TabularClassifier(num_classes=4)
    tclf_state = NetState.create(
        tclf.init({"params": jax.random.key(0), "dropout": jax.random.key(0)},
                  jnp.asarray(xtr[:2])),
        adam_like_torch(1e-3),
    )
    cfg = CounterGANConfig(hidden_dim=16, num_res_blocks=2)
    bundle = build_tabular_countergan(cfg, tclf, tclf_state, schema, stats,
                                      num_classes=4, seed=3)
    kw = dict(schema=schema, stats=stats)
    plain = CounterfactualEngine.from_bundle(bundle, tclf, tclf_state, **kw)
    sharded = CounterfactualEngine.from_bundle(
        bundle, tclf, tclf_state, **kw).shard(create_mesh())

    x = np.asarray(xtr[:37], np.float32)  # odd size -> padding on the mesh
    ref = plain.generate(x, target=2)
    got = sharded.generate(x, target=2)
    np.testing.assert_allclose(got.x_cf, ref.x_cf, atol=1e-6)
    np.testing.assert_array_equal(got.pred, ref.pred)
    # immutables untouched under the schema default mask, sharded too
    for i in schema.immutable_idx:
        np.testing.assert_array_equal(got.x_cf[:, i], x[:, i])
