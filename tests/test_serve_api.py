"""HTTP JSON API tests (`cfgan.serve.api`) — a real threaded server on an
ephemeral loopback port, driven with urllib.  Covers happy paths for all
three endpoints, each mask form, and the client-error surface."""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from cfgan.core.config import ClassifierConfig, CounterGANConfig
from cfgan.models.classifiers import MLPClassifier
from cfgan.serve.api import make_server
from cfgan.serve.engine import CounterfactualEngine
from cfgan.train.builders import build_moons_countergan
from cfgan.train.classifier import train_classifier


@pytest.fixture(scope="module")
def api(moons_data):
    (xtr, ytr), (xte, yte), _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(
        CounterGANConfig(), clf_model, clf_state, seed=3
    )
    engine = CounterfactualEngine.from_bundle(bundle, clf_model, clf_state)
    server = make_server(engine, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield engine, base, xte
    server.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(api):
    engine, base, _ = api
    status, body = _get(base, "/health")
    assert status == 200
    assert body == {"status": "ok", "num_classes": 3, "kind": "generic"}


def test_classify_matches_engine(api):
    engine, base, xte = api
    x = np.asarray(xte[:4]).tolist()
    status, body = _post(base, "/classify", {"x": x})
    assert status == 200
    np.testing.assert_allclose(np.asarray(body["probs"]),
                               engine.classify(xte[:4]), rtol=1e-5)
    assert body["pred"] == np.argmax(engine.classify(xte[:4]), 1).tolist()


def test_counterfactual_matches_engine(api):
    engine, base, xte = api
    x = np.asarray(xte[:4])
    status, body = _post(base, "/counterfactual",
                         {"x": x.tolist(), "target": 2})
    assert status == 200
    ref = engine.generate(x, target=2)
    np.testing.assert_allclose(np.asarray(body["x_cf"]), ref.x_cf, rtol=1e-5)
    assert body["pred"] == ref.pred.tolist()
    assert body["flipped"] == ref.flipped.tolist()
    assert len(body["probs"]) == 4 and len(body["probs"][0]) == 3


def test_counterfactual_single_sample_and_dense_mask(api):
    engine, base, xte = api
    x = np.asarray(xte[0])
    status, body = _post(base, "/counterfactual",
                         {"x": x.tolist(), "target": 1,
                          "mask": [0.0, 0.0]})
    assert status == 200
    # zero mask => identity counterfactual (batch of one)
    np.testing.assert_allclose(np.asarray(body["x_cf"]), x[None], atol=1e-7)


def test_counterfactual_per_sample_targets(api):
    engine, base, xte = api
    x = np.asarray(xte[:3])
    status, body = _post(base, "/counterfactual",
                         {"x": x.tolist(), "target": [0, 1, 2]})
    assert status == 200
    ref = engine.generate(x, np.asarray([0, 1, 2]))
    np.testing.assert_allclose(np.asarray(body["x_cf"]), ref.x_cf, rtol=1e-5)


@pytest.mark.parametrize("body,frag", [
    ({}, "missing required field 'x'"),
    ({"x": [[0.1, 0.2]]}, "missing required field 'target'"),
    ({"x": [[0.1, 0.2]], "target": 7}, "must be int(s)"),
    ({"x": [[0.1, 0.2]], "target": 1.5}, "must be int(s)"),
    ({"x": [[0.1, 0.2]], "target": [0, 1]}, "length-1"),
    ({"x": [[0.1, 0.2]], "target": 0, "mask": [1.0]}, "mask shape"),
    ({"x": [[0.1, 0.2]], "target": 0, "patches": [0]}, "image engine"),
    ({"x": [[0.1, 0.2]], "target": 0, "features": ["grade"]},
     "tabular engine"),
    ({"x": [[0.1, 0.2]], "target": 0, "mask": [1.0, 1.0],
      "patches": [0]}, "at most one"),
    ({"x": "nope", "target": 0}, "not numeric"),
], ids=["no-x", "no-target", "target-range", "target-float", "target-len",
        "mask-shape", "patches-kind", "features-kind", "two-masks",
        "x-type"])
def test_client_errors_are_400(api, body, frag):
    _, base, _ = api
    status, resp = _post(base, "/counterfactual", body)
    assert status == 400
    assert frag in resp["error"]


def test_counterfactual_bulk_matches_engine(api):
    """/counterfactual_bulk routes through the engine's on-device scan
    path: same response schema as /counterfactual, values matching
    `generate_bulk` exactly (chunking included — the padded-chunk key
    schedule makes bulk results chunk-size-dependent, so the oracle must
    use the same chunk)."""
    engine, base, xte = api
    x = np.asarray(xte[:20])
    status, body = _post(base, "/counterfactual_bulk",
                         {"x": x.tolist(), "target": 2, "chunk": 8})
    assert status == 200
    ref = engine.generate_bulk(x, target=2, chunk=8)
    np.testing.assert_allclose(np.asarray(body["x_cf"]), ref.x_cf, rtol=1e-5)
    assert body["pred"] == ref.pred.tolist()
    assert body["flipped"] == ref.flipped.tolist()
    assert len(body["probs"]) == 20 and len(body["probs"][0]) == 3


def test_counterfactual_bulk_validation(api):
    _, base, _ = api
    status, resp = _post(base, "/counterfactual_bulk",
                         {"x": [[0.1, 0.2]], "target": 0, "chunk": 0})
    assert status == 400 and "'chunk'" in resp["error"]
    status, resp = _post(base, "/counterfactual_bulk",
                         {"x": [[0.1, 0.2]], "target": 0, "chunk": True})
    assert status == 400 and "'chunk'" in resp["error"]
    # shared validation applies to the bulk route too
    status, resp = _post(base, "/counterfactual_bulk", {"x": [[0.1, 0.2]]})
    assert status == 400 and "missing required field 'target'" in resp["error"]


def test_counterfactual_bulk_default_chunk_and_mask(api):
    engine, base, xte = api
    x = np.asarray(xte[:5])
    status, body = _post(base, "/counterfactual_bulk",
                         {"x": x.tolist(), "target": 1,
                          "mask": [0.0, 0.0]})
    assert status == 200
    # zero mask => identity counterfactuals through the bulk path
    np.testing.assert_allclose(np.asarray(body["x_cf"]), x, atol=1e-7)


@pytest.fixture(scope="module")
def image_api():
    """Stub image engine (patch_size 7, 14x14) behind a real server —
    pins the 'patches' mask form over HTTP."""
    import jax
    import jax.numpy as jnp

    H = W = 14

    def cf_fn(g_vars, x, target, mask, key=None):
        raw = 0.2 * jnp.ones_like(x)
        return jnp.clip(x + raw * mask, -1, 1), raw, raw * mask

    wm = jax.random.normal(jax.random.key(0), (H * W, 4))

    def clf_fn(x):
        return x.reshape(x.shape[0], -1) @ wm

    engine = CounterfactualEngine(cf_fn, clf_fn, {}, num_classes=4,
                                  patch_size=7)
    server = make_server(engine, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{server.server_address[1]}", H, W
    server.shutdown()


def test_wrong_rank_x_is_400(api, image_api):
    """Rank/width validation: a channel-less 2-D image, a 3-D tensor to a
    vector engine, or a wrong-width tabular row must be a 400 client
    error, not a 500 from deep inside the engine."""
    # moons (generic vector) engine: 3-D x is nonsense
    _, base, _ = api
    status, resp = _post(base, "/counterfactual",
                         {"x": [[[0.1, 0.2]]], "target": 1})
    assert status == 400 and "'x' must be" in resp["error"]
    # classify validates too
    status, resp = _post(base, "/classify", {"x": [[[0.1, 0.2]]]})
    assert status == 400 and "'x' must be" in resp["error"]
    # image engine: 2-D image without the channel dim
    ibase, H, W = image_api
    status, resp = _post(ibase, "/counterfactual",
                         {"x": np.zeros((H, W)).tolist(), "target": 1})
    assert status == 400 and "channel dim" in resp["error"]


def test_patches_mask_over_http(image_api):
    base, H, W = image_api
    x = np.zeros((1, H, W, 1), np.float32).tolist()
    status, body = _post(base, "/counterfactual",
                         {"x": x, "target": 1, "patches": [0]})
    assert status == 200
    delta = np.asarray(body["x_cf"])[0, :, :, 0]
    assert np.all(delta[:7, :7] != 0)        # inside patch 0
    assert np.all(delta[7:, :] == 0) and np.all(delta[:, 7:] == 0)
    # health reports an image engine
    assert _get(base, "/health")[1]["kind"] == "image"


def test_features_mask_over_http():
    import jax.numpy as jnp

    from cfgan.core.config import TabularSchema

    schema = TabularSchema(feature_names=("a", "b", "c", "d"),
                           immutable_features=("d",))

    def cf_fn(g_vars, x, target, mask, key=None):
        raw = 0.1 * jnp.ones_like(x)
        return x + raw * mask, raw, raw * mask

    def clf_fn(x):
        return jnp.stack([x[:, 0], x[:, 1], x[:, 2]], axis=1)

    engine = CounterfactualEngine(cf_fn, clf_fn, {}, num_classes=3,
                                  schema=schema)
    server = make_server(engine, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        x = [[0.5, 0.5, 0.5, 0.5]]
        status, body = _post(base, "/counterfactual",
                             {"x": x, "target": 0, "features": ["a", "c"]})
        assert status == 200
        delta = np.asarray(body["x_cf"])[0] - 0.5
        np.testing.assert_allclose(delta, [0.1, 0.0, 0.1, 0.0], atol=1e-7)
        # no mask at all -> default = complement of schema immutables
        status, body = _post(base, "/counterfactual", {"x": x, "target": 0})
        delta = np.asarray(body["x_cf"])[0] - 0.5
        np.testing.assert_allclose(delta, [0.1, 0.1, 0.1, 0.0], atol=1e-7)
        # unknown feature name -> 400
        status, body = _post(base, "/counterfactual",
                             {"x": x, "target": 0, "features": ["zz"]})
        assert status == 400 and "unknown feature names" in body["error"]
        # wrong feature width -> 400 (not an XLA shape error 500)
        status, body = _post(base, "/counterfactual",
                             {"x": [[0.5, 0.5, 0.5]], "target": 0})
        assert status == 400 and "4-feature" in body["error"]
        assert _get(base, "/health")[1]["kind"] == "tabular"
    finally:
        server.shutdown()


def test_concurrent_hammer_mixed_endpoints(api):
    """Concurrency hammer (`serve/api.py` uses ThreadingHTTPServer, so
    `engine.generate`/`engine.classify` run concurrently across request
    threads): 8 threads x 6 requests each, mixing /classify and
    /counterfactual at batch sizes crossing bucket edges
    (1, 2, 127, 128, 129, 512, 513 -> buckets 1, 2, 128, 256, 512, 1024).

    Asserts (a) every response bit-equals the sequential reference — the
    moons cf_fn is deterministic, and bucket padding is value-invariant —
    and (b) the serving jit cache grows by at most the number of distinct
    buckets touched, i.e. bucketing keeps compiles O(log max_batch) even
    under concurrent first-touch of the same bucket."""
    import concurrent.futures

    engine, base, xte = api
    sizes = [1, 2, 127, 128, 129, 512, 513]
    xs = {b: np.resize(np.asarray(xte), (b, 2)).astype(np.float32)
          for b in sizes}
    # sequential references (also pre-warms nothing: fresh buckets below
    # 1 and 2 are already compiled by earlier tests; measure the delta)
    refs_cf = {b: engine.generate(xs[b], target=b % 3) for b in sizes}
    refs_pr = {b: engine.classify(xs[b]) for b in sizes}
    cache_before = engine._serve._cache_size()

    def worker(tid: int):
        rng = np.random.RandomState(tid)
        order = rng.permutation(len(sizes) * 2 - 1) % len(sizes)
        for j in order[:6]:
            b = sizes[j]
            if (tid + j) % 2:
                status, body = _post(base, "/classify",
                                     {"x": xs[b].tolist()})
                assert status == 200, body
                np.testing.assert_array_equal(
                    np.asarray(body["probs"], np.float32), refs_pr[b])
            else:
                status, body = _post(base, "/counterfactual",
                                     {"x": xs[b].tolist(), "target": b % 3})
                assert status == 200, body
                np.testing.assert_array_equal(
                    np.asarray(body["x_cf"], np.float32), refs_cf[b].x_cf)
                assert body["pred"] == refs_cf[b].pred.tolist()
        return tid

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        done = list(pool.map(worker, range(8)))
    assert done == list(range(8))
    # every size above maps into the pre-warmed bucket set -> no growth
    assert engine._serve._cache_size() == cache_before


def test_unknown_path_404_and_bad_json_400(api):
    _, base, _ = api
    status, _ = _post(base, "/nope", {})
    assert status == 404
    req = urllib.request.Request(
        base + "/classify", data=b"{not json", method="POST",
        headers={"Content-Length": "9"},
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_stats_endpoint_counts_and_latency(api):
    """/stats reports per-endpoint request/error/sample counters and
    latency quantiles; counters move with traffic (own-traffic deltas only
    — the module-scoped server has seen other tests' requests)."""
    engine, base, xte = api
    _, before = _get(base, "/stats")
    b_cf = before["endpoints"].get("/counterfactual",
                                   {"requests": 0, "errors": 0,
                                    "samples": 0})
    _post(base, "/counterfactual", {"x": xte[:3].tolist(), "target": 1})
    _post(base, "/counterfactual", {"x": "garbage", "target": 1})  # 400
    _post(base, "/classify", {"x": xte[:2].tolist()})
    status, after = _get(base, "/stats")
    assert status == 200
    assert after["uptime_s"] >= 0
    a_cf = after["endpoints"]["/counterfactual"]
    assert a_cf["requests"] == b_cf["requests"] + 2
    assert a_cf["errors"] == b_cf["errors"] + 1
    assert a_cf["samples"] == b_cf["samples"] + 3
    lat = a_cf["latency_ms"]
    assert lat["p50"] is not None and lat["p50"] <= lat["max"]
    assert after["endpoints"]["/classify"]["requests"] >= 1


def test_api_over_sharded_engine(moons_data):
    """The HTTP API serves correctly from a mesh-sharded engine (the
    --shard deployment path): sharded responses equal unsharded ones."""
    from cfgan.parallel.mesh import create_mesh

    (xtr, ytr), (xte, yte), _ = moons_data
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=50), (xtr, ytr), seed=1
    )
    bundle = build_moons_countergan(
        CounterGANConfig(), clf_model, clf_state, seed=3
    )
    plain = CounterfactualEngine.from_bundle(bundle, clf_model, clf_state)
    sharded = CounterfactualEngine.from_bundle(
        bundle, clf_model, clf_state).shard(create_mesh())
    server = make_server(sharded, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        x = np.asarray(xte[:5], np.float32)
        status, body = _post(base, "/counterfactual",
                             {"x": x.tolist(), "target": 1})
        assert status == 200
        ref = plain.generate(x, target=1)
        np.testing.assert_allclose(np.asarray(body["x_cf"]),
                                   ref.x_cf, atol=1e-5)
        assert body["pred"] == ref.pred.tolist()
    finally:
        server.shutdown()


# --- binary (npz) wire format -------------------------------------------

def _post_raw(base, path, data, headers):
    req = urllib.request.Request(base + path, data=data, headers=headers,
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, r.headers.get("Content-Type", ""), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type", ""), e.read()


def _npz_bytes(**arrays):
    import io

    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _npz_load(raw):
    import io

    with np.load(io.BytesIO(raw), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def test_npz_counterfactual_roundtrip(api):
    """application/x-npz in -> application/x-npz out; values match both
    the engine and the JSON route bit-for-bit (same request, same seed)."""
    engine, base, xte = api
    x = np.asarray(xte[:4], np.float32)
    raw = _npz_bytes(x=x, target=np.int32(2), seed=np.int64(0))
    status, ctype, out = _post_raw(
        base, "/counterfactual", raw,
        {"Content-Type": "application/x-npz"})
    assert status == 200 and ctype == "application/x-npz"
    body = _npz_load(out)
    ref = engine.generate(x, target=2)
    np.testing.assert_allclose(body["x_cf"], ref.x_cf, rtol=1e-5)
    np.testing.assert_array_equal(body["pred"], ref.pred)
    np.testing.assert_array_equal(body["flipped"], ref.flipped)
    # identical values to the JSON route (shared handler, shared seed)
    _, jbody = _post(base, "/counterfactual",
                     {"x": x.tolist(), "target": 2})
    np.testing.assert_allclose(body["x_cf"], np.asarray(jbody["x_cf"]),
                               atol=0)


def test_npz_bulk_with_scalars_and_mask(api):
    """0-d npz entries (chunk/seed/scalar target) hit the same validation
    as JSON ints; dense masks ride as arrays."""
    engine, base, xte = api
    x = np.asarray(xte[:10], np.float32)
    raw = _npz_bytes(x=x, target=np.int64(1), chunk=np.int32(4),
                     mask=np.zeros(2, np.float32))
    status, ctype, out = _post_raw(
        base, "/counterfactual_bulk", raw,
        {"Content-Type": "application/x-npz"})
    assert status == 200 and ctype == "application/x-npz"
    body = _npz_load(out)
    # zero mask => identity counterfactuals through the bulk scan path
    np.testing.assert_allclose(body["x_cf"], x, atol=1e-7)


def test_npz_accept_negotiation(api):
    """Accept headers override the mirror-the-request default in both
    directions: npz-in + Accept json -> JSON; json-in + Accept npz -> npz."""
    engine, base, xte = api
    x = np.asarray(xte[:2], np.float32)
    raw = _npz_bytes(x=x, target=np.int32(1))
    status, ctype, out = _post_raw(
        base, "/counterfactual", raw,
        {"Content-Type": "application/x-npz", "Accept": "application/json"})
    assert status == 200 and ctype == "application/json"
    jbody = json.loads(out)
    assert np.asarray(jbody["x_cf"]).shape == (2, 2)
    status, ctype, out = _post_raw(
        base, "/classify", json.dumps({"x": x.tolist()}).encode(),
        {"Content-Type": "application/json", "Accept": "application/x-npz"})
    assert status == 200 and ctype == "application/x-npz"
    body = _npz_load(out)
    np.testing.assert_allclose(body["probs"], engine.classify(x), rtol=1e-5)


def test_npz_octet_stream_magic_sniffing(api):
    """A generic octet-stream upload whose body is a zip (npz) routes to
    the binary decoder via magic-byte sniffing."""
    _, base, xte = api
    x = np.asarray(xte[:2], np.float32)
    raw = _npz_bytes(x=x, target=np.int32(1))
    status, ctype, out = _post_raw(
        base, "/counterfactual", raw,
        {"Content-Type": "application/octet-stream"})
    assert status == 200 and ctype == "application/x-npz"
    assert _npz_load(out)["x_cf"].shape == (2, 2)


def test_npz_errors_are_json_400(api):
    """Malformed npz bodies and validation failures come back as
    human-readable JSON 400s, never binary."""
    _, base, xte = api
    status, ctype, out = _post_raw(
        base, "/counterfactual", b"PK\x03\x04garbage",
        {"Content-Type": "application/x-npz"})
    assert status == 400 and ctype == "application/json"
    assert "invalid npz body" in json.loads(out)["error"]
    # valid npz, missing target -> shared validation message
    raw = _npz_bytes(x=np.asarray(xte[:2], np.float32))
    status, ctype, out = _post_raw(
        base, "/counterfactual", raw,
        {"Content-Type": "application/x-npz"})
    assert status == 400 and ctype == "application/json"
    assert "missing required field 'target'" in json.loads(out)["error"]


# --- CFClient (cfgan.serve.client) ---------------------------------------

def test_client_counterfactual_matches_engine(api):
    """npz-wire client result == in-process engine result, as a CFResult."""
    from cfgan.serve.client import CFClient

    engine, base, xte = api
    x = np.asarray(xte[:4], np.float32)
    res = CFClient(base).counterfactual(x, target=2)
    ref = engine.generate(x, target=2)
    np.testing.assert_allclose(res.x_cf, ref.x_cf, rtol=1e-5)
    np.testing.assert_array_equal(res.pred, ref.pred)
    np.testing.assert_array_equal(res.flipped, ref.flipped)
    assert res.probs.shape == (4, 3) and res.flipped.dtype == bool


def test_client_wire_formats_agree(api):
    """json-wire and npz-wire clients produce identical values (shared
    handler, shared default seed)."""
    from cfgan.serve.client import CFClient

    _, base, xte = api
    x = np.asarray(xte[:3], np.float32)
    a = CFClient(base, wire="npz").counterfactual_bulk(x, target=1, chunk=2)
    b = CFClient(base, wire="json").counterfactual_bulk(x, target=1, chunk=2)
    np.testing.assert_allclose(a.x_cf, b.x_cf, atol=1e-6)
    np.testing.assert_array_equal(a.pred, b.pred)


def test_client_classify_health_stats(api):
    from cfgan.serve.client import CFClient

    engine, base, xte = api
    c = CFClient(base)
    probs, pred = c.classify(np.asarray(xte[:5], np.float32))
    np.testing.assert_allclose(probs, engine.classify(xte[:5]), rtol=1e-5)
    np.testing.assert_array_equal(pred, np.argmax(probs, axis=1))
    assert c.health()["num_classes"] == 3
    assert "/classify" in c.stats()["endpoints"]


def test_client_errors_raise_with_status(api):
    from cfgan.serve.client import CFApiError, CFClient

    _, base, xte = api
    c = CFClient(base)
    with pytest.raises(CFApiError) as ei:
        c.counterfactual(np.asarray(xte[:2], np.float32), target=99)
    assert ei.value.status == 400 and "'target'" in ei.value.message
    with pytest.raises(ValueError, match="at most one"):
        c.counterfactual(xte[:2], target=1, mask=[0.0, 0.0],
                         features=["a"])


def test_client_patches_falls_back_to_json(image_api):
    """patches is a JSON-only field: the npz-wire client transparently
    sends that request as JSON and the patch mask is honored."""
    from cfgan.serve.client import CFClient

    base, H, W = image_api
    x = np.zeros((2, H, W, 1), np.float32)
    res = CFClient(base, wire="npz").counterfactual(x, target=1, patches=[0])
    # only patch 0 (top-left 7x7) may change
    assert np.abs(res.residual[:, 7:, :, :]).max() == 0.0
    assert np.abs(res.residual[:, :, 7:, :]).max() == 0.0
    assert np.abs(res.residual[:, :7, :7, :]).max() > 0.0


def test_client_keepalive_reuses_connection(api):
    """The server speaks HTTP/1.1 and the client holds one persistent
    connection per thread: sequential requests ride the same socket."""
    from cfgan.serve.client import CFClient

    _, base, xte = api
    c = CFClient(base)
    c.health()
    conn = c._local.conn
    sock = conn.sock
    assert sock is not None  # still open after the response (keep-alive)
    c.classify(np.asarray(xte[:2], np.float32))
    c.counterfactual(np.asarray(xte[:2], np.float32), target=1)
    assert c._local.conn is conn and conn.sock is sock
    c.close()
    assert c._local.conn is None


def test_client_reconnects_on_dead_socket(api):
    """A kept-alive socket that died between calls is re-opened
    transparently (one silent retry; requests are pure)."""
    from cfgan.serve.client import CFClient

    _, base, xte = api
    c = CFClient(base)
    assert c.health()["status"] == "ok"
    c._local.conn.sock.close()  # simulate server-side idle close
    probs, pred = c.classify(np.asarray(xte[:2], np.float32))
    assert probs.shape == (2, 3) and pred.shape == (2,)
