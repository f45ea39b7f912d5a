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
