"""HTTP JSON API for counterfactual serving (stdlib-only).

The reference's only serving surface is Gradio web UIs
(`mnist/gr.py:277`, `house_sales_kc_usa/gradio_app.py:259`,
`moons/gradio_app.py:162`) — there is no programmatic endpoint.  For
production deployment this module exposes the fused
`CounterfactualEngine` (`cfgan.serve.engine`, one XLA call per request)
over a threaded HTTP server with JSON in/out and zero dependencies
beyond the standard library.

Endpoints:

* ``GET  /health``          -> ``{"status": "ok", "num_classes": C, ...}``
* ``GET  /stats``           -> per-endpoint request/error/sample counts +
  p50/p95/max latency over the last 1024 requests (thread-safe)
* ``POST /classify``        body ``{"x": [...] | [[...]]}``
                            -> ``{"probs": [[...]], "pred": [...]}``
* ``POST /counterfactual``  body ``{"x": ..., "target": int | [...]}`` plus
  an optional mask given ONE of three ways (mirroring the promptable UIs):
  ``"mask"`` (dense 0/1 array), ``"patches"`` (image engines: modifiable
  patch indices, `mnist/gr.py:73-76`), or ``"features"`` (tabular engines:
  allowed feature names, `house gradio_app.py:150-156`); optional ``"seed"``.
  -> the full `CFResult` as JSON lists.
* ``POST /counterfactual_bulk``  same schema plus optional ``"chunk"``
  (default 128) -> same response, via the engine's on-device ``lax.scan``
  bulk path (one dispatch per request, dataset-scale throughput).

Binary wire format (production bulk path): every POST endpoint also
accepts ``Content-Type: application/x-npz`` — the body is an uncompressed
NumPy ``.npz`` archive whose entries are the same fields as the JSON
schema (``x``/``target``/``mask`` as arrays; ``chunk``/``seed`` as 0-d
ints; the list-valued ``patches``/``features`` forms are JSON-only — send
a dense ``mask``).  The response mirrors the request format (an ``.npz``
of the result arrays) unless an ``Accept`` header forces the other one.
JSON float lists cost ~20 bytes/value plus host-side encode on the
serving core; packed f32 is 4 bytes/value with C-speed encode — at
dataset scale the NPZ route is serialization-unbound (see
``tools/api_bulk_bench.py``).

Batched and single-sample inputs both work (a single sample comes back as a
batch of one, matching `CounterfactualEngine.generate`).  The server binds
loopback by default; exposing it on all interfaces is an explicit opt-in
(same policy as `cfgan.serve.launch`).
"""
from __future__ import annotations

import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from cfgan.serve.engine import CounterfactualEngine

NPZ_CONTENT_TYPE = "application/x-npz"
#: npz archives are zip files; used as a content-type fallback so generic
#: ``application/octet-stream`` uploads still route to the binary decoder
_ZIP_MAGIC = b"PK\x03\x04"


class ApiError(ValueError):
    """Client error carried to a 400 response."""


def _decode_npz_body(raw: bytes) -> dict:
    """Decode an ``application/x-npz`` request body into the same dict the
    JSON path produces: arrays stay arrays (``_as_array``/``np.asarray``
    accept them downstream), 0-d integer entries (``chunk``/``seed``/a
    scalar ``target``) become Python ints so the shared validation treats
    both wire formats identically."""
    try:
        with np.load(io.BytesIO(raw), allow_pickle=False) as npz:
            body = {k: npz[k] for k in npz.files}
    except Exception as e:
        raise ApiError(f"invalid npz body: {e}") from e
    for k, v in body.items():
        if isinstance(v, np.ndarray) and v.ndim == 0:
            body[k] = int(v) if v.dtype.kind in "iub" else float(v)
    return body


def _encode_npz_payload(payload: dict) -> bytes:
    """Pack a handler result (dict of arrays/scalars) as an uncompressed
    npz — C-speed encode, 4 bytes per f32 vs ~20 for a JSON float."""
    buf = io.BytesIO()
    np.savez(buf, **{k: np.asarray(v) for k, v in payload.items()})
    return buf.getvalue()


def _jsonable(payload: dict) -> dict:
    """Arrays -> lists for the JSON response path (handlers return arrays
    so the binary path never round-trips through Python lists)."""
    return {k: (v.tolist() if isinstance(v, np.ndarray) else v)
            for k, v in payload.items()}


def _as_array(obj, name: str) -> np.ndarray:
    if obj is None:
        raise ApiError(f"missing required field {name!r}")
    try:
        arr = np.asarray(obj, dtype=np.float32)
    except (TypeError, ValueError) as e:
        raise ApiError(f"field {name!r} is not numeric: {e}") from e
    if arr.size == 0:
        raise ApiError(f"field {name!r} is empty")
    return arr


def _resolve_mask(engine: CounterfactualEngine, body: dict, batch: int,
                  x_shape) -> np.ndarray | None:
    given = [k for k in ("mask", "patches", "features") if body.get(k) is not None]
    if len(given) > 1:
        raise ApiError(f"give at most one of mask/patches/features, got {given}")
    if not given:
        return None
    kind = given[0]
    if kind == "mask":
        mask = _as_array(body["mask"], "mask")
        want = tuple(x_shape[1:])
        if mask.shape not in (want, (batch,) + want):
            raise ApiError(
                f"mask shape {mask.shape} does not match sample shape {want}"
            )
        return mask
    if kind == "patches":
        if engine.patch_size is None:
            raise ApiError("'patches' requires an image engine")
        patches = body["patches"]
        if (not isinstance(patches, list) or not patches
                or not all(isinstance(p, int) and not isinstance(p, bool)
                           for p in patches)):
            raise ApiError("'patches' must be a non-empty list of ints")
        hw = tuple(x_shape[1:3])
        n = (hw[0] // engine.patch_size) * (hw[1] // engine.patch_size)
        if any(p < 0 or p >= n for p in patches):
            raise ApiError(f"patch indices must be in [0, {n})")
        return np.asarray(
            engine.mask_from_patches(patches, batch, hw, x_shape[3])
        )
    # features
    if engine.schema is None:
        raise ApiError("'features' requires a tabular engine")
    feats = body["features"]
    if not isinstance(feats, list) or not feats:
        raise ApiError("'features' must be a non-empty list of names")
    unknown = [f for f in feats if f not in engine.schema.feature_names]
    if unknown:
        raise ApiError(f"unknown feature names: {unknown}")
    return np.asarray(engine.mask_from_feature_names(feats, batch))


def _validate_x(engine: CounterfactualEngine, x: np.ndarray) -> None:
    """Reject wrong-rank/wrong-width inputs as 400s BEFORE they reach the
    engine — an unrecognized rank would otherwise be treated as batched
    and surface as a 500 with a raw IndexError/XLA shape error."""
    if engine.schema is not None:  # tabular engine
        d = engine.schema.input_dim
        if x.ndim not in (1, 2) or x.shape[-1] != d:
            raise ApiError(
                f"'x' must be a {d}-feature vector or a batch of them "
                f"(got shape {x.shape})"
            )
    elif engine.patch_size is not None:  # image engine
        if x.ndim not in (3, 4):
            raise ApiError(
                "'x' must be an (H, W, C) image or an (B, H, W, C) batch "
                f"— include the channel dim (got shape {x.shape})"
            )
    elif x.ndim not in (1, 2):  # generic vector engine (moons)
        raise ApiError(
            f"'x' must be a feature vector or a batch of them "
            f"(got shape {x.shape})"
        )


def _handle_classify(engine: CounterfactualEngine, body: dict) -> dict:
    x = _as_array(body.get("x"), "x")
    _validate_x(engine, x)
    probs = engine.classify(x)
    return {"probs": probs, "pred": np.argmax(probs, axis=1)}


def _parse_cf_request(engine: CounterfactualEngine, body: dict):
    """Shared request validation for the counterfactual endpoints:
    returns `(batched_x, targets, mask, key)` or raises `ApiError`."""
    import jax

    x = _as_array(body.get("x"), "x")
    _validate_x(engine, x)
    target = body.get("target")
    if target is None:
        raise ApiError("missing required field 'target'")
    t = np.asarray(target)
    if t.dtype.kind not in "iu" or np.any(t < 0) or np.any(
            t >= engine.num_classes):
        raise ApiError(
            f"'target' must be int(s) in [0, {engine.num_classes})"
        )
    # normalize to a batch before mask resolution so dense masks, patch
    # masks and feature masks all see the batched shape
    batched_x = x if x.ndim != engine._sample_ndim(x) else x[None]
    if t.ndim > 1 or (t.ndim == 1 and t.shape[0] != batched_x.shape[0]):
        raise ApiError(
            f"'target' must be a scalar or length-{batched_x.shape[0]} list"
        )
    mask = _resolve_mask(engine, body, batched_x.shape[0], batched_x.shape)
    seed = body.get("seed", 0)
    if not isinstance(seed, int) or isinstance(seed, bool):
        raise ApiError("'seed' must be an int")
    return batched_x, t, mask, jax.random.key(seed)


def _cf_payload(res) -> dict:
    # arrays, not lists: the wire encoder (_jsonable / _encode_npz_payload)
    # owns the format so the binary path never materializes Python lists
    return {
        "x_cf": res.x_cf,
        "residual": res.residual,
        "pred": res.pred,
        "confidence": res.confidence,
        "probs": res.probs,
        "probs_orig": res.probs_orig,
        "flipped": res.flipped,
    }


def _handle_counterfactual(engine: CounterfactualEngine, body: dict) -> dict:
    batched_x, t, mask, key = _parse_cf_request(engine, body)
    res = engine.generate(batched_x, t, mask=mask, key=key)
    return _cf_payload(res)


def _handle_counterfactual_bulk(engine: CounterfactualEngine,
                                body: dict) -> dict:
    """Dataset-scale CF sweep over the wire: routes to
    `CounterfactualEngine.generate_bulk` — the batch is chunked and ONE
    compiled program scans the fused serving step over the chunks
    on-device (no host dispatch between chunks; ~one dispatch per 8,192
    samples at 128.8k cf/s, BASELINE.md "Serving latency").  Same request
    schema as /counterfactual plus optional ``"chunk"`` (samples per scan
    chunk, default 128)."""
    chunk = body.get("chunk", 128)
    if not isinstance(chunk, int) or isinstance(chunk, bool) \
            or not 1 <= chunk <= 65536:
        raise ApiError("'chunk' must be an int in [1, 65536]")
    batched_x, t, mask, key = _parse_cf_request(engine, body)
    try:
        res = engine.generate_bulk(batched_x, t, mask=mask, key=key,
                                   chunk=chunk)
    except ValueError as e:
        # e.g. chunk not divisible by the mesh batch-axis size
        raise ApiError(str(e)) from e
    return _cf_payload(res)


class ApiStats:
    """Thread-safe request counters + latency quantiles for ``/stats``.

    Production observability the reference's gradio-only serving lacks:
    per-endpoint request/error counts, samples served, and p50/p95/max
    request latency over a sliding window of the most recent requests.
    """

    WINDOW = 1024

    def __init__(self):
        import collections
        import threading

        self._lock = threading.Lock()
        self._counts = collections.Counter()
        self._errors = collections.Counter()
        self._samples = collections.Counter()
        self._lat = collections.defaultdict(
            lambda: collections.deque(maxlen=self.WINDOW))
        self._started = time.time()

    def record(self, path: str, seconds: float, samples: int, ok: bool):
        with self._lock:
            self._counts[path] += 1
            if not ok:
                self._errors[path] += 1
            self._samples[path] += samples
            self._lat[path].append(seconds)

    def snapshot(self) -> dict:
        with self._lock:
            out = {"uptime_s": round(time.time() - self._started, 1),
                   "endpoints": {}}
            for path in sorted(self._counts):
                lat = sorted(self._lat[path])
                # nearest-rank over n-1 intervals (ADVICE r3: int(p*len) is
                # upper-biased — with 2 samples p50 would return the max)
                q = (lambda p: round(
                    lat[int(round(p * (len(lat) - 1)))] * 1e3, 2)
                ) if lat else (lambda p: None)
                out["endpoints"][path] = {
                    "requests": self._counts[path],
                    "errors": self._errors[path],
                    "samples": self._samples[path],
                    "latency_ms": {"p50": q(0.50), "p95": q(0.95),
                                   "max": q(1.0)},
                }
            return out


class CFRequestHandler(BaseHTTPRequestHandler):
    """Routes requests to the engine attached to the server."""

    # HTTP/1.1 => persistent connections (every response already carries
    # Content-Length, the precondition for keep-alive).  Interactive
    # clients then pay the TCP handshake once per session instead of once
    # per request — `cfgan.serve.CFClient` holds one connection per
    # thread.  HTTP/1.0 clients (plain urllib) are still served per spec.
    protocol_version = "HTTP/1.1"

    # quiet by default; the server object can flip this on
    def log_message(self, fmt, *args):  # noqa: D102
        if getattr(self.server, "verbose", False):
            super().log_message(fmt, *args)

    def _send(self, code: int, payload: dict, binary: bool = False):
        if binary and code == 200:
            data = _encode_npz_payload(payload)
            ctype = NPZ_CONTENT_TYPE
        else:  # errors are always JSON (human-readable)
            data = json.dumps(_jsonable(payload)).encode()
            ctype = "application/json"
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802
        if self.path == "/stats":
            return self._send(200, self.server.stats.snapshot())
        if self.path != "/health":
            return self._send(404, {"error": f"unknown path {self.path}"})
        eng = self.server.engine
        kind = ("tabular" if eng.schema is not None
                else "image" if eng.patch_size is not None else "generic")
        self._send(200, {
            "status": "ok",
            "num_classes": eng.num_classes,
            "kind": kind,
        })

    def do_POST(self):  # noqa: N802
        routes = {"/classify": _handle_classify,
                  "/counterfactual": _handle_counterfactual,
                  "/counterfactual_bulk": _handle_counterfactual_bulk}
        handler = routes.get(self.path)
        if handler is None:
            return self._send(404, {"error": f"unknown path {self.path}"})
        t0 = time.perf_counter()
        samples, ok, binary_out = 0, False, False
        try:
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
            binary_in = (ctype == NPZ_CONTENT_TYPE
                         or (ctype in ("", "application/octet-stream")
                             and raw[:4] == _ZIP_MAGIC))
            accept = self.headers.get("Accept", "") or ""
            # response mirrors the request format unless Accept forces one
            binary_out = (NPZ_CONTENT_TYPE in accept
                          or (binary_in and "application/json" not in accept))
            if binary_in:
                body = _decode_npz_body(raw)
            else:
                body = json.loads(raw or b"{}")
                if not isinstance(body, dict):
                    raise ApiError("request body must be a JSON object")
            payload = handler(self.server.engine, body)
            samples = len(payload.get("pred", payload.get("probs", [])))
            ok = True
            out = (200, payload)
        except (ApiError, json.JSONDecodeError) as e:
            out = (400, {"error": str(e)})
        except Exception as e:  # pragma: no cover - defensive
            out = (500, {"error": f"{type(e).__name__}: {e}"})
        # record BEFORE sending: a client that has received its response is
        # guaranteed to see the request reflected in a subsequent /stats
        # (recording after _send races exactly that read pattern)
        self.server.stats.record(self.path, time.perf_counter() - t0,
                                 samples, ok)
        self._send(*out, binary=binary_out)


def make_server(engine: CounterfactualEngine, host: str = "127.0.0.1",
                port: int = 8000, verbose: bool = False) -> ThreadingHTTPServer:
    """Build (but do not start) the API server; port 0 picks a free port.
    Call `.serve_forever()` (blocking) or run it in a thread."""
    server = ThreadingHTTPServer((host, port), CFRequestHandler)
    server.engine = engine
    server.verbose = verbose
    server.stats = ApiStats()
    return server


def serve(engine: CounterfactualEngine, host: str = "127.0.0.1",
          port: int = 8000) -> None:
    server = make_server(engine, host, port, verbose=True)
    print(f"cfgan API listening on http://{host}:{server.server_address[1]}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover - interactive
        server.shutdown()
