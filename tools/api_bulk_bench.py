"""Wire-level throughput of the HTTP serving API's bulk route.

Serves the committed house checkpoint (the snapshot-selected production
generator, `cfgan.serve.launch.setup_house`) behind the stdlib API server
on loopback and measures end-to-end `/counterfactual_bulk` throughput —
JSON decode + engine scan + JSON encode + HTTP — against per-request
`/counterfactual` at the same total sample count.  This is the number a
deployment actually sees, complementing the on-chip engine numbers in
BASELINE.md ("Serving latency": 128.8k cf/s at the device boundary).

Usage: python tools/api_bulk_bench.py [--results results/house_countergan]
       [--sizes 512,2048,8192] [--chunk 512] [--out results/api_bulk]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def _post_npz(base, path, arrays):
    """Binary wire format: packed-f32 npz request/response (4 bytes/value
    + C-speed encode vs ~20 bytes/value JSON; serve/api.py docstring)."""
    import io

    import numpy as np

    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        base + path, data=buf.getvalue(),
        headers={"Content-Type": "application/x-npz"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        raw = r.read()
    with np.load(io.BytesIO(raw), allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--results", default="results/house_countergan")
    ap.add_argument("--sizes", default="512,2048,8192")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="results/api_bulk")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from cfgan.core.logging import setup_compile_cache

    setup_compile_cache()
    import numpy as np

    from cfgan.serve.api import make_server
    from cfgan.serve.launch import setup_house

    engine, xte, yte, schema, stats, bins = setup_house(args.results)
    server = make_server(engine, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    rng = np.random.RandomState(0)
    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        idx = rng.randint(0, len(xte), n)
        xa = np.asarray(xte, np.float32)[idx]
        ta = ((np.asarray(yte)[idx] + 1) % engine.num_classes).astype(np.int32)
        body = {"x": xa.tolist(), "target": ta.tolist(), "chunk": args.chunk}
        _post(base, "/counterfactual_bulk", body)  # warm (compile)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = _post(base, "/counterfactual_bulk", body)
        dt = (time.perf_counter() - t0) / args.reps
        flip = float(np.mean(out["flipped"]))
        row = {"route": "/counterfactual_bulk", "n": n, "chunk": args.chunk,
               "wall_ms": round(dt * 1e3, 1),
               "cf_per_sec_wire": round(n / dt), "flip": round(flip, 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

        # same request over the binary wire format
        npz_body = {"x": xa, "target": ta, "chunk": np.int32(args.chunk)}
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = _post_npz(base, "/counterfactual_bulk", npz_body)
        dt = (time.perf_counter() - t0) / args.reps
        row = {"route": "/counterfactual_bulk (npz)", "n": n,
               "chunk": args.chunk, "wall_ms": round(dt * 1e3, 1),
               "cf_per_sec_wire": round(n / dt),
               "flip": round(float(np.mean(out["flipped"])), 4)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # per-request contrast at the largest size, one engine batch per call
    n = max(int(s) for s in args.sizes.split(","))
    idx = rng.randint(0, len(xte), n)
    x = np.asarray(xte)[idx]
    t = (np.asarray(yte)[idx] + 1) % engine.num_classes
    b = args.chunk
    bodies = [{"x": x[i:i + b].tolist(), "target": t[i:i + b].tolist()}
              for i in range(0, n, b)]
    _post(base, "/counterfactual", bodies[0])  # warm
    t0 = time.perf_counter()
    for body in bodies:
        _post(base, "/counterfactual", body)
    dt = time.perf_counter() - t0
    row = {"route": "/counterfactual (per-chunk requests)", "n": n,
           "chunk": b, "wall_ms": round(dt * 1e3, 1),
           "cf_per_sec_wire": round(n / dt)}
    rows.append(row)
    print(json.dumps(row), flush=True)

    os.makedirs(args.out, exist_ok=True)
    payload = {"backend": jax.default_backend(),
               "results_dir": args.results, "rows": rows,
               "note": "loopback HTTP incl. wire encode/decode (JSON and "
                       "packed-f32 npz rows); 1-core host — serialization "
                       "shares the core"}
    with open(os.path.join(args.out, "api_bulk.json"), "w") as f:
        json.dump(payload, f, indent=1)
    server.shutdown()
    print(json.dumps({"written": os.path.join(args.out, "api_bulk.json")}))


if __name__ == "__main__":
    main()
