"""Wire-level throughput of the HTTP serving API's bulk route.

Serves the committed house checkpoint (the snapshot-selected production
generator, `cfgan.serve.launch.setup_house`) behind the stdlib API server
on loopback and measures end-to-end `/counterfactual_bulk` throughput —
wire decode + engine scan + wire encode + HTTP — against per-request
`/counterfactual` at the same total sample count, on both wire formats
(JSON and packed-f32 npz) via `cfgan.serve.client.CFClient`.  This is the
number a deployment actually sees, complementing the on-chip engine
numbers in BASELINE.md ("Serving latency": 128.8k cf/s at the device
boundary).

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from cfgan.serve.client import CFClient
    from cfgan.serve.launch import setup_house

    engine, xte, yte, schema, stats, bins = setup_house(args.results)
    server = make_server(engine, port=0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    clients = {"json": CFClient(base, wire="json"),
               "npz": CFClient(base, wire="npz")}

    rng = np.random.RandomState(0)
    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        idx = rng.randint(0, len(xte), n)
        xa = np.asarray(xte, np.float32)[idx]
        ta = ((np.asarray(yte)[idx] + 1) % engine.num_classes).astype(np.int32)
        clients["json"].counterfactual_bulk(
            xa, ta, chunk=args.chunk)  # warm (compile)
        for wire, client in clients.items():
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = client.counterfactual_bulk(xa, ta, chunk=args.chunk)
            dt = (time.perf_counter() - t0) / args.reps
            suffix = "" if wire == "json" else f" ({wire})"
            row = {"route": f"/counterfactual_bulk{suffix}", "n": n,
                   "chunk": args.chunk, "wall_ms": round(dt * 1e3, 1),
                   "cf_per_sec_wire": round(n / dt),
                   "flip": round(float(np.mean(out.flipped)), 4)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    # per-request contrast at the largest size, one engine batch per call
    n = max(int(s) for s in args.sizes.split(","))
    idx = rng.randint(0, len(xte), n)
    x = np.asarray(xte, np.float32)[idx]
    t = ((np.asarray(yte)[idx] + 1) % engine.num_classes).astype(np.int32)
    b = args.chunk
    chunks = [(x[i:i + b], t[i:i + b]) for i in range(0, n, b)]
    clients["json"].counterfactual(*chunks[0])  # warm
    t0 = time.perf_counter()
    for xc, tc in chunks:
        clients["json"].counterfactual(xc, tc)
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
