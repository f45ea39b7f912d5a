"""Training observability.

The reference logs through per-batch `print` + `.item()` calls, which force a
device->host sync every batch — the single biggest throughput killer in its
hot loop (`mnist/trainer.py:126-137`).  Here metrics are accumulated
*on device* inside the compiled step/scan and flushed once per epoch; the
logger then fans out to stdout, a JSONL file, and CSV summaries.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Mapping

import numpy as np


class MetricLogger:
    def __init__(self, out_dir: str | None = None, name: str = "train",
                 print_every: int = 1):
        self.out_dir = out_dir
        self.name = name
        self.print_every = print_every
        self.history: list[dict[str, Any]] = []
        self._t0 = time.perf_counter()
        self._fh = None
        if out_dir is not None:
            os.makedirs(out_dir, exist_ok=True)
            self._fh = open(os.path.join(out_dir, f"{name}_metrics.jsonl"), "a")

    def log(self, step: int, metrics: Mapping[str, Any], prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.perf_counter() - self._t0}
        for k, v in metrics.items():
            rec[k] = float(np.asarray(v))
        self.history.append(rec)
        if self._fh is not None:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.print_every and step % self.print_every == 0:
            body = ", ".join(
                f"{k}={v:.4f}" for k, v in rec.items() if k not in ("step", "time")
            )
            print(f"[{prefix or self.name}] step {step} :: {body}")

    def series(self, key: str) -> np.ndarray:
        return np.array([h[key] for h in self.history if key in h])

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def setup_compile_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache.

    On this TPU platform the `JAX_COMPILATION_CACHE_DIR` env var is
    ignored (the config must be set through `jax.config`), and the first
    remote compile of a fused train step costs minutes — cache it across
    runs.  Default location: `~/.cache/cfgan/jax_cache`, overridable via
    the `CFGAN_JAX_CACHE` env var or the argument.  Returns the directory
    used.  Called by the experiment mains; `bench.py` has its own
    repo-local variant."""
    import os

    import jax

    cache_dir = (cache_dir or os.environ.get("CFGAN_JAX_CACHE")
                 or os.path.expanduser("~/.cache/cfgan/jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
    return cache_dir
