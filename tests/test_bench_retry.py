"""bench.py outage tolerance (VERDICT r3 missing #1).

Round 3 lost its benchmark record because a single backend-init failure
(axon tunnel outage) crashed bench.py with a raw traceback.  bench.py now
supervises the jax-touching work in child processes with hard timeouts and
bounded retry; on final failure it emits ONE structured JSON line.  These
tests drive the supervisor through simulated crash/hang/success paths —
no TPU (and no real benchmark run) required.
"""
import json
import os
import subprocess
import sys

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "bench.py")


def run_bench(env_extra, timeout=120):
    env = dict(os.environ)
    env.update(env_extra)
    # children must not inherit the axon platform pin: the probe child runs
    # real jax and must stay on CPU in tests (the sitecustomize ignores the
    # env var, so bench.py honors CFGAN_BENCH_PLATFORM via jax.config)
    env["CFGAN_BENCH_PLATFORM"] = "cpu"
    return subprocess.run([sys.executable, BENCH], env=env,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          timeout=timeout)


def last_json_line(stdout: bytes):
    lines = [l for l in stdout.decode().strip().splitlines() if l.strip()]
    assert lines, "no stdout from bench.py"
    return json.loads(lines[-1])


def test_probe_crash_yields_structured_error_json():
    proc = run_bench({
        "CFGAN_BENCH_FAIL_PROBE": "crash",
        "CFGAN_BENCH_ATTEMPTS": "2",
        "CFGAN_BENCH_BACKOFF": "0",
    })
    assert proc.returncode == 1
    rec = last_json_line(proc.stdout)
    assert rec["value"] is None
    assert rec["attempts"] == 2
    assert "probe" in rec["error"]
    assert len(rec["errors"]) == 2


def test_probe_hang_is_killed_and_retried():
    proc = run_bench({
        "CFGAN_BENCH_FAIL_PROBE": "hang",
        "CFGAN_BENCH_ATTEMPTS": "2",
        "CFGAN_BENCH_BACKOFF": "0",
        "CFGAN_BENCH_PROBE_TIMEOUT": "3",
    }, timeout=120)
    assert proc.returncode == 1
    rec = last_json_line(proc.stdout)
    assert rec["attempts"] == 2
    assert "timed out" in rec["error"]


def test_bench_child_crash_after_probe_ok():
    proc = run_bench({
        "CFGAN_BENCH_FAIL_BENCH": "crash",
        "CFGAN_BENCH_ATTEMPTS": "1",
        "CFGAN_BENCH_BACKOFF": "0",
    }, timeout=420)
    assert proc.returncode == 1
    rec = last_json_line(proc.stdout)
    assert "bench child failed rc=18" in rec["error"]


def test_success_path_forwards_child_json():
    # probe runs real jax on CPU; bench child short-circuits via the fake
    # hook, proving the supervisor forwards the child's stdout verbatim
    proc = run_bench({"CFGAN_BENCH_FAKE": "1"}, timeout=420)
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    rec = last_json_line(proc.stdout)
    assert rec == {"metric": "fake", "value": 1.0, "unit": "x",
                   "vs_baseline": 1.0}
