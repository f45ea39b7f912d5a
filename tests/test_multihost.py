"""Multi-host (DCN-style) initialization: two OS processes, each with 4
virtual CPU devices, form one 8-device global mesh via
`cfgan.parallel.mesh.multihost_initialize`; a cross-process reduction
returns the correct global sum on both ranks.

This is the single-machine stand-in for a TPU pod slice: same
`jax.distributed.initialize` + global-mesh code path, Gloo instead of DCN.
"""
import os
import subprocess
import sys

import pytest

WORKER = """
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from cfgan.parallel.mesh import multihost_initialize
multihost_initialize(f"localhost:{{port}}", num_processes=2, process_id=pid)
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
arr = jax.make_array_from_callback(
    (8,), NamedSharding(mesh, P("data")),
    lambda idx: np.arange(8, dtype=np.float32)[idx])
total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(arr)
print("RESULT", pid, jax.local_device_count(), jax.device_count(),
      float(total.addressable_shards[0].data), flush=True)
"""


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    port = "12973"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-800:]
    results = sorted(
        line.split()[1:] for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    )
    assert len(results) == 2
    for pid, (got_pid, local, glob, total) in enumerate(results):
        assert int(got_pid) == pid
        assert int(local) == 4 and int(glob) == 8
        assert float(total) == 28.0  # sum(0..7) reduced across processes
