"""Multi-host (DCN-style) initialization: two OS processes, each with 4
virtual CPU devices, form one 8-device global mesh via
`cfgan.parallel.mesh.multihost_initialize`, then

1. a cross-process reduction returns the correct global sum on both ranks;
2. a REAL CounteRGAN train step (moons bundle: residual G, spectral-norm D,
   frozen classifier, 4-term loss) runs data-parallel over the global mesh,
   both ranks report identical metrics, and those metrics match a
   single-process execution of the same step on the same batch;
3. the SCANNED production epoch runner executes across the global mesh;
4. a sharded checkpoint written cooperatively by both ranks
   (`core.checkpoint.save_sharded`, orbax) restores in a FRESH pair of
   processes and the resumed epoch reproduces the uninterrupted run's
   metrics bit-identically — the actual pod-slice failure-recovery path.

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
ckpt_dir = sys.argv[3]; phase = sys.argv[4]  # "train" | "restore"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from cfgan.parallel.mesh import multihost_initialize
multihost_initialize(f"localhost:{{port}}", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))
arr = jax.make_array_from_callback(
    (8,), NamedSharding(mesh, P("data")),
    lambda idx: np.arange(8, dtype=np.float32)[idx])
total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(arr)
if phase == "train":
    print("RESULT", pid, jax.local_device_count(), jax.device_count(),
          float(total.addressable_shards[0].data), flush=True)

# ---- a real CounteRGAN step, data-parallel over the 2-process mesh ----
from cfgan.core.config import ClassifierConfig, CounterGANConfig
from cfgan.data.moons import load_moons3
from cfgan.models.classifiers import MLPClassifier
from cfgan.train.builders import build_moons_countergan
from cfgan.train.classifier import train_classifier
(xtr, ytr), _, _ = load_moons3()
clf_model = MLPClassifier()
clf_state, _ = train_classifier(
    clf_model, ClassifierConfig(lr=1e-2, steps=30), (xtr, ytr), seed=1,
    log=lambda s: None)
bundle = build_moons_countergan(
    CounterGANConfig(lambda_cls=2.0, lambda_reg_l1=5.0, lambda_reg_l2=5.0,
                     lambda_mask=3.0),
    clf_model, clf_state, seed=7)
B = 64
xb, yb = xtr[:B], ytr[:B]
rep = NamedSharding(mesh, P())
state = jax.tree_util.tree_map(lambda a: jax.make_array_from_callback(
    np.asarray(a).shape, rep, lambda idx: np.asarray(a)[idx]), bundle.state)
bsh = NamedSharding(mesh, P("data"))
xs = jax.make_array_from_callback((B, 2), bsh, lambda idx: xb[idx])
ys = jax.make_array_from_callback((B,), NamedSharding(mesh, P("data")),
                                  lambda idx: yb[idx])
if phase == "train":
    step = jax.jit(bundle.step_fn)
    new_state, metrics = step(state, xs, ys, jax.random.key(11))
    jax.block_until_ready(metrics)
    d = float(jax.device_get(metrics["d_loss"]))
    g = float(jax.device_get(metrics["g_loss"]))
    leaf = jax.tree_util.tree_leaves(new_state.g.params)[0]
    assert leaf.sharding.is_fully_replicated, "params lost replication"
    print("STEP", pid, f"{{d:.8f}}", f"{{g:.8f}}", flush=True)

# ---- the SCANNED production epoch runner across the 2-process mesh ----
# (make_epoch_runner's lax.scan over device-resident data, not a
# hand-jitted step: the path every experiment main actually runs)
from cfgan.data.pipeline import epoch_perm
from cfgan.core import checkpoint as ckpt
N = 128
xall = jax.make_array_from_callback((N, 2), bsh, lambda idx: xtr[:N][idx])
yall = jax.make_array_from_callback((N,), NamedSharding(mesh, P("data")),
                                    lambda idx: ytr[:N][idx])

def g_param_checksum(s):
    f = jax.jit(lambda t: sum(jnp.sum(jnp.abs(l))
                              for l in jax.tree_util.tree_leaves(t.g.params)),
                out_shardings=NamedSharding(mesh, P()))
    return float(f(s).addressable_shards[0].data)

if phase == "train":
    perm = epoch_perm(jax.random.key(12), N, B)
    ep_state, ep_metrics = bundle.epoch_fn(state, xall, yall, perm,
                                           jax.random.key(13))
    jax.block_until_ready(ep_metrics)
    ed = float(jax.device_get(ep_metrics["d_loss"]))
    eg = float(jax.device_get(ep_metrics["g_loss"]))
    leaf = jax.tree_util.tree_leaves(ep_state.g.params)[0]
    assert leaf.sharding.is_fully_replicated, "epoch lost replication"
    print("EPOCH", pid, f"{{ed:.8f}}", f"{{eg:.8f}}", flush=True)
    # ---- cooperative sharded checkpoint: BOTH ranks write their shards.
    # Saved BEFORE the post epoch — epoch_fn donates its input state.
    csum = g_param_checksum(ep_state)
    ckpt.save_sharded(ckpt_dir, ep_state, metadata={{"epoch": 1}})
else:
    # fresh pair of processes: restore into the replicated template and
    # resume — this is the pod-slice failure-recovery path
    ep_state = ckpt.restore_sharded(ckpt_dir, state)
    csum = g_param_checksum(ep_state)

# one more epoch from ep_state: the uninterrupted run ("train") and the
# restored-from-checkpoint run ("restore") must produce IDENTICAL metrics
perm2 = epoch_perm(jax.random.key(14), N, B)
post_state, post_metrics = bundle.epoch_fn(ep_state, xall, yall, perm2,
                                           jax.random.key(15))
jax.block_until_ready(post_metrics)
pd_ = float(jax.device_get(post_metrics["d_loss"]))
pg = float(jax.device_get(post_metrics["g_loss"]))
print("POST", pid, phase, f"{{csum:.10f}}", f"{{pd_:.10f}}", f"{{pg:.10f}}",
      flush=True)
"""


def _run_phase(script, port, ckpt_dir, phase, timeout=420):
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), port, ckpt_dir, phase],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-1500:]
    return outs


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(WORKER.format(repo=repo))
    ckpt_dir = str(tmp_path / "sharded_ckpt")
    outs = _run_phase(script, "12973", ckpt_dir, "train")
    results = sorted(
        line.split()[1:] for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    )
    assert len(results) == 2
    for pid, (got_pid, local, glob, total) in enumerate(results):
        assert int(got_pid) == pid
        assert int(local) == 4 and int(glob) == 8
        assert float(total) == 28.0  # sum(0..7) reduced across processes

    # ---- both ranks executed the CounteRGAN step and agree exactly ----
    steps = sorted(
        line.split()[1:] for out in outs for line in out.splitlines()
        if line.startswith("STEP")
    )
    assert len(steps) == 2, outs
    (_, d0, g0), (_, d1, g1) = steps
    assert d0 == d1 and g0 == g1  # identical across ranks

    # ...and match a single-process execution of the same step
    import jax
    import numpy as np

    from cfgan.core.config import ClassifierConfig, CounterGANConfig
    from cfgan.data.moons import load_moons3
    from cfgan.models.classifiers import MLPClassifier
    from cfgan.train.builders import build_moons_countergan
    from cfgan.train.classifier import train_classifier

    (xtr, ytr), _, _ = load_moons3()
    clf_model = MLPClassifier()
    clf_state, _ = train_classifier(
        clf_model, ClassifierConfig(lr=1e-2, steps=30), (xtr, ytr), seed=1,
        log=lambda s: None,
    )
    bundle = build_moons_countergan(
        CounterGANConfig(lambda_cls=2.0, lambda_reg_l1=5.0,
                         lambda_reg_l2=5.0, lambda_mask=3.0),
        clf_model, clf_state, seed=7,
    )
    import jax.numpy as jnp

    _, metrics = jax.jit(bundle.step_fn)(
        bundle.state, jnp.asarray(xtr[:64]), jnp.asarray(ytr[:64]),
        jax.random.key(11),
    )
    # 8-way sharded reductions reassociate f32 sums; observed deltas are
    # ~2e-4 on a ~15 loss (1e-5 relative)
    np.testing.assert_allclose(float(metrics["d_loss"]), float(d0), atol=1e-4)
    np.testing.assert_allclose(float(metrics["g_loss"]), float(g0), atol=1e-3)

    # ---- the scanned epoch runner ran across both ranks and agrees ----
    epochs = sorted(
        line.split()[1:] for out in outs for line in out.splitlines()
        if line.startswith("EPOCH")
    )
    assert len(epochs) == 2, outs
    (_, ed0, eg0), (_, ed1, eg1) = epochs
    assert ed0 == ed1 and eg0 == eg1  # identical across ranks

    from cfgan.data.pipeline import epoch_perm

    # the workers ran their epoch from the INITIAL replicated state (the
    # hand-jitted step above did not donate), so compare from bundle.state
    perm = epoch_perm(jax.random.key(12), 128, 64)
    _, ep_metrics = bundle.epoch_fn(
        bundle.state, jnp.asarray(xtr[:128]), jnp.asarray(ytr[:128]), perm,
        jax.random.key(13),
    )
    np.testing.assert_allclose(float(ep_metrics["d_loss"]), float(ed0),
                               atol=1e-4)
    np.testing.assert_allclose(float(ep_metrics["g_loss"]), float(eg0),
                               atol=1e-3)

    # ---- sharded-checkpoint round-trip in FRESH processes (pod-slice
    # failure recovery): restore + resumed epoch must reproduce the
    # uninterrupted run bit-identically ----
    def post_lines(outs):
        return sorted(
            line.split()[1:] for out in outs for line in out.splitlines()
            if line.startswith("POST")
        )

    train_post = post_lines(outs)
    assert len(train_post) == 2, outs
    outs2 = _run_phase(script, "12974", ckpt_dir, "restore")
    restore_post = post_lines(outs2)
    assert len(restore_post) == 2, outs2
    for (pid_t, _, cs_t, d_t, g_t), (pid_r, _, cs_r, d_r, g_r) in zip(
            train_post, restore_post):
        assert pid_t == pid_r
        assert cs_t == cs_r, "restored g-params checksum differs"
        assert (d_t, g_t) == (d_r, g_r), (
            "resumed epoch metrics differ from the uninterrupted run")
    # and the two restore ranks agree with each other
    assert restore_post[0][1:] == restore_post[1][1:]
