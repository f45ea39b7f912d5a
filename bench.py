"""Benchmark: MNIST CounteRGAN G+D train-step throughput (images/sec/chip).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The workload is the flagship hot loop (SURVEY.md section 3.5 item 1): one
fused XLA program per step — mask+target sampling, generator forward,
discriminator update (real+fake batched), generator update through the
frozen classifier — with donated state and zero per-step host syncs.

Baseline: the PyTorch reference publishes no throughput numbers
(BASELINE.md), so the baseline is the reference-equivalent eager PyTorch
train step (same models, losses, and update order as
`conditional_counteRGAN/mnist/trainer.py:76-137`, re-implemented from the
survey, not copied) measured on THIS host's CPU — the only PyTorch device
available here.  The measurement is cached in `.bench_baseline.json`.
Secondary metrics (cf/sec serving throughput) go to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

BATCH = 128
STEPS = 60
WARMUP = 3
_BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".bench_baseline.json")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def fence(x) -> float:
    """Timing fence: FETCH a scalar derived from `x` instead of
    `block_until_ready`.  On the experimental axon (remote-TPU) platform,
    `block_until_ready` was measured to return prematurely for some scanned
    programs (a 24-step WGAN-GP epoch "completed" in 1.5 ms — 40x faster
    than physics allows — while a value fetch showed the true 130 ms; the
    flagship CounteRGAN program fences correctly either way).  A device->
    host copy of one scalar cannot complete before the producing program
    does, so this is the trustworthy fence; it costs one tunnel round trip
    per timed window."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0])


# --------------------------------------------------------------- cfgan side
def _setup_compile_cache():
    """Persistent compilation cache (the env var alone is ignored on this
    platform — must go through jax.config): first fused-step compile through
    the remote-compile tunnel costs minutes; cache it across bench runs."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:
        log(f"[bench] compilation cache unavailable: {e}")


def bench_cfgan():
    import jax

    _setup_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from cfgan.core.config import CounterGANConfig, MaskConfig
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan
    from cfgan.train.state import NetState, adam_like_torch

    # the SHIPPED default recipe (presets.MNIST_COUNTERGAN): reference
    # widths/losses + lambda_cls 2 + per-step generator EMA + bf16 compute
    # (f32 params/opt/losses) — the headline measures what a default run
    # actually executes, EMA axpy included
    cfg = CounterGANConfig(
        lr_g=5e-5, lr_d=1e-5, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=2.5, lambda_mask=2.0, adv_loss="bce",
        reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
        resample_target=False, num_res_blocks=6, hidden_dim=64,
        mask=MaskConfig(kind="patch", patch_size=7, num_modifiable_patches=10),
        compute_dtype="bfloat16",
        ema_decay=0.999,
    )
    clf_model = CNNClassifier()
    clf_state = NetState.create(
        clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                       train=False),
        adam_like_torch(1e-3),
    )
    bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=0,
                                    diagnostics=False)

    from cfgan.data.pipeline import epoch_perm

    rng = np.random.RandomState(0)
    n = BATCH * STEPS
    x = jnp.asarray(rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 10, n).astype(np.int32))
    key = jax.random.key(2)
    perm = epoch_perm(jax.random.key(3), n, BATCH)  # STEPS steps

    # the production training path: the whole epoch is ONE lax.scan program
    # over the device-resident dataset (train/countergan.make_epoch_runner) —
    # no per-step dispatch
    state = bundle.state
    t0 = time.perf_counter()
    for _ in range(WARMUP):
        state, metrics = bundle.epoch_fn(state, x, y, perm, key)
    fence(metrics["d_loss"])
    log(f"[cfgan] compile+warmup {time.perf_counter() - t0:.1f}s on "
        f"{jax.devices()[0].platform}")

    reps = 5
    t0 = time.perf_counter()
    for i in range(reps):
        state, metrics = bundle.epoch_fn(state, x, y, perm,
                                         jax.random.fold_in(key, i))
    fence(metrics["d_loss"])
    dt = (time.perf_counter() - t0) / reps
    train_ips = n / dt
    log(f"[cfgan] scanned epoch: {dt / STEPS * 1e3:.2f} ms/step -> "
        f"{train_ips:,.0f} images/sec/chip")

    # secondary: serving throughput (fused G+classifier counterfactual fwd)
    cf = bundle.cf_fn
    g_vars = state.g.variables()
    xb = x[:BATCH]
    t = jnp.asarray(rng.randint(0, 10, BATCH).astype(np.int32))
    mask = jnp.ones((BATCH, 28, 28, 1), jnp.float32)
    out = cf(g_vars, xb, t, mask)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = cf(g_vars, xb, t, mask)
    fence(out)
    cf_ps = BATCH * STEPS / (time.perf_counter() - t0)
    log(f"[cfgan] counterfactuals/sec (batch {BATCH}): {cf_ps:,.0f}")
    return train_ips, cf_ps


# ------------------------------------------------------------ torch baseline
def bench_torch_baseline(steps: int = 8) -> float:
    """Reference-equivalent eager PyTorch CounteRGAN step on this host."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    torch.manual_seed(0)
    dev = "cuda" if torch.cuda.is_available() else "cpu"

    class ResBlock(nn.Module):
        def __init__(self, ch):
            super().__init__()
            self.c1 = nn.Conv2d(ch, ch, 3, 1, 1)
            self.b1 = nn.BatchNorm2d(ch)
            self.c2 = nn.Conv2d(ch, ch, 3, 1, 1)
            self.b2 = nn.BatchNorm2d(ch)

        def forward(self, x):
            h = F.leaky_relu(self.b1(self.c1(x)), 0.2)
            return x + 0.1 * self.b2(self.c2(h))

    class Gen(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(10, 784)
            self.cin = nn.Conv2d(3, 64, 3, 1, 1)
            self.blocks = nn.Sequential(*[ResBlock(64) for _ in range(6)])
            self.mid = nn.Conv2d(64, 64, 3, 1, 1)
            self.out = nn.Conv2d(64, 1, 3, 1, 1)

        def forward(self, x, t, m):
            plane = self.emb(t).view(-1, 1, 28, 28)
            h = F.leaky_relu(self.cin(torch.cat([x, plane, m], 1)), 0.2)
            h = F.leaky_relu(self.mid(self.blocks(h)), 0.2)
            raw = self.out(h) * 0.1
            return raw, raw * m

    class Disc(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(10, 784)
            chans = [(2, 64), (64, 128), (128, 256), (256, 256)]
            self.convs = nn.ModuleList(
                [nn.Conv2d(i, o, 3, 2, 1) for i, o in chans]
            )
            self.fc = nn.Linear(256, 1)

        def forward(self, x, t):
            h = torch.cat([x, self.emb(t).view(-1, 1, 28, 28)], 1)
            for c in self.convs:
                h = F.leaky_relu(c(h), 0.2)
            return self.fc(F.adaptive_avg_pool2d(h, 1).flatten(1))

    class Clf(nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = nn.Conv2d(1, 32, 3, 1, 1)
            self.c2 = nn.Conv2d(32, 64, 3, 2, 1)
            self.c3 = nn.Conv2d(64, 128, 3, 2, 1)
            self.f1 = nn.Linear(128 * 7 * 7, 256)
            self.f2 = nn.Linear(256, 10)

        def forward(self, x):
            h = F.relu(self.c1(x))
            h = F.relu(self.c2(h))
            h = F.relu(self.c3(h))
            return self.f2(F.relu(self.f1(h.flatten(1))))

    G, D, C = Gen().to(dev), Disc().to(dev), Clf().to(dev)
    for p in C.parameters():
        p.requires_grad_(False)
    og = torch.optim.Adam(G.parameters(), 5e-5)
    od = torch.optim.Adam(D.parameters(), 1e-5)
    bce = nn.BCEWithLogitsLoss()

    x = torch.rand(BATCH, 1, 28, 28, device=dev) * 2 - 1
    y = torch.randint(0, 10, (BATCH,), device=dev)

    def one_step():
        t = torch.randint(0, 10, (BATCH,), device=dev)
        m = (torch.rand(BATCH, 1, 4, 4, device=dev) > 0.5).float()
        m = F.interpolate(m, scale_factor=7, mode="nearest")
        raw, masked = G(x, t, m)
        x_cf = torch.clamp(x + masked, -1, 1)
        od.zero_grad()
        d_loss = bce(D(x, y), torch.ones(BATCH, 1, device=dev)) + bce(
            D(x_cf.detach(), t), torch.zeros(BATCH, 1, device=dev)
        )
        d_loss.backward()
        od.step()
        og.zero_grad()
        g_loss = (
            bce(D(x_cf, t), torch.ones(BATCH, 1, device=dev))
            + F.cross_entropy(C(x_cf), t)
            + 2.5 * masked.abs().mean()
            + 2.0 * (raw * (1 - m)).abs().mean()
        )
        g_loss.backward()
        og.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        one_step()
    if dev == "cuda":
        torch.cuda.synchronize()
    ips = BATCH * steps / (time.perf_counter() - t0)
    log(f"[torch baseline] {dev}: {ips:,.0f} images/sec")
    return ips


def get_baseline() -> float:
    if os.path.exists(_BASELINE_CACHE):
        with open(_BASELINE_CACHE) as f:
            return json.load(f)["torch_images_per_sec"]
    try:
        ips = bench_torch_baseline()
        with open(_BASELINE_CACHE, "w") as f:
            json.dump({"torch_images_per_sec": ips, "note":
                       "reference-equivalent eager step, this host"}, f)
        return ips
    except Exception as e:  # torch missing/broken: report absolute only
        log(f"[torch baseline] unavailable: {e}")
        return float("nan")


def bench_batch_scaling(batches=(64, 128, 256, 512)):
    """Throughput vs batch size (written to bench_scaling.json; the 128
    default is the reference's batch — this substantiates where the chip
    actually saturates)."""
    import jax

    _setup_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from cfgan.core.config import CounterGANConfig, MaskConfig
    from cfgan.data.pipeline import epoch_perm
    from cfgan.models.classifiers import CNNClassifier
    from cfgan.train.builders import build_mnist_countergan
    from cfgan.train.state import NetState, adam_like_torch

    cfg = CounterGANConfig(
        lr_g=5e-5, lr_d=1e-5, lambda_adv=1.0, lambda_cls=1.0,
        lambda_reg_l1=2.5, lambda_mask=2.0, adv_loss="bce",
        reg_reduction="mean_abs", clamp_cf=(-1.0, 1.0),
        resample_target=False, num_res_blocks=6, hidden_dim=64,
        mask=MaskConfig(kind="patch", patch_size=7, num_modifiable_patches=10),
    )
    clf_model = CNNClassifier()
    clf_state = NetState.create(
        clf_model.init(jax.random.key(1), jnp.zeros((2, 28, 28, 1)),
                       train=False),
        adam_like_torch(1e-3),
    )
    bundle = build_mnist_countergan(cfg, clf_model, clf_state, seed=0,
                                    diagnostics=False)
    rng = np.random.RandomState(0)
    rows = []
    for b in batches:
        steps = max(8, 4096 // b)
        n = b * steps
        x = jnp.asarray(rng.uniform(-1, 1, (n, 28, 28, 1)).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 10, n).astype(np.int32))
        perm = epoch_perm(jax.random.key(3), n, b)
        # epoch_fn donates its input state: give each batch size its own copy
        state = jax.tree_util.tree_map(jnp.array, bundle.state)
        key = jax.random.key(2)
        for _ in range(2):  # compile + warm
            state, metrics = bundle.epoch_fn(state, x, y, perm, key)
        fence(metrics["d_loss"])
        reps = 5
        t0 = time.perf_counter()
        for i in range(reps):
            state, metrics = bundle.epoch_fn(state, x, y, perm,
                                             jax.random.fold_in(key, i))
        fence(metrics["d_loss"])
        ips = n * reps / (time.perf_counter() - t0)
        rows.append({"batch": b, "images_per_sec": round(ips, 1),
                     "ms_per_step": round(1000.0 * b / ips, 3)})
        log(f"[scaling] batch {b}: {ips:,.0f} img/s "
            f"({1000.0 * b / ips:.2f} ms/step)")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_scaling.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    log(f"[scaling] written to {out}")
    return rows


def bench_families():
    """Per-family train-step throughput on the device: the five plain
    generation families at their reference-preset widths/batches plus the
    tabular CounteRGAN (rows/sec).  Random inputs of the production shapes
    (measures compute, not the data path).  Writes bench_families.json."""
    import jax

    _setup_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from cfgan.data.pipeline import epoch_perm
    from cfgan.experiments.presets import PRESETS
    from cfgan.train.gan_builders import build_gan

    shapes = {  # family -> (x_shape_tail, num_classes)
        "simple_gan_moons": ((2,), 0),
        "simple_gan_mnist": ((28, 28, 1), 0),
        "cgan_moons": ((2,), 2),
        "wgan_gp_mnist": ((28, 28, 1), 10),
        "dcgan_mnist": ((64, 64, 1), 0),
    }
    rng = np.random.RandomState(0)
    rows = []

    def time_epoch(epoch_fn, state, x, y, batch, n, unit):
        perm = epoch_perm(jax.random.key(3), n, batch)
        steps = perm.shape[0]
        key = jax.random.key(2)
        t0 = time.perf_counter()
        for _ in range(WARMUP):
            state, metrics = epoch_fn(state, x, y, perm, key)
        fence(metrics)
        compile_s = time.perf_counter() - t0
        reps = 5
        t0 = time.perf_counter()
        for i in range(reps):
            state, metrics = epoch_fn(state, x, y, perm,
                                      jax.random.fold_in(key, i))
        fence(metrics)
        dt = (time.perf_counter() - t0) / reps
        return {"batch": batch, "steps": steps,
                "ms_per_step": round(1000.0 * dt / steps, 3),
                f"{unit}_per_sec": round(n / dt, 1),
                "compile_warmup_s": round(compile_s, 1)}

    for preset, (tail, ncls) in shapes.items():
        cfg = PRESETS[preset]
        batch = cfg.data.batch_size
        n = batch * 24
        x = jnp.asarray(rng.uniform(-1, 1, (n, *tail)).astype(np.float32))
        y = jnp.asarray(rng.randint(0, max(1, ncls), n).astype(np.int32))
        bundle = build_gan(cfg.gan, num_classes=ncls, seed=0)
        r = time_epoch(bundle.epoch_fn, bundle.state, x, y, batch, n,
                       "images")
        r["family"] = preset
        rows.append(r)
        log(f"[families] {preset}: {r['ms_per_step']} ms/step, "
            f"{r['images_per_sec']:,.0f} img/s (batch {batch})")

    # tabular CounteRGAN (kc_house reference preset widths)
    from cfgan.core.config import CounterGANConfig
    from cfgan.data.kc_house import KC_SCHEMA
    from cfgan.models.classifiers import TabularClassifier
    from cfgan.train.builders import build_tabular_countergan
    from cfgan.train.state import NetState, adam_like_torch

    cfg_t = CounterGANConfig(
        lr_g=1e-3, lr_d=1e-3, lambda_adv=1.0, lambda_cls=2.0,
        lambda_reg_l1=1.0, lambda_mask=1.0, resample_target=True,
        hidden_dim=32, num_res_blocks=5, gumbel_tau=0.5,
    )
    clf_model = TabularClassifier()
    clf_state = NetState.create(
        clf_model.init(
            {"params": jax.random.key(1), "dropout": jax.random.key(1)},
            jnp.zeros((2, KC_SCHEMA.input_dim)), train=False,
        ),
        adam_like_torch(1e-3),
    )
    bundle = build_tabular_countergan(cfg_t, clf_model, clf_state, KC_SCHEMA,
                                      stats=None, seed=0, diagnostics=False)
    batch = 128
    n = batch * 24
    x = jnp.asarray(rng.uniform(0, 1, (n, KC_SCHEMA.input_dim))
                    .astype(np.float32))
    y = jnp.asarray(rng.randint(0, 4, n).astype(np.int32))
    r = time_epoch(bundle.epoch_fn, bundle.state, x, y, batch, n, "rows")
    r["family"] = "house_countergan"
    rows.append(r)
    log(f"[families] house_countergan: {r['ms_per_step']} ms/step, "
        f"{r['rows_per_sec']:,.0f} rows/s (batch {batch})")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "bench_families.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)
    log(f"[families] written to {out}")
    return rows


# ----------------------------------------------------- outage-tolerant driver
# Round 3 shipped no benchmark because one backend-init failure (the axon
# tunnel was down) killed the process with a raw traceback (VERDICT.md
# missing #1).  The fix: the parent process never touches jax.  It first
# runs a tiny device PROBE in a child with a hard timeout (a hung backend
# init cannot be interrupted in-process — only a child kill works), then
# the real bench in a second child, retrying both with bounded backoff.
# On final failure it emits ONE structured JSON line.

def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ.get(name, default))
    except ValueError:
        return default


def _probe_main() -> None:
    """Child: prove the backend is alive (device list + tiny matmul)."""
    sim = os.environ.get("CFGAN_BENCH_FAIL_PROBE", "")
    if sim == "crash":
        log("[probe] simulated backend-init crash")
        sys.exit(17)
    if sim == "hang":
        log("[probe] simulated backend-init hang")
        time.sleep(3600)
    import jax

    # the axon sitecustomize pins the platform; tests override to CPU via
    # jax.config (the env var alone is ignored on this image)
    plat = os.environ.get("CFGAN_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp

    dev = jax.devices()[0]
    x = jnp.ones((128, 128))
    val = float((x @ x)[0, 0])
    log(f"[probe] backend ok: {dev.platform} ({dev.device_kind}), "
        f"matmul={val}")
    sys.exit(0)


def _run_child(flag: str, timeout_s: float, extra: list[str]) -> tuple[int, str]:
    """Run this script in a child with `flag`; kill on timeout.
    Returns (rc, stdout). stderr is inherited (live progress)."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), flag, *extra]
    try:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE, timeout=timeout_s)
        return proc.returncode, proc.stdout.decode(errors="replace")
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"").decode(errors="replace")
        return -9, out + f"\n[timeout after {timeout_s:.0f}s]"


def _supervise(argv: list[str]) -> None:
    extra = [a for a in argv if a in ("--scaling", "--families")]
    attempts_max = int(_env_float("CFGAN_BENCH_ATTEMPTS", 3))
    probe_timeout = _env_float("CFGAN_BENCH_PROBE_TIMEOUT", 300.0)
    bench_timeout = _env_float("CFGAN_BENCH_TIMEOUT", 3000.0)
    backoff = _env_float("CFGAN_BENCH_BACKOFF", 30.0)
    errors: list[str] = []
    for attempt in range(1, attempts_max + 1):
        if attempt > 1:
            delay = backoff * 2 ** (attempt - 2)
            log(f"[bench] attempt {attempt}/{attempts_max} in {delay:.0f}s")
            time.sleep(delay)
        rc, _ = _run_child("--_probe", probe_timeout, [])
        if rc != 0:
            msg = (f"backend probe {'timed out' if rc == -9 else f'failed rc={rc}'}"
                   f" (attempt {attempt})")
            log(f"[bench] {msg}")
            errors.append(msg)
            continue
        rc, out = _run_child("--_child", bench_timeout, extra)
        if rc == 0:
            # forward the child's stdout (the JSON line / results) verbatim
            sys.stdout.write(out)
            sys.stdout.flush()
            return
        msg = (f"bench child {'timed out' if rc == -9 else f'failed rc={rc}'}"
               f" (attempt {attempt})")
        log(f"[bench] {msg}")
        errors.append(msg)
    print(json.dumps({
        "metric": "mnist_countergan_train_images_per_sec_per_chip",
        "value": None,
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "error": errors[-1] if errors else "unknown",
        "attempts": attempts_max,
        "errors": errors,
    }), flush=True)
    sys.exit(1)


def _child_main() -> None:
    if os.environ.get("CFGAN_BENCH_FAIL_BENCH", "") == "crash":
        log("[bench child] simulated failure")
        sys.exit(18)
    if os.environ.get("CFGAN_BENCH_FAKE", "") == "1":
        # test hook: exercise the supervisor's forwarding path without
        # paying for a real benchmark run
        print(json.dumps({"metric": "fake", "value": 1.0, "unit": "x",
                          "vs_baseline": 1.0}), flush=True)
        return
    if "--scaling" in sys.argv:
        bench_batch_scaling()
        return
    if "--families" in sys.argv:
        bench_families()
        return
    train_ips, cf_ps = bench_cfgan()
    base = get_baseline()
    vs = train_ips / base if base == base else 0.0
    print(json.dumps({
        "metric": "mnist_countergan_train_images_per_sec_per_chip",
        "value": round(train_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs, 2),
        # bf16 compute (f32 params/optimizer/losses) + per-step generator
        # EMA is the framework default recipe; f32 is kept for the torch
        # parity harness
        "dtype": "bfloat16",
        "recipe": "default (lambda_cls 2, EMA 0.999)",
        # in-band honesty: the reference publishes no throughput numbers and
        # no CUDA GPU exists in this environment, so the baseline is the
        # reference-equivalent EAGER PYTORCH STEP ON THIS HOST'S CPU
        "baseline": "torch-eager CPU on this host (reference GPU "
                    "unavailable; reference publishes no throughput)",
    }), flush=True)


def main():
    if "--_probe" in sys.argv:
        _probe_main()
        return
    if "--_child" in sys.argv:
        _child_main()
        return
    _supervise(sys.argv[1:])


if __name__ == "__main__":
    main()
