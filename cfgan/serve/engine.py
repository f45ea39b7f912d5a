"""Promptable counterfactual serving engine.

The serving hot path of the reference is a per-query generator+classifier
forward (`mnist/eval_utils.py:498-530` via `mnist/gr.py:68-85`,
`house gradio_app.py:162-163`).  Here it is ONE jitted fused program:
mask construction happens outside (masks are dense operands, never shapes,
so arbitrary per-request masks reuse the same executable), then
G forward -> clamp -> classifier in a single XLA call returning the
counterfactual, residual, prediction and class probabilities.

Engines are constructed either from live training state or from orbax-style
checkpoints written by the experiment mains.

Thread ownership: a constructed engine is safe to SHARE across request
threads (`serve/api.py` uses ThreadingHTTPServer) — `generate`/`classify`
are pure functions of their arguments plus the immutable `g_vars`, JAX
dispatch and the jit caches are thread-safe, and bucket padding is
value-invariant per row, so concurrent first-touch of the same bucket at
worst compiles once per bucket (pinned by
`tests/test_serve_api.py::test_concurrent_hammer_mixed_endpoints`).
Configuration is construct-then-serve and ENFORCED: once the first
request has been served, `shard()` and `pad_to_bucket` assignment raise
`RuntimeError`, so the unsafe reconfigure-while-serving window cannot
exist (`launch --shard` already shards before the server starts; pinned
by `tests/test_serve.py::test_engine_config_frozen_after_first_request`).
The gradio *backends*
(`serve/apps.py`) are by contrast single-session objects: they carry
conversation state and a `np.random.RandomState` and must not be shared
across concurrent sessions.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cfgan.core.config import TabularSchema
from cfgan.data.transforms import NormStats
from cfgan.masks.feature import feature_names_to_mask
from cfgan.masks.patch import patch_indices_to_mask


@dataclass
class CFResult:
    x_cf: np.ndarray
    residual: np.ndarray
    pred: np.ndarray  # (B,) argmax class of the counterfactual
    confidence: np.ndarray  # (B,) max prob
    probs: np.ndarray  # (B, C)
    probs_orig: np.ndarray  # (B, C)
    flipped: np.ndarray  # (B,) bool, pred == target


class CounterfactualEngine:
    """Fused (x, target, mask) -> counterfactual endpoint."""

    def __init__(
        self,
        cf_fn: Callable,  # (g_vars, x, target, mask, key) -> (x_cf, raw, masked)
        clf_fn: Callable,  # (x,) -> logits
        g_vars: Any,
        num_classes: int,
        patch_size: int | None = None,
        schema: TabularSchema | None = None,
        stats: NormStats | None = None,
    ):
        self.g_vars = g_vars
        self.num_classes = num_classes
        self.patch_size = patch_size
        self.schema = schema
        self.stats = stats
        self.cf_fn = cf_fn  # raw fused fns, reused by eval visual helpers
        self.clf_fn = clf_fn

        @jax.jit
        def _serve(g_vars, x, target, mask, key):
            x_cf, raw, masked = cf_fn(g_vars, x, target, mask, key)
            logits = clf_fn(x_cf)
            probs = jax.nn.softmax(logits, axis=1)
            probs_orig = jax.nn.softmax(clf_fn(x), axis=1)
            return x_cf, masked, probs, probs_orig

        self._serve = _serve
        self._classify = jax.jit(lambda x: jax.nn.softmax(clf_fn(x), axis=1))

        @jax.jit
        def _serve_bulk(g_vars, xs, ts, ms, key):
            # xs/ts/ms are (n_chunks, chunk, ...); ONE dispatch scans the
            # fused serving program over the chunks on-device — no host
            # round-trip between chunks (measured ~149k cf/s vs the 126k
            # dispatch-per-call knee, BASELINE.md "Serving latency")
            def body(i, inp):
                x, t, m = inp
                return i + 1, _serve(g_vars, x, t, m,
                                     jax.random.fold_in(key, i))

            _, outs = jax.lax.scan(body, 0, (xs, ts, ms))
            return outs

        self._serve_bulk = _serve_bulk
        self._mesh = None
        self._shard_n = 1
        self._batch_sharding = None
        # set at first served request; threading.Event for cross-thread
        # visibility under ThreadingHTTPServer (construct-then-serve guard)
        import threading

        self._served = threading.Event()

    def _mark_served(self):
        if not self._served.is_set():
            self._served.set()

    def _check_configurable(self, what: str):
        if self._served.is_set():
            raise RuntimeError(
                f"cannot change {what}: the engine has already served "
                "requests.  Configuration is construct-then-serve — shard "
                "and set pad_to_bucket before the first generate/classify "
                "call (see the thread-ownership contract in the module "
                "docstring)."
            )

    # --------------------------------------------------------- parallelism
    def shard(self, mesh, axis: str | None = None):
        """Enable data-parallel serving over a `jax.sharding.Mesh`
        (capability uplift over the single-device reference, SURVEY.md
        section 2.9): request batches are laid out along `axis` (first
        mesh axis by default), generator/classifier variables are
        replicated, and the SAME jitted serving programs then run SPMD —
        XLA partitions the fused forward across devices with no code
        changes (collectives ride ICI; per-row independence means there
        are none on the hot path).  Batch padding is raised to a multiple
        of the axis size so shards stay equal.  Returns self."""
        from jax.sharding import NamedSharding, PartitionSpec

        self._check_configurable("sharding")
        axis = axis or mesh.axis_names[0]
        self._mesh = mesh
        self._shard_n = mesh.shape[axis]
        self._batch_sharding = NamedSharding(mesh, PartitionSpec(axis))
        self.g_vars = jax.device_put(
            self.g_vars, NamedSharding(mesh, PartitionSpec()))
        return self

    def _place(self, x, t, mask):
        """Lay sharded-serving inputs out along the mesh batch axis."""
        if self._mesh is None:
            return x, t, mask
        from jax.sharding import NamedSharding, PartitionSpec

        def put(a):
            spec = PartitionSpec(*([self._batch_sharding.spec[0]]
                                   + [None] * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(self._mesh, spec))

        return put(x), put(t), put(mask)

    # ------------------------------------------------------------- inference
    def classify(self, x) -> np.ndarray:
        self._mark_served()
        x = jnp.asarray(x)
        if x.ndim == self._sample_ndim(x):
            x = x[None]
        return np.asarray(self._classify(x))

    #: pad request batches up to the next power of two (cap 512) so the
    #: jitted serving program compiles O(log max_batch) variants instead of
    #: one per distinct request size — a fresh compile costs seconds to
    #: minutes, so unbucketed shapes would make first-request latency
    #: unpredictable.  Padded rows replicate the last sample and are
    #: sliced off the results; wasted compute is bounded below 2x.
    #: Padding cannot change results: the deterministic families ignore
    #: `key`, and the tabular cf_fn derives its Gumbel noise PER ROW
    #: (`derive_gumbel_noise`, cfgan/models/tabular.py), so row i's draw
    #: depends only on (key, head, i), never on the padded batch size —
    #: pinned by tests/test_serve.py::test_bucket_padding_value_invariant.
    #: Settable only before the first request (construct-then-serve).
    _pad_to_bucket: bool = True
    _MAX_BUCKET = 512

    @property
    def pad_to_bucket(self) -> bool:
        return self._pad_to_bucket

    @pad_to_bucket.setter
    def pad_to_bucket(self, value: bool) -> None:
        self._check_configurable("pad_to_bucket")
        self._pad_to_bucket = bool(value)

    @classmethod
    def _bucket(cls, b: int) -> int:
        n = 1
        while n < b:
            n <<= 1
        if n <= cls._MAX_BUCKET:
            return n
        # beyond the cap: round up to a multiple of the cap so huge varying
        # batches still compile a bounded set of variants (waste < 2x)
        return -(-b // cls._MAX_BUCKET) * cls._MAX_BUCKET

    def generate(self, x, target, mask=None, key=None) -> CFResult:
        """Batched counterfactual generation.  `target` may be an int
        (broadcast) or a per-sample array; `mask` defaults to all-ones with
        schema immutables zeroed for tabular engines."""
        self._mark_served()
        x = jnp.asarray(x)
        squeeze = x.ndim == self._sample_ndim(x)
        if squeeze:
            x = x[None]
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(target, jnp.int32), (b,))
        if mask is None:
            mask = self.default_mask(b, x.shape)
        mask = jnp.asarray(mask, x.dtype)
        if mask.ndim == x.ndim - 1:
            mask = mask[None]
        # materialize broadcasts (e.g. a (1, D) mask against a (B, D) x)
        # BEFORE bucket padding — padding a size-1 batch dim would otherwise
        # produce a mask batch that matches neither b nor the bucket
        mask = jnp.broadcast_to(mask, x.shape)
        key = key if key is not None else jax.random.key(0)
        nb = self._bucket(b) if self.pad_to_bucket else b
        if self._shard_n > 1:  # equal shards on the mesh batch axis
            nb = -(-nb // self._shard_n) * self._shard_n
        if nb != b:
            pad = nb - b
            x_in = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], 0)
            t_in = jnp.concatenate([t, jnp.repeat(t[-1:], pad, axis=0)], 0)
            m_in = jnp.concatenate(
                [mask, jnp.repeat(mask[-1:], pad, axis=0)], 0)
        else:
            x_in, t_in, m_in = x, t, mask
        x_in, t_in, m_in = self._place(x_in, t_in, m_in)
        x_cf, residual, probs, probs_orig = self._serve(
            self.g_vars, x_in, t_in, m_in, key
        )
        if nb != b:
            x_cf, residual = x_cf[:b], residual[:b]
            probs, probs_orig = probs[:b], probs_orig[:b]
        pred = np.asarray(jnp.argmax(probs, axis=1))
        out = CFResult(
            x_cf=np.asarray(x_cf),
            residual=np.asarray(residual),
            pred=pred,
            confidence=np.asarray(jnp.max(probs, axis=1)),
            probs=np.asarray(probs),
            probs_orig=np.asarray(probs_orig),
            flipped=pred == np.asarray(t),
        )
        return out

    def generate_bulk(self, x, target, mask=None, key=None,
                      chunk: int = 128) -> CFResult:
        """Offline/bulk counterfactual generation: the batch is split into
        fixed-size chunks and ONE compiled program `lax.scan`s the fused
        serving step over them on-device — no host dispatch between chunks,
        which measures ~18% faster than the dispatch-per-call path at its
        best batch (BASELINE.md "Serving latency").  Use for large queued
        workloads (dataset-scale CF sweeps, batch exports); `generate` is
        the low-latency interactive path.

        The chunk count is padded to a power of two (rows replicate the
        last sample and are sliced off), so compile count stays
        O(log(max_batch/chunk)).  For the tabular family the per-chunk key
        is `fold_in(key, chunk_index)`, so a sample's Gumbel draw depends
        on its chunk — same distribution as `generate`, but not
        row-for-row identical to it."""
        self._mark_served()
        x = jnp.asarray(x)
        if x.ndim == self._sample_ndim(x):
            x = x[None]
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(target, jnp.int32), (b,))
        if mask is None:
            mask = self.default_mask(b, x.shape)
        mask = jnp.asarray(mask, x.dtype)
        if mask.ndim == x.ndim - 1:
            mask = mask[None]
        mask = jnp.broadcast_to(mask, x.shape)
        key = key if key is not None else jax.random.key(0)

        n_chunks = -(-b // chunk)
        nc = 1
        while nc < n_chunks:
            nc <<= 1
        padded = nc * chunk
        if padded != b:
            pad = padded - b
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], 0)
            t = jnp.concatenate([t, jnp.repeat(t[-1:], pad, axis=0)], 0)
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[-1:], pad, axis=0)], 0)
        shape = (nc, chunk) + x.shape[1:]
        xs, ts, ms = (x.reshape(shape), t.reshape(nc, chunk),
                      mask.reshape(shape))
        if self._shard_n > 1:
            # scan iterates chunks sequentially; each CHUNK is sharded over
            # the mesh batch axis (dim 1).  chunk must split evenly.
            if chunk % self._shard_n:
                raise ValueError(
                    f"bulk chunk size {chunk} must be a multiple of the "
                    f"mesh batch-axis size {self._shard_n}"
                )
            from jax.sharding import NamedSharding, PartitionSpec

            ax = self._batch_sharding.spec[0]

            def put(a):
                spec = PartitionSpec(*([None, ax] + [None] * (a.ndim - 2)))
                return jax.device_put(a, NamedSharding(self._mesh, spec))

            xs, ts, ms = put(xs), put(ts), put(ms)
        x_cf, residual, probs, probs_orig = self._serve_bulk(
            self.g_vars, xs, ts, ms, key,
        )
        x_cf = x_cf.reshape((padded,) + x_cf.shape[2:])[:b]
        residual = residual.reshape((padded,) + residual.shape[2:])[:b]
        probs = probs.reshape(padded, -1)[:b]
        probs_orig = probs_orig.reshape(padded, -1)[:b]
        pred = np.asarray(jnp.argmax(probs, axis=1))
        return CFResult(
            x_cf=np.asarray(x_cf),
            residual=np.asarray(residual),
            pred=pred,
            confidence=np.asarray(jnp.max(probs, axis=1)),
            probs=np.asarray(probs),
            probs_orig=np.asarray(probs_orig),
            flipped=pred == np.asarray(t[:b]),
        )

    # ------------------------------------------------------------- masks
    def default_mask(self, batch: int, x_shape) -> jnp.ndarray:
        if self.schema is not None and len(x_shape) == 2:
            from cfgan.masks.feature import immutable_complement_mask

            return immutable_complement_mask(batch, x_shape[1],
                                             self.schema.immutable_idx)
        return jnp.ones((batch,) + tuple(x_shape[1:]), jnp.float32)

    def mask_from_patches(self, patch_indices: Sequence[int], batch: int,
                          image_hw: tuple[int, int], channels: int = 1):
        if self.patch_size is None:
            raise ValueError("engine has no patch_size (not an image engine)")
        return patch_indices_to_mask(patch_indices, batch, image_hw,
                                     self.patch_size, channels)

    def mask_from_feature_names(self, allowed: Sequence[str], batch: int):
        if self.schema is None:
            raise ValueError("engine has no schema (not a tabular engine)")
        return feature_names_to_mask(allowed, batch, self.schema)

    @staticmethod
    def _sample_ndim(x) -> int:
        return 3 if x.ndim in (3, 4) else 1

    # ------------------------------------------------------------- loading
    @classmethod
    def from_bundle(cls, bundle, clf_model, clf_state, state=None,
                    g_variables=None, **kw):
        """Engine from a live training bundle.  For EMA-carrying states
        (CounterGANConfig.ema_decay > 0) the caller must pass
        `g_variables` from `cfgan.train.builders.g_serving_variables` —
        serving live params would ignore the EMA, and serving EMA params
        against live BN stats mis-normalizes (make_bn_recalibrator)."""
        state = state if state is not None else bundle.state
        if g_variables is None:
            if getattr(state, "g_ema", None) is not None:
                raise ValueError(
                    "state carries generator EMA params; pass g_variables="
                    "g_serving_variables(bundle, state, x_train, key) so the"
                    " BN stats are recalibrated under them"
                )
            g_variables = state.g.variables()
        clf_vars = clf_state.variables()
        return cls(
            bundle.cf_fn,
            lambda x: clf_model.apply(clf_vars, x, train=False),
            g_variables,
            bundle.num_classes,
            **kw,
        )
