"""Wire models + losses + masks into compiled CounteRGAN pipelines.

One builder per flagship family (moons 2-D, MNIST images, KC-house tabular),
each returning a `CounterGANBundle`: initialized GAN state, the jitted
per-step function, the scanned epoch runner, and a fused inference-time
counterfactual function (the serving hot path).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from cfgan.core.config import CounterGANConfig, TabularSchema
from cfgan.masks.feature import immutable_complement_mask, random_feature_mask
from cfgan.masks.patch import random_patch_mask
from cfgan.models.classifiers import CNNClassifier, MLPClassifier, TabularClassifier
from cfgan.models.discriminators import (
    CondConvDiscriminator,
    SpectralMLPDiscriminator,
)
from cfgan.models.generators import (
    ImageResidualGenerator,
    MoonsResidualGenerator,
    TabularResidualGenerator,
)
from cfgan.models.tabular import (
    assemble_residual,
    build_cat_norm_values,
    derive_gumbel_noise,
)
from cfgan.train.countergan import make_countergan_step, make_epoch_runner
from cfgan.train.state import GANState, NetState, adam_like_torch


@dataclass
class CounterGANBundle:
    g_model: Any
    d_model: Any
    state: GANState
    step_fn: Callable
    epoch_fn: Callable
    cf_fn: Callable  # (g_variables, x, target, mask, key) -> (x_cf, raw, masked)
    tx_g: Any
    tx_d: Any
    num_classes: int
    # (params, stats, x, key, *, steps, batch_size) -> recalibrated stats;
    # required before serving/evaling EMA params (see make_bn_recalibrator)
    recal_fn: Callable | None = None


def _cast_floats(tree, dtype):
    """Cast floating leaves of a pytree (params/stats/activations)."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def make_mixed_precision(apply_fn, compute_dtype: str):
    """Wrap an apply-style fn (params, stats, *arrays, **kw) so the forward
    (and, through jax.vjp's transpose of the casts, the backward) runs in
    `compute_dtype` while parameters, optimizer state and loss math stay
    float32.  Identity when compute_dtype == 'float32'.

    BatchNorm running mean/var stay f32 through the wrapper, standard-AMP
    style: train-mode normalization uses the *batch* statistics (still
    computed in `compute_dtype`), so the hot path is unaffected, while the
    running EMAs accumulate in f32 instead of being re-quantized through
    bf16 every step — which would silently degrade eval-mode fidelity over
    long runs.  Spectral-norm u DOES get cast: it re-normalizes itself
    every iteration (quantization cannot accumulate), and an f32 u would
    promote the whole spectral matmul chain out of bf16."""
    if compute_dtype == "float32":
        return apply_fn
    cd = jnp.dtype(compute_dtype)

    def wrapped(params, stats, *arrays, **kw):
        params = _cast_floats(params, cd)
        stats = {k: (v if k == "batch_stats" else _cast_floats(v, cd))
                 for k, v in stats.items()}
        arrays = tuple(_cast_floats(a, cd) for a in arrays)
        out, new_stats = apply_fn(params, stats, *arrays, **kw)
        return _cast_floats(out, jnp.float32), _cast_floats(
            new_stats, jnp.float32
        )

    return wrapped


def make_bn_recalibrator(g_forward, mask_sampler, num_classes: int,
                         full_mask_fn=None):
    """BatchNorm-statistics recalibration for weight-averaged generators.

    The per-step generator EMA (`CounterGANConfig.ema_decay`) averages
    *parameters only*; BatchNorm running mean/var keep tracking the LIVE
    parameters' activations.  Evaluating EMA params against live-params
    running stats mis-normalizes every BN layer — the standard
    stochastic-weight-averaging pitfall — and on unlucky seeds collapses
    eval-mode counterfactual quality (seed 46: per-target flip floor 0.20
    with live stats vs 0.98 recalibrated; RESULTS.md).

    Returns `recal_fn(params, stats, x, key, *, steps=200, batch_size=128,
    mask_mode="train")`: one compiled `lax.scan` of train-mode forward
    passes under `params`, sampling batches/targets from the training
    distributions and masks per `mask_mode` — `"train"` draws from the
    training `mask_sampler`, `"ones"` uses the family's serving-default
    "fully modifiable" mask: all-ones, or `full_mask_fn(x)` when given
    (ADVICE r3: the tabular serving default zeroes immutable features, so
    literal all-ones would recalibrate under a distribution serving never
    sees).  Which distribution yields the better serving stats is
    seed-dependent, so `select_g_serving_variables` scores both.
    Running stats chain through the scan; with torch-momentum 0.1 their
    memory of the starting point decays by 0.9^steps (~7e-10 at 200), so
    initialization is irrelevant.  Cost: `steps` generator forwards — a
    fraction of one training epoch.
    """

    @partial(jax.jit, static_argnames=("steps", "batch_size", "mask_mode"))
    def recal_fn(params, stats, x, key, *, steps: int = 200,
                 batch_size: int = 128, mask_mode: str = "train"):
        n = x.shape[0]

        def body(carry, k):
            ki, kt, km, kg = jax.random.split(k, 4)
            idx = jax.random.randint(ki, (batch_size,), 0, n)
            xb = x[idx]
            t = jax.random.randint(kt, (batch_size,), 0, num_classes)
            t_oh = jax.nn.one_hot(t, num_classes, dtype=xb.dtype)
            mask = (mask_sampler(km, xb) if mask_mode == "train"
                    else (full_mask_fn(xb) if full_mask_fn is not None
                          else jnp.ones_like(xb)))
            _, new = g_forward(params, carry, xb, t, t_oh, mask, kg)
            return {**carry, **new}, jnp.zeros(())

        out, _ = jax.lax.scan(body, dict(stats), jax.random.split(key, steps))
        return out

    return recal_fn


def g_serving_variables(bundle: "CounterGANBundle", state: GANState, x, key,
                        *, steps: int = 200, batch_size: int = 128) -> dict:
    """Generator variables for eval/serving/checkpointing.

    EMA-less states: live params + live stats (same as
    `cfgan.train.state.g_eval_variables`).  EMA-carrying states: EMA params
    + BN stats RECALIBRATED under those params via `bundle.recal_fn` —
    never pair EMA params with live-params running stats (see
    `make_bn_recalibrator`).  `x` is the training inputs to draw
    recalibration batches from."""
    if state.g_ema is None:
        return {"params": state.g.params, **state.g.stats}
    if bundle.recal_fn is None or not state.g.stats:
        return {"params": state.g_ema, **state.g.stats}
    stats = bundle.recal_fn(state.g_ema, dict(state.g.stats), jnp.asarray(x),
                            key, steps=steps, batch_size=batch_size)
    return {"params": state.g_ema, **stats}


def select_g_serving_variables(bundle: "CounterGANBundle", state: GANState,
                               x_recal, key, xva, yva, clf_fn,
                               *, batch_size: int = 1024,
                               serving_mask_fn=None):
    """Validation-scored serving-candidate selection for EMA recipes.

    Which end-of-training generator serves best is seed-dependent: the live
    params, the EMA params with BN stats recalibrated under the training
    mask distribution, or the EMA params recalibrated under all-ones masks
    (measured spread on the MNIST default recipe: each of the three wins on
    at least one seed, and the validation ranking matched the test ranking
    on every seed studied — RESULTS.md).  Scores each candidate's
    per-target flip sweep (all-ones mask, the headline protocol) on the
    VALIDATION split and returns `(g_variables, info)` for the best by
    worst-target flip (mean flip tie-break); `info` records the chosen
    candidate and all scores for the run's metadata.

    Falls back to live params + live stats (no scoring) when the state
    carries no EMA."""
    if state.g_ema is None:
        return ({"params": state.g.params, **state.g.stats},
                {"candidate": "live", "scores": {}})
    import numpy as np

    from cfgan.eval.metrics import make_per_target_sweep, per_target_metrics

    k_recal, k_eval = jax.random.split(key)
    x_recal = jnp.asarray(x_recal)
    candidates = {"live": {"params": state.g.params, **state.g.stats}}
    for mode in ("train", "ones"):
        stats = bundle.recal_fn(state.g_ema, dict(state.g.stats), x_recal,
                                k_recal, mask_mode=mode)
        candidates[f"ema_recal_{mode}"] = {"params": state.g_ema, **stats}

    sweep = make_per_target_sweep(
        bundle.cf_fn, clf_fn, bundle.num_classes,
        exclude_same_class=False,
        pred_gain_mode="cf_target_minus_cf_true",
        actionability_mode="x_cf_minus_x",
    )
    feat_shape = tuple(np.asarray(xva).shape[1:])
    # score under the family's SERVING-default mask: all-ones for images;
    # tabular/moons callers pass serving_mask_fn (immutable features
    # zeroed) so selection ranks under the protocol serving actually uses
    mask_fn = serving_mask_fn or (
        lambda b: jnp.ones((b, *feat_shape), jnp.float32))
    scores = {}
    for name, gv in candidates.items():
        df = per_target_metrics(
            sweep, gv, xva, yva,
            mask_fn=mask_fn,
            key=k_eval, num_classes=bundle.num_classes,
            batch_size=batch_size,
        )
        flips = df["class_flip_rate"].to_numpy()
        scores[name] = {"worst_flip": round(float(np.nanmin(flips)), 6),
                        "mean_flip": round(float(np.nanmean(flips)), 6)}
    best = max(scores, key=lambda n: (scores[n]["worst_flip"],
                                      scores[n]["mean_flip"]))
    return candidates[best], {"candidate": best, "scores": scores}


def _clf_forward_fn(clf_model, clf_vars, compute_dtype: str):
    """Frozen-classifier forward at the configured compute dtype
    (float32 logits either way)."""
    if compute_dtype == "float32":
        def clf_forward(x):
            return clf_model.apply(clf_vars, x, train=False)
        return clf_forward
    cd = jnp.dtype(compute_dtype)
    clf_vars_cast = _cast_floats(clf_vars, cd)

    def clf_forward(x):
        logits = clf_model.apply(clf_vars_cast, x.astype(cd), train=False)
        return logits.astype(jnp.float32)

    return clf_forward


def _with_ones_fraction(mask_sampler, frac: float, full_mask_fn=None):
    """Replace each training sample's mask with the 'fully modifiable' mask
    (all-ones, or the family's serving-default via `full_mask_fn`) with
    probability `frac` (`MaskConfig.ones_fraction`).  Identity at 0.0 —
    the reference-exact distribution."""
    if not frac:
        return mask_sampler
    full = full_mask_fn or (lambda x: jnp.ones_like(x))

    def sampler(key, x):
        k1, k2 = jax.random.split(key)
        m = mask_sampler(k1, x)
        pick = jax.random.bernoulli(k2, frac, (x.shape[0],))
        return jnp.where(pick.reshape((-1,) + (1,) * (m.ndim - 1)),
                         full(x).astype(m.dtype), m)

    return sampler


def _init_state(g_model, d_model, g_inputs, d_inputs, cfg, key):
    kg, kd = jax.random.split(key)
    g_vars = g_model.init({"params": kg, "gumbel": kg}, *g_inputs, train=False)
    d_vars = d_model.init({"params": kd}, *d_inputs)
    tx_g = adam_like_torch(cfg.lr_g)
    tx_d = adam_like_torch(cfg.lr_d)
    g_net = NetState.create(g_vars, tx_g)
    state = GANState(
        g=g_net,
        d=NetState.create(d_vars, tx_d),
        step=jnp.zeros((), jnp.int32),
        # EMA starts AT the init params (no debias term needed)
        g_ema=(jax.tree_util.tree_map(jnp.array, g_net.params)
               if getattr(cfg, "ema_decay", 0.0) else None),
    )
    return state, tx_g, tx_d


# ------------------------------------------------------------------- moons
def build_moons_countergan(
    cfg: CounterGANConfig,
    clf_model,
    clf_state,
    num_classes: int = 3,
    input_dim: int = 2,
    seed: int = 42,
    diagnostics: bool = True,
):
    g_model = MoonsResidualGenerator(input_dim=input_dim, hidden_dim=cfg.hidden_dim)
    d_model = SpectralMLPDiscriminator(
        hidden_dims=(cfg.hidden_dim, cfg.hidden_dim // 2, cfg.hidden_dim // 2)
    )
    x0 = jnp.zeros((2, input_dim))
    oh0 = jnp.zeros((2, num_classes))
    state, tx_g, tx_d = _init_state(
        g_model, d_model, (x0, oh0, x0), (x0, oh0), cfg, jax.random.key(seed)
    )

    clf_vars = {"params": clf_state.params, **clf_state.stats}

    def g_forward(params, stats, x, t, t_oh, mask, key):
        (raw, masked), new_stats = g_model.apply(
            {"params": params, **stats}, x, t_oh, mask, train=True,
            mutable=["batch_stats"],
        )
        return (raw, masked), new_stats

    def d_forward(params, stats, x, t, t_oh, train):
        if train:
            scores, new_stats = d_model.apply(
                {"params": params, **stats}, x, t_oh, update_stats=True,
                mutable=["spectral_stats"],
            )
            return scores, new_stats
        scores = d_model.apply({"params": params, **stats}, x, t_oh,
                               update_stats=False)
        return scores, stats

    g_forward = make_mixed_precision(g_forward, cfg.compute_dtype)
    d_forward = make_mixed_precision(d_forward, cfg.compute_dtype)
    clf_forward = _clf_forward_fn(clf_model, clf_vars, cfg.compute_dtype)

    moons_full_mask = lambda x: immutable_complement_mask(
        x.shape[0], x.shape[1], cfg.mask.immutable_idx)
    mask_sampler = _with_ones_fraction(
        lambda key, x: random_feature_mask(
            key, x.shape[0], x.shape[1], cfg.mask.immutable_idx
        ),
        cfg.mask.ones_fraction,
        moons_full_mask,
    )

    step_fn = make_countergan_step(
        cfg=cfg, num_classes=num_classes, g_forward=g_forward,
        d_forward=d_forward, clf_forward=clf_forward, tx_g=tx_g, tx_d=tx_d,
        mask_sampler=mask_sampler, diagnostics=diagnostics,
    )

    cf_cd = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def cf_fn(g_variables, x, target, mask, key=None):
        """Serving/eval CF forward at the configured compute dtype (the
        x + masked epilogue stays float32 either way)."""
        gv, xc, mc = g_variables, x, mask
        if cf_cd != jnp.float32:
            gv = _cast_floats(gv, cf_cd)
            xc, mc = x.astype(cf_cd), mask.astype(cf_cd)
        t_oh = jax.nn.one_hot(target, num_classes, dtype=xc.dtype)
        raw, masked = g_model.apply(gv, xc, t_oh, mc, train=False)
        raw = raw.astype(jnp.float32)
        masked = masked.astype(jnp.float32)
        return x + masked, raw, masked

    return CounterGANBundle(
        g_model, d_model, state, step_fn, make_epoch_runner(step_fn), cf_fn,
        tx_g, tx_d, num_classes,
        recal_fn=make_bn_recalibrator(g_forward, mask_sampler, num_classes,
                                      full_mask_fn=moons_full_mask),
    )


# ------------------------------------------------------------------- mnist
def build_mnist_countergan(
    cfg: CounterGANConfig,
    clf_model,
    clf_state,
    num_classes: int = 10,
    image_hw: tuple[int, int] = (28, 28),
    seed: int = 42,
    diagnostics: bool = True,
    legacy_delta: bool = False,
):
    """`legacy_delta=True` selects the superseded delta-generator family
    (mask-free tanh delta G + unconditional conv D, `mnist/gan_train.py` /
    `countergan2.py`), typically with `cfg.fixed_target` set and
    `cfg.adv_loss='clipped_log'`."""
    if legacy_delta:
        from cfgan.models.discriminators import ConvDiscriminator
        from cfgan.models.generators import DeltaImageGenerator

        g_model = DeltaImageGenerator(num_classes=num_classes,
                                      base_ch=cfg.hidden_dim)
        d_model = ConvDiscriminator(d_hidden=cfg.hidden_dim)
    else:
        g_model = ImageResidualGenerator(
            image_hw=image_hw,
            num_classes=num_classes,
            base_ch=cfg.hidden_dim,
            n_resblocks=cfg.num_res_blocks,
            residual_scaling=cfg.residual_scaling,
            conv_impl=cfg.conv_impl,
        )
        d_model = CondConvDiscriminator(num_classes=num_classes,
                                        d_hidden=cfg.hidden_dim)
    h, w = image_hw
    x0 = jnp.zeros((2, h, w, 1))
    t0 = jnp.zeros((2,), jnp.int32)
    state, tx_g, tx_d = _init_state(
        g_model, d_model, (x0, t0, x0), (x0, t0), cfg, jax.random.key(seed)
    )
    clf_vars = {"params": clf_state.params, **clf_state.stats}

    def g_forward(params, stats, x, t, t_oh, mask, key):
        (raw, masked), new_stats = g_model.apply(
            {"params": params, **stats}, x, t, mask, train=True,
            mutable=["batch_stats"],
        )
        return (raw, masked), new_stats

    def d_forward(params, stats, x, t, t_oh, train):
        return d_model.apply({"params": params, **stats}, x, t), stats

    g_forward = make_mixed_precision(g_forward, cfg.compute_dtype)
    d_forward = make_mixed_precision(d_forward, cfg.compute_dtype)
    clf_forward = _clf_forward_fn(clf_model, clf_vars, cfg.compute_dtype)

    if legacy_delta:
        mask_sampler = lambda key, x: jnp.ones_like(x)  # no masks in legacy
    else:
        mask_sampler = _with_ones_fraction(
            lambda key, x: random_patch_mask(
                key,
                x.shape[0],
                image_hw,
                cfg.mask.patch_size,
                cfg.mask.num_modifiable_patches,
                channels=x.shape[-1],
            ),
            cfg.mask.ones_fraction,
        )

    step_fn = make_countergan_step(
        cfg=cfg, num_classes=num_classes, g_forward=g_forward,
        d_forward=d_forward, clf_forward=clf_forward, tx_g=tx_g, tx_d=tx_d,
        mask_sampler=mask_sampler, diagnostics=diagnostics,
    )

    cf_cd = jnp.dtype(cfg.compute_dtype)

    @jax.jit
    def cf_fn(g_variables, x, target, mask, key=None):
        """Serving/eval CF forward at the configured compute dtype — the
        generator (≈95% of the serving FLOPs) runs on the MXU in bf16 when
        `compute_dtype="bfloat16"`; the clamp epilogue stays float32."""
        gv, xc, mc = g_variables, x, mask
        if cf_cd != jnp.float32:
            gv = _cast_floats(gv, cf_cd)
            xc, mc = x.astype(cf_cd), mask.astype(cf_cd)
        raw, masked = g_model.apply(gv, xc, target, mc, train=False)
        raw = raw.astype(jnp.float32)
        masked = masked.astype(jnp.float32)
        x_cf = jnp.clip(x + masked, -1.0, 1.0)
        return x_cf, raw, masked

    return CounterGANBundle(
        g_model, d_model, state, step_fn, make_epoch_runner(step_fn), cf_fn,
        tx_g, tx_d, num_classes,
        recal_fn=make_bn_recalibrator(g_forward, mask_sampler, num_classes),
    )


# ------------------------------------------------------------------ tabular
def build_tabular_countergan(
    cfg: CounterGANConfig,
    clf_model,
    clf_state,
    schema: TabularSchema,
    stats,  # NormStats
    num_classes: int = 4,
    seed: int = 42,
    diagnostics: bool = True,
    explicit_gumbel: bool = False,
):
    """`explicit_gumbel=True` derives each categorical head's Gumbel noise
    as `gumbel(fold_in(step_key, feature_idx))` instead of through flax's
    'gumbel' rng collection — i.i.d.-identical sampling, but with a
    derivation the torch parity oracle can reproduce from the same key
    (used by `tools/parity_report.py` / `tests/test_epoch_parity.py`)."""
    cat_norm_values = build_cat_norm_values(schema.categorical_info, stats)
    g_model = TabularResidualGenerator(
        input_dim=schema.input_dim,
        hidden_dim=cfg.hidden_dim,
        num_classes=num_classes,
        continuous_idx=schema.continuous_idx,
        categorical_info=schema.categorical_info,
        n_blocks=cfg.num_res_blocks,
        residual_scaling=cfg.residual_scaling,
        tau=cfg.gumbel_tau,
        cat_head_f32=cfg.cat_head_f32,
    )
    d_model = SpectralMLPDiscriminator(
        hidden_dims=(cfg.hidden_dim, cfg.hidden_dim * 2, cfg.hidden_dim * 4)
    )
    x0 = jnp.zeros((2, schema.input_dim))
    oh0 = jnp.zeros((2, num_classes))
    state, tx_g, tx_d = _init_state(
        g_model, d_model, (x0, oh0, x0), (x0, oh0), cfg, jax.random.key(seed)
    )
    clf_vars = {"params": clf_state.params, **clf_state.stats}

    def _gumbel_kwargs(key, batch, dtype):
        if cfg.cat_head_f32:
            dtype = jnp.float32  # noise joins the f32 head path un-quantized
        if explicit_gumbel:
            return {"gumbel_noise": derive_gumbel_noise(
                key, batch, schema.categorical_info, dtype)}
        return {"rngs": {"gumbel": key}}

    def g_forward(params, stats_, x, t, t_oh, mask, key):
        (cont, logits, samples), new_stats = g_model.apply(
            {"params": params, **stats_},
            x, t_oh, mask,
            temperature=cfg.gumbel_tau, hard=False, train=True,
            mutable=["batch_stats"], **_gumbel_kwargs(key, x.shape[0], x.dtype),
        )
        raw = assemble_residual(x, cont, samples, schema.continuous_idx,
                                cat_norm_values)
        return (raw, raw * mask), new_stats

    def d_forward(params, stats_, x, t, t_oh, train):
        if train:
            scores, new_stats = d_model.apply(
                {"params": params, **stats_}, x, t_oh, update_stats=True,
                mutable=["spectral_stats"],
            )
            return scores, new_stats
        return (
            d_model.apply({"params": params, **stats_}, x, t_oh,
                          update_stats=False),
            stats_,
        )

    g_forward = make_mixed_precision(g_forward, cfg.compute_dtype)
    d_forward = make_mixed_precision(d_forward, cfg.compute_dtype)
    clf_forward = _clf_forward_fn(clf_model, clf_vars, cfg.compute_dtype)

    serving_full_mask = lambda x: immutable_complement_mask(
        x.shape[0], x.shape[1], schema.immutable_idx)
    mask_sampler = _with_ones_fraction(
        lambda key, x: random_feature_mask(
            key, x.shape[0], x.shape[1], schema.immutable_idx
        ),
        cfg.mask.ones_fraction,
        serving_full_mask,
    )

    step_fn = make_countergan_step(
        cfg=cfg, num_classes=num_classes, g_forward=g_forward,
        d_forward=d_forward, clf_forward=clf_forward, tx_g=tx_g, tx_d=tx_d,
        mask_sampler=mask_sampler, diagnostics=diagnostics,
    )

    cf_cd = jnp.dtype(cfg.compute_dtype)

    @partial(jax.jit, static_argnames=("hard",))
    def cf_fn(g_variables, x, target, mask, key, hard: bool = True):
        """Eval-time CF: hard Gumbel, clamp to [0,1] data space
        (`house eval_utils.py:126-181`); generator forward at the
        configured compute dtype, residual assembly + clamp float32.
        Gumbel noise is ALWAYS the explicit per-row derivation here
        (regardless of the bundle's training-path `explicit_gumbel`
        setting) so a sample's counterfactual is invariant to the batch
        it is served in — required by the engine's bucket padding."""
        gv, xc, mc = g_variables, x, mask
        if cf_cd != jnp.float32:
            gv = _cast_floats(gv, cf_cd)
            xc, mc = x.astype(cf_cd), mask.astype(cf_cd)
        t_oh = jax.nn.one_hot(target, num_classes, dtype=xc.dtype)
        cont, logits, samples = g_model.apply(
            gv, xc, t_oh, mc,
            temperature=cfg.gumbel_tau, hard=hard, train=False,
            gumbel_noise=derive_gumbel_noise(
                key, x.shape[0], schema.categorical_info,
                jnp.float32 if cfg.cat_head_f32 else xc.dtype,
            ),
        )
        cont = cont.astype(jnp.float32)
        samples = {k: v.astype(jnp.float32) for k, v in samples.items()}
        raw = assemble_residual(x, cont, samples, schema.continuous_idx,
                                cat_norm_values)
        masked = raw * mask
        x_cf = jnp.clip(x + masked, 0.0, 1.0)
        return x_cf, raw, masked

    return CounterGANBundle(
        g_model, d_model, state, step_fn, make_epoch_runner(step_fn), cf_fn,
        tx_g, tx_d, num_classes,
        recal_fn=make_bn_recalibrator(g_forward, mask_sampler, num_classes,
                                      full_mask_fn=serving_full_mask),
    )
