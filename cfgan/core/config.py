"""Typed, immutable configuration trees.

The reference scatters configuration across per-folder modules with four
different styles (class attributes `mnist/config.py:3-29`, plain dicts
`house_sales_kc_usa/config.py:13-83`, dataclasses, argparse) and mutates them
at runtime (scaler/bins stashed into the dict, `house data_utils.py:16,40`).

Here every experiment is described by one frozen dataclass tree.  Runtime
artifacts (normalization stats, class bins) are *not* config — they live in
`cfgan.data.transforms.NormStats` and travel with checkpoints as model
metadata.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence


def _frozen(**kw):
    return dataclass(frozen=True, **kw)


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection + loading parameters."""

    name: str = "moons"  # registry key: moons | mnist | kc_house
    batch_size: int = 64
    valid_fraction: float = 0.0  # stratified valid split (mnist: 0.1)
    test_fraction: float = 0.2  # train/test split for array datasets
    seed: int = 42
    path: str | None = None  # dataset file/dir override (env-resolved if None)
    # image datasets
    image_shape: tuple[int, int, int] = (28, 28, 1)  # NHWC
    normalize_mean: float = 0.5  # maps [0,1] -> [-1,1] like Normalize((.5),(.5))
    normalize_std: float = 0.5
    resize_to: int | None = None  # dcgan resizes 28 -> 64


@dataclass(frozen=True)
class ClassifierConfig:
    """Frozen-classifier pretrain stage (CounteRGAN stage 1)."""

    arch: str = "mlp"  # mlp | cnn
    lr: float = 1e-3
    epochs: int = 10
    batch_size: int = 128
    steps: int | None = None  # full-batch step count (moons: 1000)
    weight_decay: float = 0.0  # house uses AdamW
    class_weighted: bool = False  # house: class-weighted CE
    early_stop_patience: int | None = None  # house: 15
    lr_plateau: bool = False  # house: ReduceLROnPlateau
    hidden_dim: int = 32
    dropout: tuple[float, ...] = ()


@dataclass(frozen=True)
class MaskConfig:
    """Mask-sampling policy for CounteRGAN training and eval.

    Images: random patch-grid masks (reference `mnist/trainer.py:45-72`).
    Tabular: per-feature Bernoulli(0.5) with immutable features forced to 0
    (reference `house trainer.py:253-255`).
    """

    kind: str = "feature"  # feature | patch
    patch_size: int = 7
    num_modifiable_patches: int | None = 10  # None => iid Bernoulli(0.5)
    immutable_idx: tuple[int, ...] = ()
    # fraction of TRAINING samples whose mask is replaced by all-ones
    # (capability knob, default off = reference-exact distribution): the
    # headline eval/serving protocol is all-ones masks while reference
    # training only ever sees partial masks — mixing a few all-ones
    # samples in narrows that train/serve distribution gap
    ones_fraction: float = 0.0


@dataclass(frozen=True)
class CounterGANConfig:
    """Stage-2 adversarial training of the residual generator."""

    epochs: int = 500
    lr_g: float = 1e-3
    lr_d: float = 1e-3
    lambda_adv: float = 1.0
    lambda_cls: float = 2.0
    lambda_reg_l1: float = 1.0
    lambda_reg_l2: float = 0.0  # moons uses both L1 and L2
    lambda_mask: float = 1.0
    # wasserstein | bce | clipped_log (legacy countergan2 sigmoid-D losses
    # log(d + 1e-6), `mnist/countergan2.py:188,198`)
    adv_loss: str = "wasserstein"
    reg_reduction: str = "per_sample_norm"  # per_sample_norm | mean_abs
    clamp_cf: tuple[float, float] | None = None  # mnist clamps to (-1, 1)
    # out-of-range residual penalty: > 0 adds
    # lambda_range * mean(relu(x + raw*mask - hi) + relu(lo - x - raw*mask))
    # to the G loss so the UN-clamped counterfactual itself stays inside
    # the clamp_cf bounds — making the eval-time clamp a no-op and the
    # honest and reference (un-clamped, `house eval_utils.py:244-245`)
    # protocols agree.  Only meaningful with clamp_cf set; 0 disables.
    lambda_range: float = 0.0
    resample_target: bool = True  # force target != source (tabular/moons)
    # legacy fixed-target mode (`mnist/gan_train.py:17` trains toward ONE
    # class for the whole run); None => per-sample random targets
    fixed_target: int | None = None
    hidden_dim: int = 32
    num_res_blocks: int = 5
    residual_scaling: float = 0.1
    gumbel_tau: float = 0.5
    # mixed precision: "bfloat16" runs G/D/classifier forwards+backwards on
    # the MXU in bf16 with float32 parameters, optimizer state and losses
    # (capability uplift; float32 default matches reference numerics)
    compute_dtype: str = "float32"
    # rematerialize the generator forward in the backward pass
    # (jax.checkpoint): trades ~1/3 more FLOPs for O(depth) less activation
    # memory — the knob for scaling G depth/width beyond HBM
    remat: bool = False
    # image generator 3x3-conv lowering: None/"xla" = lax.conv (the
    # production path — XLA's native conv tilings win at these shapes).
    # EXPERIMENTAL alternatives, kept for study (both measured strictly
    # slower, results/conv_cliff/NOTES.md #5/#7): "matmul" = shifted-tap
    # matmul decomposition (cfgan.ops.conv, 6-20x slower per-op),
    # "pallas" = hand-written Pallas TPU kernel (nine VMEM-resident MXU
    # dots per batch tile, matmul-decomposition custom VJP; compiles on
    # the current stack, 12-13x slower in the full step).  Bench with
    # tools/conv_cliff_bench.py.
    conv_impl: str | None = None
    # tabular only: run the categorical heads + Gumbel-Softmax in f32 under
    # bf16 compute (exp((logits+g)/tau) at tau=0.5 amplifies bf16 logit
    # quantization into argmax flips); no-op under f32 compute.  Default ON:
    # the controlled ablation (results/tabular_bf16_ablation/,
    # tools/tabular_bf16_ablation.py) measured it as the best and
    # lowest-variance arm (worst-seed target-1 flip 0.9815 vs full-bf16
    # 0.9708 / f32 0.9594) at no measurable cost
    cat_head_f32: bool = True
    # experimental f32 batch-scaling lever (conv-cliff study, VERDICT r4
    # #5): >= 2 splits the GENERATOR update into this many micro-batches
    # inside the fused step (grad accumulation via lax.scan), shrinking
    # the generator-backward activation working set by the same factor —
    # the direct test of the VMEM-spill hypothesis behind the f32
    # batch>=256 regression (results/conv_cliff/NOTES.md #4).  Costs one
    # extra G forward (the D phase no longer shares the G linearization);
    # BN batch statistics and the tabular Gumbel draws are per
    # micro-batch during the G-update forwards (standard grad-accum
    # semantics).  0 disables (production default; equal-size chunks
    # average to the exact full-batch mean gradient otherwise).
    g_microbatch: int = 0
    # epoch-snapshot serving selection (cfgan.train.selection): > 0 makes
    # the experiment mains score serving candidates every K epochs on the
    # validation fold and ship the trajectory's best snapshot instead of
    # the final epoch (the reference always serves the final epoch,
    # `mnist/trainer.py:163`, `house trainer.py:378`).  0 = final-epoch
    # serving (with the end-of-training {live, EMA+recal} selection when
    # ema_decay > 0).
    snapshot_every: int = 0
    # generator EMA (capability uplift, standard GAN stabilizer): > 0
    # maintains an exponential moving average of G params per STEP inside
    # the fused program (initialized at the init params, so no debias term)
    # for use at eval/serving time; 0 disables.  The train-path gradients
    # always flow through the live params.
    ema_decay: float = 0.0
    mask: MaskConfig = field(default_factory=MaskConfig)


@dataclass(frozen=True)
class GANConfig:
    """Plain generation families (simple / conditional / DCGAN / WGAN-GP)."""

    family: str = "simple_mlp"  # simple_mlp | mlp_image | cgan_mlp | dcgan | wgan_gp
    epochs: int = 500
    lr_g: float = 1e-3
    lr_d: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.999
    latent_dim: int = 32
    hidden_dim: int = 128
    n_critic: int = 1  # WGAN-GP: 5
    gp_lambda: float = 10.0
    g_before_d: bool = False  # simple_gan/mnist updates G before D
    sample_every: int = 0  # iterations between fixed-noise sample grids
    compute_dtype: str = "float32"  # "bfloat16": G/D fwd+bwd on the MXU in
    # bf16, f32 params/opt/losses (same policy as CounterGANConfig)


@dataclass(frozen=True)
class ShardingConfig:
    """Device-mesh / parallelism policy (capability uplift over the reference,
    which is single-device everywhere — SURVEY.md section 2.9)."""

    data_axis: str = "data"
    mesh_shape: tuple[int, ...] | None = None  # None => all local devices
    donate_state: bool = True
    # Under jit-with-shardings (the path used here) BatchNorm reductions have
    # GLOBAL batch semantics automatically — XLA inserts the collectives — so
    # sharded training reproduces the single-device run exactly
    # (tests/test_sharding.py parity test).  This flag exists for a future
    # shard_map/pmap path, where per-replica stats would need
    # `nn.layers.BatchNorm(axis_name=...)` to opt back into sync.
    sync_batch_norm: bool = True


@dataclass(frozen=True)
class TabularSchema:
    """Feature schema for tabular CounteRGAN (reference `house config.py:54-82`)."""

    feature_names: tuple[str, ...] = ()
    immutable_features: tuple[str, ...] = ()
    categorical_values: Mapping[str, tuple[float, ...]] = field(default_factory=dict)

    @property
    def input_dim(self) -> int:
        return len(self.feature_names)

    @property
    def immutable_idx(self) -> tuple[int, ...]:
        return tuple(self.feature_names.index(f) for f in self.immutable_features)

    @property
    def categorical_idx(self) -> tuple[int, ...]:
        return tuple(
            self.feature_names.index(f) for f in self.categorical_values
        )

    @property
    def categorical_info(self) -> dict[int, tuple[float, ...]]:
        return {
            self.feature_names.index(f): tuple(v)
            for f, v in self.categorical_values.items()
        }

    @property
    def continuous_idx(self) -> tuple[int, ...]:
        cat = set(self.categorical_idx)
        return tuple(i for i in range(self.input_dim) if i not in cat)

    @classmethod
    def from_dataframe(
        cls,
        df,
        immutable: tuple[str, ...] = (),
        categorical=None,
        max_categorical_cardinality: int = 32,
        exclude: tuple[str, ...] = (),
    ) -> "TabularSchema":
        """Infer a schema from a pandas DataFrame (bring-your-own-CSV
        convenience; the reference hand-maintains the equivalent lists in
        `house config.py:44-79`).

        Every numeric column with at most `max_categorical_cardinality`
        distinct values becomes categorical with its observed sorted
        values.  `categorical` overrides inference: a sequence of column
        names (values observed from the data) or a mapping
        name -> explicit value tuple; pass `categorical=()` to disable
        inference entirely.  `exclude` drops columns (targets, ids).
        """
        from collections.abc import Mapping as ABCMapping

        import numpy as np

        names = tuple(c for c in df.columns if c not in exclude)
        for f in immutable:
            if f not in names:
                raise ValueError(f"immutable feature {f!r} not a column")
        cat_values: dict[str, tuple[float, ...]] = {}

        def observed(col) -> tuple[float, ...]:
            vals = np.unique(np.asarray(df[col], np.float64))
            return tuple(float(v) for v in vals)

        if categorical is None:
            for c in names:
                vals = np.unique(np.asarray(df[c], np.float64))
                if len(vals) <= max_categorical_cardinality:
                    cat_values[c] = tuple(float(v) for v in vals)
        elif isinstance(categorical, ABCMapping):
            cat_values = {c: tuple(float(v) for v in vs)
                          for c, vs in categorical.items()}
        else:
            cat_values = {c: observed(c) for c in categorical}
        for c in cat_values:
            if c not in names:
                raise ValueError(f"categorical feature {c!r} not a column")
        return cls(feature_names=names, immutable_features=tuple(immutable),
                   categorical_values=cat_values)


@dataclass(frozen=True)
class ExperimentConfig:
    """One runnable experiment preset (replaces a reference folder)."""

    name: str = "moons_countergan"
    seed: int = 42
    num_classes: int = 3
    data: DataConfig = field(default_factory=DataConfig)
    classifier: ClassifierConfig = field(default_factory=ClassifierConfig)
    countergan: CounterGANConfig | None = field(default_factory=CounterGANConfig)
    gan: GANConfig | None = None
    sharding: ShardingConfig = field(default_factory=ShardingConfig)
    schema: TabularSchema | None = None
    out_dir: str = "results"

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)


def replace(cfg, **kw):
    """Functional update helper for any config node."""
    return dataclasses.replace(cfg, **kw)


def to_dict(cfg) -> dict[str, Any]:
    return dataclasses.asdict(cfg)
