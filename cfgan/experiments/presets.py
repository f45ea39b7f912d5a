"""Experiment presets mirroring the five reference experiment folders
(BASELINE.json "configs").  Hyperparameters cite the reference config they
reproduce."""
from __future__ import annotations

from cfgan.core.config import (
    ClassifierConfig,
    CounterGANConfig,
    DataConfig,
    ExperimentConfig,
    GANConfig,
    MaskConfig,
    replace,
)

# ----------------------------------------------------------- CounteRGAN
# moons/config.py:1-17 — the EXACT reference recipe, kept for parity work
MOONS_COUNTERGAN_REFERENCE = ExperimentConfig(
    name="moons_countergan_reference",
    seed=42,
    num_classes=3,
    data=DataConfig(name="moons", batch_size=64),
    classifier=ClassifierConfig(arch="mlp", lr=1e-2, steps=1000, hidden_dim=32),
    countergan=CounterGANConfig(
        epochs=500,
        lr_g=1e-3,
        lr_d=1e-3,
        lambda_cls=2.0,
        lambda_reg_l1=5.0,
        lambda_reg_l2=5.0,
        lambda_mask=3.0,
        adv_loss="wasserstein",
        reg_reduction="per_sample_norm",
        clamp_cf=None,
        resample_target=True,
        hidden_dim=32,
        mask=MaskConfig(kind="feature"),
    ),
)

# the SHIPPED moons default: reference recipe with lambda_cls 2 -> 3 and
# lambda_reg 5/5 -> 3/3.  The reference recipe's seed-42 run stalls at
# 0.974 flip on target 1 (seed luck: 43/44 reach 1.0); the round-4 recipe
# grid (tools/moons_recipe_search.py, results/moons_recipe_search/)
# measured this variant at per-target flip 1.0 ON ALL THREE TARGETS FOR
# ALL THREE SEEDS (42/43/44) with unchanged actionability — robust 1.0,
# not pick-your-seed (mirrors the MNIST default/reference preset split).
MOONS_COUNTERGAN = MOONS_COUNTERGAN_REFERENCE.replace(
    name="moons_countergan",
    countergan=replace(
        MOONS_COUNTERGAN_REFERENCE.countergan,
        lambda_cls=3.0,
        lambda_reg_l1=3.0,
        lambda_reg_l2=3.0,
        # round 5: same epoch-snapshot serving selection as the MNIST and
        # house defaults (cfgan.train.selection) — already at flip 1.0
        # end-of-training; the ladder makes that robust to trajectory
        # placement instead of relying on where epoch 500 lands
        snapshot_every=50,
    ),
)

# mnist/config.py:3-29 — the EXACT reference recipe, kept for parity work
# (the torch oracle traces and the cross-framework loss-parity harness run
# against this, in f32)
MNIST_COUNTERGAN_REFERENCE = ExperimentConfig(
    name="mnist_countergan_reference",
    seed=42,
    num_classes=10,
    data=DataConfig(name="mnist", batch_size=128, valid_fraction=0.1),
    classifier=ClassifierConfig(arch="cnn", lr=1e-3, epochs=10, batch_size=128),
    countergan=CounterGANConfig(
        epochs=20,
        lr_g=5e-5,
        lr_d=1e-5,
        lambda_adv=1.0,
        lambda_cls=1.0,
        lambda_reg_l1=2.5,
        lambda_mask=2.0,
        adv_loss="bce",
        reg_reduction="mean_abs",
        clamp_cf=(-1.0, 1.0),
        resample_target=False,  # mnist/trainer.py:94 samples any target
        hidden_dim=64,
        num_res_blocks=6,
        mask=MaskConfig(kind="patch", patch_size=7, num_modifiable_patches=10),
    ),
)

# the SHIPPED default: reference recipe + lambda_cls 2 + per-step generator
# EMA (0.999) + bf16 compute.  The reference's committed per-class CSV is
# flip 1.0 on all ten targets (`mnist/results/countergan_metrics_per_class
# .csv:2-11`) but its exact recipe only reaches that for lucky seeds
# (worst-target floor 0.90 at seed 42, RESULTS.md); this default reaches
# worst-target flip [1.0, 0.9998, 1.0, 1.0] across seeds 42-45 at the same
# 20-epoch budget (results/recipe_search_bf16/, tools/recipe_search.py) —
# robust 1.0, not pick-your-seed.
MNIST_COUNTERGAN = MNIST_COUNTERGAN_REFERENCE.replace(
    name="mnist_countergan",
    countergan=replace(
        MNIST_COUNTERGAN_REFERENCE.countergan,
        lambda_cls=2.0,
        ema_decay=0.999,
        compute_dtype="bfloat16",
        # round 5: epoch-snapshot serving selection (every 2 of the 20
        # epochs), extending the round-3 end-of-training {live,
        # EMA+recal} selection along the trajectory — lifts the
        # committed default's worst-seed per-target floor (0.9836 at
        # seed 42 target 8) by shipping the validation-best snapshot
        snapshot_every=2,
    ),
)

# house_sales_kc_usa/config.py:13-83 — the reference's EXACT recipe (50
# epochs, lambda_cls 2, no clamp/range term), kept first-class for parity
# runs, mirroring the MNIST_COUNTERGAN_REFERENCE naming.
HOUSE_COUNTERGAN_REFERENCE = ExperimentConfig(
    name="house_countergan_reference",
    seed=42,
    num_classes=4,
    data=DataConfig(name="kc_house", batch_size=128),
    classifier=ClassifierConfig(
        arch="tabular",
        lr=5e-4,
        epochs=200,
        batch_size=128,
        weight_decay=0.01,
        class_weighted=True,
        early_stop_patience=15,
        lr_plateau=True,
    ),
    countergan=CounterGANConfig(
        epochs=50,
        lr_g=1e-3,
        lr_d=1e-3,
        lambda_cls=2.0,
        lambda_reg_l1=1.0,
        lambda_mask=1.0,
        adv_loss="wasserstein",
        reg_reduction="per_sample_norm",
        clamp_cf=None,
        resample_target=True,
        hidden_dim=32,
        num_res_blocks=5,
        gumbel_tau=0.5,
    ),
)

# shipped default (round 5): clamp-trained + out-of-range residual
# penalty (lambda_range keeps the UN-clamped counterfactual inside [0,1]
# so both eval protocols agree), lambda_cls 5 on the 350-epoch schedule,
# per-step generator EMA, and epoch-snapshot serving selection
# (cfgan.train.selection): every 10 epochs the trajectory's serving
# candidates ({live, EMA+BN-recal x2}) are scored on a held-out-from-test
# fold and the best snapshot ships, instead of whichever generator epoch
# 350 lands on.  Measured on the ladder matrices
# (results/house_ladder_matrix*/, tools/house_ladder_matrix.py): this
# recipe+rule ships a generator that beats the reference's committed
# per-target flips (1.000/0.991/0.980/0.996,
# house_sales_kc_usa/results/countergan_metrics.csv:2-5) under the
# reference's own un-clamped protocol on every seed studied, where every
# END-OF-TRAINING recipe of 13 searched across 4 waves missed on at
# least one seed (GAN end states are chaotic to compiler-level numerics;
# the trajectory's flip spread dwarfs the recipe spread).
HOUSE_COUNTERGAN = HOUSE_COUNTERGAN_REFERENCE.replace(
    name="house_countergan",
    countergan=replace(
        HOUSE_COUNTERGAN_REFERENCE.countergan,
        epochs=350,
        lambda_cls=5.0,
        clamp_cf=(0.0, 1.0),
        lambda_range=10.0,
        ema_decay=0.999,
        snapshot_every=10,
    ),
)

# the reference's committed per-target class-flip rates under its own
# (un-clamped) protocol — the behavioral contract the house snapshot
# selection scores margins against
# (`house_sales_kc_usa/results/countergan_metrics.csv:2-5`, exact values)
HOUSE_REFERENCE_FLIPS = (0.9999999824692222, 0.9906153240624596,
                         0.9796906499301686, 0.995971225640353)

# ------------------------------------------------------ generation families
# simple_gan/moons/make_moons_gan.py:15-21
SIMPLE_GAN_MOONS = ExperimentConfig(
    name="simple_gan_moons",
    num_classes=2,
    data=DataConfig(name="moons2", batch_size=50),
    countergan=None,
    gan=GANConfig(family="simple_mlp", epochs=500, lr_g=1e-3, lr_d=1e-3,
                  latent_dim=32, hidden_dim=128),
)

# simple_gan/mnist/mnist_gan.py:22-32 (argparse defaults)
SIMPLE_GAN_MNIST = ExperimentConfig(
    name="simple_gan_mnist",
    num_classes=10,
    data=DataConfig(name="mnist", batch_size=64, valid_fraction=0.0),
    countergan=None,
    gan=GANConfig(family="mlp_image", epochs=20, lr_g=2e-4, lr_d=2e-4,
                  beta1=0.5, beta2=0.999, latent_dim=100, g_before_d=True,
                  sample_every=400),
)

# conditional_gan/moons/make_moons_cgan.py:10-21
CGAN_MOONS = ExperimentConfig(
    name="cgan_moons",
    num_classes=2,
    data=DataConfig(name="moons2", batch_size=64),
    countergan=None,
    gan=GANConfig(family="cgan_mlp", epochs=500, lr_g=1e-3, lr_d=1e-3,
                  latent_dim=32, hidden_dim=128),
)

# conditional_gan/mnist/mnist_wgan_conditional.py:20-32
WGAN_GP_MNIST = ExperimentConfig(
    name="wgan_gp_mnist",
    num_classes=10,
    data=DataConfig(name="mnist", batch_size=128),
    countergan=None,
    gan=GANConfig(family="wgan_gp", epochs=20, lr_g=1e-4, lr_d=1e-4,
                  beta1=0.0, beta2=0.9, latent_dim=32, hidden_dim=1024,
                  n_critic=5, gp_lambda=10.0, sample_every=500),
)

# dconv_gan/mnist/mnist_dcgan.py:15-30
DCGAN_MNIST = ExperimentConfig(
    name="dcgan_mnist",
    num_classes=10,
    data=DataConfig(name="mnist", batch_size=128, resize_to=64),
    countergan=None,
    gan=GANConfig(family="dcgan", epochs=5, lr_g=2e-4, lr_d=2e-4,
                  beta1=0.5, beta2=0.999, latent_dim=100, hidden_dim=64,
                  sample_every=500),
)

PRESETS = {
    p.name: p
    for p in (
        MOONS_COUNTERGAN,
        MOONS_COUNTERGAN_REFERENCE,
        MNIST_COUNTERGAN,
        MNIST_COUNTERGAN_REFERENCE,
        HOUSE_COUNTERGAN,
        HOUSE_COUNTERGAN_REFERENCE,
        SIMPLE_GAN_MOONS,
        SIMPLE_GAN_MNIST,
        CGAN_MOONS,
        WGAN_GP_MNIST,
        DCGAN_MNIST,
    )
}

# legacy superseded stack: fixed-target delta CounteRGAN
# (mnist/gan_train.py:17-30: target_class 5, lambda_cls 3, lambda_reg .05;
# countergan2.py clipped log losses)
MNIST_COUNTERGAN_LEGACY = ExperimentConfig(
    name="mnist_countergan_legacy",
    seed=42,
    num_classes=10,
    data=DataConfig(name="mnist", batch_size=128, valid_fraction=0.1),
    classifier=ClassifierConfig(arch="cnn", lr=1e-3, epochs=10, batch_size=128),
    countergan=CounterGANConfig(
        epochs=20,
        lr_g=5e-5,
        lr_d=1e-5,
        lambda_adv=1.0,
        lambda_cls=3.0,
        lambda_reg_l1=0.05,
        lambda_mask=0.0,
        adv_loss="clipped_log",
        reg_reduction="mean_abs",
        clamp_cf=(-1.0, 1.0),
        fixed_target=5,
        resample_target=False,
        hidden_dim=32,
    ),
)
PRESETS[MNIST_COUNTERGAN_LEGACY.name] = MNIST_COUNTERGAN_LEGACY

# countergan2.py self-contained CLI variant (`mnist/countergan2.py:16-30,
# 186-205`): REQUIRED --target from the command line, 50 epochs, Adam 1e-3
# for both nets, clipped-log sigmoid-D losses, lambda_cls 3 / lambda_reg
# 0.05 / no mask term, legacy MaxPool classifier.  fixed_target is filled in
# by the CLI (cfgan.experiments.mnist_countergan2).
MNIST_COUNTERGAN2 = ExperimentConfig(
    name="mnist_countergan2",
    seed=42,
    num_classes=10,
    data=DataConfig(name="mnist", batch_size=128, valid_fraction=0.1),
    classifier=ClassifierConfig(arch="cnn_legacy", lr=1e-3, epochs=10,
                                batch_size=128),
    countergan=CounterGANConfig(
        epochs=50,
        lr_g=1e-3,
        lr_d=1e-3,
        lambda_adv=1.0,
        lambda_cls=3.0,
        lambda_reg_l1=0.05,
        lambda_mask=0.0,
        adv_loss="clipped_log",
        reg_reduction="mean_abs",
        clamp_cf=(-1.0, 1.0),
        fixed_target=None,  # REQUIRED from the CLI, countergan2.py:17
        resample_target=False,
        hidden_dim=64,
    ),
)
PRESETS[MNIST_COUNTERGAN2.name] = MNIST_COUNTERGAN2

# round-3 improved recipe: the reference recipe but the training loss sees
# the clamped counterfactual (train/eval consistency), which reaches the
# reference's flip rates with counterfactuals that stay in legal data space
# (RESULTS.md "clamp-trained" row).  Superseded as the default by
# HOUSE_COUNTERGAN (range10_350ep) above; kept for the round-3 result dirs.
HOUSE_COUNTERGAN_CLAMPED = HOUSE_COUNTERGAN_REFERENCE.replace(
    name="house_countergan_clamped",
    countergan=CounterGANConfig(
        epochs=150,
        lr_g=1e-3,
        lr_d=1e-3,
        lambda_cls=4.0,
        lambda_reg_l1=1.0,
        lambda_mask=1.0,
        adv_loss="wasserstein",
        reg_reduction="per_sample_norm",
        clamp_cf=(0.0, 1.0),
        resample_target=True,
        hidden_dim=32,
        num_res_blocks=5,
        gumbel_tau=0.5,
    ),
)
PRESETS[HOUSE_COUNTERGAN_CLAMPED.name] = HOUSE_COUNTERGAN_CLAMPED

# bf16 variant of the exact REFERENCE recipe (RESULTS.md: quality at parity
# with f32 across seeds on the honest corpus; 1.12x faster step) — kept
# first-class so the round-2 bf16-vs-f32 comparison runs stay reproducible.
# (The shipped default `mnist_countergan` is already bf16 + lambda_cls 2 +
# EMA; this one isolates the dtype change against the reference recipe.)
MNIST_COUNTERGAN_BF16 = MNIST_COUNTERGAN_REFERENCE.replace(
    name="mnist_countergan_bf16",
    countergan=replace(MNIST_COUNTERGAN_REFERENCE.countergan,
                       compute_dtype="bfloat16"),
)
PRESETS[MNIST_COUNTERGAN_BF16.name] = MNIST_COUNTERGAN_BF16
