"""cfgan — a TPU-native promptable counterfactual GAN framework.

A ground-up JAX / XLA / Pallas / pjit rebuild of the capabilities of the
PyTorch reference `flash4242/Promptable-Counterfactual-GAN` (see SURVEY.md):

* five GAN families — simple MLP GAN, conditional GAN, conditional WGAN-GP,
  DCGAN, and the flagship conditional CounteRGAN;
* three dataset types — make_moons 2-D points, MNIST images, King County
  house-sales tabular data;
* a promptable counterfactual engine: a residual generator conditioned on a
  target class and a user-supplied binary mask of modifiable patches/features,
  trained against a conditional discriminator and a frozen classifier;
* a full evaluation suite (flip rate, prediction gain, actionability,
  feature-shift importance, class-pair sensitivity, case studies) and
  natural-language serving front-ends.

Unlike the reference (single-GPU eager scripts), every hot path here is a
fused, jitted XLA program sharded over a `jax.sharding.Mesh`.

Subpackage map (see SURVEY.md section 7):
    core/        config trees, PRNG discipline, checkpointing, logging
    parallel/    device mesh, shardings, collectives (the reference has none)
    data/        dataset registry, device-resident pipelines, normalization
    nn/          layers: spectral norm, FiLM, residual blocks, gumbel-softmax
    ops/         Pallas TPU kernels + XLA fallbacks for the hot epilogues
    masks/       patch-grid (image) and feature (tabular) mask policies
    losses/      GAN losses + the 4-term CounteRGAN composite
    models/      generators / discriminators / classifiers, one registry
    train/       jitted alternating train steps, epoch-as-scan loops
    eval/        vmapped metrics, grids, heatmaps, case studies
    serve/       fused CF inference engine, NL intent parsing, web apps
    experiments/ presets mirroring the five reference experiment folders

The throughput harness lives at the repo root (`bench.py`).
"""

__version__ = "0.1.0"
