"""`python -m cfgan` — list the runnable entry points and presets."""
from __future__ import annotations


def main():
    from cfgan.experiments.presets import PRESETS

    print(__doc__.strip())
    print("""
Experiments (classifier pretrain -> GAN train -> eval suite):
  python -m cfgan.experiments.mnist_countergan   [--seed N] [--epochs N] [--limit N] [--fresh] [--legacy]
  python -m cfgan.experiments.mnist_countergan2  --target C   (legacy fixed-target CLI)
  python -m cfgan.experiments.house_countergan   [--seed N] [--epochs N] [--limit N]
  python -m cfgan.experiments.moons_countergan   [--seed N] [--epochs N]
  python -m cfgan.experiments.generation         --preset NAME

Serving:
  python -m cfgan.serve.launch --app mnist|house|moons [--api [--shard]] [--port P]
  (or the `cfgan-serve` console script)

Benchmarks / tools (repo checkout):
  python bench.py [--families]
  python tools/roofline.py [--serving|--latency|--bulk] [--dtype bfloat16]
  python tools/parity_report.py [--quick] [--legs moons,house,mnist]
  python tools/recipe_search.py / reselect_serving.py / reference_weights_eval.py

Presets:""")
    for name in sorted(PRESETS):
        print(f"  {name}")


if __name__ == "__main__":
    main()
