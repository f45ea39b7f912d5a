#!/bin/bash
# Regenerate seed-42/46 MNIST run-dir eval artifacts from their selected
# serving candidates (VERDICT r3 next-step #2).  CPU fallback for the axon
# outage; rerun on TPU (drop --platform cpu) if the chip returns first.
set -x
cd /root/repo
for spec in "results/mnist_countergan=42" "results/mnist_countergan_seed46=46"; do
  dir="${spec%%=*}"; seed="${spec##*=}"
  nice -n 10 python tools/reselect_serving.py "$spec" --platform cpu \
    || exit 1
  nice -n 10 python -m cfgan.experiments.mnist_countergan \
    --seed "$seed" --out-dir "$dir" --platform cpu || exit 1
  python tools/check_provenance.py --results "$dir" || exit 1
done
echo REGEN_DONE
