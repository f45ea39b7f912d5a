# Reproducible environment for cfgan (TPU-native counterfactual-GAN
# framework).  Counterpart of the reference's `Dockerfile:1-29`
# (pytorch/pytorch:2.4.1-cuda11.8 + pip deps) — rebuilt for the JAX/TPU
# stack.  Versions pinned to the environment the committed results were
# produced on (see also pyproject.toml extras).
#
# Build:  docker build -t cfgan .
# Run (TPU VM):  docker run --privileged --net=host \
#     -v $PWD:/workspace cfgan python -m cfgan.experiments.mnist_countergan
# Run (CPU, tests):  docker run cfgan python -m pytest tests/ -q
FROM python:3.12.12-slim-bookworm

# native toolchain for cfgan/native (ctypes-loaded C++ data-path kernels)
RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make \
    && rm -rf /var/lib/apt/lists/*

# On a TPU VM replace `jax==0.9.0` with `jax[tpu]==0.9.0`
# (-f https://storage.googleapis.com/jax-releases/libtpu_releases.html).
RUN pip install --no-cache-dir \
        jax==0.9.0 jaxlib==0.9.0 \
        flax==0.12.3 optax==0.2.6 chex==0.1.91 \
        orbax-checkpoint==0.11.32 \
        numpy==2.0.2 scipy==1.17.0 \
        scikit-learn==1.9.0 pandas==3.0.3 \
        matplotlib==3.10.8 seaborn==0.13.2 pillow==12.1.0 \
        einops==0.8.2 \
        pytest==8.* \
    && pip install --no-cache-dir --index-url https://download.pytorch.org/whl/cpu \
        torch==2.13.0
# optional serving extras (gradio UI + LLM intent providers); the framework
# degrades gracefully without them:
#   pip install gradio google-generativeai openai

WORKDIR /workspace
COPY . /workspace
RUN python -c "import cfgan"

CMD ["python", "-m", "pytest", "tests/", "-q"]
