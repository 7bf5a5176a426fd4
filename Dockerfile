# Environment spec (parity row for reference Dockerfile:1-14, which pins a
# CUDA 10.2 image + fairseq/s3prl commits). The TPU-native stack needs none
# of those: jax with the TPU PJRT plugin, flax/optax/orbax, torch (CPU) only
# for checkpoint import tests, and a C++17 toolchain for native/.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

# TPU runtime: on Cloud TPU VMs use jax[tpu]; pin versions for reproducibility
RUN pip install --no-cache-dir \
        "jax[tpu]==0.9.0" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax optax orbax-checkpoint chex einops numpy pyyaml pytest \
        torch --index-url https://download.pytorch.org/whl/cpu

WORKDIR /workspace/fithubert_tpu
COPY . .
RUN make -C native && pip install -e .

# smoke: synthetic-data distillation end to end, then the test suite
RUN python -m pytest tests/ -q
CMD ["python", "train.py", "-c", "configs/fithubert.yaml"]
