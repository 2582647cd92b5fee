# TPU training image (reference builds on pytorch/pytorch:1.4-cuda10.1,
# Dockerfile:1-8; the TPU-native equivalent is a JAX TPU base).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY . /app

# jax[tpu] pulls libtpu; pinned by the deploy environment
RUN pip install --no-cache-dir "jax[tpu]" -f \
    https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir .

ENTRYPOINT ["tartangan_train_cnn"]
