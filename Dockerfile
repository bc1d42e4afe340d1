# Larynx TPU serving image.
# Build:  docker build -t larynx-tpu .
# Run:    docker run -p 5002:5002 -v $HOME/.local/share/larynx:/root/.local/share/larynx larynx-tpu
FROM python:3.12-slim

WORKDIR /app
COPY pyproject.toml README.md ./
COPY larynx_tpu ./larynx_tpu

# jax[tpu] pulls libtpu for Cloud TPU VMs; plain jax works for CPU smoke tests
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || \
    pip install --no-cache-dir jax
RUN pip install --no-cache-dir .

EXPOSE 5002
ENTRYPOINT ["larynx-tpu-server", "--host", "0.0.0.0", "--port", "5002"]
