# Larynx TPU serving image (multi-arch: linux/amd64, linux/arm64 — build
# with scripts/build-docker.sh / docker buildx).
#
# Build:  docker build -t larynx-tpu .
# Run:    docker run -p 5002:5002 \
#           -v $HOME/.local/share/larynx:/root/.local/share/larynx larynx-tpu

# --- builder: wheel + dependency download -------------------------------------
FROM python:3.12-slim AS builder

WORKDIR /src
COPY pyproject.toml README.md ./
COPY larynx_tpu ./larynx_tpu
RUN pip wheel --no-deps -w /wheels . \
 && (pip download -d /wheels "jax[tpu]" \
       -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
     || pip download -d /wheels jax) \
 && pip download -d /wheels aiohttp numpy pyyaml

# --- runtime -------------------------------------------------------------------
FROM python:3.12-slim

COPY --from=builder /wheels /wheels
RUN pip install --no-cache-dir --no-index -f /wheels larynx-tpu jax aiohttp \
 && rm -rf /wheels

EXPOSE 5002
ENTRYPOINT ["larynx-tpu-server", "--host", "0.0.0.0", "--port", "5002"]
