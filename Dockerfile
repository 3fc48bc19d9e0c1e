# Reproducible environment for arflow_tpu (reference parity:
# /root/reference/Dockerfile:1-19 pins the reference's CUDA/torch stack; this
# pins the jax/flax stack the framework is validated and benchmarked against).
#
# Build:            docker build -t arflow-tpu .
# Fast test lane:   docker run --rm arflow-tpu
# Full suite:       docker run --rm arflow-tpu python -m pytest tests/ -q
# TPU hosts:        install the matching libtpu wheel for jax==0.9.0 inside
#                   the container (pip install jax[tpu]==0.9.0 -f
#                   https://storage.googleapis.com/jax-releases/libtpu_releases.html)
#                   and mount /dev/vfio; everything else is identical.

FROM python:3.12-slim

# g++ compiles the native IO runtime (arflow_tpu/native/arflow_io.cpp) on
# first use; libpng/libjpeg headers back its decode fast path.
RUN apt-get update && \
    apt-get install -y --no-install-recommends g++ make libpng-dev libjpeg-dev && \
    apt-get clean && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/arflow_tpu

# Pinned stack (mirrors pyproject.toml [project.dependencies] + test extras).
# torch is CPU-only and used solely as the parity-test oracle.
RUN pip install --no-cache-dir \
    jax==0.9.0 jaxlib==0.9.0 flax==0.12.3 optax==0.2.6 chex==0.1.91 \
    orbax-checkpoint==0.11.32 numpy==2.0.2 pillow==12.1.0 einops==0.8.2 \
    pytest==8.4.2 tensorboardX==2.6.4 && \
    pip install --no-cache-dir torch==2.13.0 --index-url https://download.pytorch.org/whl/cpu

COPY pyproject.toml README.md ./
COPY arflow_tpu ./arflow_tpu
COPY configs ./configs
COPY tests ./tests
COPY pytest.ini train.py inference.py evaluate_flo_files.py fit_penalty.py ./

RUN pip install --no-cache-dir --no-deps .

# Pre-build the native IO library so first use inside the container is warm
# (arflow_tpu/native/__init__.py compiles arflow_io.cpp with g++ on import).
RUN python -c "import arflow_tpu.native as n; assert n.available(), 'native IO build failed'"

# Default: the fast test lane on a virtual 8-device CPU mesh (tests/conftest.py
# forces JAX_PLATFORMS=cpu + xla_force_host_platform_device_count=8).
CMD ["python", "-m", "pytest", "tests/", "-q", "-m", "not slow"]
