"""ARFlow-TPU: a TPU-native (JAX/XLA/Pallas) unsupervised optical-flow framework.

Re-implements the full capability surface of the reference ARFlow/UFlow fork
(PWC-style coarse-to-fine unsupervised flow, census/SSIM photometric losses with
range-map occlusion, variational/probabilistic flow trained with a reparametrized
ELBO, sparse-triangular / mixture / low-rank posteriors, uncertainty metrics)
as an idiomatic JAX framework:

- NHWC layout everywhere (TPU conv-native); flow fields are ``(B, H, W, 2)``
  with ``[..., 0] = u`` (horizontal) and ``[..., 1] = v`` (vertical).
- Pure-functional models (flax.linen) with explicit PRNG threading for
  level-dropout and posterior sampling.
- One jitted train step (forward + loss + grad + optimizer update).
- Data parallelism via ``jax.sharding.Mesh`` + NamedSharding over ICI.
- Pallas kernels for the hot ops (cost volume).
"""

__version__ = "0.1.0"

from arflow_tpu.utils.hostmem import configure_host_allocator

# Keep large host buffers (decoded/augmented frames) on the reusable heap
# free-list instead of per-allocation mmaps — see utils/hostmem.py for the
# measurements. ARFLOW_HOST_ALLOC=0 opts out.
configure_host_allocator()

from arflow_tpu.config import Config, load_config  # noqa: F401
