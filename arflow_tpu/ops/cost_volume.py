"""Local correlation cost volume and feature normalization.

Reference: models/uflow_model.py:53-92 (shift-and-multiply cost volume, mean
over channels) and models/correlation_native.py:13-23 (identical math for the
PWC-Lite family; the CUDA kernel in models/correlation_package normalizes by
K^2*C with K=1, i.e. also a channel mean).

Channel order matches the reference: displacement (dy, dx) with dy-major,
i.e. output channel (dy + md) * (2*md + 1) + (dx + md).

The default JAX formulation (81 shifted elementwise products) fuses well under
XLA; a fused Pallas kernel lives in arflow_tpu/ops/pallas/cost_volume_pallas.py
and is used automatically on TPU for supported shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def compute_cost_volume_reference(
    features1: jnp.ndarray, features2: jnp.ndarray, max_displacement: int = 4
) -> jnp.ndarray:
    """(B,H,W,C) x (B,H,W,C) -> (B,H,W,(2*md+1)**2), pure-JAX reference."""
    b, h, w, c = features1.shape
    md = max_displacement
    if md <= 0:
        raise ValueError(f"Max displacement of {md} is too small.")
    # NOTE: unlike uflow_model.py:71-72 we don't reject md >= height — the
    # padded shifted-product formulation is well-defined for any size (the
    # PWC-Lite correlation, models/correlation_native.py, has no such check).
    num_shifts = 2 * md + 1
    f2_padded = jnp.pad(features2, ((0, 0), (md, md), (md, md), (0, 0)))
    costs = []
    for i in range(num_shifts):
        for j in range(num_shifts):
            shifted = lax.dynamic_slice(f2_padded, (0, i, j, 0), (b, h, w, c))
            costs.append(jnp.mean(features1 * shifted, axis=-1))
    return jnp.stack(costs, axis=-1)


def compute_cost_volume(
    features1: jnp.ndarray,
    features2: jnp.ndarray,
    max_displacement: int = 4,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Cost volume; dispatches to the fused Pallas kernel on TPU when possible."""
    if use_pallas is None:
        # Default ON for every supported shape on TPU (measured, BASELINE.md):
        # the v2 kernel + its shifted-product custom VJP beat XLA's fusion at
        # all training and inference level shapes, fwd AND fwd+grad —
        # 1.4-1.8x at 256x448 training levels (scan-amortized
        # benchmarks/bench_cost_volume_grad.py), 2.6x end-to-end at 384x640
        # inference. ARFLOW_USE_PALLAS=0/1 force-overrides.
        import os

        env = os.environ.get("ARFLOW_USE_PALLAS")
        if env is not None:
            use_pallas = env == "1"
        else:
            use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        try:
            from arflow_tpu.ops.pallas.cost_volume_pallas import (
                cost_volume_pallas,
                cost_volume_pallas_v2,
                supported,
                supported_v2,
            )

            if supported_v2(features1.shape, max_displacement):
                if features1.dtype == jnp.bfloat16:
                    # The v2 kernel is f32-tuned (bf16 lane-packing makes it
                    # slower than XLA); run it in f32 and cast back. Slightly
                    # HIGHER precision than the bf16 XLA path (documented
                    # bf16-mode divergence).
                    return cost_volume_pallas_v2(
                        features1.astype(jnp.float32),
                        features2.astype(jnp.float32),
                        max_displacement,
                    ).astype(jnp.bfloat16)
                return cost_volume_pallas_v2(
                    features1, features2, max_displacement
                )
            if supported(features1.shape, max_displacement):
                if features1.dtype == jnp.bfloat16:
                    # Same f32 round-trip as the v2 path: the v1 kernel
                    # accumulates in the input dtype, so bf16 inputs would
                    # otherwise lose the accumulation precision the cast
                    # above was added to preserve.
                    return cost_volume_pallas(
                        features1.astype(jnp.float32),
                        features2.astype(jnp.float32),
                        max_displacement,
                    ).astype(jnp.bfloat16)
                return cost_volume_pallas(features1, features2, max_displacement)
        except ImportError:
            pass
    return compute_cost_volume_reference(features1, features2, max_displacement)


def normalize_features(
    feature_list,
    normalize: bool,
    center: bool,
    moments_across_channels: bool,
    moments_across_images: bool,
):
    """Feature normalization before the cost volume (uflow_model.py:8-50).

    Variance uses the unbiased estimator to match ``torch.var``.
    """
    axes = (1, 2, 3) if moments_across_channels else (1, 2)

    means = []
    variances = []
    for f in feature_list:
        mean = jnp.mean(f, axis=axes, keepdims=True)
        n = 1
        for a in axes:
            n *= f.shape[a]
        var = jnp.sum(jnp.square(f - mean), axis=axes, keepdims=True) / max(n - 1, 1)
        means.append(mean)
        variances.append(var)

    if moments_across_images:
        mean_all = sum(means) / len(means)
        var_all = sum(variances) / len(variances)
        means = [mean_all] * len(means)
        variances = [var_all] * len(variances)

    stds = [jnp.sqrt(v + 1e-16) for v in variances]
    if center:
        feature_list = [f - m for f, m in zip(feature_list, means)]
    if normalize:
        feature_list = [f / s for f, s in zip(feature_list, stds)]
    return feature_list
