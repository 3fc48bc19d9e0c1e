"""SSIM losses (uflow decomposed variant and ARFlow-era variant).

Reference: utils/uflow_utils.py:309-334 (SAME padding, count_include_pad) and
losses/loss_blocks.py:65-84 (VALID padding). Average pooling is a
``lax.reduce_window`` sum divided by the full window size, matching torch's
``nn.AvgPool2d(count_include_pad=True)``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from arflow_tpu.ops.census import zero_mask_border


def avg_pool(x: jnp.ndarray, patch_size: int, padding: str = "SAME") -> jnp.ndarray:
    """NHWC stride-1 average pooling; zero-pad counted in the divisor."""
    if padding == "SAME":
        pad = patch_size // 2
        pads = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    else:
        pads = ((0, 0), (0, 0), (0, 0), (0, 0))
    summed = lax.reduce_window(
        x, 0.0, lax.add, (1, patch_size, patch_size, 1), (1, 1, 1, 1), pads
    )
    return summed / float(patch_size * patch_size)


def _moments(image_a, image_b, patch_size, padding):
    mu_x = avg_pool(image_a, patch_size, padding)
    mu_y = avg_pool(image_b, patch_size, padding)
    sigma_x = avg_pool(image_a * image_a, patch_size, padding) - mu_x**2
    sigma_y = avg_pool(image_b * image_b, patch_size, padding) - mu_y**2
    sigma_xy = avg_pool(image_a * image_b, patch_size, padding) - mu_x * mu_y
    return mu_x, mu_y, sigma_x, sigma_y, sigma_xy


def ssim_loss(
    image_a: jnp.ndarray,
    image_b: jnp.ndarray,
    mask: jnp.ndarray,
    patch_size: int = 7,
    num_groups: int = 1,
):
    """Decomposed SSIM distance + normalized weights (uflow_utils.py:309-334).

    Returns ([d1_sq, d2_sq], padded_mask / sum(padded_mask)). ``num_groups``
    normalizes the weights per batch group (see census_loss_no_penalty).
    """
    from arflow_tpu.ops.census import _group_normalize

    c1 = 0.01**2
    c2 = 0.03**2
    mu_x, mu_y, sigma_x, sigma_y, sigma_xy = _moments(image_a, image_b, patch_size, "SAME")

    s1 = (2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)
    s2 = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    d1_sq = jnp.clip(1 - s1, 0.0, 1.0)
    d2_sq = jnp.clip(1 - s2, 0.0, 1.0)

    padded_mask = zero_mask_border(mask, patch_size)
    return [d1_sq, d2_sq], _group_normalize(padded_mask, num_groups)


def ssim_dist(x: jnp.ndarray, y: jnp.ndarray, md: int = 1) -> jnp.ndarray:
    """ARFlow-era SSIM distance map, VALID padding (losses/loss_blocks.py:65-84)."""
    patch_size = 2 * md + 1
    c1 = 0.01**2
    c2 = 0.03**2
    mu_x, mu_y, sigma_x, sigma_y, sigma_xy = _moments(x, y, patch_size, "VALID")

    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    ssim = ssim_n / ssim_d
    return jnp.clip((1 - ssim) / 2, 0.0, 1.0)
