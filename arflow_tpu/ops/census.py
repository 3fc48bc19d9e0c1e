"""Census (ternary) transform and census loss (uflow/DDFlow recipe).

Reference: utils/uflow_utils.py:227-306. The 7x7 patch extraction that the
reference does with an identity-kernel conv (uflow_utils.py:255-257) is
expressed here with ``lax.conv_general_dilated_patches``, which XLA lowers to
cheap shifted reads instead of a 49-channel convolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def rgb_to_grayscale(image: jnp.ndarray) -> jnp.ndarray:
    """NHWC RGB -> (B,H,W,1) grayscale (utils/uflow_utils.py:227-231)."""
    weights = jnp.array([0.2989, 0.5870, 0.1140], dtype=image.dtype)
    return jnp.einsum(
        "...c,c->...", image, weights, precision=lax.Precision.HIGHEST
    )[..., None]


def extract_patches(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B,H,W,1) -> (B,H,W,patch_size**2) zero-padded SAME patches.

    Pure data movement: static shifted slices of one padded canvas (exact,
    and much cheaper on TPU than the identity-kernel convolution the
    reference uses, uflow_utils.py:255-257 — a 49-channel conv at full
    precision). Channel k corresponds to tap (k // P, k % P), matching the
    reference's eye-kernel ordering.
    """
    b, h, w, c = x.shape
    assert c == 1
    pad = patch_size // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    taps = [
        xp[:, i : i + h, j : j + w, 0]
        for i in range(patch_size)
        for j in range(patch_size)
    ]
    return jnp.stack(taps, axis=-1)


def census_transform(image: jnp.ndarray, patch_size: int = 7) -> jnp.ndarray:
    """DDFlow census transform (utils/uflow_utils.py:241-261)."""
    intensities = rgb_to_grayscale(image) * 255.0
    neighbors = extract_patches(intensities, patch_size)
    diff = neighbors - intensities
    return diff / jnp.sqrt(0.81 + jnp.square(diff))


def soft_hamming(a: jnp.ndarray, b: jnp.ndarray, thresh: float = 0.1) -> jnp.ndarray:
    """Soft hamming distance, summed over features (utils/uflow_utils.py:264-279)."""
    sq_dist = jnp.square(a - b)
    soft = sq_dist / (thresh + sq_dist)
    return jnp.sum(soft, axis=-1, keepdims=True)


def zero_mask_border(mask: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Zero a border of patch_size//2 pixels (utils/uflow_utils.py:234-238)."""
    pad = patch_size // 2
    h, w = mask.shape[-3], mask.shape[-2]
    border = jnp.zeros((h, w, 1), dtype=mask.dtype)
    border = border.at[pad : h - pad, pad : w - pad, :].set(1.0)
    return mask * border


def abs_robust_loss(diff: jnp.ndarray, eps: float = 0.01, q: float = 0.4) -> jnp.ndarray:
    """(|d| + eps)^q (utils/uflow_utils.py:213-214)."""
    return jnp.power(jnp.abs(diff) + eps, q)


def robust_l1(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(x + 1e-6)-style robust L1 (utils/uflow_utils.py:337-338)."""
    return jnp.sqrt(x + 0.001**2)


def census_loss(
    image_a: jnp.ndarray,
    image_b: jnp.ndarray,
    mask: jnp.ndarray,
    patch_size: int = 7,
    num_groups: int = 1,
) -> jnp.ndarray:
    """Masked census loss (utils/uflow_utils.py:282-293).

    ``num_groups > 1`` splits the batch into equal groups and returns one
    loss per group (each normalized by its own mask sum) — lets callers
    batch the forward and backward directions through ONE census/gather
    pipeline and still get the reference's per-direction normalization.
    """
    hamming, _ = _census_dist(image_a, image_b, patch_size)
    padded_mask = zero_mask_border(mask, patch_size)
    diff = abs_robust_loss(hamming) * padded_mask
    if num_groups == 1:
        denom = jnp.sum(lax.stop_gradient(padded_mask)) + 1e-6
        return jnp.sum(diff) / denom
    diff_g = diff.reshape((num_groups, -1))
    mask_g = lax.stop_gradient(padded_mask).reshape((num_groups, -1))
    return jnp.sum(diff_g, axis=1) / (jnp.sum(mask_g, axis=1) + 1e-6)


def census_loss_no_penalty(
    image_a: jnp.ndarray,
    image_b: jnp.ndarray,
    mask: jnp.ndarray,
    patch_size: int = 7,
    num_groups: int = 1,
    a_rep: int = 1,
):
    """Per-pixel census distance + normalized weight (uflow_utils.py:296-306).

    ``num_groups > 1`` splits the batch into equal groups, each weight map
    normalized by its own group's mask sum — lets the ELBO loss batch the
    fw and bw directions through ONE census pipeline while preserving the
    reference's per-direction normalization.

    ``a_rep > 1``: image_a holds one copy per group while image_b holds
    ``a_rep`` MC-sample copies (sample-major within each group, the ELBO's
    ``_tile`` layout) — image_a's census transform is computed ONCE per
    group and broadcast against the samples instead of transforming the
    same target image ``a_rep`` times.
    """
    if a_rep == 1:
        hamming, _ = _census_dist(image_a, image_b, patch_size)
    else:
        ca = census_transform(image_a, patch_size)
        cb = census_transform(image_b, patch_size)
        b_small = image_a.shape[0] // num_groups
        tail = cb.shape[1:]
        ca5 = ca.reshape((num_groups, 1, b_small) + tail)
        cb5 = cb.reshape((num_groups, a_rep, b_small) + tail)
        hamming = soft_hamming(ca5, cb5).reshape(
            (num_groups * a_rep * b_small,) + tail[:-1] + (1,)
        )
    padded_mask = zero_mask_border(mask, patch_size)
    return hamming, _group_normalize(padded_mask, num_groups)


def _group_normalize(padded_mask, num_groups):
    """mask / per-group-sum(mask), groups along axis 0."""
    if num_groups == 1:
        denom = jnp.sum(lax.stop_gradient(padded_mask)) + 1e-6
        return padded_mask / denom
    b = padded_mask.shape[0]
    mask_g = lax.stop_gradient(padded_mask).reshape((num_groups, -1))
    denom = jnp.sum(mask_g, axis=1) + 1e-6  # (G,)
    denom = jnp.repeat(denom, b // num_groups).reshape(
        (b,) + (1,) * (padded_mask.ndim - 1)
    )
    return padded_mask / denom


def _census_dist(image_a, image_b, patch_size):
    census_a = census_transform(image_a, patch_size)
    census_b = census_transform(image_b, patch_size)
    return soft_hamming(census_a, census_b), None
