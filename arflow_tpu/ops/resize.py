"""Image / flow resizing with exact torch ``F.interpolate`` semantics.

The reference mixes three conventions:
- bilinear align_corners=False for pyramid up/downsampling
  (utils/uflow_utils.py:163-204),
- bilinear align_corners=True for PWC-Lite flow upsampling
  (models/pwclite.py:178-179) and resize_flow (utils/flow_utils.py:110-118),
- 'area' for multi-scale image pyramids in the ARFlow losses
  (losses/flow_loss.py:63-64).

TPU-first design: resizing is separable and the per-axis interpolation weights
are static once shapes are known, so each resize is two small dense matmuls
(``W_h @ img @ W_w^T``) that run on the MXU — no gathers, no dynamic indexing,
exact parity with torch's weight computation (including the half-pixel clamp
at zero used by align_corners=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, align_corners: bool
) -> np.ndarray:
    """(out_size, in_size) interpolation weight matrix, float32."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        if align_corners:
            if out_size == 1:
                src = np.zeros(1)
            else:
                src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
        else:
            src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
            src = np.maximum(src, 0.0)  # torch clamps the source coord at 0
        x0 = np.floor(src).astype(np.int64)
        x0 = np.minimum(x0, in_size - 1)
        x1 = np.minimum(x0 + 1, in_size - 1)
        w1 = src - x0
        np.add.at(m, (np.arange(out_size), x0), 1.0 - w1)
        np.add.at(m, (np.arange(out_size), x1), w1)
    elif mode == "area":
        # torch mode='area' == adaptive_avg_pool: integer cell boundaries.
        for i in range(out_size):
            start = (i * in_size) // out_size
            end = -((-(i + 1) * in_size) // out_size)  # ceil
            m[i, start:end] = 1.0 / (end - start)
    else:
        raise NotImplementedError(mode)
    return m.astype(np.float32)


def _resize(img: jnp.ndarray, out_hw, mode: str, align_corners: bool) -> jnp.ndarray:
    b, h, w, c = img.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if (oh, ow) == (h, w):
        return img
    dtype = img.dtype
    mh = jnp.asarray(_resize_matrix(h, oh, mode, align_corners), dtype)
    mw = jnp.asarray(_resize_matrix(w, ow, mode, align_corners), dtype)
    # HIGHEST precision: interpolation weights must not be bf16-rounded
    # (flow values feed warping; the default TPU matmul precision is bf16).
    hi = jax.lax.Precision.HIGHEST
    out = jnp.einsum("oh,bhwc->bowc", mh, img, precision=hi)
    out = jnp.einsum("ow,bhwc->bhoc", mw, out, precision=hi)
    return out


def resize_bilinear(img: jnp.ndarray, out_hw, align_corners: bool = False) -> jnp.ndarray:
    return _resize(img, out_hw, "bilinear", align_corners)


def resize_area(img: jnp.ndarray, out_hw) -> jnp.ndarray:
    return _resize(img, out_hw, "area", False)


def upsample(img: jnp.ndarray, is_flow: bool, scale_factor: float = 2.0) -> jnp.ndarray:
    """uflow upsample (utils/uflow_utils.py:163-182): bilinear a_c=False; flow scaled."""
    h, w = img.shape[-3], img.shape[-2]
    out = resize_bilinear(img, (int(h * scale_factor), int(w * scale_factor)), False)
    if is_flow:
        out = out * scale_factor
    return out


def downsample(img: jnp.ndarray, is_flow: bool, scale_factor: float = 2.0) -> jnp.ndarray:
    """uflow downsample (utils/uflow_utils.py:185-204)."""
    h, w = img.shape[-3], img.shape[-2]
    out = resize_bilinear(img, (int(h / scale_factor), int(w / scale_factor)), False)
    if is_flow:
        out = out / scale_factor
    return out


def resize_flow(flow: jnp.ndarray, new_shape, align_corners: bool = False) -> jnp.ndarray:
    """Resize a flow field and rescale its values (utils/flow_utils.py:110-118)."""
    h, w = flow.shape[-3], flow.shape[-2]
    nh, nw = int(new_shape[0]), int(new_shape[1])
    out = resize_bilinear(flow, (nh, nw), align_corners)
    scale = jnp.array([nw / w, nh / h], dtype=flow.dtype)
    return out * scale


def image_grads(image: jnp.ndarray, stride: int = 1):
    """Forward differences along W then H (utils/uflow_utils.py:207-210). NHWC."""
    gx = image[:, :, stride:, :] - image[:, :, :-stride, :]
    gy = image[:, stride:, :, :] - image[:, :-stride, :, :]
    return gx, gy
