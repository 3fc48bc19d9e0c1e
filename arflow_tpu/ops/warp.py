"""Warping / resampling ops (uflow and ARFlow conventions).

Reference semantics reproduced (file:line cite into /root/reference):
- ``flow_to_warp``: utils/uflow_utils.py:6-32 (grid + flow, u then v).
- ``resample``: utils/uflow_utils.py:53-77 — bilinear ``grid_sample`` with
  ``align_corners=True`` and zeros padding. Because align_corners=True
  normalization round-trips to raw pixel coordinates, this is exactly a
  bilinear gather at pixel coords with per-tap zero fill outside the image.
- ``mask_invalid``: utils/uflow_utils.py:35-50.
- ``flow_warp``: utils/warp_utils.py:83-90 — ARFlow-era warp with configurable
  padding mode and align_corners. align_corners=False maps pixel coord x to
  ``x * W / (W-1) - 0.5`` before the gather (grid_sample normalization math).
- ``border_mask``: utils/warp_utils.py:119-134 (strict inequalities).

TPU note: the gather is expressed as ``jnp.take_along_axis`` over the
flattened spatial dim, which XLA lowers to a single gather per tap; the four
taps and weighting fuse into the surrounding computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_to_warp(flow: jnp.ndarray) -> jnp.ndarray:
    """Compute warp coordinates (endpoints) from flow. NHWC, channels (u, v)."""
    h, w = flow.shape[-3], flow.shape[-2]
    x = jnp.arange(w, dtype=flow.dtype)
    y = jnp.arange(h, dtype=flow.dtype)
    grid = jnp.stack(jnp.meshgrid(x, y, indexing="xy"), axis=-1)  # (H, W, 2)
    return flow + grid


def mask_invalid(coords: jnp.ndarray) -> jnp.ndarray:
    """1.0 where warp coords land inside the image, else 0.0. (B,H,W,1)."""
    h, w = coords.shape[-3], coords.shape[-2]
    x, y = coords[..., 0], coords[..., 1]
    valid = (x >= 0.0) & (x <= w - 1.0) & (y >= 0.0) & (y <= h - 1.0)
    return valid[..., None].astype(coords.dtype)


def _gather_taps(
    source: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding: str = "zeros",
):
    """Packed 2x2-neighborhood gather shared by the bilinear samplers.

    Returns ``(taps, x, y, x0, y0, oob_mask, c)``: taps (..., 4C) ordered
    [(y0,x0), (y0,x1), (y1,x0), (y1,x1)], the coords AFTER 'border'
    clamping (weights must be computed from these, not the caller's), the
    floor coords, the zeros-padding validity mask (None for 'border'),
    and the channel count.
    """
    b, h, w, c = source.shape
    if padding == "border":
        x = jnp.clip(x, 0.0, w - 1.0)
        y = jnp.clip(y, 0.0, h - 1.0)
        # Edge padding: the +1 taps at the border re-read the edge pixel.
        srcp = jnp.pad(source, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ix = x0.astype(jnp.int32)
        iy = y0.astype(jnp.int32)
        oob_mask = None
    else:
        # Zeros padding: pack over a zero-padded (H+2, W+2) canvas so the
        # tap window for any x0 in [-1, W-1] is addressable; coordinates
        # entirely outside [-1, S) contribute nothing (masked below).
        srcp = jnp.pad(source, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        ix = (jnp.clip(x0, -1, w - 1) + 1).astype(jnp.int32)
        iy = (jnp.clip(y0, -1, h - 1) + 1).astype(jnp.int32)
        oob_mask = (
            (x >= -1.0) & (x < w) & (y >= -1.0) & (y < h)
        ).astype(source.dtype)[..., None]

    # Packed 2x2 neighborhoods: P[..., 0:C]=(y0,x0), [C:2C]=(y0,x1),
    # [2C:3C]=(y1,x0), [3C:4C]=(y1,x1).
    packed = jnp.concatenate(
        [
            srcp[:, :-1, :-1, :],
            srcp[:, :-1, 1:, :],
            srcp[:, 1:, :-1, :],
            srcp[:, 1:, 1:, :],
        ],
        axis=-1,
    )
    ph, pw = packed.shape[1], packed.shape[2]
    flat = packed.reshape(b, ph * pw, 4 * c)
    idx = (iy * pw + ix).reshape(b, -1, 1)
    hw = idx.shape[1]
    # XLA's TPU gather falls off a per-descriptor performance cliff above
    # ~1M indices in one op (measured: 7ns/px at 0.9M -> 25ns/px at 1.8M).
    # Chunk the batch so each gather stays under ~0.5M descriptors: at
    # 16x256x448 this is 3.7x faster than one big gather.
    chunk_b = max(1, (512 * 1024) // max(hw, 1))
    chunks = []
    for i in range(0, b, chunk_b):
        t = jnp.take_along_axis(flat[i : i + chunk_b], idx[i : i + chunk_b],
                                axis=1)
        # MISCOMPILE GUARD (do not remove): on the TPU backend, fusing this
        # gather with the 4D output reshape deterministically corrupts the
        # gathered values for large flat indices (observed 2026-08-16: ~45%
        # of taps wrong / NaN-filled at 8x256x448; bit-identical across
        # runs, i.e. a compiler bug, not flaky hardware). The barrier keeps
        # the gather un-fused from the reshape; verified to restore exact
        # values (tests/test_warp_gather_guard.py).
        chunks.append(jax.lax.optimization_barrier(t))
    taps = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    taps = taps.reshape(x.shape + (4 * c,))
    return taps, x, y, x0, y0, oob_mask, c


def bilinear_gather(
    source: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sample of ``source`` (B,H,W,C) at pixel coords x, y (B,Hq,Wq).

    padding='zeros': out-of-range taps contribute zero (grid_sample zeros).
    padding='border': coordinates are clamped to the image (grid_sample border).

    TPU-first formulation: the four neighborhood taps are pre-packed into the
    channel dimension of one (H+1, W+1, 4C) tensor, so the warp is a SINGLE
    XLA gather with a 4C-lane payload instead of four 1-tap gathers (4x fewer
    gather descriptors, 4x better lane utilization; for C=32 features the
    payload is exactly 128 lanes). ~3x faster than the 4-gather version on
    TPU for full-resolution image warps.
    """
    taps, x, y, x0, y0, oob_mask, c = _gather_taps(source, x, y, padding)
    wx1 = (x - x0)[..., None]
    wy1 = (y - y0)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out = (
        wy0 * (wx0 * taps[..., 0 * c : 1 * c] + wx1 * taps[..., 1 * c : 2 * c])
        + wy1 * (wx0 * taps[..., 2 * c : 3 * c] + wx1 * taps[..., 3 * c : 4 * c])
    )
    if oob_mask is not None:
        out = out * oob_mask
    return out


def bilinear_gather_with_grads(
    source: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    padding: str = "zeros",
):
    """Bilinear sample + analytic spatial partials from the SAME 4 taps.

    Returns ``(value, d/dx, d/dy)`` of the bilinear interpolant at (x, y).
    Within a 2x2 cell the interpolant is bilinear in (x, y), so

        d/dx = wy0*(t01 - t00) + wy1*(t11 - t10)
        d/dy = wx0*(t10 - t00) + wx1*(t11 - t01)

    are its EXACT derivatives — no finite-difference approximation — and
    cost zero extra gathers (the taps are shared with the value). Used by
    the opt-in Taylor-warp ELBO fast path (losses/blocks.py): one gather at
    the posterior mean replaces n_samples gathers, with each sampled
    reconstruction linearized as value + grad . delta.
    """
    taps, x, y, x0, y0, oob_mask, c = _gather_taps(source, x, y, padding)
    t00 = taps[..., 0 * c : 1 * c]
    t01 = taps[..., 1 * c : 2 * c]
    t10 = taps[..., 2 * c : 3 * c]
    t11 = taps[..., 3 * c : 4 * c]
    wx1 = (x - x0)[..., None]
    wy1 = (y - y0)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    val = wy0 * (wx0 * t00 + wx1 * t01) + wy1 * (wx0 * t10 + wx1 * t11)
    gx = wy0 * (t01 - t00) + wy1 * (t11 - t10)
    gy = wx0 * (t10 - t00) + wx1 * (t11 - t01)
    if oob_mask is not None:
        val = val * oob_mask
        gx = gx * oob_mask
        gy = gy * oob_mask
    return val, gx, gy


def resample_with_grads(source: jnp.ndarray, coords: jnp.ndarray):
    """``resample`` + exact spatial partials of the bilinear interpolant.

    Same uflow grid_sample(align_corners=True, zeros) semantics as
    ``resample``; see ``bilinear_gather_with_grads``.
    """
    return bilinear_gather_with_grads(
        source, coords[..., 0], coords[..., 1], padding="zeros"
    )


def resample(source: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Resample ``source`` (B,H,W,C) at warp ``coords`` (B,H,W,2), uflow style.

    Equivalent to grid_sample(align_corners=True, padding_mode='zeros') on
    align_corners-normalized coords (utils/uflow_utils.py:53-77).
    """
    return bilinear_gather(source, coords[..., 0], coords[..., 1], padding="zeros")


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    pad: str = "zeros",
    align_corners: bool = True,
) -> jnp.ndarray:
    """ARFlow-era warp (utils/warp_utils.py:83-90): sample x at grid + flow.

    align_corners=False reproduces grid_sample's half-pixel remap of the
    align_corners-normalized grid: pixel coord p -> p * S / (S - 1) - 0.5.
    """
    coords = flow_to_warp(flow)
    cx, cy = coords[..., 0], coords[..., 1]
    if not align_corners:
        h, w = x.shape[-3], x.shape[-2]
        cx = cx * w / max(w - 1, 1) - 0.5
        cy = cy * h / max(h - 1, 1) - 0.5
    return bilinear_gather(x, cx, cy, padding=pad)


def border_mask(flow: jnp.ndarray) -> jnp.ndarray:
    """Mask of pixels whose correspondence lands strictly inside the borders.

    Reference: utils/warp_utils.py:119-134 (note strict < / >).
    """
    h, w = flow.shape[-3], flow.shape[-2]
    coords = flow_to_warp(flow)
    x, y = coords[..., 0], coords[..., 1]
    valid = (x > 0.0) & (x < w - 1.0) & (y > 0.0) & (y < h - 1.0)
    return valid[..., None].astype(flow.dtype)
