"""Fused Pallas TPU kernel for the local-correlation cost volume.

Replaces the reference CUDA correlation kernel
(models/correlation_package/correlation_cuda_kernel.cu:42-114) the TPU way:
each kernel instance holds an H-tile of the feature map plus the haloed tile
of the padded counterpart in VMEM and emits all (2*md+1)^2 channel-mean dot
products in one fused pass — no HBM round trips for the 81 shifted products.

Numerics match models/correlation_native.py:13-23 / uflow_model.py:53-92
exactly (mean over channels, zero padding), verified by parity tests in
interpret mode and against the XLA reference formulation.

VMEM accounting: blocks are lane-padded to 128, double-buffered by the
pipeline; ``supported()`` budgets conservatively and the grid tiles H so the
per-instance footprint stays well under the ~16 MiB scoped limit.

Backward: custom VJP with the shifted-product adjoints (mirroring
correlation_cuda_kernel.cu:117-300), currently lowered via XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 13 * 1024 * 1024  # headroom under the ~16 MiB scoped VMEM limit


def _ceil(a, b):
    return -(-a // b)


def _pad_lane(c):
    return _ceil(c, 128) * 128


def _tile_h(h: int, w: int, c: int, md: int) -> int:
    """Largest H-tile whose double-buffered footprint fits the budget."""
    num_shifts = 2 * md + 1
    for th in (32, 16, 8):
        th_eff = min(th, h)
        f1 = th_eff * w * _pad_lane(c) * 4
        f2p = (th_eff + 2 * md) * (w + 2 * md) * _pad_lane(c) * 4
        out = th_eff * w * _pad_lane(num_shifts**2) * 4
        # One row-shift group of product temporaries is alive at a time
        # (the kernel writes per-group); Mosaic's stack allocator is
        # conservative, so budget all of them.
        temps = num_shifts * f1
        if 2 * (f1 + f2p + out) + temps < _VMEM_BUDGET:
            return th_eff
    return 0


def supported(f1_shape, max_displacement: int) -> bool:
    if len(f1_shape) != 4:
        return False
    _, h, w, c = f1_shape
    # _tile_h returns 0 for shapes the kernel can't tile (uneven H tiles
    # would need masked edge handling) — those fall back to the XLA path.
    return _tile_h(h, w, c, max_displacement) > 0


def _fwd_kernel(f1_ref, f2p_ref, out_ref, *, num_shifts: int, c: int):
    f1 = f1_ref[0]
    th, w = f1.shape[0], f1.shape[1]
    # Write one row-shift group (num_shifts channels) at a time so only that
    # group's product temporaries are live (a single 81-way stack makes
    # Mosaic's stack allocator hold all 81 (th, w, c) products -> VMEM OOM).
    for i in range(num_shifts):
        group = []
        for j in range(num_shifts):
            f2 = f2p_ref[0, i : i + th, j : j + w, :]
            group.append(jnp.sum(f1 * f2, axis=-1) / c)
        out_ref[0, :, :, i * num_shifts : (i + 1) * num_shifts] = jnp.stack(
            group, axis=-1
        )


def _call_fwd(f1, f2, md: int):
    b, h, w, c = f1.shape
    num_shifts = 2 * md + 1
    th = _tile_h(h, w, c, md)
    if th <= 0:
        raise ValueError("shape unsupported for the pallas cost volume")
    # Pad H so tiles divide evenly (zero rows produce zero costs, sliced off).
    h_pad = _ceil(h, th) * th
    f1p = jnp.pad(f1, ((0, 0), (0, h_pad - h), (0, 0), (0, 0)))
    f2p = jnp.pad(
        f2, ((0, 0), (md, md + h_pad - h), (md, md), (0, 0))
    )
    kernel = functools.partial(_fwd_kernel, num_shifts=num_shifts, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(b, h_pad // th),
        in_specs=[
            pl.BlockSpec(
                (1, th, w, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # Haloed tile: rows [j*th, j*th + th + 2*md). BlockSpecs address
            # non-overlapping blocks, so the overlapping windows are
            # pre-stacked by _halo_stack into a (B*n_tiles, th+2md, W+2md, C)
            # array indexed here by flat (batch, tile).
            pl.BlockSpec(
                (1, th + 2 * md, w + 2 * md, c),
                lambda i, j, _n=h_pad // th: (i * _n + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, num_shifts**2), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_pad, w, num_shifts**2), f1.dtype),
        interpret=jax.default_backend() != "tpu",
    )(f1p, _halo_stack(f2p, th, md, h_pad))
    return out[:, :h]


def _halo_stack(f2p, th: int, md: int, h_pad: int):
    """Materialize overlapping H-tiles of the padded features.

    BlockSpec index maps address non-overlapping blocks only, so the haloed
    windows (th + 2*md rows, stride th) are pre-stacked into a
    (B, n_tiles, th+2md, W+2md, C) array — XLA lowers this to cheap strided
    copies, and each kernel instance then reads its own block.
    """
    n_tiles = h_pad // th
    windows = [
        f2p[:, j * th : j * th + th + 2 * md] for j in range(n_tiles)
    ]
    return jnp.stack(windows, axis=1).reshape(
        f2p.shape[0] * n_tiles, th + 2 * md, f2p.shape[2], f2p.shape[3]
    )


def _grad_shifted(g, f1, f2, md: int):
    """Backward pass via shifted products (XLA; fused well by the compiler).

    grad_f1[:, y, x, c] = sum_k g[:, y, x, k] * f2[:, y+dy_k, x+dx_k, c] / C
    grad_f2[:, y, x, c] = sum_k g[:, y-dy_k, x-dx_k, k] * f1[:, y-dy_k, x-dx_k, c] / C
    """
    b, h, w, c = f1.shape
    num_shifts = 2 * md + 1
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))

    grad_f1 = jnp.zeros_like(f1)
    for i in range(num_shifts):
        for j in range(num_shifts):
            k = i * num_shifts + j
            shifted = jax.lax.dynamic_slice(f2p, (0, i, j, 0), (b, h, w, c))
            grad_f1 = grad_f1 + g[..., k : k + 1] * shifted / c

    gp = jnp.pad(g, ((0, 0), (md, md), (md, md), (0, 0)))
    f1p = jnp.pad(f1, ((0, 0), (md, md), (md, md), (0, 0)))
    grad_f2 = jnp.zeros_like(f2)
    for i in range(num_shifts):
        for j in range(num_shifts):
            k = i * num_shifts + j
            gs = jax.lax.dynamic_slice(
                gp, (0, 2 * md - i, 2 * md - j, 0), (b, h, w, num_shifts**2)
            )[..., k : k + 1]
            f1s = jax.lax.dynamic_slice(
                f1p, (0, 2 * md - i, 2 * md - j, 0), (b, h, w, c)
            )
            grad_f2 = grad_f2 + gs * f1s / c
    return grad_f1, grad_f2


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cost_volume_pallas(f1, f2, max_displacement: int = 4):
    return _call_fwd(f1, f2, max_displacement)


def _vjp_fwd(f1, f2, md):
    return _call_fwd(f1, f2, md), (f1, f2)


def _vjp_bwd(md, res, g):
    f1, f2 = res
    return _grad_shifted(g, f1, f2, md)


cost_volume_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# v2: lane-transposed kernel — W in the lane dimension, C in sublanes.
#
# The v1 layout keeps C (=32) in lanes, wasting 3/4 of each 128-lane vector
# and losing to XLA's own fusion. Here inputs are transposed to (.., C, W):
# each (dy, dx) displacement is one (th, C, W) elementwise multiply reduced
# over the C sublanes, with dx realized as a static lane shift — full lane
# utilization, one contiguous (th, W) write per displacement.
# ---------------------------------------------------------------------------

def _fwd_kernel_v2(f1_ref, f2_ref, out_ref, *, num_shifts: int, c: int,
                   th: int, w: int):
    f1 = f1_ref[0]  # (th, C, W)
    for dy in range(num_shifts):
        f2_dy = f2_ref[0, dy : dy + th, :, :]  # (th, C, W + 2md)
        for dx in range(num_shifts):
            prod = f1 * f2_dy[:, :, dx : dx + w]
            out_ref[0, dy * num_shifts + dx] = jnp.sum(prod, axis=1) / c


def supported_v2(f1_shape, max_displacement: int) -> bool:
    if len(f1_shape) != 4:
        return False
    _, h, w, c = f1_shape
    md = max_displacement
    th = 8
    wp = _pad_lane(w)
    need = (
        2 * (th * c * wp + (th + 2 * md) * c * _pad_lane(w + 2 * md)
             + (2 * md + 1) ** 2 * th * wp)
        + 4 * th * c * wp  # product temporaries headroom
    ) * 4
    return need < _VMEM_BUDGET and h >= 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cost_volume_pallas_v2(f1, f2, max_displacement: int = 4):
    """Lane-transposed cost volume with the shifted-product custom VJP."""
    return _call_fwd_v2(f1, f2, max_displacement)


def _v2_vjp_fwd(f1, f2, md):
    return _call_fwd_v2(f1, f2, md), (f1, f2)


def _v2_vjp_bwd(md, res, g):
    f1, f2 = res
    return _grad_shifted(g, f1, f2, md)


def _call_fwd_v2(f1, f2, max_displacement: int = 4):
    """Forward pass of the lane-transposed kernel."""
    b, h, w, c = f1.shape
    md = max_displacement
    num_shifts = 2 * md + 1
    th = 8
    h_pad = _ceil(h, th) * th

    # (B, H, C, W) layouts.
    f1_t = jnp.transpose(
        jnp.pad(f1, ((0, 0), (0, h_pad - h), (0, 0), (0, 0))), (0, 1, 3, 2)
    )
    f2_t = jnp.transpose(
        jnp.pad(f2, ((0, 0), (md, md + h_pad - h), (md, md), (0, 0))),
        (0, 1, 3, 2),
    )
    n_tiles = h_pad // th
    # Halo-stacked (B*n_tiles, th+2md, C, W+2md).
    windows = [f2_t[:, j * th : j * th + th + 2 * md] for j in range(n_tiles)]
    f2_st = jnp.stack(windows, axis=1).reshape(
        b * n_tiles, th + 2 * md, c, w + 2 * md
    )

    kernel = functools.partial(
        _fwd_kernel_v2, num_shifts=num_shifts, c=c, th=th, w=w
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, th, c, w),
                lambda i, j, _n=n_tiles: (i * _n + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, th + 2 * md, c, w + 2 * md),
                lambda i, j, _n=n_tiles: (i * _n + j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_shifts**2, th, w),
            lambda i, j, _n=n_tiles: (i * _n + j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b * n_tiles, num_shifts**2, th, w), f1.dtype
        ),
        interpret=jax.default_backend() != "tpu",
    )(f1_t.reshape(b * n_tiles, th, c, w), f2_st)
    # (B*n_tiles, K, th, W) -> (B, H, W, K)
    out = out.reshape(b, n_tiles, num_shifts**2, th, w)
    out = jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(
        b, h_pad, w, num_shifts**2
    )
    return out[:, :h]


cost_volume_pallas_v2.defvjp(_v2_vjp_fwd, _v2_vjp_bwd)
