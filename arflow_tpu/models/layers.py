"""Layer primitives with torch-equivalent geometry (padding / transpose-conv).

All convs use explicit symmetric padding ``((k-1)*dilation)//2`` so that
strided convs align taps exactly like torch's ``padding=p`` (XLA's 'SAME'
shifts taps for even inputs at stride 2, which would break checkpoint parity).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# Reference inits: xavier_uniform for the uflow family
# (models/uflow_model.py:124-136), kaiming_normal(fan_in) for pwclite
# (models/pwclite.py:149-159) and uflow_prob (models/uflow_prob_model.py:209-221).
xavier_uniform = jax.nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
kaiming_normal = jax.nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def conv2d(
    features: int,
    kernel_size: int = 3,
    stride: int = 1,
    dilation: int = 1,
    name: str | None = None,
    kernel_init: Callable = xavier_uniform,
    use_bias: bool = True,
    dtype=None,
) -> nn.Conv:
    """dtype: computation dtype (e.g. jnp.bfloat16); params stay float32."""
    pad = ((kernel_size - 1) * dilation) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size, kernel_size),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        kernel_init=kernel_init,
        dtype=dtype,
        name=name,
    )


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope)


def conv_npad_enabled(default: bool = False) -> bool:
    """Trace-time gate for the bf16 thin-N conv workaround
    (``ARFLOW_CONV_NPAD=0/1`` force-overrides).

    Measured (benchmarks/bench_pyramid_probe.py, TPU v5e): XLA's bf16 conv
    emitter runs a 3x3 32->32 conv 2.5x SLOWER than the same conv with 64
    output channels (2.57 vs 1.04 ms at 16x192x320) — output channels are
    free on the MXU up to the 128-lane width, and N=32 triggers a
    pathological bf16 lowering. Zero-padding the kernel to 64 outputs and
    slicing the result back is numerically exact (the padded channels are
    discarded) and sidesteps the slow path.
    """
    import os

    env = os.environ.get("ARFLOW_CONV_NPAD")
    if env is not None:
        return env == "1"
    return default


def int8_pyramid_enabled(default: bool = False) -> bool:
    """Trace-time gate for int8 feature-pyramid convs. ``default`` comes
    from the owning module's ``int8`` attribute (set per-instance by
    ``model.dtype: "int8"`` — never process-global state);
    ``ARFLOW_INT8_PYRAMID=0/1`` is an explicit force-override for A/B runs.
    SERVING-ONLY: the quantization round has zero gradient, so training
    must keep it off (trainers reject both the config and the env form).

    Measured (benchmarks/bench_int8_conv_probe.py, TPU v5e, chained): the
    MXU runs int8 at ~2x the bf16 rate, and XLA lowers int8
    ``conv_general_dilated`` onto it — the pyramid's thin 32-channel convs,
    which sit at a quarter of the ~43% tall-skinny bf16 conv wall
    (BASELINE.md "MFU ceiling analysis"), speed up 1.58x (3x3 32->32 at
    16x192x320) to 1.88x (stride-2 stem). The dense-net decoder conv is
    FASTER in bf16 (0.50 vs 1.37 ms at K=4194) and the refinement stack
    likewise — so quantization covers the pyramid only.
    """
    import os

    env = os.environ.get("ARFLOW_INT8_PYRAMID")
    if env is not None:
        return env == "1"
    return default


def quantized_conv2d(x, kernel, bias, stride, pad):
    """Dynamically-quantized int8 conv: per-SAMPLE symmetric activation
    scales (batch entries never couple — b1 streaming numerics == batched),
    per-OUTPUT-CHANNEL weight scales, int32 MXU accumulation, f32 dequant.
    ``kernel``/``bias`` are the layer's ordinary f32 params (weights are
    quantized at trace time per call; they are tiny next to the conv).
    """
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    ax = jnp.maximum(ax, 1e-6) / 127.0
    xq = jnp.clip(jnp.round(xf / ax), -127.0, 127.0).astype(jnp.int8)
    sw = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    sw = jnp.maximum(sw, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(kernel / sw), -127.0, 127.0).astype(jnp.int8)
    yi = lax.conv_general_dilated(
        xq, wq, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return yi.astype(jnp.float32) * (ax * sw) + bias


def wfold_s1_kernel(k: jnp.ndarray, f: int = 4) -> jnp.ndarray:
    """Remap a (3,3,cin,cout) stride-1 kernel to the W-fold-f layout
    (3, 3, f*cin, f*cout): output phase r of a folded cell j reads original
    columns f*j+r-1 .. f*j+r+1, which span folded cells j-1..j+1; the
    original tap (h, t) lands at window offset ``f + r + t - 1`` (cell
    offset//f, sub-column offset%f). All other entries are structural
    zeros, so the folded conv computes the EXACT same sums (zeros add
    nothing; only MXU pass order differs). See
    benchmarks/bench_pyramid_fold_ab.py and models/bidir.py
    ``wfold_pyramid_enabled`` for the measured win."""
    kh, kw, cin, cout = k.shape
    z = jnp.zeros((kh, cin, cout), k.dtype)
    cols = []
    for r in range(f):
        taps = {f + r + t - 1: k[:, t] for t in range(kw)}
        stack = [taps.get(off, z) for off in range(3 * f)]
        cols.append(jnp.concatenate(stack, axis=1))
    big = jnp.concatenate(cols, axis=2)  # (kh, 3f*cin, f*cout)
    return big.reshape(kh, 3, f * cin, f * cout)


def wfold_s2_kernel(k: jnp.ndarray, f: int = 4) -> jnp.ndarray:
    """Remap a (3,3,cin,cout) stride-2 kernel to the W-folded layout
    (3, 2, 2f*cin, f*cout): output phase r of folded output cell j reads
    original columns 2f*j+2r-1 .. 2f*j+2r+1 — folded INPUT cells (of 2f
    columns) j-1..j, a width-2 window needing one cell of left pad only."""
    kh, kw, cin, cout = k.shape
    fi = 2 * f
    z = jnp.zeros((kh, cin, cout), k.dtype)
    cols = []
    for r in range(f):
        taps = {fi + 2 * r + t - 1: k[:, t] for t in range(kw)}
        stack = [taps.get(off, z) for off in range(2 * fi)]
        cols.append(jnp.concatenate(stack, axis=1))
    big = jnp.concatenate(cols, axis=2)  # (kh, 2*fi*cin, f*cout)
    return big.reshape(kh, 2, fi * cin, f * cout)


def wfold_begin(x: jnp.ndarray) -> tuple:
    """Enter fold-4 W layout for a pyramid if the width allows; returns
    ``(x, folded)``. Callers gate on ``bidir.wfold_pyramid_enabled``."""
    if x.shape[2] % 8:
        return x, False
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 4, 4 * c), True


def wfold_level_check(x: jnp.ndarray, folded: bool, ch_out: int) -> tuple:
    """Unfold before a pyramid level whose stem cannot fold: the folded
    width must still split into fold-8 cells, and folding only pays while
    4*ch_out fits the MXU's 128 lanes (wider N would multiply N-tile
    passes — measured LOSS for 64+-channel levels, see
    ``bidir.wfold_pyramid_enabled``)."""
    if folded and (x.shape[2] % 2 or 4 * ch_out > 128):
        b, h, wc, c4 = x.shape
        return x.reshape(b, h, wc * 4, c4 // 4), False
    return x, folded


def wfold_unfold(x: jnp.ndarray, ch: int) -> jnp.ndarray:
    """Leave fold-4 layout: (B, H, Wc, 4*ch) -> (B, H, 4*Wc, ch)."""
    return x.reshape(x.shape[0], x.shape[1], x.shape[2] * 4, ch)


class Conv2dNPad(nn.Module):
    """3x3-family conv whose OUTPUT channels are zero-padded to ``pad_to``
    on the MXU when the gate is on (bf16 thin-N workaround; see
    ``conv_npad_enabled``). Parameters are IDENTICAL to ``conv2d``'s
    ``nn.Conv`` ('kernel' (k,k,cin,features) HWIO + 'bias'), so checkpoints
    and torch imports are layout-stable and the gate flips at trace time.

    A second trace-time gate, ``int8_pyramid_enabled``, swaps the apply
    path for a dynamically-quantized int8 conv (serving-only; same params).

    ``__call__(x, wfold=...)`` selects the W-folded apply path (same
    params, input/output in fold-4 layout): ``"s1"`` for stride-1 convs,
    ``"s2"`` for the stride-2 stems (input arrives fold-4 and is reshaped
    to fold-8 internally). See ``wfold_s1_kernel`` / ``wfold_s2_kernel``.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    kernel_init: Callable = xavier_uniform
    dtype: object = None  # compute dtype; params stay float32
    pad_to: int = 64
    gate_default: bool = False
    int8: bool = False  # serving-only quantized path (see int8_pyramid_enabled)

    @nn.compact
    def __call__(self, x: jnp.ndarray, wfold: str | None = None
                 ) -> jnp.ndarray:
        k, s = self.kernel_size, self.stride
        cin = x.shape[-1] if wfold is None else x.shape[-1] // 4
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, cin, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        )
        dt = self.dtype if self.dtype is not None else x.dtype
        pad = (k - 1) // 2
        if wfold is not None:
            assert k == 3, "W-fold supports 3x3 convs only"
            bias4 = jnp.tile(bias, 4).astype(dt)
            if wfold == "s2":
                assert s == 2
                b_, h_, wc_, c_ = x.shape
                x8 = x.reshape(b_, h_, wc_ // 2, 2 * c_)
                x8 = jnp.pad(x8, ((0, 0), (0, 0), (1, 0), (0, 0)))
                y = lax.conv_general_dilated(
                    x8.astype(dt), wfold_s2_kernel(kernel).astype(dt),
                    (2, 1), ((1, 1), (0, 0)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            else:
                assert wfold == "s1" and s == 1
                y = lax.conv_general_dilated(
                    x.astype(dt), wfold_s1_kernel(kernel).astype(dt),
                    (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            return y + bias4
        if int8_pyramid_enabled(default=self.int8):
            return quantized_conv2d(kernel=kernel, bias=bias, x=x,
                                    stride=s, pad=pad).astype(dt)
        use_pad = (
            self.features < self.pad_to
            and dt == jnp.bfloat16
            and conv_npad_enabled(default=self.gate_default)
        )
        if use_pad:
            kernel = jnp.pad(
                kernel, ((0, 0), (0, 0), (0, 0),
                         (0, self.pad_to - self.features))
            )
        y = lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if use_pad:
            y = y[..., : self.features]
        return y + bias.astype(y.dtype)


class SplitConv(nn.Module):
    """3x3 stride-1 conv over an implicit channel-concat of input chunks.

    ``conv(concat(xs)) == sum_i conv(x_i, kernel[:, :, off_i:off_i+c_i])``,
    so the dense-net decoder's growing concats (profiled at ~1.6 ms/step of
    pure HBM copies at the b8 384x640 bench shape) never have to be
    materialized: each chunk is convolved against its kernel slice and the
    partials are summed in f32. Measured SLOWER than the fused
    concat+conv on TPU v5e (see models/bidir.py split_decoder_enabled) —
    default OFF; the gate records the experiment.

    Parameters are IDENTICAL to ``nn.Conv`` over the concatenated input
    ('kernel' (3,3,sum c_i,features) + 'bias', same initializer), so
    checkpoints and torch imports (models/uflow_model.py:288-323 decoder
    weights) are layout-stable and the ``ARFLOW_SPLIT_DECODER`` gate can
    flip the apply path at trace time with no param migration.
    """

    features: int
    kernel_init: Callable = xavier_uniform
    dtype: object = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, xs: list, h_valid: bool = False) -> jnp.ndarray:
        from arflow_tpu.models.bidir import split_decoder_enabled

        # h_valid: caller already supplied the H padding rows (the H-fold
        # path pre-pads each slice with exact cross-slice halos, see
        # uflow.py _halo_pad_rows) — pad W only.
        hpad = (0, 0) if h_valid else (1, 1)

        cin = sum(x.shape[-1] for x in xs)
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, cin, self.features), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        dt = self.dtype if self.dtype is not None else xs[0].dtype

        if len(xs) == 1 or not split_decoder_enabled(default=False):
            x = xs[0] if len(xs) == 1 else jnp.concatenate(xs, axis=-1)
            y = lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt), (1, 1), (hpad, (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(y.dtype)

        acc = None
        off = 0
        for x in xs:
            c = x.shape[-1]
            y = lax.conv_general_dilated(
                x.astype(dt), kernel[:, :, off : off + c, :].astype(dt),
                (1, 1), (hpad, (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            acc = y if acc is None else acc + y
            off += c
        return (acc + bias).astype(dt)


class Conv2dHValid(nn.Module):
    """3x3 stride-1 (optionally dilated) conv that can run H-valid.

    Parameters are IDENTICAL to ``conv2d``'s ``nn.Conv`` ('kernel'
    (k,k,cin,features) HWIO + 'bias'), so checkpoints and torch imports are
    layout-stable. ``h_valid=True`` means the caller pre-padded the H axis
    with ``dilation`` exact halo rows per side (see uflow.py
    ``_halo_pad_rows``) — the conv then pads W only, and its output rows
    are exactly the full-H SAME conv's rows for that slice. Used by the
    H-folded dilated refinement stack (reference dilation stack:
    models/uflow_model.py:325-348)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    kernel_init: Callable = xavier_uniform
    dtype: object = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h_valid: bool = False) -> jnp.ndarray:
        k, d = self.kernel_size, self.dilation
        pad = ((k - 1) * d) // 2
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,),
            jnp.float32,
        )
        dt = self.dtype if self.dtype is not None else x.dtype
        hpad = (0, 0) if h_valid else (pad, pad)
        y = lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), (1, 1), (hpad, (pad, pad)),
            rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(y.dtype)


class ConvTranspose2dTorch(nn.Module):
    """Transpose conv with exact ``torch.nn.ConvTranspose2d(k, s, p)`` geometry.

    Implemented as a regular conv over the stride-dilated input with padding
    ``k - 1 - p`` and a pre-flipped kernel, so the stored 'kernel' param (HWIO,
    I = torch in_channels) applies directly in ``lax.conv_general_dilated``.
    The torch importer maps ``W[i, o, kh, kw] -> kernel[K-1-kh, K-1-kw, i, o]``.
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    kernel_init: Callable = xavier_uniform
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, subpixel: bool = False) -> jnp.ndarray:
        k, s, p = self.kernel_size, self.stride, self.padding
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, in_features, self.features),
            jnp.float32,
        )
        if self.dtype is not None:
            kernel = kernel.astype(self.dtype)
            x = x.astype(self.dtype)
        if subpixel and k == 4 and s == 2 and p == 1:
            return self._subpixel(x, kernel)
        pad = k - 1 - p
        y = lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", jax.nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y

    def _subpixel(self, x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
        """Exact subpixel decomposition of the 4x4/s2/p1 transposed conv.

        Output phase (a, b) of the direct path reads exactly the 2x2 input
        window with taps kernel[2*dy + a, 2*dx + b] (the other 12 taps of
        the 4x4 kernel land on the lhs_dilation zeros). One (2,2,C,4*F)
        VALID conv over the 1-padded input computes all four phases; the
        phase planes then interleave to (2H, 2W). Same 4 multiply-adds per
        output pixel as the direct path — see
        bidir.deconv_subpixel_enabled for the A/B numbers."""
        n, hs, ws, cin = x.shape
        f = self.features
        # kernel[u, v, i, o] with u = 2*dy + a, v = 2*dx + b
        k2 = kernel.reshape(2, 2, 2, 2, cin, f)  # [dy, a, dx, b, i, o]
        k2 = k2.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, cin, 4 * f)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y2 = lax.conv_general_dilated(
            xp, k2, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (n, hs+1, ws+1, 4f), channels (a, b, o) a-major
        y2 = y2.reshape(n, hs + 1, ws + 1, 2, 2, f)
        rows = []
        for a in (0, 1):
            cols = [y2[:, a:hs + a, b:ws + b, a, b, :] for b in (0, 1)]
            rows.append(jnp.stack(cols, axis=3))  # (n, hs, ws, 2, f)
        y = jnp.stack(rows, axis=2)  # (n, hs, 2, ws, 2, f)
        y = y.reshape(n, 2 * hs, 2 * ws, f)
        if self.use_bias:
            bias = self.param(
                "bias", jax.nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            if self.dtype is not None:
                bias = bias.astype(self.dtype)
            y = y + bias
        return y

