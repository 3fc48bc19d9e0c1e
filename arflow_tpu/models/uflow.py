"""PWCFlow — the UFlow PWC network (flax.linen, NHWC).

Faithful capability port of the reference's PyTorch UFlow model
(models/uflow_model.py:96-470): 5-level feature pyramid with 'valid' convs and
manual zero pad, per-level dense-net flow decoders, deconv context
propagation, moments-across-images feature normalization before the cost
volume, dilated refinement at the 1/4-res level, whole-level dropout, and two
final 2x bilinear upsamples back to full resolution.

Returns flows at 6 scales, finest first:
[full, 1/2, 1/4 (refined output level), 1/8, 1/16, 1/32].
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from arflow_tpu.models.bidir import (
    bidir_batch_enabled,
    deconv_subpixel_enabled,
    hfold_k,
    hfold_refine_k,
    pyramid_batch_enabled,
    split_decoder_enabled,
    wfold_pyramid_enabled,
)
from arflow_tpu.models.layers import (
    Conv2dHValid,
    Conv2dNPad,
    ConvTranspose2dTorch,
    SplitConv,
    int8_pyramid_enabled,
    leaky_relu,
    wfold_begin,
    wfold_level_check,
    wfold_unfold,
    xavier_uniform,
)
from arflow_tpu.ops import (
    compute_cost_volume,
    flow_to_warp,
    normalize_features,
    resample,
    upsample,
)

_LEAKY_ALPHA = 0.1


def _halo_pad_rows(x, batch, k, n: int = 1):
    """Pad each of the k H-slices (contiguous per image along batch) with n
    rows of TRUE neighbor data on each side — the rows a full-H 3x3 SAME
    conv (with dilation n) would read — and zeros at the real image
    top/bottom. Output H grows by 2n so an H-valid conv returns exactly the
    full-H conv's slice rows. Requires n <= slice height (halos come from
    the adjacent slice only; callers cap the fold factor accordingly)."""
    bk, hs, w, c = x.shape
    assert bk == batch * k and n <= hs
    x5 = x.reshape(batch, k, hs, w, c)
    zero = jnp.zeros_like(x5[:, :1, :n])
    top = jnp.concatenate([zero, x5[:, :-1, -n:]], axis=1)
    bot = jnp.concatenate([x5[:, 1:, :n], zero], axis=1)
    return jnp.concatenate([top, x5, bot], axis=2).reshape(
        bk, hs + 2 * n, w, c
    )


def _dense_stack_hfold(convs, x_in, b0, k, alpha):
    """Dense-net decoder stack on the H-folded layout, maintaining the
    halo-padded buffer INCREMENTALLY: only each new (thin, 128-ch) conv
    output is halo-padded and channel-concatenated onto the padded buffer,
    instead of re-halo-padding the full growing (up-to-659-ch) tensor per
    conv. Halo-padding is a per-channel row shuffle, so it commutes with
    channel concat — numerics are bitwise those of the naive form
    (tests/test_hfold.py) while the big tensor is materialized once per
    conv rather than twice (~halves the non-conv HBM traffic of the fold;
    BASELINE.md round 4 'remaining l1 gap').

    Returns ``(context, out)``: the last hidden activation (unpadded,
    slice-rows layout) and the final out-conv applied to its halo-padded
    form."""
    x_pad = _halo_pad_rows(x_in, b0, k)
    x_out = None
    x_out_pad = None
    for conv in convs[:-1]:
        if x_out_pad is not None:
            x_pad = jnp.concatenate([x_pad, x_out_pad], axis=-1)
        x_out = leaky_relu(conv([x_pad], h_valid=True), alpha)
        x_out_pad = _halo_pad_rows(x_out, b0, k)
    out = convs[-1]([x_out_pad], h_valid=True)
    return x_out, out


class PWCFeaturePyramid(nn.Module):
    """Feature pyramid (models/uflow_model.py:364-470).

    filters: per-level (num_convs, num_filters); first conv of each level has
    stride 2. Input in [0, 1] is rescaled to [-1, 1].
    """

    filters: Sequence[tuple] = ((3, 32), (3, 32), (3, 32), (3, 32), (3, 32))
    leaky_relu_alpha: float = _LEAKY_ALPHA
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params f32
    int8: bool = False  # serving-only quantized convs (model.dtype "int8")

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = x * 2.0 - 1.0
        # W-fold: run the whole pyramid with 4 W-columns folded into
        # channels — the thin 32-out convs become (3,3,128,128)-shaped
        # ((3,2,8*cin,128) for the stride-2 stems) and run 2.4-3.1x faster
        # on the MXU (bidir.wfold_pyramid_enabled has the numbers). Exact
        # numerics up to MXU summation order; default ON at inference only.
        folded = False
        if not int8_pyramid_enabled(default=self.int8) and (
            wfold_pyramid_enabled(default=not train)
        ):
            x, folded = wfold_begin(x)
        features = []
        for level, (num_layers, num_filters) in enumerate(self.filters):
            # unfold when the remaining width cannot supply the stem's
            # fold-8 cells — the small upper levels run direct
            x, folded = wfold_level_check(x, folded, num_filters)
            for i in range(num_layers):
                stride = 2 if i == 0 else 1
                # Conv2dNPad == conv2d (identical params/geometry), plus the
                # bf16 thin-N pad-to-64 experiment behind ARFLOW_CONV_NPAD.
                # Measured a WASH (bench_pyramid_probe: pyramid 4.72 ms
                # either way; the thin conv is M*K pass-bound, N<=128 free)
                # — default OFF, gate kept as the recorded experiment.
                conv = Conv2dNPad(
                    num_filters,
                    kernel_size=3,
                    stride=stride,
                    name=f"conv_l{level}_{i}",
                    kernel_init=xavier_uniform,
                    dtype=self.dtype,
                    gate_default=False,
                    int8=self.int8,
                )
                if folded:
                    x = conv(x, wfold="s2" if stride == 2 else "s1")
                else:
                    x = conv(x)
                x = leaky_relu(x, self.leaky_relu_alpha)
            features.append(wfold_unfold(x, num_filters) if folded else x)
        return features


class PWCFlow(nn.Module):
    """UFlow PWC optical-flow network (models/uflow_model.py:96-361)."""

    level_dropout: float = 0.0
    feature_norm: bool = True
    num_levels: int = 5
    num_context_up_channels: int = 32
    max_displacement: int = 4
    accumulate_flow: bool = True
    use_feature_warp: bool = True
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); outputs are f32
    int8_pyramid: bool = False  # serving-only (model.dtype "int8")
    flow_decoder_filters: Sequence[int] = (128, 128, 96, 64, 32)
    refinement_filters: Sequence[tuple] = (
        (128, 1),
        (128, 2),
        (128, 4),
        (96, 8),
        (64, 16),
        (32, 1),
    )

    def setup(self):
        self.feature_pyramid = PWCFeaturePyramid(
            name="feature_pyramid", dtype=self.dtype, int8=self.int8_pyramid
        )

        # Per-level dense-net flow decoders (uflow_model.py:288-323); levels
        # 1..num_levels-1 (level 0 never estimates flow).
        flow_layers = {}
        for level in range(1, self.num_levels):
            convs = []
            for j, c in enumerate(self.flow_decoder_filters):
                convs.append(
                    SplitConv(c, name=f"flow_l{level}_c{j}",
                              dtype=self.dtype)
                )
            # SplitConv == conv2d(2, k=3) param-for-param; it additionally
            # accepts the H-fold h_valid mode (pre-padded halo rows).
            convs.append(
                SplitConv(2, name=f"flow_l{level}_out", dtype=self.dtype)
            )
            flow_layers[level] = convs
        self._flow_layers = flow_layers

        # Context upsampling deconvs (uflow_model.py:275-286).
        self._context_up_layers = {
            level: ConvTranspose2dTorch(
                self.num_context_up_channels,
                kernel_size=4,
                stride=2,
                padding=1,
                dtype=self.dtype,
                name=f"context_up_l{level}",
            )
            for level in range(1, self.num_levels)
        }

        # Dilated refinement model (uflow_model.py:325-348). Conv2dHValid ==
        # conv2d param-for-param; it additionally accepts the H-fold h_valid
        # mode (pre-padded dilation-row halos).
        refine = []
        for j, (c, d) in enumerate(self.refinement_filters):
            refine.append(
                Conv2dHValid(c, kernel_size=3, dilation=d,
                             name=f"refine_{j}", dtype=self.dtype)
            )
        refine.append(
            Conv2dHValid(2, kernel_size=3, name="refine_out",
                         dtype=self.dtype)
        )
        self._refine_model = refine

    def _maybe_level_dropout(self, tensors, train, num_groups: int = 1):
        if not train or self.level_dropout <= 0:
            return tensors
        rng = self.make_rng("dropout")
        if num_groups == 1:
            keep = (jax.random.uniform(rng, ()) > self.level_dropout).astype(
                tensors[0].dtype
            )
            return [t * keep for t in tensors]
        # Batched bidirectional forward: one independent whole-level draw per
        # direction group (matches the reference's separate fw/bw calls,
        # uflow_model.py:210-214).
        keep = (
            jax.random.uniform(rng, (num_groups,)) > self.level_dropout
        ).astype(tensors[0].dtype)
        b = tensors[0].shape[0] // num_groups
        keep = jnp.repeat(keep, b).reshape(-1, 1, 1, 1)
        return [t * keep for t in tensors]

    def forward_2_frames(self, fp1, fp2, train: bool = False,
                         num_groups: int = 1):
        """Coarse-to-fine flow between two feature pyramids
        (uflow_model.py:138-245)."""
        context = None
        flow = None
        flow_up = None
        context_up = None
        flows = []

        # levels num_levels-1 .. 1 (coarse to fine; level 0 skipped).
        for level in range(self.num_levels - 1, 0, -1):
            features1 = fp1[level]
            features2 = fp2[level]

            if flow_up is None or not self.use_feature_warp:
                warped2 = features2
            else:
                warp_up = flow_to_warp(flow_up)
                warped2 = resample(features2, warp_up)

            features1_normalized, warped2_normalized = normalize_features(
                [features1, warped2],
                normalize=self.feature_norm,
                center=self.feature_norm,
                moments_across_channels=True,
                moments_across_images=True,
            )
            cost_volume = compute_cost_volume(
                features1_normalized, warped2_normalized, self.max_displacement
            )
            cost_volume = leaky_relu(cost_volume, _LEAKY_ALPHA)

            if flow_up is None:
                chunks = [cost_volume, features1]
            else:
                chunks = [context_up, flow_up, cost_volume, features1]

            # Dense-net connections (uflow_model.py:196-208). With the
            # (default-off) split gate, SplitConv consumes the chunk list
            # directly; otherwise the canonical incremental 2-way concat —
            # NOT an N-way re-concat of the chunks, which XLA fuses worse
            # (measured +35% on the train step, bench_decoder_gates_ab).
            x_out = None
            if split_decoder_enabled(default=False):
                for conv in self._flow_layers[level][:-1]:
                    x_out = leaky_relu(conv(chunks), _LEAKY_ALPHA)
                    chunks = chunks + [x_out]
                context = x_out
                flow = self._flow_layers[level][-1]([context])
            else:
                x_in = jnp.concatenate(chunks, axis=-1)
                b0, h0 = x_in.shape[0], x_in.shape[1]
                # Default ON for inference (the small-batch serving shapes
                # where the b<8 conv cliff bites: +9.6% at Sintel-res b4,
                # +14.6% at streaming b1, bench_hfold_ab.py); OFF in training
                # so trajectories stay byte-identical with prior rounds.
                # Target 16, not 8 (round 5): the conv emitter keeps gaining
                # past the b>=8 cliff at the flagship shape — 384x640 b8
                # k=2 runs 14.56 -> 14.05 ms (+3.8%), while b4/b1 (k 4/16
                # vs 2/8) are a wash and target 32 loses everywhere
                # (bench_hfold_ab.py round-5 sweep). ARFLOW_HFOLD overrides
                # either way.
                k = hfold_k(b0, h0, default_target=0 if train else 16)
                if k > 1:
                    # Fold H into batch for the dense-net stack: XLA's conv
                    # emitter runs ~2.5x faster at batch>=8 than at b<=4 for
                    # the same FLOPs (bench_decoder_shape_probe.py). Exact
                    # numerics: each conv gets true cross-slice halo rows
                    # (zeros at the real image edges) and runs H-valid.
                    x_in = x_in.reshape(b0 * k, h0 // k, *x_in.shape[2:])
                    context, flow = _dense_stack_hfold(
                        self._flow_layers[level], x_in, b0, k, _LEAKY_ALPHA
                    )
                    context = context.reshape(b0, h0, *context.shape[2:])
                    flow = flow.reshape(b0, h0, *flow.shape[2:])
                else:
                    for conv in self._flow_layers[level][:-1]:
                        x_out = leaky_relu(conv([x_in]), _LEAKY_ALPHA)
                        x_in = jnp.concatenate([x_in, x_out], axis=-1)
                    context = x_out
                    flow = self._flow_layers[level][-1]([context])

            context, flow = self._maybe_level_dropout(
                [context, flow], train, num_groups
            )

            if flow_up is not None and self.accumulate_flow:
                flow = flow + flow_up

            flow_up = upsample(flow, is_flow=True)
            context_up = self._context_up_layers[level](
                context, subpixel=deconv_subpixel_enabled(default=False)
            )

            flows.insert(0, flow)

        # Refinement at the output level (uflow_model.py:227-240). The
        # H-fold can cover the dilated stack too (per-conv halos = the
        # dilation rows, fold capped so each slice supplies its neighbor's
        # halo) but MEASURES A LOSS end-to-end at the small-batch shapes it
        # targets — the d=16 halo is 57-114% overhead rows per slice
        # (Sintel b4 13.48 -> 13.70 ms, streaming b1 3.34 -> 3.52;
        # benchmarks/bench_refine_fold_ab.py) — so the default is OFF
        # everywhere and ARFLOW_HFOLD_REFINE opts in (parity pinned either
        # way, tests/test_hfold.py).
        refinement = jnp.concatenate([context, flow], axis=-1)
        br, hr = refinement.shape[0], refinement.shape[1]
        kr = hfold_refine_k(
            br, hr, max_dil=max(d for _, d in self.refinement_filters),
            default_target=0,
        )
        if kr > 1:
            x = refinement.reshape(br * kr, hr // kr, *refinement.shape[2:])
            for conv, (_, d) in zip(self._refine_model[:-1],
                                    self.refinement_filters):
                x = leaky_relu(
                    conv(_halo_pad_rows(x, br, kr, n=d), h_valid=True),
                    _LEAKY_ALPHA,
                )
            x = self._refine_model[-1](
                _halo_pad_rows(x, br, kr), h_valid=True
            )
            refinement = x.reshape(br, hr, *x.shape[2:])
        else:
            for conv in self._refine_model[:-1]:
                refinement = leaky_relu(conv(refinement), _LEAKY_ALPHA)
            refinement = self._refine_model[-1](refinement)
        (refinement,) = self._maybe_level_dropout([refinement], train, num_groups)

        flows[0] = flow + refinement
        flows.insert(0, upsample(flows[0], is_flow=True))
        flows.insert(0, upsample(flows[0], is_flow=True))
        if self.dtype is not None:
            flows = [f.astype(jnp.float32) for f in flows]
        return flows

    def __call__(self, img1, img2, with_bk: bool = True, train: bool = False):
        if pyramid_batch_enabled(default=not with_bk):
            # One 2B pyramid call instead of two B calls: the thin
            # (32-channel) pyramid convs are MXU-tiling-bound, so doubling
            # the batch fills more of the systolic array per pass. Exact
            # numerics (convs never mix batch entries). Default ON only
            # for the forward-only (inference) program: chained A/B
            # measured +4% there but an 11% train-step REGRESSION with
            # the 2B pyramid in the backward (see
            # models/bidir.py pyramid_batch_enabled).
            nb = img1.shape[0]
            fboth = self.feature_pyramid(
                jnp.concatenate([img1, img2], axis=0), train=train
            )
            fp1 = [f[:nb] for f in fboth]
            fp2 = [f[nb:] for f in fboth]
        else:
            fp1 = self.feature_pyramid(img1, train=train)
            fp2 = self.feature_pyramid(img2, train=train)
        if with_bk and bidir_batch_enabled(default=False):
            # Batched bidirectional pass: fw and bw ride ONE coarse-to-fine
            # pass at 2B on swapped pyramids. Per-sample numerics are
            # unchanged: convs, feature moments (per batch element) and the
            # cost volume never mix batch entries; level dropout draws per
            # direction group. Default OFF: measured 78.1 ms/step batched
            # vs 70.7 sequential for the full uflow train step @256x448 b8
            # on TPU v5e under chained ground-truth timing
            # (benchmarks/bench_chained_ab.py) — the 2B convs don't beat
            # two B-sized passes here (ARFLOW_BIDIR_BATCH=1 to force).
            fp_a = [jnp.concatenate([a, b], axis=0) for a, b in zip(fp1, fp2)]
            fp_b = [jnp.concatenate([b, a], axis=0) for a, b in zip(fp1, fp2)]
            flows = self.forward_2_frames(fp_a, fp_b, train=train, num_groups=2)
            nb = img1.shape[0]
            return {
                "flows_fw": [f[:nb] for f in flows],
                "flows_bw": [f[nb:] for f in flows],
            }
        res = {"flows_fw": self.forward_2_frames(fp1, fp2, train=train)}
        if with_bk:
            res["flows_bw"] = self.forward_2_frames(fp2, fp1, train=train)
        return res
