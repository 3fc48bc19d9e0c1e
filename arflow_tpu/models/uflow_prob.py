"""Probabilistic UFlow PWC network + mixture machinery.

Reference: models/uflow_prob_model.py.

- ``PWCProbFlow`` (:149-412): PWCFlow predicting grouped output channels
  ``out_channels = [L, M, N]`` — L flow channels propagated & warped, M
  propagated log-diag channels (bias +-log2 per upsample), N output-only
  extras (e.g. off-diagonal bands / low-rank columns). Supports multiple
  feature pyramids (``n_pyramids``) whose outputs are concatenated groupwise.
- ``ComponentNet`` (:109-146): two PWCProbFlow components -> 2-component
  mixture.
- ``MixtureWeightsNet`` (:693-745): ResNet-18-ish over per-pixel data /
  smoothness loss maps -> softmax component weights.

Documented divergences (latent bugs in the reference, see SURVEY.md §7.4):
- MixtureWeightsNet unpacks 2 values from data_loss_no_penalty which returns
  4 (uflow_prob_model.py:712) — would crash; fixed here.
- The reference pairs component-major repeated images with batch-major
  reshaped flows (uflow_prob_model.py:704-709) — mismatched for batch > 1;
  here images are repeated batch-major (jnp.repeat) to pair correctly.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from arflow_tpu.models.bidir import (
    bidir_batch_enabled,
    component_batch_enabled,
    deconv_subpixel_enabled,
    hfold_k,
    hfold_refine_k,
    split_decoder_enabled,
)
from arflow_tpu.models.layers import (
    Conv2dHValid,
    ConvTranspose2dTorch,
    SplitConv,
    conv2d,
    kaiming_normal,
    leaky_relu,
)
from arflow_tpu.models.uflow import (
    PWCFeaturePyramid,
    _dense_stack_hfold,
    _halo_pad_rows,
)
from arflow_tpu.ops import (
    compute_cost_volume,
    downsample,
    flow_to_warp,
    normalize_features,
    resample,
    upsample,
)

_ALPHA = 0.1


def _conv(features, kernel_size=3, stride=1, dilation=1, name=None, dtype=None):
    return conv2d(
        features, kernel_size, stride, dilation, name=name,
        kernel_init=kaiming_normal, dtype=dtype,
    )


class PWCProbFlow(nn.Module):
    level_dropout: float = 0.0
    feature_norm: bool = True
    out_channels: Sequence[int] = (2, 2, 0)
    inv_cov: bool = False
    n_pyramids: int = 1
    mixture_weights: bool = False
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); outputs are f32
    int8_pyramid: bool = False  # serving-only (model.dtype "int8")
    num_levels: int = 5
    num_context_up_channels: int = 32
    max_displacement: int = 4
    flow_decoder_filters: Sequence[int] = (128, 128, 96, 64, 32)
    refinement_filters: Sequence[tuple] = (
        (128, 1),
        (128, 2),
        (128, 4),
        (96, 8),
        (64, 16),
        (32, 1),
    )

    @property
    def diag_bias(self):
        return -math.log(2) if self.inv_cov else math.log(2)

    def setup(self):
        self.pyramids = [
            PWCFeaturePyramid(name=f"feature_pyramid_{k}", dtype=self.dtype,
                              int8=self.int8_pyramid)
            for k in range(self.n_pyramids)
        ]
        flow_layers = {}
        for level in range(1, self.num_levels):
            convs = [
                SplitConv(c, kernel_init=kaiming_normal,
                          name=f"flow_l{level}_c{j}", dtype=self.dtype)
                for j, c in enumerate(self.flow_decoder_filters)
            ]
            out_ch = (
                sum(self.out_channels)
                if level == 1
                else sum(self.out_channels[0:2])
            )
            # SplitConv == _conv(out_ch) param-for-param (same kernel/bias
            # names, shapes, and kaiming init); it additionally accepts the
            # H-fold h_valid mode (see models/uflow.py).
            convs.append(
                SplitConv(out_ch, kernel_init=kaiming_normal,
                          name=f"flow_l{level}_out", dtype=self.dtype)
            )
            flow_layers[level] = convs
        self._flow_layers = flow_layers
        self._context_up_layers = {
            level: ConvTranspose2dTorch(
                self.num_context_up_channels,
                kernel_size=4,
                stride=2,
                padding=1,
                kernel_init=kaiming_normal,
                dtype=self.dtype,
                name=f"context_up_l{level}",
            )
            for level in range(1, self.num_levels)
        }
        # Conv2dHValid == _conv param-for-param (same kernel/bias names,
        # shapes, and kaiming init); it additionally accepts the H-fold
        # h_valid mode (see models/uflow.py refinement fold).
        refine = [
            Conv2dHValid(c, dilation=d, name=f"refine_{j}",
                         kernel_init=kaiming_normal, dtype=self.dtype)
            for j, (c, d) in enumerate(self.refinement_filters)
        ]
        refine.append(
            Conv2dHValid(sum(self.out_channels), name="refine_out",
                         kernel_init=kaiming_normal, dtype=self.dtype)
        )
        self._refine_model = refine
        if self.mixture_weights:
            self._mixture_weights_net = MixtureWeightsNet(
                n_flows=self.out_channels[0] // 2,
                n_pyramids=self.n_pyramids,
                name="mixture_weights_net",
            )

    def _maybe_dropout(self, tensors, train, num_groups: int = 1):
        if not train or self.level_dropout <= 0:
            return tensors
        rng = self.make_rng("dropout")
        if num_groups == 1:
            keep = (jax.random.uniform(rng, ()) > self.level_dropout).astype(
                tensors[0].dtype
            )
            return [t * keep for t in tensors]
        # Batched bidirectional forward: independent whole-level draw per
        # direction group (uflow_prob_model.py dropout semantics preserved).
        keep = (
            jax.random.uniform(rng, (num_groups,)) > self.level_dropout
        ).astype(tensors[0].dtype)
        b = tensors[0].shape[0] // num_groups
        keep = jnp.repeat(keep, b).reshape(-1, 1, 1, 1)
        return [t * keep for t in tensors]

    def upsample_out(self, out):
        """Groupwise 2x upsample (uflow_prob_model.py:223-250)."""
        l, m, n = self.out_channels
        pieces = []
        if l > 0:
            pieces.append(upsample(out[..., :l], is_flow=True))
        if m > 0:
            pieces.append(
                upsample(out[..., l : l + m] + self.diag_bias, is_flow=False)
            )
        if n > 0 and out.shape[-1] > l + m:
            pieces.append(upsample(out[..., l + m :], is_flow=False))
        return jnp.concatenate(pieces, axis=-1)

    def forward_2_frames(self, fp1, fp2, train=False, num_groups: int = 1):
        l_ch, m_ch, n_ch = self.out_channels
        context = None
        context_up = None
        out_up = None
        outs = []

        for level in range(self.num_levels - 1, 0, -1):
            features1, features2 = fp1[level], fp2[level]
            if out_up is None:
                b, h, w, _ = features1.shape
                flow_up = jnp.zeros((b, h, w, l_ch), features1.dtype)
                log_diag_up = (
                    -(self.num_levels - 3)
                    * self.diag_bias
                    * jnp.ones((b, h, w, m_ch), features1.dtype)
                )
                out_up = jnp.concatenate([flow_up, log_diag_up], axis=-1)
                context_up = jnp.zeros(
                    (b, h, w, self.num_context_up_channels), features1.dtype
                )

            # One cost volume per flow pair (uflow_prob_model.py:275-303).
            cost_list = []
            for k in range(l_ch // 2):
                warp_up = flow_to_warp(out_up[..., 2 * k : 2 * k + 2])
                warped2 = resample(features2, warp_up)
                f1n, w2n = normalize_features(
                    [features1, warped2],
                    normalize=self.feature_norm,
                    center=self.feature_norm,
                    moments_across_channels=True,
                    moments_across_images=True,
                )
                cv = compute_cost_volume(f1n, w2n, self.max_displacement)
                cost_list.append(leaky_relu(cv, _ALPHA))
            cost_volume = jnp.concatenate(cost_list, axis=-1)

            # Dense-net connections. With the (default-off) split gate,
            # SplitConv consumes the chunk list; otherwise the canonical
            # incremental 2-way concat (an N-way re-concat each layer
            # fuses worse — see models/uflow.py).
            chunks = [context_up, out_up, cost_volume, features1]
            x_out = None
            if split_decoder_enabled(default=False):
                for conv in self._flow_layers[level][:-1]:
                    x_out = leaky_relu(conv(chunks), _ALPHA)
                    chunks = chunks + [x_out]
                context = x_out
                out = self._flow_layers[level][-1]([context])
            else:
                x_in = jnp.concatenate(chunks, axis=-1)
                b0, h0 = x_in.shape[0], x_in.shape[1]
                # H-fold relayout for small-batch inference (exact halo
                # numerics; see models/uflow.py + BASELINE.md round 4).
                # Target 8 (not the uflow decoder's 16): the prob family
                # serves at b<=4 where the round-5 sweep measured 8 vs 16
                # a wash (bench_hfold_ab.py); 16 is only measured to win
                # at b8, which this family's ELBO memory never reaches.
                k = hfold_k(b0, h0, default_target=0 if train else 8)
                if k > 1:
                    x_in = x_in.reshape(b0 * k, h0 // k, *x_in.shape[2:])
                    context, out = _dense_stack_hfold(
                        self._flow_layers[level], x_in, b0, k, _ALPHA
                    )
                    context = context.reshape(b0, h0, *context.shape[2:])
                    out = out.reshape(b0, h0, *out.shape[2:])
                else:
                    for conv in self._flow_layers[level][:-1]:
                        x_out = leaky_relu(conv([x_in]), _ALPHA)
                        x_in = jnp.concatenate([x_in, x_out], axis=-1)
                    context = x_out
                    out = self._flow_layers[level][-1]([context])
            context, out = self._maybe_dropout([context, out], train, num_groups)

            # Pad propagated channels when the output level adds N extras.
            if out.shape[-1] > out_up.shape[-1]:
                pad = out.shape[-1] - out_up.shape[-1]
                out_up = jnp.pad(out_up, ((0, 0), (0, 0), (0, 0), (0, pad)))
            out = out + out_up

            out_up = self.upsample_out(out)
            context_up = self._context_up_layers[level](
                context, subpixel=deconv_subpixel_enabled(default=False)
            )
            outs.insert(0, out)

        if out.shape[-1] < sum(self.out_channels):
            pad = sum(self.out_channels) - out.shape[-1]
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, pad)))

        refinement = jnp.concatenate([context, out], axis=-1)
        br, hr = refinement.shape[0], refinement.shape[1]
        # Default OFF: the dilation-row halos outweigh the batch-cliff win
        # end-to-end (see models/uflow.py refinement + bench_refine_fold_ab).
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
                    _ALPHA,
                )
            x = self._refine_model[-1](
                _halo_pad_rows(x, br, kr), h_valid=True
            )
            refinement = x.reshape(br, hr, *x.shape[2:])
        else:
            for conv in self._refine_model[:-1]:
                refinement = leaky_relu(conv(refinement), _ALPHA)
            refinement = self._refine_model[-1](refinement)
        (refinement,) = self._maybe_dropout([refinement], train, num_groups)
        refined = out + refinement

        flow = refined[..., :l_ch]
        log_diag = refined[..., l_ch : l_ch + m_ch]
        rest = refined[..., l_ch + m_ch :]
        if self.inv_cov:
            log_diag = jnp.maximum(log_diag, -5.0)
        else:
            log_diag = jnp.clip(log_diag, -10.0, 10.0)
        outs[0] = jnp.concatenate([flow, log_diag, rest], axis=-1)

        out_1 = self.upsample_out(outs[0])
        out_0 = self.upsample_out(out_1)
        outs.insert(0, out_1)
        outs.insert(0, out_0)
        if self.dtype is not None:
            outs = [o.astype(jnp.float32) for o in outs]
        return outs

    def flows_cat(self, input_list):
        """Concatenate per-pyramid outputs groupwise (uflow_prob_model.py:189-207)."""
        l_ch, m_ch, n_ch = self.out_channels
        out_list = []
        for level in range(len(input_list[0])):
            mean = jnp.concatenate(
                [f[level][..., :l_ch] for f in input_list], axis=-1
            )
            log_diag = jnp.concatenate(
                [f[level][..., l_ch : l_ch + m_ch] for f in input_list], axis=-1
            )
            if input_list[0][level].shape[-1] > l_ch + m_ch:
                rest = jnp.concatenate(
                    [
                        f[level][..., l_ch + m_ch : sum(self.out_channels)]
                        for f in input_list
                    ],
                    axis=-1,
                )
                out_list.append(jnp.concatenate([mean, log_diag, rest], axis=-1))
            else:
                out_list.append(jnp.concatenate([mean, log_diag], axis=-1))
        return out_list

    def __call__(self, img1, img2, with_bk: bool = True, train: bool = False):
        flows_fw, flows_bw = [], []
        nb = img1.shape[0]
        bidir = with_bk and bidir_batch_enabled(default=True)
        if self.n_pyramids > 1 and component_batch_enabled(default=True):
            # The K mixture components SHARE the flow decoder — only the
            # feature pyramids carry per-component weights
            # (uflow_prob_model.py:187,391-404) — so all K components (and,
            # when enabled, both directions) ride the batch axis through
            # ONE decoder pass: K*B (or 2K*B) instead of K (2K) sequential
            # thin-batch passes. Exact per-sample numerics; dropout draws
            # stay independent per (component, direction) via num_groups.
            pairs = []
            both = jnp.concatenate([img1, img2], axis=0)
            for k in range(self.n_pyramids):
                fboth = self.pyramids[k](both, train=train)
                pairs.append(([f[:nb] for f in fboth], [f[nb:] for f in fboth]))

            def run(srcs, tgts):
                fa = [jnp.concatenate(p, axis=0) for p in zip(*srcs)]
                fb = [jnp.concatenate(p, axis=0) for p in zip(*tgts)]
                outs = self.forward_2_frames(
                    fa, fb, train, num_groups=len(srcs)
                )
                return [
                    [o[k * nb : (k + 1) * nb] for o in outs]
                    for k in range(len(srcs))
                ]

            if bidir:
                groups = run(
                    [p[0] for p in pairs] + [p[1] for p in pairs],
                    [p[1] for p in pairs] + [p[0] for p in pairs],
                )
                flows_fw = groups[: self.n_pyramids]
                flows_bw = groups[self.n_pyramids :]
            else:
                flows_fw = run([p[0] for p in pairs], [p[1] for p in pairs])
                if with_bk:
                    flows_bw = run(
                        [p[1] for p in pairs], [p[0] for p in pairs]
                    )
        else:
            for k in range(self.n_pyramids):
                f1 = self.pyramids[k](img1, train=train)
                f2 = self.pyramids[k](img2, train=train)
                if bidir:
                    # Batched bidirectional pass (see PWCFlow.__call__;
                    # per-sample numerics unchanged). Default ON: the full
                    # sparse-ELBO train step measured 75.3 ms/step batched
                    # vs 86.7 sequential @256x448 b4 on TPU v5e under
                    # chained ground-truth timing
                    # (benchmarks/bench_chained_ab.py;
                    # ARFLOW_BIDIR_BATCH=0 to force sequential).
                    fa = [
                        jnp.concatenate([a, b], axis=0) for a, b in zip(f1, f2)
                    ]
                    fb = [
                        jnp.concatenate([b, a], axis=0) for a, b in zip(f1, f2)
                    ]
                    outs = self.forward_2_frames(fa, fb, train, num_groups=2)
                    flows_fw.append([o[:nb] for o in outs])
                    flows_bw.append([o[nb:] for o in outs])
                else:
                    flows_fw.append(self.forward_2_frames(f1, f2, train))
                    if with_bk:
                        flows_bw.append(self.forward_2_frames(f2, f1, train))
        res = {"flows_fw": self.flows_cat(flows_fw)}
        if with_bk:
            res["flows_bw"] = self.flows_cat(flows_bw)

        if self.mixture_weights:
            l_ch = self.out_channels[0]
            mean12_2 = res["flows_fw"][2][..., : l_ch * self.n_pyramids]
            mean21_2 = res["flows_bw"][2][..., : l_ch * self.n_pyramids]
            res["weights_fw"] = self._mixture_weights_net(
                mean12_2, mean21_2, img1, img2, train=train
            )
            res["weights_bw"] = self._mixture_weights_net(
                mean21_2, mean12_2, img2, img1, train=train
            )
        return res


class ComponentNet(nn.Module):
    """Two PWCProbFlow components -> 2-component mixture
    (uflow_prob_model.py:109-146)."""

    level_dropout: float = 0.0
    feature_norm: bool = True
    out_channels: Sequence[int] = (2, 2, 0)
    inv_cov: bool = False
    n_pyramids: int = 1
    mixture_weights: bool = False
    dtype: object = None  # compute dtype for both component nets
    int8_pyramid: bool = False  # serving-only (model.dtype "int8")

    def setup(self):
        kwargs = dict(
            level_dropout=self.level_dropout,
            feature_norm=self.feature_norm,
            out_channels=(2, 2, 0),
            inv_cov=self.inv_cov,
            n_pyramids=1,
            mixture_weights=False,
            dtype=self.dtype,
            int8_pyramid=self.int8_pyramid,
        )
        self.pwcnet1 = PWCProbFlow(name="pwcnet1", **kwargs)
        self.pwcnet2 = PWCProbFlow(name="pwcnet2", **kwargs)
        if self.mixture_weights:
            self._mixture_weights_net = MixtureWeightsNet(
                n_flows=self.out_channels[0] // 2,
                n_pyramids=self.n_pyramids,
                name="mixture_weights_net",
            )

    def __call__(self, img1, img2, with_bk: bool = True, train: bool = False):
        res1 = self.pwcnet1(img1, img2, with_bk=with_bk, train=train)
        res2 = self.pwcnet2(img1, img2, with_bk=with_bk, train=train)

        def concat(f1, f2):
            out = []
            for lvl in range(len(f1)):
                mean = jnp.concatenate(
                    [f1[lvl][..., 0:2], f2[lvl][..., 0:2]], axis=-1
                )
                log_diag = jnp.concatenate(
                    [f1[lvl][..., 2:4], f2[lvl][..., 2:4]], axis=-1
                )
                out.append(jnp.concatenate([mean, log_diag], axis=-1))
            return out

        res = {
            "flows_fw": concat(res1["flows_fw"], res2["flows_fw"]),
            "flows_bw": concat(res1["flows_bw"], res2["flows_bw"]),
        }
        if self.mixture_weights:
            l_ch = self.out_channels[0]
            mean12_2 = res["flows_fw"][2][..., : l_ch * self.n_pyramids]
            mean21_2 = res["flows_bw"][2][..., : l_ch * self.n_pyramids]
            res["weights_fw"] = self._mixture_weights_net(
                mean12_2, mean21_2, img1, img2, train=train
            )
            res["weights_bw"] = self._mixture_weights_net(
                mean21_2, mean12_2, img2, img1, train=train
            )
        return res


class ResidualBlock(nn.Module):
    """uflow_prob_model.py:622-644 (Conv-BN-LeakyReLU x2 + skip)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, kernel_init=kaiming_normal,
            name="conv1",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(y)
        y = nn.leaky_relu(y, 0.01)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
            kernel_init=kaiming_normal, name="conv2",
        )(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                kernel_init=kaiming_normal, name="downsample_conv",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="downsample_bn"
            )(residual)
        return nn.leaky_relu(y + residual, 0.01)


class ResNet(nn.Module):
    """uflow_prob_model.py:647-690 (ResNet-18-shaped classifier)."""

    num_classes: int
    layers: Sequence[int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
            kernel_init=kaiming_normal, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2))
        ):
            for blk in range(blocks):
                x = ResidualBlock(
                    planes,
                    stride=stride if blk == 0 else 1,
                    name=f"layer{stage}_block{blk}",
                )(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(x)


class MixtureWeightsNet(nn.Module):
    """Per-image mixture weights from per-pixel loss maps
    (uflow_prob_model.py:693-745)."""

    n_flows: int = 1
    n_pyramids: int = 1

    @nn.compact
    def __call__(self, flow12_2, flow21_2, im1_0, im2_0, train: bool = False):
        from arflow_tpu.losses.blocks import (
            data_loss_no_penalty,
            smooth_loss_no_penalty,
        )

        k = self.n_flows * self.n_pyramids
        b, h, w, _ = flow12_2.shape

        # Components as batch entries, batch-major:
        # (B,H,W,2K) -> (B*K,H,W,2): channel pairs -> batch entries.
        f12 = flow12_2.reshape(b, h, w, k, 2).transpose(0, 3, 1, 2, 4).reshape(
            b * k, h, w, 2
        )
        f21 = flow21_2.reshape(b, h, w, k, 2).transpose(0, 3, 1, 2, 4).reshape(
            b * k, h, w, 2
        )
        im1 = jnp.repeat(im1_0, k, axis=0)
        im2 = jnp.repeat(im2_0, k, axis=0)

        data_loss, data_weight, _, _ = data_loss_no_penalty(
            im1, im2, f12, f21, "none", ["census"]
        )
        data_loss, data_weight = data_loss[0], data_weight[0]
        s_x, w_x, s_y, w_y = smooth_loss_no_penalty(im1, f12, 150.0, edge_asymp=0.01)

        data_loss = downsample(data_loss, is_flow=False, scale_factor=4)
        data_weight = downsample(data_weight, is_flow=False, scale_factor=4)

        s_x = jnp.pad(s_x, ((0, 0), (0, 0), (1, 0), (0, 0)))
        s_y = jnp.pad(s_y, ((0, 0), (1, 0), (0, 0), (0, 0)))
        w_x = jnp.pad(w_x, ((0, 0), (0, 0), (1, 0), (0, 0)))
        w_y = jnp.pad(w_y, ((0, 0), (1, 0), (0, 0), (0, 0)))

        def as_channels(t, ch):
            # (B*K,H,W,ch) -> (B,H,W,K*ch)
            return t.reshape(b, k, h, w, ch).transpose(0, 2, 3, 1, 4).reshape(
                b, h, w, k * ch
            )

        x = jnp.concatenate(
            [
                as_channels(data_loss, 1),
                as_channels(data_weight, 1),
                as_channels(s_x, 2),
                as_channels(s_y, 2),
                as_channels(w_x, 1),
                as_channels(w_y, 1),
            ],
            axis=-1,
        )
        y = ResNet(num_classes=k, name="resnet")(x, train=train)
        return jax.nn.softmax(y, axis=-1)
