"""PWC-Lite — the original ARFlow model (flax.linen, NHWC).

Reference: models/pwclite.py:109-283. 6-level feature pyramid (channels
[16,32,64,96,128,192]), one *shared* flow estimator + context network with
per-level 1x1 feature adapters, search range 4 (81-channel cost volume),
2-frame, 3-frame bidirectional fusion, and 5-frame chained inference.

Level list returned finest-first: [full, 1/4, 1/8, 1/16, 1/32, 1/64]
(2-frame; the 3-frame variant upsamples every level by 4 like the reference,
models/pwclite.py:252-254).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from arflow_tpu.models.bidir import bidir_batch_enabled, wfold_pyramid_enabled
from arflow_tpu.models.layers import (
    Conv2dNPad,
    conv2d,
    kaiming_normal,
    leaky_relu,
    wfold_begin,
    wfold_level_check,
    wfold_unfold,
)
from arflow_tpu.ops import compute_cost_volume, flow_warp, resize_bilinear

_ALPHA = 0.1


def _conv(features, kernel_size=3, stride=1, dilation=1, name=None, dtype=None):
    return conv2d(
        features, kernel_size, stride, dilation, name=name,
        kernel_init=kaiming_normal, dtype=dtype,
    )


def _upflow2(flow):
    """flow*2 then 2x bilinear align_corners=True (models/pwclite.py:178-179)."""
    h, w = flow.shape[1], flow.shape[2]
    return resize_bilinear(flow * 2.0, (h * 2, w * 2), align_corners=True)


def _upflow4(flow):
    h, w = flow.shape[1], flow.shape[2]
    return resize_bilinear(flow * 4.0, (h * 4, w * 4), align_corners=True)


class FeatureExtractor(nn.Module):
    """models/pwclite.py:26-45: per level, stride-2 conv + conv. Returns the
    pyramid coarsest-first (reference reverses)."""

    num_chs: Sequence[int] = (3, 16, 32, 64, 96, 128, 192)
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # W-fold the THIN levels (16/32 channels: 4*ch <= 128 lanes) —
        # the large-M half of the pyramid; levels with 64+ channels run
        # direct (folding would multiply N-tile passes). Same relayout as
        # the uflow pyramid (bidir.wfold_pyramid_enabled has the numbers);
        # params unchanged (Conv2dNPad == conv2d param-for-param).
        folded = False
        if wfold_pyramid_enabled(default=not train):
            x, folded = wfold_begin(x)
        pyramid = []
        for level, ch_out in enumerate(self.num_chs[1:]):
            x, folded = wfold_level_check(x, folded, ch_out)
            conv0 = Conv2dNPad(ch_out, 3, stride=2,
                               kernel_init=kaiming_normal,
                               name=f"conv_l{level}_0", dtype=self.dtype)
            conv1 = Conv2dNPad(ch_out, 3, kernel_init=kaiming_normal,
                               name=f"conv_l{level}_1", dtype=self.dtype)
            x = conv0(x, wfold="s2") if folded else conv0(x)
            x = leaky_relu(x, _ALPHA)
            x = conv1(x, wfold="s1") if folded else conv1(x)
            x = leaky_relu(x, _ALPHA)
            pyramid.append(wfold_unfold(x, ch_out) if folded else x)
        return pyramid[::-1]


class FlowEstimatorDense(nn.Module):
    """models/pwclite.py:48-66 dense-net estimator; returns (features, flow)."""

    ch_out: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = lambda f, name: _conv(f, name=name, dtype=self.dtype)
        x1 = jnp.concatenate([leaky_relu(c(128, "conv1")(x), _ALPHA), x], -1)
        x2 = jnp.concatenate([leaky_relu(c(128, "conv2")(x1), _ALPHA), x1], -1)
        x3 = jnp.concatenate([leaky_relu(c(96, "conv3")(x2), _ALPHA), x2], -1)
        x4 = jnp.concatenate([leaky_relu(c(64, "conv4")(x3), _ALPHA), x3], -1)
        x5 = jnp.concatenate([leaky_relu(c(32, "conv5")(x4), _ALPHA), x4], -1)
        out = c(self.ch_out, "conv_last")(x5)
        return x5, out


class FlowEstimatorReduce(nn.Module):
    """models/pwclite.py:69-88 reduced estimator; returns (features, flow)."""

    ch_out: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        c = lambda f, name: _conv(f, name=name, dtype=self.dtype)
        x1 = leaky_relu(c(128, "conv1")(x), _ALPHA)
        x2 = leaky_relu(c(128, "conv2")(x1), _ALPHA)
        x3 = leaky_relu(c(96, "conv3")(jnp.concatenate([x1, x2], -1)), _ALPHA)
        x4 = leaky_relu(c(64, "conv4")(jnp.concatenate([x2, x3], -1)), _ALPHA)
        x5 = leaky_relu(c(32, "conv5")(jnp.concatenate([x3, x4], -1)), _ALPHA)
        flow = c(self.ch_out, "predict_flow")(jnp.concatenate([x4, x5], -1))
        return x5, flow


class ContextNetwork(nn.Module):
    """models/pwclite.py:91-106 dilated context refinement."""

    ch_out: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        specs = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)]
        for i, (c, d) in enumerate(specs):
            x = leaky_relu(
                _conv(c, dilation=d, name=f"ctx_{i}", dtype=self.dtype)(x),
                _ALPHA,
            )
        return _conv(self.ch_out, name="ctx_out", dtype=self.dtype)(x)


class PWCLite(nn.Module):
    """cfg surface: n_frames (2|3|5), upsample, reduce_dense
    (models/pwclite.py:109-143)."""

    n_frames: int = 2
    upsample: bool = True
    reduce_dense: bool = True
    search_range: int = 4
    output_level: int = 4  # stop at 1/4 resolution (pyramid index 4)
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); outputs are f32

    def setup(self):
        self.feature_extractor = FeatureExtractor(
            name="feature_pyramid", dtype=self.dtype
        )
        estimator_cls = FlowEstimatorReduce if self.reduce_dense else FlowEstimatorDense
        self.flow_estimator = estimator_cls(
            ch_out=2, name="flow_estimator", dtype=self.dtype
        )
        self.context_network = ContextNetwork(
            ch_out=2, name="context_network", dtype=self.dtype
        )
        self.adapters = [
            _conv(32, kernel_size=1, name=f"conv_1x1_{l}", dtype=self.dtype)
            for l in range(5)
        ]

    def _corr(self, x1, x2):
        out = compute_cost_volume(x1, x2, self.search_range)
        return leaky_relu(out, _ALPHA)

    def forward_2_frames(self, p1, p2):
        b, h, w, _ = p1[0].shape
        flow = jnp.zeros((b, h, w, 2), p1[0].dtype)
        flows = []
        for l in range(self.output_level + 1):
            x1, x2 = p1[l], p2[l]
            if l == 0:
                x2_warp = x2
            else:
                flow = _upflow2(flow)
                x2_warp = flow_warp(x2, flow)
            corr = self._corr(x1, x2_warp)
            x1_1by1 = leaky_relu(self.adapters[l](x1), _ALPHA)
            x_intm, flow_res = self.flow_estimator(
                jnp.concatenate([corr, x1_1by1, flow], -1)
            )
            flow = flow + flow_res
            flow_fine = self.context_network(jnp.concatenate([x_intm, flow], -1))
            flow = flow + flow_fine
            flows.append(flow)
        if self.upsample:
            flows.append(_upflow4(flow))
        return flows[::-1]

    def forward_3_frames(self, p0, p1, p2):
        """Bidirectional 3-frame fusion (models/pwclite.py:206-258)."""
        b, h, w, _ = p1[0].shape
        flow = jnp.zeros((b, h, w, 4), p1[0].dtype)  # [flow_10, flow_12]
        flows = []
        for l in range(self.output_level + 1):
            x0, x1, x2 = p0[l], p1[l], p2[l]
            if l == 0:
                x0_warp, x2_warp = x0, x2
            else:
                flow = _upflow2_multi(flow)
                x0_warp = flow_warp(x0, flow[..., :2])
                x2_warp = flow_warp(x2, flow[..., 2:])
            corr_10 = self._corr(x1, x0_warp)
            corr_12 = self._corr(x1, x2_warp)
            x1_1by1 = leaky_relu(self.adapters[l](x1), _ALPHA)
            feat_10 = jnp.concatenate(
                [x1_1by1, corr_10, corr_12, flow[..., :2], -flow[..., 2:]], -1
            )
            feat_12 = jnp.concatenate(
                [x1_1by1, corr_12, corr_10, flow[..., 2:], -flow[..., :2]], -1
            )
            xi_10, res_10 = self.flow_estimator(feat_10)
            xi_12, res_12 = self.flow_estimator(feat_12)
            flow = flow + jnp.concatenate([res_10, res_12], -1)

            feat_10 = jnp.concatenate([xi_10, xi_12, flow[..., :2], -flow[..., 2:]], -1)
            feat_12 = jnp.concatenate([xi_12, xi_10, flow[..., 2:], -flow[..., :2]], -1)
            fine_10 = self.context_network(feat_10)
            fine_12 = self.context_network(feat_12)
            flow = flow + jnp.concatenate([fine_10, fine_12], -1)
            flows.append(flow)
        if self.upsample:
            flows = [_upflow4_multi(f) for f in flows]
        flows_10 = [f[..., :2] for f in flows[::-1]]
        flows_12 = [f[..., 2:] for f in flows[::-1]]
        return flows_10, flows_12

    def __call__(self, *imgs, with_bk: bool = False, train: bool = False):
        pyramids = [
            self.feature_extractor(img, train=train) for img in imgs
        ]
        n = len(imgs)
        res = {}
        nb = imgs[0].shape[0]
        if n == 2:
            if with_bk and bidir_batch_enabled(default=False):
                # Batched bidirectional pass (same program on swapped
                # pyramids; per-sample numerics unchanged). Default OFF:
                # 227.2 ms/step batched vs 222.6 sequential for the full
                # unflow train step @256x448 b8, chained ground-truth
                # timing (benchmarks/bench_chained_ab.py).
                pa = [
                    jnp.concatenate([a, b], axis=0)
                    for a, b in zip(pyramids[0], pyramids[1])
                ]
                pb = [
                    jnp.concatenate([b, a], axis=0)
                    for a, b in zip(pyramids[0], pyramids[1])
                ]
                flows = self.forward_2_frames(pa, pb)
                res["flows_fw"] = [f[:nb] for f in flows]
                res["flows_bw"] = [f[nb:] for f in flows]
            else:
                res["flows_fw"] = self.forward_2_frames(pyramids[0], pyramids[1])
                if with_bk:
                    res["flows_bw"] = self.forward_2_frames(
                        pyramids[1], pyramids[0]
                    )
        elif n == 3:
            flows_10, flows_12 = self.forward_3_frames(*pyramids)
            res["flows_fw"], res["flows_bw"] = flows_12, flows_10
        elif n == 5:
            if bidir_batch_enabled(default=False):
                # All sliding 3-frame windows ride one batched
                # forward_3_frames. Default OFF: 18.7 ms batched vs 12.6
                # sequential for the b4 5-frame forward @256x448, chained
                # timing (bench_chained_ab.py) — matches the reference's
                # sequential windows (models/pwclite.py:274-280).
                starts = (0, 1, 2) if with_bk else (0, 1)
                levels = len(pyramids[0])
                cat = lambda off: [
                    jnp.concatenate(
                        [pyramids[s + off][l] for s in starts], axis=0
                    )
                    for l in range(levels)
                ]
                flows_10, flows_12 = self.forward_3_frames(
                    cat(0), cat(1), cat(2)
                )
                win = lambda i, flows: [
                    f[i * nb : (i + 1) * nb] for f in flows
                ]
                # window 0: frames 0,1,2 -> (flows_10, flows_12)
                # window 1: frames 1,2,3 -> (flows_21, flows_23)
                # window 2: frames 2,3,4 -> (flows_32, flows_34)
                res["flows_fw"] = [win(0, flows_12), win(1, flows_12)]
                if with_bk:
                    res["flows_bw"] = [win(1, flows_10), win(2, flows_10)]
            else:
                flows_10, flows_12 = self.forward_3_frames(*pyramids[0:3])
                flows_21, flows_23 = self.forward_3_frames(*pyramids[1:4])
                res["flows_fw"] = [flows_12, flows_23]
                if with_bk:
                    flows_32, _ = self.forward_3_frames(*pyramids[2:5])
                    res["flows_bw"] = [flows_21, flows_32]
        else:
            raise NotImplementedError(f"{n} frames")
        if self.dtype is not None:
            res = jax.tree_util.tree_map(
                lambda f: f.astype(jnp.float32), res
            )
        return res


def _upflow2_multi(flow):
    h, w = flow.shape[1], flow.shape[2]
    return resize_bilinear(flow * 2.0, (h * 2, w * 2), align_corners=True)


def _upflow4_multi(flow):
    h, w = flow.shape[1], flow.shape[2]
    return resize_bilinear(flow * 4.0, (h * 4, w * 4), align_corners=True)
