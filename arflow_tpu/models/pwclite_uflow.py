"""PWC-Lite-UFlow hybrid: thin pyramid, per-level estimators, deconv context.

Reference: models/pwclite_uflow.py:131-283. Channels [3,16,32,32,32,32]
(3 convs per level, input rescaled to [-1,1]), per-level (non-shared)
estimators fed deconvolved activations from the coarser level, joint feature
normalization before correlation, whole-level dropout, configurable
align_corners / warp padding; context refinement at the output level; two 2x
upsamples appended. Output finest-first: [full, 1/2, 1/4, 1/8, 1/16, 1/32].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from arflow_tpu.models.bidir import bidir_batch_enabled, wfold_pyramid_enabled
from arflow_tpu.models.layers import (
    Conv2dNPad,
    ConvTranspose2dTorch,
    kaiming_normal,
    leaky_relu,
    wfold_begin,
    wfold_level_check,
    wfold_unfold,
)
from arflow_tpu.models.pwclite import (
    ContextNetwork,
    FlowEstimatorDense,
    FlowEstimatorReduce,
    _ALPHA,
)
from arflow_tpu.ops import compute_cost_volume, flow_warp, resize_bilinear


def _normalize_features_joint(features_list):
    """Joint standardization over concatenated channels and pixels per sample
    (models/pwclite_uflow.py:32-40; unbiased variance like torch.var)."""
    features = jnp.concatenate(features_list, axis=-1)
    mean = jnp.mean(features, axis=(1, 2, 3), keepdims=True)
    n = features.shape[1] * features.shape[2] * features.shape[3]
    var = jnp.sum(jnp.square(features - mean), axis=(1, 2, 3), keepdims=True) / max(
        n - 1, 1
    )
    std = jnp.sqrt(var + 1e-16)
    return [(f - mean) / std for f in features_list]


class ThinFeatureExtractor(nn.Module):
    """models/pwclite_uflow.py:42-66: 3 convs per level, [-1,1] rescale."""

    num_chs = (3, 16, 32, 32, 32, 32)
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); params f32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x * 2.0 - 1.0
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # All levels are thin (16/32 channels) — the whole pyramid rides
        # the W-fold relayout at inference (bidir.wfold_pyramid_enabled).
        folded = False
        if wfold_pyramid_enabled(default=not train):
            x, folded = wfold_begin(x)
        pyramid = []
        for level, ch_out in enumerate(self.num_chs[1:]):
            x, folded = wfold_level_check(x, folded, ch_out)
            convs = [
                Conv2dNPad(ch_out, 3, stride=2 if i == 0 else 1,
                           kernel_init=kaiming_normal,
                           name=f"conv_l{level}_{i}", dtype=self.dtype)
                for i in range(3)
            ]
            for i, conv in enumerate(convs):
                if folded:
                    x = conv(x, wfold="s2" if i == 0 else "s1")
                else:
                    x = conv(x)
                x = leaky_relu(x, _ALPHA)
            pyramid.append(wfold_unfold(x, ch_out) if folded else x)
        return pyramid[::-1]


class PWCLiteUflow(nn.Module):
    n_frames: int = 2
    reduce_dense: bool = True
    level_dropout: float = 0.0
    feature_norm: bool = False
    align_corners: bool = True
    warp_pad: str = "zeros"
    search_range: int = 4
    output_level: int = 3  # top-to-bottom index; stops at 1/4 resolution
    deconv_chs: int = 32
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); outputs are f32

    def setup(self):
        self.feature_extractor = ThinFeatureExtractor(
            name="feature_pyramid", dtype=self.dtype
        )
        estimator_cls = FlowEstimatorReduce if self.reduce_dense else FlowEstimatorDense
        self.estimators = [
            estimator_cls(ch_out=2, name=f"flow_estimator_{l}", dtype=self.dtype)
            for l in range(self.output_level + 1)
        ]
        self.context_network = ContextNetwork(
            ch_out=2, name="context_network", dtype=self.dtype
        )
        self.deconvs = [
            ConvTranspose2dTorch(
                self.deconv_chs, kernel_size=4, stride=2, padding=1,
                name=f"deconv_{l}", dtype=self.dtype,
            )
            for l in range(self.output_level)
        ]

    def _dropout(self, tensors, train, num_groups: int = 1):
        if not train or self.level_dropout <= 0:
            return tensors
        rng = self.make_rng("dropout")
        if num_groups == 1:
            keep = (jax.random.uniform(rng, ()) > self.level_dropout).astype(
                tensors[0].dtype
            )
            return [t * keep for t in tensors]
        # Batched bidirectional forward: independent draw per direction group.
        keep = (
            jax.random.uniform(rng, (num_groups,)) > self.level_dropout
        ).astype(tensors[0].dtype)
        b = tensors[0].shape[0] // num_groups
        keep = jnp.repeat(keep, b).reshape(-1, 1, 1, 1)
        return [t * keep for t in tensors]

    def forward_2_frames(self, p1, p2, train=False, num_groups: int = 1):
        b, h, w, _ = p1[0].shape
        flow = jnp.zeros((b, h, w, 2), p1[0].dtype)
        flows = []
        act = None
        for l in range(self.output_level + 1):
            x1, x2 = p1[l], p2[l]
            if l == 0:
                x2_warp = x2
            else:
                flow = resize_bilinear(
                    flow * 2.0,
                    (flow.shape[1] * 2, flow.shape[2] * 2),
                    align_corners=self.align_corners,
                )
                x2_warp = flow_warp(
                    x2, flow, align_corners=self.align_corners, pad=self.warp_pad
                )
            if self.feature_norm:
                x1, x2_warp = _normalize_features_joint([x1, x2_warp])
            corr = leaky_relu(
                compute_cost_volume(x1, x2_warp, self.search_range), _ALPHA
            )
            if l == 0:
                act, flow_res = self.estimators[l](
                    jnp.concatenate([corr, x1, flow], -1)
                )
            else:
                act_deconv = self.deconvs[l - 1](act)
                act, flow_res = self.estimators[l](
                    jnp.concatenate([corr, x1, flow, act_deconv], -1)
                )
            flow_res, act = self._dropout([flow_res, act], train, num_groups)
            flow = flow + flow_res
            flows.append(flow)

        flow_fine = self.context_network(jnp.concatenate([act, flow], -1))
        (flow_fine,) = self._dropout([flow_fine], train, num_groups)
        flow = flow + flow_fine
        flows[-1] = flow

        for _ in range(2):
            flow = resize_bilinear(
                flow * 2.0,
                (flow.shape[1] * 2, flow.shape[2] * 2),
                align_corners=self.align_corners,
            )
            flows.append(flow)
        return flows[::-1]

    def __call__(self, img1, img2, with_bk: bool = False, train: bool = False):
        p1 = self.feature_extractor(img1, train=train)
        p2 = self.feature_extractor(img2, train=train)
        if with_bk and bidir_batch_enabled(default=False):
            # TPU fast path: fw + bw in one 2B pass (see PWCLite.__call__);
            # feature standardization is per-sample so halves never mix.
            pa = [jnp.concatenate([a, b], axis=0) for a, b in zip(p1, p2)]
            pb = [jnp.concatenate([b, a], axis=0) for a, b in zip(p1, p2)]
            flows = self.forward_2_frames(pa, pb, train, num_groups=2)
            nb = img1.shape[0]
            res = {
                "flows_fw": [f[:nb] for f in flows],
                "flows_bw": [f[nb:] for f in flows],
            }
        else:
            res = {"flows_fw": self.forward_2_frames(p1, p2, train)}
            if with_bk:
                res["flows_bw"] = self.forward_2_frames(p2, p1, train)
        if self.dtype is not None:
            res = jax.tree_util.tree_map(
                lambda f: f.astype(jnp.float32), res
            )
        return res
