"""PWC-Lite-Prob: PWCLite predicting [flow(2), log_var(2)] per level.

Reference: models/pwclite_prob.py:112-233. Log-variance is initialized to 1,
upsampled with a +2*log(2) bias per resolution doubling, and clamped at 10.
2-frame only. Output per level: (B,H,W,4) = [flow, log_var], finest first.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from arflow_tpu.models.bidir import bidir_batch_enabled
from arflow_tpu.models.layers import leaky_relu
from arflow_tpu.models.pwclite import (
    ContextNetwork,
    FeatureExtractor,
    FlowEstimatorDense,
    FlowEstimatorReduce,
    _conv,
    _ALPHA,
)
from arflow_tpu.ops import compute_cost_volume, flow_warp, resize_bilinear


def _up2(x, bias=0.0, scale=1.0):
    h, w = x.shape[1], x.shape[2]
    return resize_bilinear(x * scale + bias, (h * 2, w * 2), align_corners=True)


class PWCLiteProb(nn.Module):
    n_frames: int = 2
    upsample: bool = True
    reduce_dense: bool = True
    search_range: int = 4
    output_level: int = 4
    dtype: object = None  # compute dtype (e.g. jnp.bfloat16); outputs are f32

    def setup(self):
        self.feature_extractor = FeatureExtractor(
            name="feature_pyramid", dtype=self.dtype
        )
        estimator_cls = FlowEstimatorReduce if self.reduce_dense else FlowEstimatorDense
        self.flow_estimator = estimator_cls(
            ch_out=4, name="flow_estimator", dtype=self.dtype
        )
        self.context_network = ContextNetwork(
            ch_out=4, name="context_network", dtype=self.dtype
        )
        self.adapters = [
            _conv(32, kernel_size=1, name=f"conv_1x1_{l}", dtype=self.dtype)
            for l in range(5)
        ]

    def forward_2_frames(self, p1, p2):
        b, h, w, _ = p1[0].shape
        dtype = p1[0].dtype
        flow = jnp.zeros((b, h, w, 2), dtype)
        log_var = jnp.ones((b, h, w, 2), dtype)
        flows, log_vars = [], []
        for l in range(self.output_level + 1):
            x1, x2 = p1[l], p2[l]
            if l == 0:
                x2_warp = x2
            else:
                flow = _up2(flow, scale=2.0)
                log_var = _up2(log_var, bias=2 * math.log(2))
                x2_warp = flow_warp(x2, flow)
            corr = leaky_relu(
                compute_cost_volume(x1, x2_warp, self.search_range), _ALPHA
            )
            x1_1by1 = leaky_relu(self.adapters[l](x1), _ALPHA)
            x_intm, out = self.flow_estimator(
                jnp.concatenate([corr, x1_1by1, flow, log_var], -1)
            )
            flow = flow + out[..., 0:2]
            log_var = log_var + out[..., 2:4]

            out = self.context_network(jnp.concatenate([x_intm, flow, log_var], -1))
            flow = flow + out[..., 0:2]
            log_var = jnp.minimum(log_var + out[..., 2:4], 10.0)

            flows.append(flow)
            log_vars.append(log_var)
        if self.upsample:
            up4 = lambda t, bias=0.0, scale=1.0: resize_bilinear(
                t * scale + bias,
                (t.shape[1] * 4, t.shape[2] * 4),
                align_corners=True,
            )
            flows = [up4(f, scale=4.0) for f in flows]
            log_vars = [up4(v, bias=2 * math.log(4)) for v in log_vars]
        outputs = [jnp.concatenate([f, v], -1) for f, v in zip(flows, log_vars)]
        return outputs[::-1]

    def __call__(self, img1, img2, with_bk: bool = False, train: bool = False):
        p1 = self.feature_extractor(img1, train=train)
        p2 = self.feature_extractor(img2, train=train)
        if with_bk and bidir_batch_enabled(default=False):
            # TPU fast path: fw + bw in one 2B pass (see PWCLite.__call__).
            pa = [jnp.concatenate([a, b], axis=0) for a, b in zip(p1, p2)]
            pb = [jnp.concatenate([b, a], axis=0) for a, b in zip(p1, p2)]
            outs = self.forward_2_frames(pa, pb)
            nb = img1.shape[0]
            res = {
                "flows_fw": [o[:nb] for o in outs],
                "flows_bw": [o[nb:] for o in outs],
            }
        else:
            res = {"flows_fw": self.forward_2_frames(p1, p2)}
            if with_bk:
                res["flows_bw"] = self.forward_2_frames(p2, p1)
        if self.dtype is not None:
            res = jax.tree_util.tree_map(
                lambda f: f.astype(jnp.float32), res
            )
        return res
