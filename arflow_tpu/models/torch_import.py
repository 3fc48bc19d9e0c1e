"""PyTorch checkpoint importers.

Converts reference checkpoints (torch ``state_dict``) into flax param trees.
Mapping is *name-based* with explicit per-model key tables — deliberately not
the positional zip remap of the reference trainer (trainer/base_trainer.py:64-71),
which silently mis-assigns weights when module ordering changes; see
utils/torch_utils.py:54-79 for the name-based variant this follows.

Weight layout conversions:
- Conv2d OIHW -> HWIO: transpose(2, 3, 1, 0).
- ConvTranspose2d (I,O,kh,kw) -> pre-flipped HWIO used by
  ``ConvTranspose2dTorch``: W.transpose(2,3,0,1) flipped over both spatial
  axes.
"""

from __future__ import annotations

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    t = np.asarray(t)
    if t.dtype == np.float64:
        # Preserve double precision: the lockstep-trajectory parity tests
        # import float64 torch models. Reference checkpoints are float32, so
        # shipping imports are unaffected.
        return t
    return np.asarray(t, dtype=np.float32)


def conv_kernel(w) -> np.ndarray:
    return np.transpose(_np(w), (2, 3, 1, 0))


def deconv_kernel(w) -> np.ndarray:
    w = _np(w)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference ``.pth.tar`` checkpoint into a numpy state dict
    (utils/torch_utils.py:27-37 format: optional {'epoch', 'state_dict'})."""
    import torch

    weights = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in weights:
        weights = weights["state_dict"]
    weights.pop("epoch", None)
    return {k: _np(v) for k, v in weights.items()}


def _conv_entry(sd, torch_name):
    entry = {"kernel": conv_kernel(sd[f"{torch_name}.weight"])}
    if f"{torch_name}.bias" in sd:
        entry["bias"] = _np(sd[f"{torch_name}.bias"])
    return entry


def _deconv_entry(sd, torch_name):
    entry = {"kernel": deconv_kernel(sd[f"{torch_name}.weight"])}
    if f"{torch_name}.bias" in sd:
        entry["bias"] = _np(sd[f"{torch_name}.bias"])
    return entry


def import_feature_pyramid(sd, prefix: str, filters=((3,), (3,), (3,), (3,), (3,))):
    """models/uflow_model.py:364-470 pyramid: ``{prefix}._convs.{l}.{i}``."""
    params = {}
    level = 0
    while f"{prefix}._convs.{level}.0.weight" in sd:
        i = 0
        while f"{prefix}._convs.{level}.{i}.weight" in sd:
            params[f"conv_l{level}_{i}"] = _conv_entry(sd, f"{prefix}._convs.{level}.{i}")
            i += 1
        level += 1
    return params


def import_uflow(sd, num_levels: int = 5, num_decoder_convs: int = 5) -> dict:
    """Import reference PWCFlow (models/uflow_model.py:96-361) weights."""
    params = {}
    params["feature_pyramid"] = import_feature_pyramid(sd, "_feature_pyramid_extractor")

    for level in range(1, num_levels):
        for j in range(num_decoder_convs):
            params[f"flow_l{level}_c{j}"] = _conv_entry(
                sd, f"_flow_layers.{level}.{j}.0"
            )
        params[f"flow_l{level}_out"] = _conv_entry(
            sd, f"_flow_layers.{level}.{num_decoder_convs}"
        )
        params[f"context_up_l{level}"] = _deconv_entry(sd, f"_context_up_layers.{level}")

    # Refinement ModuleList interleaves Conv2d and LeakyReLU
    # (uflow_model.py:325-348): conv indices 0,2,...,2*(n-1), final at 2n.
    j = 0
    idx = 0
    while f"_refine_model.{idx}.weight" in sd:
        next_idx = idx + 2
        if f"_refine_model.{next_idx}.weight" in sd:
            params[f"refine_{j}"] = _conv_entry(sd, f"_refine_model.{idx}")
            j += 1
        else:
            params["refine_out"] = _conv_entry(sd, f"_refine_model.{idx}")
        idx = next_idx
    return params


# ---------------------------------------------------------------------------
# PWC-Lite family (models/pwclite.py, models/pwclite_prob.py,
# models/pwclite_uflow.py). conv() there is Sequential(Conv2d, LeakyReLU), so
# torch keys carry a trailing '.0'.
# ---------------------------------------------------------------------------

def _import_lite_pyramid(sd, prefix="feature_pyramid_extractor"):
    fp = {}
    level = 0
    while f"{prefix}.convs.{level}.0.0.weight" in sd:
        j = 0
        while f"{prefix}.convs.{level}.{j}.0.weight" in sd:
            fp[f"conv_l{level}_{j}"] = _conv_entry(sd, f"{prefix}.convs.{level}.{j}.0")
            j += 1
        level += 1
    return fp


def _import_lite_estimator(sd, prefix, reduce_dense):
    est = {}
    for i in range(1, 6):
        est[f"conv{i}"] = _conv_entry(sd, f"{prefix}.conv{i}.0")
    if reduce_dense:
        est["predict_flow"] = _conv_entry(sd, f"{prefix}.predict_flow.0")
    else:
        est["conv_last"] = _conv_entry(sd, f"{prefix}.conv_last.0")
    return est


def _import_lite_context(sd, prefix="context_networks"):
    ctx = {}
    for i in range(6):
        ctx[f"ctx_{i}"] = _conv_entry(sd, f"{prefix}.convs.{i}.0")
    ctx["ctx_out"] = _conv_entry(sd, f"{prefix}.convs.6.0")
    return ctx


def import_pwclite(sd, reduce_dense: bool = True) -> dict:
    """Import reference PWCLite / PWCLiteProb weights (same key structure)."""
    params = {"feature_pyramid": _import_lite_pyramid(sd)}
    params["flow_estimator"] = _import_lite_estimator(
        sd, "flow_estimators", reduce_dense
    )
    params["context_network"] = _import_lite_context(sd)
    for level in range(5):
        params[f"conv_1x1_{level}"] = _conv_entry(sd, f"conv_1x1.{level}.0")
    return params


def import_pwclite_uflow(sd, reduce_dense: bool = True, output_level: int = 3) -> dict:
    """Import reference PWCLiteUflow weights (models/pwclite_uflow.py)."""
    params = {"feature_pyramid": _import_lite_pyramid(sd)}
    for level in range(output_level + 1):
        params[f"flow_estimator_{level}"] = _import_lite_estimator(
            sd, f"flow_estimators.{level}", reduce_dense
        )
    for level in range(output_level):
        params[f"deconv_{level}"] = _deconv_entry(sd, f"deconv_networks.{level}")
    params["context_network"] = _import_lite_context(sd)
    return params


# ---------------------------------------------------------------------------
# Probabilistic UFlow family (models/uflow_prob_model.py)
# ---------------------------------------------------------------------------

def _import_bn(sd, torch_name):
    return {
        "scale": _np(sd[f"{torch_name}.weight"]),
        "bias": _np(sd[f"{torch_name}.bias"]),
    }, {
        "mean": _np(sd[f"{torch_name}.running_mean"]),
        "var": _np(sd[f"{torch_name}.running_var"]),
    }


def import_resnet(sd, prefix="resnet", layers=(2, 2, 2, 2)):
    """Import the MixtureWeightsNet ResNet (uflow_prob_model.py:622-690).
    Returns (params, batch_stats)."""
    if prefix:
        plen = len(prefix) + 1
        sd = {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}
    prefix = None
    params, stats = {}, {}
    params["conv1"] = {"kernel": conv_kernel(sd["conv1.0.weight"])}
    params["bn1"], stats["bn1"] = _import_bn(sd, "conv1.1")
    for stage, blocks in enumerate(layers):
        for blk in range(blocks):
            tp = f"layer{stage}.{blk}"
            name = f"layer{stage}_block{blk}"
            p, s = {}, {}
            p["conv1"] = {"kernel": conv_kernel(sd[f"{tp}.conv1.0.weight"])}
            p["bn1"], s["bn1"] = _import_bn(sd, f"{tp}.conv1.1")
            p["conv2"] = {"kernel": conv_kernel(sd[f"{tp}.conv2.0.weight"])}
            p["bn2"], s["bn2"] = _import_bn(sd, f"{tp}.conv2.1")
            if f"{tp}.downsample.0.weight" in sd:
                p["downsample_conv"] = _conv_entry(sd, f"{tp}.downsample.0")
                p["downsample_bn"], s["downsample_bn"] = _import_bn(
                    sd, f"{tp}.downsample.1"
                )
            params[name] = p
            stats[name] = s
    params["fc"] = {
        "kernel": _np(sd["fc.weight"]).T,
        "bias": _np(sd["fc.bias"]),
    }
    return params, stats


def import_uflow_prob(
    sd, n_pyramids: int = 1, num_levels: int = 5, num_decoder_convs: int = 5,
    mixture_weights: bool = False,
) -> dict:
    """Import reference PWCProbFlow weights (models/uflow_prob_model.py:149-412).
    Returns {'params': ..., 'batch_stats': ...} if mixture_weights else params.
    """
    params = {}
    for k in range(n_pyramids):
        params[f"feature_pyramid_{k}"] = import_feature_pyramid(
            sd, f"_feature_pyramid_extractor.{k}"
        )
    for level in range(1, num_levels):
        for j in range(num_decoder_convs):
            params[f"flow_l{level}_c{j}"] = _conv_entry(
                sd, f"_flow_layers.{level}.{j}.0"
            )
        params[f"flow_l{level}_out"] = _conv_entry(
            sd, f"_flow_layers.{level}.{num_decoder_convs}"
        )
        params[f"context_up_l{level}"] = _deconv_entry(
            sd, f"_context_up_layers.{level}"
        )
    j = 0
    idx = 0
    while f"_refine_model.{idx}.weight" in sd:
        next_idx = idx + 2
        if f"_refine_model.{next_idx}.weight" in sd:
            params[f"refine_{j}"] = _conv_entry(sd, f"_refine_model.{idx}")
            j += 1
        else:
            params["refine_out"] = _conv_entry(sd, f"_refine_model.{idx}")
        idx = next_idx
    if not mixture_weights:
        return params
    rp, rs = import_resnet(sd, "_mixture_weights_net.resnet")
    params["mixture_weights_net"] = {"resnet": rp}
    return {"params": params, "batch_stats": {"mixture_weights_net": {"resnet": rs}}}


def import_component_net(sd) -> dict:
    """Import reference ComponentNet (uflow_prob_model.py:109-146)."""
    sd1 = {k[len("pwcnet1."):]: v for k, v in sd.items() if k.startswith("pwcnet1.")}
    sd2 = {k[len("pwcnet2."):]: v for k, v in sd.items() if k.startswith("pwcnet2.")}
    params = {
        "pwcnet1": import_uflow_prob(sd1),
        "pwcnet2": import_uflow_prob(sd2),
    }
    if any(k.startswith("mixture_weights_net.") for k in sd):
        rp, rs = import_resnet(sd, "mixture_weights_net.resnet")
        params["mixture_weights_net"] = {"resnet": rp}
        return {
            "params": params,
            "batch_stats": {"mixture_weights_net": {"resnet": rs}},
        }
    return params
