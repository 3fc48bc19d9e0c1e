"""PyTorch checkpoint exporters — the exact inverse of torch_import.

Converts arflow_tpu flax param trees back into reference ``state_dict``
key/layout conventions so a model trained on TPU can be loaded by the
PyTorch reference (deu439/ARFlow) with ``load_state_dict(strict=True)``
(the name-based restore of reference utils/torch_utils.py:54-79). Together
with torch_import this makes checkpoint interop a round trip; the round-trip
identity is pinned bitwise per family in tests/test_torch_export.py.

Weight layout inversions (see torch_import.py:9-13 for the forward maps):
- Conv2d HWIO -> OIHW: transpose(3, 2, 0, 1).
- ConvTranspose2d: un-flip both spatial axes, then (kh,kw,I,O) -> (I,O,kh,kw).
- BatchNorm: scale/bias -> weight/bias; batch_stats mean/var ->
  running_mean/running_var (+ a zero ``num_batches_tracked`` for strict
  loading; the reference never reads it).
- Linear: kernel (in,out) -> weight (out,in).
"""

from __future__ import annotations

import numpy as np


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def conv_kernel_inv(k) -> np.ndarray:
    """HWIO -> OIHW (inverse of torch_import.conv_kernel)."""
    return np.ascontiguousarray(np.transpose(_np(k), (3, 2, 0, 1)))


def deconv_kernel_inv(k) -> np.ndarray:
    """Pre-flipped HWIO-style deconv kernel -> torch (I, O, kh, kw)."""
    k = _np(k)[::-1, ::-1]
    return np.ascontiguousarray(np.transpose(k, (2, 3, 0, 1)))


def _put_conv(sd, torch_name, entry):
    sd[f"{torch_name}.weight"] = conv_kernel_inv(entry["kernel"])
    if "bias" in entry:
        sd[f"{torch_name}.bias"] = _np(entry["bias"])


def _put_deconv(sd, torch_name, entry):
    sd[f"{torch_name}.weight"] = deconv_kernel_inv(entry["kernel"])
    if "bias" in entry:
        sd[f"{torch_name}.bias"] = _np(entry["bias"])


def _level_conv_keys(params, fmt_prefix):
    """Sorted (level, i) pairs present as ``conv_l{level}_{i}`` keys."""
    pairs = []
    for k in params:
        if k.startswith("conv_l"):
            lvl, i = k[len("conv_l"):].split("_")
            pairs.append((int(lvl), int(i)))
    return sorted(pairs)


def export_feature_pyramid(params, prefix: str, sd=None) -> dict:
    """Inverse of import_feature_pyramid: ``{prefix}._convs.{l}.{i}``."""
    sd = {} if sd is None else sd
    for lvl, i in _level_conv_keys(params, prefix):
        _put_conv(sd, f"{prefix}._convs.{lvl}.{i}", params[f"conv_l{lvl}_{i}"])
    return sd


def _export_uflow_decoder(params, sd):
    """flow layers / context up-convs / refinement stack shared by PWCFlow
    and PWCProbFlow (reference models/uflow_model.py:275-348)."""
    levels = sorted(
        int(k[len("flow_l"):].split("_")[0])
        for k in params if k.startswith("flow_l") and k.endswith("_out")
    )
    for level in levels:
        convs = sorted(
            int(k.split("_c")[1])
            for k in params if k.startswith(f"flow_l{level}_c")
        )
        for j in convs:
            _put_conv(sd, f"_flow_layers.{level}.{j}.0", params[f"flow_l{level}_c{j}"])
        _put_conv(sd, f"_flow_layers.{level}.{len(convs)}", params[f"flow_l{level}_out"])
        _put_deconv(sd, f"_context_up_layers.{level}", params[f"context_up_l{level}"])
    # The reference constructs a context up-conv for EVERY level including 0
    # (uflow_model.py:275-284 loops range(num_levels)) but its forward never
    # applies _context_up_layers.0 (the coarse-to-fine loop stops at level 1).
    # The weight therefore doesn't exist in the jax tree; emit a zero
    # placeholder of the shared shape so load_state_dict(strict=True) works.
    if levels and 0 not in levels:
        ref = params[f"context_up_l{levels[0]}"]
        sd["_context_up_layers.0.weight"] = np.zeros_like(
            deconv_kernel_inv(ref["kernel"])
        )
        if "bias" in ref:
            sd["_context_up_layers.0.bias"] = np.zeros_like(_np(ref["bias"]))
    refine = sorted(
        int(k[len("refine_"):])
        for k in params if k.startswith("refine_") and k != "refine_out"
    )
    for j in refine:
        _put_conv(sd, f"_refine_model.{2 * j}", params[f"refine_{j}"])
    if "refine_out" in params:
        _put_conv(sd, f"_refine_model.{2 * len(refine)}", params["refine_out"])


def export_uflow(params) -> dict:
    """Inverse of import_uflow (reference PWCFlow, models/uflow_model.py)."""
    sd = {}
    export_feature_pyramid(
        params["feature_pyramid"], "_feature_pyramid_extractor", sd
    )
    _export_uflow_decoder(params, sd)
    return sd


# ---------------------------------------------------------------------------
# PWC-Lite family (torch conv() = Sequential(Conv2d, LeakyReLU) -> '.0' keys)
# ---------------------------------------------------------------------------

def _export_lite_pyramid(params, sd, prefix="feature_pyramid_extractor"):
    for lvl, j in _level_conv_keys(params, prefix):
        _put_conv(sd, f"{prefix}.convs.{lvl}.{j}.0", params[f"conv_l{lvl}_{j}"])


def _export_lite_estimator(params, sd, prefix):
    for i in range(1, 6):
        _put_conv(sd, f"{prefix}.conv{i}.0", params[f"conv{i}"])
    if "predict_flow" in params:
        _put_conv(sd, f"{prefix}.predict_flow.0", params["predict_flow"])
    else:
        _put_conv(sd, f"{prefix}.conv_last.0", params["conv_last"])


def _export_lite_context(params, sd, prefix="context_networks"):
    i = 0
    while f"ctx_{i}" in params:
        _put_conv(sd, f"{prefix}.convs.{i}.0", params[f"ctx_{i}"])
        i += 1
    _put_conv(sd, f"{prefix}.convs.{i}.0", params["ctx_out"])


def export_pwclite(params) -> dict:
    """Inverse of import_pwclite (PWCLite / PWCLiteProb share the layout)."""
    sd = {}
    _export_lite_pyramid(params["feature_pyramid"], sd)
    _export_lite_estimator(params["flow_estimator"], sd, "flow_estimators")
    _export_lite_context(params["context_network"], sd)
    level = 0
    while f"conv_1x1_{level}" in params:
        _put_conv(sd, f"conv_1x1.{level}.0", params[f"conv_1x1_{level}"])
        level += 1
    return sd


def export_pwclite_uflow(params) -> dict:
    """Inverse of import_pwclite_uflow (models/pwclite_uflow.py)."""
    sd = {}
    _export_lite_pyramid(params["feature_pyramid"], sd)
    level = 0
    while f"flow_estimator_{level}" in params:
        _export_lite_estimator(
            params[f"flow_estimator_{level}"], sd, f"flow_estimators.{level}"
        )
        level += 1
    level = 0
    while f"deconv_{level}" in params:
        _put_deconv(sd, f"deconv_networks.{level}", params[f"deconv_{level}"])
        level += 1
    _export_lite_context(params["context_network"], sd)
    return sd


# ---------------------------------------------------------------------------
# Probabilistic UFlow family
# ---------------------------------------------------------------------------

def _put_bn(sd, torch_name, p, s):
    sd[f"{torch_name}.weight"] = _np(p["scale"])
    sd[f"{torch_name}.bias"] = _np(p["bias"])
    sd[f"{torch_name}.running_mean"] = _np(s["mean"])
    sd[f"{torch_name}.running_var"] = _np(s["var"])
    sd[f"{torch_name}.num_batches_tracked"] = np.zeros((), dtype=np.int64)


def export_resnet(params, stats, prefix="resnet", sd=None) -> dict:
    """Inverse of import_resnet (MixtureWeightsNet backbone)."""
    sd = {} if sd is None else sd
    pre = f"{prefix}." if prefix else ""
    sd[f"{pre}conv1.0.weight"] = conv_kernel_inv(params["conv1"]["kernel"])
    _put_bn(sd, f"{pre}conv1.1", params["bn1"], stats["bn1"])
    for name in params:
        if not name.startswith("layer"):
            continue
        stage, blk = name[len("layer"):].split("_block")
        tp = f"{pre}layer{stage}.{blk}"
        p, s = params[name], stats[name]
        sd[f"{tp}.conv1.0.weight"] = conv_kernel_inv(p["conv1"]["kernel"])
        _put_bn(sd, f"{tp}.conv1.1", p["bn1"], s["bn1"])
        sd[f"{tp}.conv2.0.weight"] = conv_kernel_inv(p["conv2"]["kernel"])
        _put_bn(sd, f"{tp}.conv2.1", p["bn2"], s["bn2"])
        if "downsample_conv" in p:
            _put_conv(sd, f"{tp}.downsample.0", p["downsample_conv"])
            _put_bn(sd, f"{tp}.downsample.1", p["downsample_bn"], s["downsample_bn"])
    sd[f"{pre}fc.weight"] = np.ascontiguousarray(_np(params["fc"]["kernel"]).T)
    sd[f"{pre}fc.bias"] = _np(params["fc"]["bias"])
    return sd


def _split_variables(variables):
    """Accept either bare params or {'params', 'batch_stats'} trees."""
    if "params" in variables and isinstance(variables["params"], dict) and (
        "batch_stats" in variables
    ):
        return variables["params"], variables["batch_stats"]
    return variables, {}


def export_uflow_prob(variables) -> dict:
    """Inverse of import_uflow_prob (reference PWCProbFlow)."""
    params, batch_stats = _split_variables(variables)
    sd = {}
    k = 0
    while f"feature_pyramid_{k}" in params:
        export_feature_pyramid(
            params[f"feature_pyramid_{k}"], f"_feature_pyramid_extractor.{k}", sd
        )
        k += 1
    _export_uflow_decoder(params, sd)
    if "mixture_weights_net" in params:
        export_resnet(
            params["mixture_weights_net"]["resnet"],
            batch_stats["mixture_weights_net"]["resnet"],
            prefix="_mixture_weights_net.resnet",
            sd=sd,
        )
    return sd


def export_component_net(variables) -> dict:
    """Inverse of import_component_net (reference ComponentNet)."""
    params, batch_stats = _split_variables(variables)
    sd = {}
    for net in ("pwcnet1", "pwcnet2"):
        for key, val in export_uflow_prob(params[net]).items():
            sd[f"{net}.{key}"] = val
    if "mixture_weights_net" in params:
        export_resnet(
            params["mixture_weights_net"]["resnet"],
            batch_stats["mixture_weights_net"]["resnet"],
            prefix="mixture_weights_net.resnet",
            sd=sd,
        )
    return sd


def export_state_dict(variables, model_cfg) -> dict:
    """Dispatch on model_cfg.type (mirrors checkpoint.load_pretrained)."""
    t = model_cfg["type"] if isinstance(model_cfg, dict) else model_cfg.type
    params, _ = _split_variables(variables)
    if t == "uflow":
        return export_uflow(params)
    if t == "uflow_prob":
        return export_uflow_prob(variables)
    if t == "component":
        return export_component_net(variables)
    if t in ("pwclite", "pwclite_prob"):
        return export_pwclite(params)
    if t == "pwclite_uflow":
        return export_pwclite_uflow(params)
    raise NotImplementedError(f"torch export for model type {t}")


def save_torch_checkpoint(path: str, variables, model_cfg, epoch: int = 0):
    """Write a reference-format ``.pth.tar`` ({'epoch', 'state_dict'},
    utils/torch_utils.py:27-37) loadable by the reference's name-based
    ``restore_model`` and by ``load_state_dict(strict=True)``."""
    import torch

    sd = export_state_dict(variables, model_cfg)
    torch.save(
        {"epoch": epoch,
         "state_dict": {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}},
        path,
    )
    return path
