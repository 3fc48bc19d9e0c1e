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
