"""Round-trip checkpoint interop: torch state_dict -> import -> export.

The exporter must reproduce the reference's state_dict bitwise (pure layout
transposes both ways) so a TPU-trained model loads into the PyTorch reference
with load_state_dict(strict=True) — the reverse direction of the migration
path (reference utils/torch_utils.py:54-79 restore conventions).
"""

import numpy as np
import torch

from tests.reference_oracle import import_reference
from arflow_tpu.config import Config
from arflow_tpu.models import torch_import as ti
from arflow_tpu.models import torch_export as te

pwclite_ref = import_reference("models.pwclite")
pwclite_uflow_ref = import_reference("models.pwclite_uflow")
uflow_ref = import_reference("models.uflow_model")
prob_ref = import_reference("models.uflow_prob_model")


def _np_sd(state_dict):
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def _assert_roundtrip(sd, exported, dead_keys=()):
    """Bitwise key-by-key equality, except ``dead_keys`` (reference modules
    its forward never applies — exported as shape-matched zero placeholders
    since the weight doesn't exist in the jax tree)."""
    assert set(exported) == set(sd), (
        f"missing: {set(sd) - set(exported)}; extra: {set(exported) - set(sd)}"
    )
    for k in sd:
        if any(k.endswith(d) or d in k for d in dead_keys):
            assert exported[k].shape == sd[k].shape, k
            continue
        np.testing.assert_array_equal(
            exported[k].astype(np.float32),
            sd[k].astype(np.float32),
            err_msg=k,
        )


def test_pwclite_roundtrip_and_strict_load():
    torch.manual_seed(0)
    cfg = Config({"n_frames": 2, "upsample": True, "reduce_dense": True})
    ref = pwclite_ref.PWCLite(cfg)
    sd = _np_sd(ref.state_dict())

    params = ti.import_pwclite(sd, reduce_dense=True)
    exported = te.export_pwclite(params)
    _assert_roundtrip(sd, exported)

    # A fresh reference model must accept the exported dict strict=True and
    # become weight-identical to the original.
    torch.manual_seed(1)
    fresh = pwclite_ref.PWCLite(cfg)
    fresh.load_state_dict({k: torch.from_numpy(v) for k, v in exported.items()},
                          strict=True)
    for k, v in _np_sd(fresh.state_dict()).items():
        np.testing.assert_array_equal(v, sd[k], err_msg=k)


def test_pwclite_no_reduce_roundtrip():
    torch.manual_seed(0)
    cfg = Config({"n_frames": 2, "upsample": True, "reduce_dense": False})
    ref = pwclite_ref.PWCLite(cfg)
    sd = _np_sd(ref.state_dict())
    exported = te.export_pwclite(ti.import_pwclite(sd, reduce_dense=False))
    _assert_roundtrip(sd, exported)


def test_pwclite_uflow_roundtrip():
    torch.manual_seed(0)
    cfg = Config({
        "n_frames": 2, "upsample": True, "reduce_dense": True,
        "feature_norm": True, "level_dropout": 0.0,
        "align_corners": True, "warp_pad": "border",
    })
    ref = pwclite_uflow_ref.PWCLiteUflow(cfg)
    sd = _np_sd(ref.state_dict())
    exported = te.export_pwclite_uflow(ti.import_pwclite_uflow(sd))
    _assert_roundtrip(sd, exported)


def test_uflow_roundtrip():
    torch.manual_seed(0)
    ref = uflow_ref.PWCFlow(Config({"feature_norm": True, "level_dropout": 0.0}))
    sd = _np_sd(ref.state_dict())
    exported = te.export_uflow(ti.import_uflow(sd))
    _assert_roundtrip(sd, exported, dead_keys=("_context_up_layers.0.",))

    # strict load into a fresh reference model must succeed.
    torch.manual_seed(1)
    fresh = uflow_ref.PWCFlow(Config({"feature_norm": True, "level_dropout": 0.0}))
    fresh.load_state_dict({k: torch.from_numpy(v) for k, v in exported.items()},
                          strict=True)


def test_uflow_prob_multi_pyramid_roundtrip():
    torch.manual_seed(0)
    cfg = Config({
        "feature_norm": True, "level_dropout": 0.0,
        "out_channels": [2, 2, 0], "inv_cov": False,
        "n_pyramids": 2, "mixture_weights": False,
    })
    ref = prob_ref.PWCProbFlow(cfg)
    sd = _np_sd(ref.state_dict())
    exported = te.export_uflow_prob(ti.import_uflow_prob(sd, n_pyramids=2))
    _assert_roundtrip(sd, exported, dead_keys=("_context_up_layers.0.",))


def test_resnet_roundtrip():
    torch.manual_seed(0)
    ref = prob_ref.ResNet(prob_ref.ResidualBlock, [2, 2, 2, 2], in_channels=8,
                          num_classes=2)
    sd = _np_sd(ref.state_dict())
    params, stats = ti.import_resnet(sd, prefix="")
    exported = te.export_resnet(params, stats, prefix="")
    _assert_roundtrip(sd, exported)


def test_export_state_dict_dispatch_and_save(tmp_path):
    torch.manual_seed(0)
    cfg = Config({"n_frames": 2, "upsample": True, "reduce_dense": True})
    ref = pwclite_ref.PWCLite(cfg)
    sd = _np_sd(ref.state_dict())
    params = ti.import_pwclite(sd, reduce_dense=True)

    model_cfg = Config({"type": "pwclite", "reduce_dense": True})
    exported = te.export_state_dict(params, model_cfg)
    _assert_roundtrip(sd, exported)

    # Reference-format .pth.tar file that our own importer reads back.
    path = str(tmp_path / "export.pth.tar")
    te.save_torch_checkpoint(path, params, model_cfg, epoch=7)
    blob = torch.load(path, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 7
    sd2 = ti.load_torch_checkpoint(path)
    _assert_roundtrip(sd, sd2)


def test_to_torch_cli_e2e(tmp_path):
    """Native msgpack ckpt -> arflow-to-torch -> reference strict load."""
    import json

    from arflow_tpu.cli import to_torch_cli
    from arflow_tpu.training.checkpoint import save_checkpoint

    torch.manual_seed(0)
    cfg = Config({"n_frames": 2, "upsample": True, "reduce_dense": True})
    ref = pwclite_ref.PWCLite(cfg)
    sd = _np_sd(ref.state_dict())
    params = ti.import_pwclite(sd, reduce_dense=True)

    ckpt = save_checkpoint(str(tmp_path), {"epoch": 3, "params": params}, "t")
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps({
        "model": {"type": "pwclite", "n_frames": 2, "upsample": True,
                  "reduce_dense": True},
        "seed": 0,
    }))
    out = str(tmp_path / "out.pth.tar")
    to_torch_cli(["-c", str(cfg_path), "-m", ckpt, "-o", out])

    blob = torch.load(out, map_location="cpu", weights_only=False)
    assert blob["epoch"] == 3
    torch.manual_seed(1)
    fresh = pwclite_ref.PWCLite(cfg)
    fresh.load_state_dict(blob["state_dict"], strict=True)
    for k, v in _np_sd(fresh.state_dict()).items():
        np.testing.assert_array_equal(v, sd[k], err_msg=k)


def test_component_net_roundtrip():
    torch.manual_seed(0)
    cfg = Config({
        "feature_norm": True, "level_dropout": 0.0,
        "out_channels": [2, 2, 0], "inv_cov": False,
        "n_pyramids": 1, "mixture_weights": False,
    })
    ref = prob_ref.ComponentNet(cfg)
    sd = _np_sd(ref.state_dict())
    exported = te.export_component_net(ti.import_component_net(sd))
    _assert_roundtrip(sd, exported, dead_keys=("_context_up_layers.0.",))
