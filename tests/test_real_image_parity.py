"""Golden real-image parity: both frameworks on the reference's example frames.

First execution on natural images: the reference ships three real KITTI
frames (/root/reference/examples/img0-2.png, 1242x375) and its README drives
inference on them at the recommended shapes (384x640 KITTI, 448x1024 Sintel)
-- see /root/reference/README.md:36-50 and inference.py:121-157; these are
BASELINE.json measurement configs #1-2.

Each test decodes the PNGs through the framework's own IO path
(native libpng fast path with PIL fallback), resizes with the framework's
Scale transform, imports identical random-init torch weights via
torch_import, and pins the flow fields pixelwise against the live torch
reference (CPU, correlation_native). Real frames exercise the census /
occlusion / correlation paths with natural statistics and would catch any
channel-order or normalization slip random tensors cannot.
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_reference
from arflow_tpu.config import Config
from arflow_tpu.data.datasets import load_image
from arflow_tpu.data.transforms import Scale
from arflow_tpu.models.pwclite import PWCLite
from arflow_tpu.models.torch_import import import_pwclite, import_uflow
from arflow_tpu.models.uflow import PWCFlow

EXAMPLES = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EXAMPLES), reason="reference example frames not present"
)


def _frames(names, hw):
    """Decode example PNGs via the framework IO path and Scale to hw.

    Returns a list of (1, h, w, 3) float32 arrays in [0, 1].
    """
    scale = Scale(size=hw)
    out = []
    for name in names:
        img = load_image(os.path.join(EXAMPLES, name))
        assert img.shape == (375, 1242, 3), img.shape
        assert img.dtype == np.float32
        # Natural-image sanity: real photographs are neither flat nor binary.
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert img.std() > 0.05
        out.append(scale(img)[None])
    return out


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _pin_levels(ours, theirs, key, atol):
    assert len(ours) == len(theirs), key
    for lvl, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(
            np.asarray(o), _nhwc(t), atol=atol, rtol=1e-3,
            err_msg=f"{key} level {lvl}",
        )


@pytest.mark.slow
def test_pwclite_2frame_real_384x640():
    """README two-view invocation shape: img1,img2 at 384x640 (config #1)."""
    pwclite_ref = import_reference("models.pwclite")
    torch.manual_seed(0)
    cfg = Config({"n_frames": 2, "upsample": True, "reduce_dense": True})
    ref = pwclite_ref.PWCLite(cfg)
    ref.eval()

    imgs = _frames(["img1.png", "img2.png"], (384, 640))
    with torch.no_grad():
        ref_out = ref(torch.cat([_nchw(i) for i in imgs], dim=1), with_bk=True)

    model = PWCLite(n_frames=2, upsample=True, reduce_dense=True)
    params = import_pwclite(ref.state_dict())
    out = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b, with_bk=True)
    )(params, jnp.asarray(imgs[0]), jnp.asarray(imgs[1]))

    # VERDICT round-2 target: max |delta| <= 1e-3 px on real frames.
    _pin_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw", atol=1e-3)
    _pin_levels(out["flows_bw"], ref_out["flows_bw"], "flows_bw", atol=1e-3)

    # The flow on real frames must be non-degenerate (the net sees real
    # structure, not a constant field).
    flow0 = np.asarray(out["flows_fw"][0])
    assert np.isfinite(flow0).all()
    assert flow0.std() > 1e-3


@pytest.mark.slow
def test_pwclite_3frame_real_384x640():
    """README multi-view invocation: img0,img1,img2 at 384x640 (config #2)."""
    pwclite_ref = import_reference("models.pwclite")
    torch.manual_seed(1)
    cfg = Config({"n_frames": 3, "upsample": True, "reduce_dense": True})
    ref = pwclite_ref.PWCLite(cfg)
    ref.eval()

    imgs = _frames(["img0.png", "img1.png", "img2.png"], (384, 640))
    with torch.no_grad():
        ref_out = ref(torch.cat([_nchw(i) for i in imgs], dim=1), with_bk=True)

    model = PWCLite(n_frames=3, upsample=True, reduce_dense=True)
    params = import_pwclite(ref.state_dict())
    out = jax.jit(
        lambda p, a, b, c: model.apply({"params": p}, a, b, c, with_bk=True)
    )(params, *(jnp.asarray(i) for i in imgs))

    _pin_levels(out["flows_fw"], ref_out["flows_fw"], "flows_fw", atol=1e-3)
    _pin_levels(out["flows_bw"], ref_out["flows_bw"], "flows_bw", atol=1e-3)


@pytest.mark.slow
def test_uflow_real_448x1024_with_bf16_delta():
    """Flagship uflow at the Sintel-recommended 448x1024 on real frames.

    Pins f32 parity vs torch and records the bf16 inference delta on the
    same natural inputs (the recommended fast inference mode).
    """
    uflow_model = import_reference("models.uflow_model")
    torch.manual_seed(2)
    cfg = Config({"feature_norm": True, "level_dropout": 0.0})
    ref = uflow_model.PWCFlow(cfg)
    ref.eval()

    imgs = _frames(["img1.png", "img2.png"], (448, 1024))
    with torch.no_grad():
        ref_out = ref(
            torch.cat([_nchw(i) for i in imgs], dim=1), with_bk=False
        )
    ref_flow0 = _nhwc(ref_out["flows_fw"][0])

    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    params = import_uflow(ref.state_dict())
    out = jax.jit(
        lambda p, a, b: model.apply({"params": p}, a, b, with_bk=False)
    )(params, jnp.asarray(imgs[0]), jnp.asarray(imgs[1]))

    flow0 = np.asarray(out["flows_fw"][0])
    delta = np.abs(flow0 - ref_flow0)
    assert delta.max() <= 1e-3, f"f32 max |delta| = {delta.max():.2e} px"

    # bf16 mode on the same real frames: loose pixel bounds, recorded.
    model_bf16 = PWCFlow(
        level_dropout=0.0, feature_norm=True, dtype=jnp.bfloat16
    )
    out16 = jax.jit(
        lambda p, a, b: model_bf16.apply({"params": p}, a, b, with_bk=False)
    )(params, jnp.asarray(imgs[0]), jnp.asarray(imgs[1]))
    flow16 = np.asarray(out16["flows_fw"][0], dtype=np.float32)
    d16 = np.abs(flow16 - ref_flow0)
    print(
        f"real-image 448x1024 bf16 delta vs torch f32: "
        f"mean {d16.mean():.4f} px, max {d16.max():.4f} px"
    )
    assert np.isfinite(flow16).all()
    # Round-2 synthetic measurement was ~0.03 px mean; allow natural-image
    # headroom but catch catastrophic divergence.
    assert d16.mean() < 0.25, f"bf16 mean |delta| = {d16.mean():.3f} px"


def test_inference_cli_real_kitti_e2e(tmp_path):
    """Full CLI run on the real frames: PNG decode -> Scale -> model ->
    rescale to original 375x1242 -> .flo + entropy .npy on disk.

    Mirrors /root/reference/inference.py's dataset-driven loop using a
    KITTI 'testing' layout built from the example frames.
    """
    import logging
    import shutil

    from arflow_tpu.cli import inference_main
    from arflow_tpu.models import get_model
    from arflow_tpu.training.checkpoint import save_checkpoint
    from arflow_tpu.utils.flow_io import read_flo

    img_dir = tmp_path / "kitti" / "testing" / "image_2"
    img_dir.mkdir(parents=True)
    shutil.copy(f"{EXAMPLES}/img1.png", img_dir / "000000_10.png")
    shutil.copy(f"{EXAMPLES}/img2.png", img_dir / "000000_11.png")

    model_cfg = Config(
        {"type": "uflow", "feature_norm": True, "level_dropout": 0.0}
    )
    model = get_model(model_cfg)
    probe = np.zeros((1, 192, 320, 3), np.float32)
    variables = jax.jit(
        lambda r: model.init(r, probe, probe, with_bk=False)
    )(jax.random.PRNGKey(0))
    save_checkpoint(
        str(tmp_path), {"params": jax.device_get(variables["params"])}, "model"
    )
    ckpt = str(tmp_path / "model_ckpt.msgpack")

    out_root = tmp_path / "out"
    cfg = Config(
        {
            "seed": 0,
            "data": [
                {
                    "root": str(tmp_path / "kitti"),
                    "type": "valid",
                    "name": "KITTI",
                    "n_frames": 2,
                    "split": "test",
                    "with_flow": False,
                    "test_shape": [192, 320],
                    "out_root": str(out_root),
                }
            ],
            "model": dict(model_cfg),
            "loss": {},
            "inference": {"pretrained_model": ckpt, "valid_batch_size": 1},
        }
    )
    inference_main(cfg, logging.getLogger("test"))

    flo = read_flo(str(out_root / "testing" / "image_2" / "000000_10.flo"))
    assert flo.shape == (375, 1242, 2)
    assert np.isfinite(flo).all()
    ent = np.load(out_root / "testing" / "image_2" / "000000_10.npy")
    assert ent.shape == (375, 1242, 2)
