"""Inference CLI round trip on a synthetic FlyingChairs-style dataset."""

import json
import logging
import os

import numpy as np
import pytest

import jax

from arflow_tpu.config import Config
from arflow_tpu.cli import inference_main
from arflow_tpu.data.datasets import Chairs
from arflow_tpu.models import get_model
from arflow_tpu.training.checkpoint import save_checkpoint
from arflow_tpu.utils.flow_io import read_flo, write_flo

H, W = 64, 96


def make_chairs_dir(tmp_path, rng, n=2):
    from PIL import Image

    root = tmp_path / "chairs"
    root.mkdir()
    for fid in range(1, n + 1):
        for i in (1, 2):
            img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / f"{fid:05d}_img{i}.ppm")
        write_flo(
            str(root / f"{fid:05d}_flow.flo"),
            rng.randn(H, W, 2).astype(np.float32),
        )
    return root


def test_chairs_dataset_collection(tmp_path, rng):
    root = make_chairs_dir(tmp_path, rng, n=3)
    ds = Chairs(str(root), split="trainval", with_flow=True)
    assert len(ds) == 3
    item = ds[0]
    assert item["img1"].shape == (H, W, 3)
    assert item["target"]["flow"].shape == (H, W, 2)


def test_inference_roundtrip(tmp_path, rng):
    root = make_chairs_dir(tmp_path, rng, n=2)
    out_root = tmp_path / "out"

    # Init + save a checkpoint for the flagship model.
    model_cfg = Config({"type": "uflow", "feature_norm": True, "level_dropout": 0.0})
    model = get_model(model_cfg)
    img = np.zeros((1, H, W, 3), np.float32)
    init_fn = jax.jit(lambda r: model.init(r, img, img, with_bk=False))
    variables = init_fn(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "model.msgpack")
    save_checkpoint(
        str(tmp_path), {"params": jax.device_get(variables["params"])}, "model"
    )
    ckpt = str(tmp_path / "model_ckpt.msgpack")

    cfg = Config(
        {
            "seed": 0,
            "data": [
                {
                    "root_chairs": str(root),
                    "type": "valid",
                    "name": "Chairs",
                    "n_frames": 2,
                    "split": "trainval",
                    "out_root": str(out_root),
                }
            ],
            "model": dict(model_cfg),
            "loss": {},  # no 'approx' -> entropy dump is zeros
            "inference": {"pretrained_model": ckpt, "valid_batch_size": 1},
        }
    )
    inference_main(cfg, logging.getLogger("test"))

    flo_files = sorted(out_root.rglob("*.flo"))
    npy_files = sorted(out_root.rglob("*.npy"))
    assert len(flo_files) == 2 and len(npy_files) == 2
    flow = read_flo(str(flo_files[0]))
    assert flow.shape == (H, W, 2)
    assert np.isfinite(flow).all()
