"""Sample-collection logic for every dataset catalog (synthetic dir layouts)."""

import numpy as np
import pytest

from arflow_tpu.data.datasets import (
    Chairs2,
    KITTIFlow,
    KITTIFlowMV,
    Sintel,
    SintelRaw,
    Things3D,
)
from arflow_tpu.utils.flow_io import write_flo, write_kitti_png

H, W = 32, 48


def _img(rng):
    return (rng.rand(H, W, 3) * 255).astype(np.uint8)


def _save_png(path, rng):
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(_img(rng)).save(path)


def test_sintel_collection(tmp_path, rng):
    root = tmp_path / "sintel"
    for scene in ("alley_1", "market_6"):
        flow_dir = root / "training" / "flow" / scene
        flow_dir.mkdir(parents=True, exist_ok=True)
        for fid in (1, 2, 3):
            _save_png(root / "training" / "final" / scene / f"frame_{fid:04d}.png", rng)
            write_flo(
                str(flow_dir / f"frame_{fid:04d}.flo"),
                rng.randn(H, W, 2).astype(np.float32),
            )
    ds = Sintel(str(root), n_frames=2, type="final", split="train",
                subsplit="trainval", with_flow=True)
    # 3 frames per scene -> 2 consecutive pairs each, but frame_0003's pair
    # needs frame_0004 -> 2 samples per scene.
    assert len(ds) == 4
    item = ds[0]
    assert item["img1"].shape == (H, W, 3)
    assert item["target"]["flow"].shape == (H, W, 2)

    # subsplit filtering: alley_1 is in the unofficial training scene list.
    ds_train = Sintel(str(root), split="train", subsplit="train", type="final")
    ds_val = Sintel(str(root), split="train", subsplit="val", type="final")
    assert len(ds_train) == 2 and len(ds_val) == 2


def test_sintel_raw_collection(tmp_path, rng):
    root = tmp_path / "raw"
    for scene in ("a", "b"):
        for fid in range(4):
            _save_png(root / scene / f"frame_{fid:04d}.png", rng)
    ds = SintelRaw(str(root), n_frames=2)
    assert len(ds) == 6  # 3 windows per scene
    ds3 = SintelRaw(str(root), n_frames=3)
    assert len(ds3) == 4


def test_chairs2_collection(tmp_path, rng):
    root = tmp_path / "chairs2"
    for fid in (0, 1):
        for i in (0, 1):
            _save_png(root / "train" / f"{fid:07d}-img_{i}.png", rng)
        write_flo(str(root / "train" / f"{fid:07d}-flow_01.flo"),
                  rng.randn(H, W, 2).astype(np.float32))
        write_flo(str(root / "train" / f"{fid:07d}-flow_10.flo"),
                  rng.randn(H, W, 2).astype(np.float32))
    ds = Chairs2(str(root), split="train", with_flow=True)
    assert len(ds) == 2
    item = ds[0]
    assert item["target"]["flow"].shape == (H, W, 2)
    assert item["target"]["flow_bw"].shape == (H, W, 2)


def test_kitti_collection(tmp_path, rng):
    pytest.importorskip("cv2")
    root = tmp_path / "kitti"
    for seq in ("000000", "000001"):
        _save_png(root / "training" / "image_2" / f"{seq}_10.png", rng)
        _save_png(root / "training" / "image_2" / f"{seq}_11.png", rng)
        flow = (rng.randn(H, W, 2) * 5).astype(np.float32)
        mask = np.ones((H, W), np.uint16)
        for d in ("flow_occ", "flow_noc"):
            (root / "training" / d).mkdir(parents=True, exist_ok=True)
            write_kitti_png(str(root / "training" / d / f"{seq}_10.png"), flow, mask)
    ds = KITTIFlow(str(root), split="train", with_flow=True)
    assert len(ds) == 2
    item = ds[0]
    # [u, v, occ_mask, noc_mask] (flow_datasets.py:75-78)
    assert item["target"]["flow"].shape == (H, W, 4)


def test_kitti_mv_collection(tmp_path, rng):
    root = tmp_path / "kittimv"
    for seq in ("000000", "000001"):
        for fid in range(3):
            _save_png(root / "image_2" / f"{seq}_{fid:02d}.png", rng)
    ds = KITTIFlowMV(str(root), n_frames=2)
    assert len(ds) == 4  # 2 windows per sequence, each window once


def test_things3d_collection(tmp_path, rng):
    root = tmp_path / "things"
    for group in ("A/0000", "A/0001"):
        for fid in range(3):
            _save_png(root / "TRAIN" / group / "left" / f"{fid:04d}.png", rng)
    ds = Things3D(str(root), split="train")
    assert len(ds) == 4
