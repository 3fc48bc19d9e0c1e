"""Metrics parity vs reference utils/flow_utils.py and flow IO round trips."""

import numpy as np
import pytest

from tests.reference_oracle import import_reference
from arflow_tpu.utils import metrics as M
from arflow_tpu.utils.flow_io import read_flo, write_flo, read_kitti_png, write_kitti_png

flow_utils = import_reference("utils.flow_utils")


def test_evaluate_flow_epe(rng):
    gts = [rng.randn(40, 60, 2).astype(np.float32) * 3 for _ in range(3)]
    preds = [rng.randn(20, 30, 2).astype(np.float32) * 3 for _ in range(3)]
    ours = M.evaluate_flow(gts, preds)
    theirs = flow_utils.evaluate_flow(gts, [p.copy() for p in preds])
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_evaluate_flow_kitti_masks(rng):
    gts = []
    for _ in range(2):
        flow = rng.randn(40, 60, 2).astype(np.float32) * 3
        occ = (rng.rand(40, 60, 1) > 0.3).astype(np.float32)
        noc = occ * (rng.rand(40, 60, 1) > 0.3).astype(np.float32)
        gts.append(np.concatenate([flow, occ, noc], axis=-1))
    preds = [rng.randn(40, 60, 2).astype(np.float32) * 3 for _ in range(2)]
    ours = M.evaluate_flow(gts, preds)
    theirs = flow_utils.evaluate_flow(gts, [p.copy() for p in preds])
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)


def test_sp_plot_parity(rng):
    error = np.abs(rng.randn(30, 40)).astype(np.float64)
    entropy = rng.randn(30, 40).astype(np.float64)
    mask = np.ones_like(error)
    ours = M.sp_plot(error, entropy, mask, n=10)
    theirs = flow_utils.sp_plot(error, entropy, mask, n=10)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_evaluate_uncertainty_parity(rng):
    gts = [rng.randn(40, 60, 2).astype(np.float32) * 3 for _ in range(2)]
    preds = [rng.randn(40, 60, 2).astype(np.float32) * 3 for _ in range(2)]
    ents = [rng.randn(40, 60, 2).astype(np.float32) for _ in range(2)]
    ours, s1, o1 = M.evaluate_uncertainty(gts, preds, [e.copy() for e in ents], 10)
    theirs, s2, o2 = flow_utils.evaluate_uncertainty(
        gts, [p.copy() for p in preds], [e.copy() for e in ents], 10
    )
    np.testing.assert_allclose(ours, theirs, rtol=1e-4)
    np.testing.assert_allclose(np.stack(s1), np.stack(s2), rtol=1e-4)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.randn(24, 32, 2).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)
    # Reference reader parity (note reference load_flow's .flo branch uses a
    # transposed np.resize — a known quirk; compare against its write+our read)
    flow_utils.write_flow(str(tmp_path / "b.flo"), flow)
    np.testing.assert_allclose(read_flo(str(tmp_path / "b.flo")), flow, atol=1e-6)


def test_kitti_png_roundtrip(tmp_path, rng):
    pytest.importorskip("cv2")
    flow = (rng.randn(24, 32, 2) * 10).astype(np.float32)
    mask = (rng.rand(24, 32) > 0.2).astype(np.uint16)
    p = str(tmp_path / "k.png")
    write_kitti_png(p, flow, mask)
    loaded = read_kitti_png(p)
    np.testing.assert_allclose(
        loaded[..., :2], flow * mask[..., None], atol=1 / 32
    )
    np.testing.assert_array_equal(loaded[..., 2], mask)
    theirs = flow_utils.load_flow(p)
    np.testing.assert_allclose(loaded, theirs, atol=1e-6)
