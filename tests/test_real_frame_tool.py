"""Smoke test for tools/real_frame_train (the real-frame training demo).

Runs both modes for a few steps at a small size on CPU against the
reference's real example frames: artifacts written, report keys sane.
"""

import json
import os

import numpy as np
import pytest

FRAMES = "/root/reference/examples"


@pytest.mark.skipif(
    not os.path.exists(os.path.join(FRAMES, "img1.png")),
    reason="reference example frames not present",
)
@pytest.mark.parametrize("elbo", [False, True])
def test_real_frame_tool_smoke(tmp_path, elbo):
    from arflow_tpu.tools.real_frame_train import main

    out = tmp_path / ("elbo" if elbo else "uflow")
    argv = [
        "--steps", "2", "--size", "64x96", "--out", str(out),
        "--frames", FRAMES,
    ] + (["--elbo"] if elbo else [])
    report = main(argv)

    assert report["steps"] == 2
    assert np.isfinite(report["loss_last"])
    assert (out / "img1_img2.flo").exists()
    assert (out / "img1_img2_flow.png").exists()
    if elbo:
        assert (out / "img1_img2_entropy.npy").exists()
    json.dumps(report)  # serializable
