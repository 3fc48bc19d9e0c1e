"""Smoke test for tools/real_frame_train (the real-frame training demo).

Runs both modes for a few steps at a small size on CPU: artifacts written,
report keys sane. Prefers the reference's real example frames when present;
otherwise generates self-contained photographic-statistics fixtures
(tests/fixtures) so the test never skips.
"""

import json
import os

import numpy as np
import pytest

_REF_FRAMES = "/root/reference/examples"


def _frames_dir():
    if os.path.exists(os.path.join(_REF_FRAMES, "img1.png")):
        return _REF_FRAMES
    from tests.fixtures import ensure_photo_frames

    return ensure_photo_frames()


FRAMES = _frames_dir()


@pytest.mark.parametrize(
    "elbo", [False, pytest.param(True, marks=pytest.mark.slow)]
)
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
