"""Native C++ IO kernels vs PIL/numpy oracles."""

import numpy as np
import pytest

from arflow_tpu import native
from arflow_tpu.utils.flow_io import write_flo, write_kitti_png

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain/libpng unavailable"
)


def test_png_decode_matches_pil(tmp_path, rng):
    from PIL import Image

    arr = (rng.rand(20, 30, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    Image.fromarray(arr).save(p)
    ours = native.load_image(p)
    ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(ours, ref, atol=1e-6)

    gray = native.load_image(p, channels=1)
    ref_gray = (
        0.2989 * ref[..., 0] + 0.587 * ref[..., 1] + 0.114 * ref[..., 2]
    )[..., None]
    np.testing.assert_allclose(gray, ref_gray, atol=1e-5)


def test_png_16bit_palette_gray(tmp_path, rng):
    from PIL import Image

    gray = (rng.rand(12, 14) * 255).astype(np.uint8)
    p = str(tmp_path / "g.png")
    Image.fromarray(gray, mode="L").save(p)
    ours = native.load_image(p)
    ref = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ppm_decode(tmp_path, rng):
    from PIL import Image

    arr = (rng.rand(16, 22, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "img.ppm")
    Image.fromarray(arr).save(p)
    ours = native.load_image(p)
    np.testing.assert_allclose(ours, arr.astype(np.float32) / 255.0, atol=1e-6)


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.randn(10, 12, 2).astype(np.float32)
    p = str(tmp_path / "f.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(native.read_flo(p), flow)


def test_kitti_flow_decode(tmp_path, rng):
    pytest.importorskip("cv2")
    from arflow_tpu.utils.flow_io import read_kitti_png

    flow = (rng.randn(12, 16, 2) * 10).astype(np.float32)
    mask = (rng.rand(12, 16) > 0.3).astype(np.uint16)
    p = str(tmp_path / "k.png")
    write_kitti_png(p, flow, mask)
    ours = native.read_kitti_png(p)
    ref = read_kitti_png(p)  # cv2-based reference-parity reader
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resize_matches_ops(rng):
    from arflow_tpu.ops.resize import _resize_matrix

    img = rng.rand(17, 23, 3).astype(np.float32)
    oh, ow = 9, 31
    ours = native.resize_bilinear(img, (oh, ow))
    mh = _resize_matrix(17, oh, "bilinear", False)
    mw = _resize_matrix(23, ow, "bilinear", False)
    ref = np.einsum("oh,hwc->owc", mh, np.einsum("ow,hwc->hoc", mw, img))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
