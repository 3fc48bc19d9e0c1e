"""Self-contained photographic-statistics frame fixtures.

The strongest real-image evidence in the suite runs on the reference's own
KITTI frames (/root/reference/examples) and skips when that tree is absent.
These generated frames make the non-oracle real-image tests self-sufficient:
license-free synthetic photographs with natural-image statistics —
1/f amplitude spectrum, smooth large-scale structure, occluding foreground
objects — and consistent inter-frame motion (translating camera over a
parallax scene), so unsupervised photometric losses have real signal.

Deterministic (fixed seed), generated on first use, cached on disk.
"""

from __future__ import annotations

import os

import numpy as np

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "_generated")


def _pink_noise(rng, h, w, exponent=1.2):
    """Grayscale field with a 1/f^exponent amplitude spectrum in [0, 1]."""
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    amp = f ** (-exponent)
    amp[0, 0] = 0.0
    phase = rng.uniform(0, 2 * np.pi, size=amp.shape)
    spec = amp * np.exp(1j * phase)
    img = np.fft.irfft2(spec, s=(h, w))
    img -= img.min()
    img /= max(img.max(), 1e-12)
    return img.astype(np.float32)


def _colorize(rng, gray):
    """Mix a grayscale field into 3 correlated RGB channels (natural images
    have strongly correlated channels with small chromatic offsets)."""
    h, w = gray.shape
    tint = 0.15 * _pink_noise(rng, h, w, exponent=1.5)
    rgb = np.stack(
        [
            np.clip(0.85 * gray + 0.5 * tint, 0, 1),
            np.clip(0.90 * gray + 0.2 * tint, 0, 1),
            np.clip(0.80 * gray - 0.3 * tint + 0.1, 0, 1),
        ],
        axis=-1,
    )
    return rgb.astype(np.float32)


def _render_sequence(seed=0, n_frames=3, h=375, w=1242, bg_vel=(0, -4)):
    """n_frames of a camera translating over a textured scene with two
    foreground layers at larger parallax. Returns uint8 (h, w, 3) frames."""
    rng = np.random.RandomState(seed)
    margin = 64
    scene = _colorize(rng, _pink_noise(rng, h + 2 * margin, w + 2 * margin))

    # Foreground layers: textured patches with soft elliptical alpha masks,
    # moving faster than the background (parallax + occlusion boundaries).
    layers = []
    for (cy, cx, ry, rx, vy, vx) in (
        (int(h * 0.62), int(w * 0.3), 60, 140, 1, -11),
        (int(h * 0.4), int(w * 0.72), 45, 90, -2, -7),
    ):
        tex = _colorize(rng, _pink_noise(rng, 2 * ry + 8, 2 * rx + 8, 0.9))
        yy, xx = np.mgrid[: tex.shape[0], : tex.shape[1]]
        d = (
            ((yy - tex.shape[0] / 2) / ry) ** 2
            + ((xx - tex.shape[1] / 2) / rx) ** 2
        )
        alpha = np.clip(1.15 - d, 0, 1)[..., None].astype(np.float32)
        layers.append((cy, cx, vy, vx, tex, alpha))

    frames = []
    for t in range(n_frames):
        oy = margin + bg_vel[0] * t
        ox = margin + bg_vel[1] * t
        frame = scene[oy : oy + h, ox : ox + w].copy()
        for (cy, cx, vy, vx, tex, alpha) in layers:
            y0 = cy + vy * t - tex.shape[0] // 2
            x0 = cx + vx * t - tex.shape[1] // 2
            ys = slice(max(y0, 0), min(y0 + tex.shape[0], h))
            xs = slice(max(x0, 0), min(x0 + tex.shape[1], w))
            ty = slice(ys.start - y0, ys.stop - y0)
            tx = slice(xs.start - x0, xs.stop - x0)
            a = alpha[ty, tx]
            frame[ys, xs] = a * tex[ty, tx] + (1 - a) * frame[ys, xs]
        # Mild sensor noise, then 8-bit quantization like a real camera.
        frame = np.clip(frame + rng.randn(h, w, 3).astype(np.float32) * 0.004,
                        0, 1)
        frames.append((frame * 255).astype(np.uint8))
    return frames


def ensure_photo_frames(out_dir: str | None = None, seed: int = 0,
                        h: int = 375, w: int = 1242) -> str:
    """Generate (once) img0.png/img1.png/img2.png with photographic
    statistics and KITTI-like geometry; returns the directory."""
    out_dir = out_dir or _DEFAULT_DIR
    names = ["img0.png", "img1.png", "img2.png"]
    if all(os.path.exists(os.path.join(out_dir, n)) for n in names):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    from PIL import Image

    for name, frame in zip(names, _render_sequence(seed=seed, h=h, w=w)):
        Image.fromarray(frame).save(os.path.join(out_dir, name))
    return out_dir
