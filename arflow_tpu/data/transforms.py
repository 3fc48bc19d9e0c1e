"""CPU-side augmentation (numpy) applied to stacked frame arrays.

Geometric transforms (transforms/geometric_transforms.py:19-69) act on the
stacked (N, H, W, 3) frames so every frame gets the same parameters.
Photometric transforms (transforms/photometric_transforms.py:7-55) reproduce
torchvision ColorJitter-style brightness/contrast/saturation/hue jitter plus
RandomGamma and RandomSwapChannels.
"""

from __future__ import annotations

import numbers

import numpy as np

from arflow_tpu.ops.resize import _resize_matrix


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


# -- geometric ---------------------------------------------------------------

class RandomCrop:
    def __init__(self, size, rng=None):
        if isinstance(size, numbers.Number):
            size = (int(size), int(size))
        self.size = tuple(size)
        self.rng = rng or np.random

    def __call__(self, inputs):
        h, w = inputs.shape[-3:-1]
        th, tw = self.size
        if (h, w) == (th, tw):
            return inputs
        x1 = self.rng.randint(0, w - tw + 1)
        y1 = self.rng.randint(0, h - th + 1)
        return inputs[..., y1 : y1 + th, x1 : x1 + tw, :]


class RandomHorizontalFlip:
    def __init__(self, rng=None):
        self.rng = rng or np.random

    def __call__(self, inputs):
        if self.rng.rand() < 0.5:
            return inputs[..., :, ::-1, :].copy()
        return inputs


def _matrix_taps(m):
    """(i0, w0, i1, w1) per output row of a bilinear resize matrix.

    Bilinear rows have <=2 nonzeros, so the dense row-dot (np.einsum over
    the full source axis — measured SECONDS per 1242-wide KITTI frame on
    this host's single core) collapses to a 2-tap gather at ~200x fewer
    FLOPs. Taps are ordered i0 <= i1, matching the dense accumulation
    order, so results are bit-identical to the matrix product (the skipped
    terms are exact +0.0 adds).
    """
    idx = np.argsort(m, axis=1)[:, -2:]
    i0 = idx.min(axis=1)
    i1 = idx.max(axis=1)
    rows = np.arange(m.shape[0])
    return i0, m[rows, i0], i1, m[rows, i1]


class Scale:
    """Deterministic bilinear scaling, align_corners=False
    (geometric_transforms.py:62-69).

    Implemented as two 2-tap gather passes derived from the parity-tested
    resize matrices (see _matrix_taps) — host-side resize of a KITTI frame
    drops from seconds (dense einsum) to ~15 ms.
    """

    def __init__(self, size):
        self.size = tuple(size)
        self._taps = {}

    def _axis_taps(self, n, out):
        key = (n, out)
        if key not in self._taps:
            self._taps[key] = _matrix_taps(_resize_matrix(n, out, "bilinear", False))
        return self._taps[key]

    def __call__(self, inputs):
        h, w = inputs.shape[-3:-1]
        oh, ow = self.size
        if (h, w) == (oh, ow):
            return inputs
        dt = inputs.dtype
        if dt == np.float32 and inputs.ndim in (3, 4):
            # Native single-pass resize (same half-pixel weights computed in
            # f32: <=5e-5 from the f64 matrix on [0,1] images), another ~13x
            # over the tap path on KITTI frames.
            from arflow_tpu import native

            if native.available():
                frames = inputs if inputs.ndim == 4 else inputs[None]
                out = np.stack(
                    [native.resize_bilinear(f, (oh, ow)) for f in frames]
                )
                return out if inputs.ndim == 4 else out[0]
        i0, w0, i1, w1 = self._axis_taps(h, oh)
        out = (
            inputs[..., i0, :, :] * w0[:, None, None]
            + inputs[..., i1, :, :] * w1[:, None, None]
        )
        j0, v0, j1, v1 = self._axis_taps(w, ow)
        out = out[..., j0, :] * v0[:, None] + out[..., j1, :] * v1[:, None]
        return out.astype(dt)


def get_geometric_transforms(cfg, rng=None):
    transforms = []
    if cfg.get("crop"):
        transforms.append(RandomCrop(cfg.crop_size, rng))
    if cfg.get("hflip"):
        transforms.append(RandomHorizontalFlip(rng))
    if cfg.get("scale"):
        transforms.append(Scale(cfg.scale_size))
    return Compose(transforms)


# -- photometric -------------------------------------------------------------

def _rgb_to_hsv(rgb):
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    deltac = maxc - minc
    s = np.where(maxc > 0, deltac / np.maximum(maxc, 1e-12), 0.0)
    deltac_safe = np.where(deltac == 0, 1.0, deltac)
    rc = (maxc - rgb[..., 0]) / deltac_safe
    gc = (maxc - rgb[..., 1]) / deltac_safe
    bc = (maxc - rgb[..., 2]) / deltac_safe
    h = np.where(
        rgb[..., 0] == maxc,
        bc - gc,
        np.where(rgb[..., 1] == maxc, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = np.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    from arflow_tpu.utils.viz import _hsv_to_rgb as impl

    return impl(hsv)


def _grayscale(img):
    return (
        0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


class ColorJitter:
    """torchvision-style brightness/contrast/saturation/hue jitter."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0, rng=None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng or np.random

    def __call__(self, img):
        img = np.asarray(img, np.float32)
        ops = []
        # NB: factors must be bound as default args — a bare closure over a
        # reused loop variable would make every op apply the last factor.
        if self.brightness > 0:
            f = self.rng.uniform(max(0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda x, f=f: np.clip(x * f, 0, 1))
        if self.contrast > 0:
            f = self.rng.uniform(max(0, 1 - self.contrast), 1 + self.contrast)
            ops.append(
                lambda x, f=f: np.clip(
                    _grayscale(x).mean(axis=(-3, -2, -1), keepdims=True)
                    * (1 - f)
                    + x * f,
                    0,
                    1,
                )
            )
        if self.saturation > 0:
            f = self.rng.uniform(max(0, 1 - self.saturation), 1 + self.saturation)
            ops.append(
                lambda x, f=f: np.clip(_grayscale(x) * (1 - f) + x * f, 0, 1)
            )
        if self.hue > 0:
            d = self.rng.uniform(-self.hue, self.hue)

            def shift_hue(x, d=d):
                from arflow_tpu import native

                if x.shape[-1] == 3 and native.available():
                    # Native path bit-matches the numpy fallback below;
                    # ~30x faster, the input-pipeline hot spot.
                    return native.hue_shift(x, d)
                hsv = _rgb_to_hsv(x)
                hsv[..., 0] = (hsv[..., 0] + d) % 1.0
                return _hsv_to_rgb(hsv)

            ops.append(shift_hue)
        self.rng.shuffle(ops)
        for op in ops:
            img = op(img)
        return np.asarray(img, np.float32)  # no copy when already f32


class RandomGamma:
    """photometric_transforms.py:29-48."""

    def __init__(self, min_gamma=0.7, max_gamma=1.5, clip_image=True, rng=None):
        self.min_gamma = min_gamma
        self.max_gamma = max_gamma
        self.clip_image = clip_image
        self.rng = rng or np.random

    def __call__(self, image):
        gamma = self.rng.uniform(self.min_gamma, self.max_gamma)
        out = np.power(np.maximum(image, 0), gamma)
        if self.clip_image:
            out = np.clip(out, 0.0, 1.0)
        return out.astype(np.float32)


class RandomSwapChannels:
    """photometric_transforms.py:51-53."""

    def __init__(self, rng=None):
        self.rng = rng or np.random

    def __call__(self, image):
        ind = self.rng.permutation(image.shape[-1])
        # Fancy indexing on the last axis yields a channel-outermost memory
        # layout; downstream batch stacking over that is a pathologically
        # strided copy (~100x slower). Write channel-by-channel into an
        # HWC-contiguous buffer instead (single copy).
        out = np.empty_like(image, subok=False)
        for k, j in enumerate(ind):
            out[..., k] = image[..., j]
        return out


def get_photometric_transforms(cfg, rng=None):
    transforms = []
    brightness = cfg.get("brightness", 0)
    contrast = cfg.get("contrast", 0)
    saturation = cfg.get("saturation", 0)
    hue = cfg.get("hue", 0)
    if any(v > 0 for v in (brightness, contrast, saturation, hue)):
        transforms.append(
            ColorJitter(brightness, contrast, saturation, hue, rng)
        )
    if cfg.get("gamma", 0) and cfg.get("gamma") > 0:
        transforms.append(RandomGamma(0.7, 1.5, clip_image=True, rng=rng))
    if cfg.get("swap_channels"):
        transforms.append(RandomSwapChannels(rng))
    return Compose(transforms)
