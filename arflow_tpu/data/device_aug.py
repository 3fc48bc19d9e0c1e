"""Device-side photometric augmentation (runs inside the jitted train step).

TPU-first redesign of the CPU photometric pipeline
(``arflow_tpu/data/transforms.py``, reference
transforms/photometric_transforms.py:7-55): instead of burning host CPU on
HSV math per sample (the input-pipeline bottleneck on few-core hosts), the
augmented view ``img_ph`` is computed on-device as fused VPU elementwise work.
The host then only decodes + stacks, and the host->device transfer halves
(no ``_ph`` copies travel over PCIe/ICI).

Math parity: each op reproduces the CPU transform exactly (same formulas,
same [0,1] clipping, same per-frame grayscale means), and like the CPU path
the jitter ops are applied in a uniformly random order per sample (the CPU
path shuffles its op list; here a ``lax.switch`` over the n! compositions).
Parameter distributions match (uniform factor ranges, uniform channel
permutations). The random *streams* differ — CPU uses numpy RandomState,
device uses JAX PRNG — which only changes which draw a given sample sees,
not the distribution.

Enable with ``"device": true`` inside a data entry's ``photometric_aug``
config; ``get_dataset`` then skips the CPU transform and the trainer applies
this one inside the train step.
"""

from __future__ import annotations

import itertools
import math

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb):
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-12), 0.0)
    deltac_safe = jnp.where(deltac == 0, 1.0, deltac)
    rc = (maxc - rgb[..., 0]) / deltac_safe
    gc = (maxc - rgb[..., 1]) / deltac_safe
    bc = (maxc - rgb[..., 2]) / deltac_safe
    h = jnp.where(
        rgb[..., 0] == maxc,
        bc - gc,
        jnp.where(rgb[..., 1] == maxc, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(deltac == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    f6 = h * 6.0
    i = jnp.floor(f6).astype(jnp.int32) % 6
    f = f6 - jnp.floor(f6)
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    # Sector table matches utils/viz.py:_hsv_to_rgb.
    rs = jnp.stack([v, q, p, p, t, v], -1)
    gs = jnp.stack([t, v, v, q, p, p], -1)
    bs = jnp.stack([p, p, t, v, v, q], -1)
    sel = jax.nn.one_hot(i, 6, dtype=hsv.dtype)
    return jnp.stack(
        [(rs * sel).sum(-1), (gs * sel).sum(-1), (bs * sel).sum(-1)], axis=-1
    )


def _grayscale(img):
    return (
        0.2989 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )[..., None]


def make_photometric(cfg):
    """Build (sample_params, apply) for a photometric_aug config dict.

    ``sample_params(key, batch_size) -> params`` draws per-sample parameters;
    ``apply(imgs, params) -> imgs_ph`` maps (B, ..., H, W, 3) images (the
    non-batch leading dims, e.g. the frame axis, share one sample's params,
    matching the CPU path which transforms the stacked frames together).
    Both are jit/grad-safe.
    """
    brightness = float(cfg.get("brightness", 0) or 0)
    contrast = float(cfg.get("contrast", 0) or 0)
    saturation = float(cfg.get("saturation", 0) or 0)
    hue = float(cfg.get("hue", 0) or 0)
    with_gamma = bool(cfg.get("gamma", 0))
    with_swap = bool(cfg.get("swap_channels", False))

    jitter_ops = []  # (name, op(img, factor))
    if brightness > 0:
        jitter_ops.append(
            ("brightness", lambda x, f: jnp.clip(x * f, 0.0, 1.0))
        )
    if contrast > 0:
        def _contrast(x, f):
            m = _grayscale(x).mean(axis=(-3, -2, -1), keepdims=True)
            return jnp.clip(m * (1.0 - f) + x * f, 0.0, 1.0)

        jitter_ops.append(("contrast", _contrast))
    if saturation > 0:
        jitter_ops.append(
            (
                "saturation",
                lambda x, f: jnp.clip(
                    _grayscale(x) * (1.0 - f) + x * f, 0.0, 1.0
                ),
            )
        )
    if hue > 0:
        def _hue(x, d):
            hsv = _rgb_to_hsv(x)
            hsv = hsv.at[..., 0].set((hsv[..., 0] + d) % 1.0)
            return _hsv_to_rgb(hsv)

        jitter_ops.append(("hue", _hue))

    n = len(jitter_ops)
    perms = list(itertools.permutations(range(n))) if n > 1 else [tuple(range(n))]
    ranges = {
        "brightness": (max(0.0, 1 - brightness), 1 + brightness),
        "contrast": (max(0.0, 1 - contrast), 1 + contrast),
        "saturation": (max(0.0, 1 - saturation), 1 + saturation),
        "hue": (-hue, hue),
    }

    def sample_params(key, batch_size):
        params = {}
        for name, _ in jitter_ops:
            key, sub = jax.random.split(key)
            lo, hi = ranges[name]
            # Explicit f32: under jax_enable_x64 (the test suite) the default
            # draw would be f64 and poison the f32 image math (the hue
            # .at[].set becomes a cross-dtype scatter — a future-JAX error).
            params[name] = jax.random.uniform(
                sub, (batch_size,), minval=lo, maxval=hi, dtype=jnp.float32
            )
        if len(perms) > 1:
            key, sub = jax.random.split(key)
            params["order"] = jax.random.randint(
                sub, (batch_size,), 0, math.factorial(n)
            )
        if with_gamma:
            key, sub = jax.random.split(key)
            params["gamma"] = jax.random.uniform(
                sub, (batch_size,), minval=0.7, maxval=1.5, dtype=jnp.float32
            )
        if with_swap:
            key, sub = jax.random.split(key)
            params["channel_perm"] = jax.vmap(
                lambda k: jax.random.permutation(k, 3)
            )(jax.random.split(sub, batch_size))
        return params

    def _apply_one(img, p):
        img = img.astype(jnp.float32)
        if jitter_ops:
            def run(order):
                def fn(x):
                    for j in order:
                        name, op = jitter_ops[j]
                        x = op(x, p[name])
                    return x

                return fn

            if len(perms) > 1:
                img = jax.lax.switch(
                    p["order"], [run(o) for o in perms], img
                )
            else:
                img = run(perms[0])(img)
        if with_gamma:
            img = jnp.clip(
                jnp.power(jnp.maximum(img, 0.0), p["gamma"]), 0.0, 1.0
            )
        if with_swap:
            img = jnp.take(img, p["channel_perm"], axis=-1)
        return img

    def apply(imgs, params):
        return jax.vmap(_apply_one)(imgs, params)

    return sample_params, apply


def device_photometric_cfg(full_cfg):
    """Return the photometric_aug dict flagged ``device: true`` from the
    train data entries of a full config, or None."""
    if full_cfg is None or "data" not in full_cfg:
        return None
    for entry in full_cfg.data:
        if entry.get("type") != "train":
            continue
        ph = entry.get("photometric_aug")
        if ph and ph.get("device"):
            return ph
    return None
