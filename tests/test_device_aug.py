"""Device-side photometric aug vs the CPU transforms (same params).

The jitted aug (arflow_tpu/data/device_aug.py) must produce the same pixels
as the CPU pipeline (arflow_tpu/data/transforms.py) when given identical
parameters — the random *streams* differ by design, the math must not.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.data import transforms as T
from arflow_tpu.data.device_aug import make_photometric


class ScriptedRng:
    """numpy-RandomState stand-in returning scripted uniform draws and a
    fixed shuffle/permutation."""

    def __init__(self, uniforms, perm=None):
        self.uniforms = list(uniforms)
        self.perm = perm

    def uniform(self, lo, hi):
        v = self.uniforms.pop(0)
        assert lo - 1e-6 <= v <= hi + 1e-6, (v, lo, hi)
        return v

    def shuffle(self, x):
        if self.perm is not None:
            x[:] = [x[i] for i in self.perm]

    def permutation(self, n):
        return np.asarray(self.perm if self.perm is not None else range(n))

    def rand(self):
        return 1.0  # never hflip


FULL_CFG = {
    "brightness": 0.3,
    "contrast": 0.3,
    "saturation": 0.3,
    "hue": 0.5,
    "gamma": 1,
    "swap_channels": True,
}


def _cpu_photometric(imgs, factors, order, chan_perm):
    cj = T.ColorJitter(
        FULL_CFG["brightness"], FULL_CFG["contrast"],
        FULL_CFG["saturation"], FULL_CFG["hue"],
        rng=ScriptedRng(factors[:4], perm=order),
    )
    gamma = T.RandomGamma(rng=ScriptedRng([factors[4]]))
    swap = T.RandomSwapChannels(rng=ScriptedRng([], perm=chan_perm))
    return swap(gamma(cj(imgs)))


@pytest.mark.parametrize("order", [(0, 1, 2, 3), (3, 1, 0, 2), (2, 3, 1, 0)])
def test_full_photometric_parity(rng, order):
    imgs = rng.rand(2, 2, 24, 32, 3).astype(np.float32)  # (B, F, H, W, 3)
    # ColorJitter draws factors in definition order: b, c, s, h; then gamma.
    factors = [0.85, 1.12, 0.94, -0.21, 1.3]
    chan_perm = (2, 0, 1)

    cpu = np.stack(
        [_cpu_photometric(im, factors, order, chan_perm) for im in imgs]
    )

    import itertools

    perms = list(itertools.permutations(range(4)))
    sample_params, apply = make_photometric(FULL_CFG)
    B = imgs.shape[0]
    params = {
        "brightness": jnp.full((B,), factors[0], jnp.float32),
        "contrast": jnp.full((B,), factors[1], jnp.float32),
        "saturation": jnp.full((B,), factors[2], jnp.float32),
        "hue": jnp.full((B,), factors[3], jnp.float32),
        "gamma": jnp.full((B,), factors[4], jnp.float32),
        "order": jnp.full((B,), perms.index(tuple(order)), jnp.int32),
        "channel_perm": jnp.tile(jnp.asarray(chan_perm), (B, 1)),
    }
    dev = np.asarray(jax.jit(apply)(jnp.asarray(imgs), params))
    np.testing.assert_allclose(dev, cpu, rtol=0, atol=2e-6)


def test_hue_only_parity(rng):
    cfg = {"hue": 0.5, "swap_channels": True}
    imgs = rng.rand(3, 2, 16, 16, 3).astype(np.float32)
    # Exercise grey/tie pixels through the HSV round trip.
    imgs[0, 0, 0, 0] = 0.5
    imgs[0, 0, 0, 1] = [0.7, 0.7, 0.2]
    imgs[0, 0, 0, 2] = [0.0, 0.0, 0.0]

    d = -0.37
    chan_perm = (1, 2, 0)
    cpu = []
    for im in imgs:
        cj = T.ColorJitter(hue=0.5, rng=ScriptedRng([d]))
        swap = T.RandomSwapChannels(rng=ScriptedRng([], perm=chan_perm))
        cpu.append(swap(cj(im)))
    cpu = np.stack(cpu)

    sample_params, apply = make_photometric(cfg)
    B = imgs.shape[0]
    params = {
        "hue": jnp.full((B,), d, jnp.float32),
        "channel_perm": jnp.tile(jnp.asarray(chan_perm), (B, 1)),
    }
    dev = np.asarray(jax.jit(apply)(jnp.asarray(imgs), params))
    np.testing.assert_allclose(dev, cpu, rtol=0, atol=2e-6)


def test_sample_params_ranges_and_shapes():
    sample_params, apply = make_photometric(FULL_CFG)
    params = jax.jit(sample_params, static_argnums=1)(
        jax.random.PRNGKey(0), 64
    )
    assert set(params) == {
        "brightness", "contrast", "saturation", "hue", "order", "gamma",
        "channel_perm",
    }
    p = jax.device_get(params)
    assert p["brightness"].min() >= 0.7 and p["brightness"].max() <= 1.3
    assert p["hue"].min() >= -0.5 and p["hue"].max() <= 0.5
    assert p["gamma"].min() >= 0.7 and p["gamma"].max() <= 1.5
    assert p["order"].min() >= 0 and p["order"].max() < 24
    # every row is a permutation of (0,1,2)
    assert (np.sort(p["channel_perm"], axis=1) == np.arange(3)).all()
    # params vary across samples
    assert len(np.unique(p["brightness"])) > 32


def test_grad_flows_through_aug(rng):
    """The aug sits inside the train step; grads must pass through it."""
    cfg = {"brightness": 0.3, "hue": 0.2}
    sample_params, apply = make_photometric(cfg)
    imgs = jnp.asarray(rng.rand(2, 1, 8, 8, 3).astype(np.float32))
    params = sample_params(jax.random.PRNGKey(0), 2)

    def f(w):
        return (apply(imgs * w, params) ** 2).sum()

    g = jax.grad(f)(jnp.float32(1.0))
    assert np.isfinite(float(g))
