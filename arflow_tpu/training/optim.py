"""Optimizer factory with decay/no-decay parameter groups.

Reference: trainer/base_trainer.py:78-129 — conv/deconv/linear *weights* get
``weight_decay``, biases and norm params get ``bias_decay`` (usually 0);
Adam (torch semantics: L2 added to the gradient before moments), AdamW
(decoupled), or SGD+momentum; exponential LR decay gated by
``lr_decay_start_epoch``.

In the flax param tree the decay set is exactly the leaves named 'kernel'
(Conv / ConvTranspose / Dense); 'bias' and BatchNorm 'scale'/'bias' fall in
the no-decay set — the same partition the reference builds by module-type
whitelisting.

Unused-parameter semantics: torch optimizers SKIP params whose ``.grad`` is
None — graph-disconnected modules (e.g. the level-0/1 decoder heads under
the level-2-only MSE loss) receive neither moment updates nor weight decay
(reference AdamW: utils/torch_utils.py:120-121 ``if p.grad is None:
continue``; torch.optim.Adam behaves the same). JAX gradients are dense
zeros instead, so the decay paths here gate per-leaf on ``any(g != 0)``:
for static graph connectivity (a leaf is either always or never reached by
the loss — true for every shipped config) this reproduces the torch
trajectory exactly, as pinned by tests/test_lockstep_trajectory.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def decay_mask(params, decay: bool = True):
    """Pytree of bools: True where weight decay applies (leaf name 'kernel')."""

    def mask_leaf(path, _):
        is_kernel = path[-1].key == "kernel"
        return is_kernel if decay else not is_kernel

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def lr_schedule(cfg, steps_per_epoch: int):
    """Constant LR, then *lr_decay_factor per epoch from lr_decay_start_epoch
    (trainer/base_trainer.py:52-55,128-129 semantics)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        exponent = jax.numpy.maximum(0, epoch - cfg.lr_decay_start_epoch + 1)
        return cfg.lr * (cfg.lr_decay_factor**exponent)

    return schedule


def add_decayed_weights_if_used(weight_decay: float, mask_fn):
    """L2-into-gradient decay that skips graph-disconnected leaves.

    ``optax.add_decayed_weights`` adds ``wd*p`` unconditionally, which would
    push never-used params (zero grads) through the Adam moments; torch adds
    the L2 term only for params that HAVE a gradient (p.grad is None is
    skipped before the decay, torch.optim.Adam semantics)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params):
        mask = mask_fn(params)

        def leaf(u, p, m):
            if not m:
                return u
            used = jnp.any(u != 0)
            return u + jnp.where(used, weight_decay * p, 0.0).astype(u.dtype)

        return (
            jax.tree_util.tree_map(leaf, updates, params, mask),
            state,
        )

    return optax.GradientTransformation(init, update)


def clip_by_global_norm_torch(max_norm: float):
    """torch.nn.utils.clip_grad_norm_ semantics: scale ALL grads by
    ``min(1, max_norm / (total_norm + 1e-6))``. The +1e-6 in the denominator
    (torch clip_grads_with_norm_) makes the clipped norm sit slightly BELOW
    max_norm — a ~1e-6 relative difference vs optax.clip_by_global_norm that
    compounds visibly over a locksteped trajectory when clipping engages
    every step (tests/test_lockstep_trajectory.py case b)."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        gnorm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
        return (
            jax.tree_util.tree_map(lambda u: (u * scale).astype(u.dtype),
                                   updates),
            state,
        )

    return optax.GradientTransformation(init, update)


def create_optimizer(cfg, params, steps_per_epoch: int):
    """Build the optax transform for cfg.optim in {'adam','adamw','sgd'}."""
    sched = lr_schedule(cfg, steps_per_epoch)
    wd = cfg.get("weight_decay", 0.0)
    bd = cfg.get("bias_decay", 0.0)

    decay_transforms = []
    if wd:
        decay_transforms.append(
            add_decayed_weights_if_used(wd, lambda p: decay_mask(p, True))
        )
    if bd:
        decay_transforms.append(
            add_decayed_weights_if_used(bd, lambda p: decay_mask(p, False))
        )

    if cfg.optim == "adam":
        # torch.optim.Adam: L2 term enters the gradient before the moments.
        core = [
            *decay_transforms,
            optax.scale_by_adam(
                b1=cfg.get("beta1", 0.9),
                b2=cfg.get("beta2", 0.999),
                eps=cfg.get("eps", 1e-8),
            ),
        ]
    elif cfg.optim == "adamw":
        # Exact reference semantics (custom AdamW, utils/torch_utils.py:82-161):
        # update = lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v)+eps) — note eps is
        # added to the UNcorrected sqrt(v) — followed by a decoupled,
        # lr-UNscaled multiplicative decay p *= (1-wd) applied AFTER the Adam
        # step (per param group: wd for conv/dense kernels, bias_decay for the
        # rest). Verified step-for-step by the lockstep trajectory test.
        core = [
            scale_by_torch_adamw(
                b1=cfg.get("momentum", 0.9), b2=cfg.get("beta", 0.999), eps=1e-8
            ),
        ]
    elif cfg.optim == "sgd":
        core = [
            *decay_transforms,
            optax.trace(decay=cfg.get("momentum", 0.9)),
        ]
    else:
        raise NotImplementedError(cfg.optim)

    transforms = []
    clip = cfg.get("clip", -1.0)
    if clip and clip > 0:
        transforms.append(clip_by_global_norm_torch(clip))
    transforms += core
    transforms.append(optax.scale_by_learning_rate(sched))
    if cfg.optim == "adamw" and (wd or bd):
        transforms.append(torch_adamw_decay(wd, bd))
    return optax.chain(*transforms)


class ScaleByTorchAdamWState(NamedTuple):
    count: object  # per-leaf step counts (torch keeps state['step'] per param)
    mu: object
    nu: object


def scale_by_torch_adamw(b1: float, b2: float, eps: float = 1e-8):
    """Adam scaling with the reference AdamW's eps placement
    (utils/torch_utils.py:136-156): ``sqrt(1-b2^t)/(1-b1^t) * m/(sqrt(v)+eps)``
    — eps is added to the *uncorrected* second-moment sqrt, unlike
    ``optax.scale_by_adam`` which adds it to the bias-corrected one. The two
    differ by ``eps*(1-sqrt(1-b2^t))`` in the denominator, which matters in
    the first hundred steps and for near-zero-gradient leaves.

    Leaves whose gradient is identically zero this step are frozen — no
    moment decay, no count increment, zero update — matching torch's
    ``if p.grad is None: continue`` for graph-disconnected params (the step
    count is per-leaf exactly as torch keeps ``state['step']`` per param).
    """

    acc_dtype = lambda: (  # noqa: E731
        jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    )

    def init(params):
        return ScaleByTorchAdamWState(
            count=jax.tree_util.tree_map(
                lambda p: jnp.zeros((), jnp.int32), params
            ),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        used = jax.tree_util.tree_map(lambda g: jnp.any(g != 0), grads)
        mu = jax.tree_util.tree_map(
            lambda m, g, u: jnp.where(u, b1 * m + (1.0 - b1) * g, m),
            state.mu, grads, used,
        )
        nu = jax.tree_util.tree_map(
            lambda v, g, u: jnp.where(u, b2 * v + (1.0 - b2) * g * g, v),
            state.nu, grads, used,
        )
        count = jax.tree_util.tree_map(
            lambda c, u: c + u.astype(jnp.int32), state.count, used
        )

        def scaled(m, v, c, u):
            cf = jnp.maximum(c, 1).astype(acc_dtype())
            bc1 = 1.0 - b1**cf
            bc2 = 1.0 - b2**cf
            out = jnp.sqrt(bc2) / bc1 * m / (jnp.sqrt(v) + eps)
            return jnp.where(u, out, 0.0).astype(m.dtype)

        updates = jax.tree_util.tree_map(scaled, mu, nu, count, used)
        return updates, ScaleByTorchAdamWState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


def torch_adamw_decay(wd: float, bd: float):
    """Reference AdamW's post-step decay (utils/torch_utils.py:158-159):
    ``p.add_(-wd * p)`` AFTER the Adam update, NOT scaled by lr. Expressed as
    an additive update on the pre-step params:
    ``p_new = (p + u)*(1-w)  =>  u' = u*(1-w) - w*p``. Per the reference's
    param groups, conv/dense kernels get ``wd``; everything else ``bd``.
    Leaves with an all-zero update (never-used params: zero moments) are
    skipped, matching torch's p.grad-is-None skip."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params):
        def leaf(path, u, p):
            w = wd if path[-1].key == "kernel" else bd
            used = jnp.any(u != 0)
            return jnp.where(used, u * (1.0 - w) - w * p, u).astype(u.dtype)

        return (
            jax.tree_util.tree_map_with_path(leaf, updates, params),
            state,
        )

    return optax.GradientTransformation(init, update)
