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
"""

from __future__ import annotations

import jax
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


def create_optimizer(cfg, params, steps_per_epoch: int):
    """Build the optax transform for cfg.optim in {'adam','adamw','sgd'}."""
    sched = lr_schedule(cfg, steps_per_epoch)
    wd = cfg.get("weight_decay", 0.0)
    bd = cfg.get("bias_decay", 0.0)

    decay_transforms = []
    if wd:
        decay_transforms.append(
            optax.add_decayed_weights(wd, mask=lambda p: decay_mask(p, True))
        )
    if bd:
        decay_transforms.append(
            optax.add_decayed_weights(bd, mask=lambda p: decay_mask(p, False))
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
        # Decoupled decay (reference custom AdamW, utils/torch_utils.py:82-161;
        # note: the reference applies decay unscaled by lr — here it is
        # lr-scaled per the AdamW paper).
        core = [
            optax.scale_by_adam(
                b1=cfg.get("momentum", 0.9), b2=cfg.get("beta", 0.999), eps=1e-8
            ),
            *decay_transforms,
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
        transforms.append(optax.clip_by_global_norm(clip))
    transforms += core
    transforms.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*transforms)
