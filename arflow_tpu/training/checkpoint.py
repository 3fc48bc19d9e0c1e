"""Checkpoint save/load.

Native format: msgpack (flax.serialization) holding {'epoch', 'params',
'opt_state'?, 'batch_stats'?}. Unlike the reference (trainer/base_trainer.py
saves only the model state; optimizer state and epoch are not restored —
SURVEY.md §5), resume restores everything saved.

Torch ``.pth(.tar)`` checkpoints are imported name-based via
arflow_tpu.models.torch_import — never the positional zip remap of
base_trainer.py:64-71.
"""

from __future__ import annotations

import os
import shutil

import flax.serialization
import jax
import numpy as np


def _to_state_dict(tree):
    # to_state_dict converts tuples/namedtuples (optax states) into dicts that
    # msgpack can serialize.
    tree = flax.serialization.to_state_dict(tree)
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(save_dir, state: dict, prefix: str, is_best: bool = False,
                    filename: str = "ckpt.msgpack"):
    """Write {prefix}_{filename}; copy to {prefix}_model_best.msgpack when best
    (utils/torch_utils.py:39-51 behavior)."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, f"{prefix}_{filename}")
    data = flax.serialization.msgpack_serialize(_to_state_dict(state))
    with open(path, "wb") as f:
        f.write(data)
    if is_best:
        shutil.copyfile(path, os.path.join(save_dir, f"{prefix}_model_best.msgpack"))
    return path


def load_checkpoint(path: str, target=None) -> dict:
    """Restore a checkpoint; pass ``target`` (a state template) to recover
    tuple-structured leaves like optax states."""
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if target is not None:
        return flax.serialization.from_state_dict(target, raw)
    return raw


def load_pretrained(path: str, model_cfg) -> dict:
    """Load pretrained params from a native msgpack or a torch checkpoint.

    Torch checkpoints are converted with the model-family importer selected by
    model_cfg.type.
    """
    if path.endswith((".pth", ".pth.tar", ".tar", ".pt")):
        from arflow_tpu.models import torch_import as ti

        sd = ti.load_torch_checkpoint(path)
        t = model_cfg.type
        if t == "uflow":
            return ti.import_uflow(sd)
        if t == "uflow_prob":
            return ti.import_uflow_prob(
                sd,
                n_pyramids=model_cfg.get("n_pyramids", 1),
                mixture_weights=model_cfg.get("mixture_weights", False),
            )
        if t == "component":
            return ti.import_component_net(sd)
        if t in ("pwclite", "pwclite_prob"):
            return ti.import_pwclite(sd, reduce_dense=model_cfg.get("reduce_dense", True))
        if t == "pwclite_uflow":
            return ti.import_pwclite_uflow(
                sd, reduce_dense=model_cfg.get("reduce_dense", True)
            )
        raise NotImplementedError(f"torch import for model type {t}")
    state = load_checkpoint(path)
    return state.get("params", state)


# ---------------------------------------------------------------------------
# Orbax backend (optional; production-grade async-capable checkpointing)
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(save_dir, state: dict, prefix: str,
                          is_best: bool = False):
    """Save via orbax StandardCheckpointer to <save_dir>/<prefix>_ckpt_orbax
    (+ <prefix>_model_best_orbax copy on best)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(save_dir, f"{prefix}_ckpt_orbax"))
    ckptr = ocp.StandardCheckpointer()
    state = _to_state_dict(state)
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if is_best:
        best = os.path.abspath(
            os.path.join(save_dir, f"{prefix}_model_best_orbax")
        )
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def load_checkpoint_orbax(path: str, target=None) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path))
    if target is not None:
        return flax.serialization.from_state_dict(target, restored)
    return restored
