"""Training framework: optimizers, checkpointing, jitted trainers.

Mirrors the reference trainer registry (trainer/get_trainer.py:4-12):
'uflow' and 'uflow_elbo'.
"""

from arflow_tpu.training.optim import create_optimizer, decay_mask  # noqa: F401
from arflow_tpu.training.checkpoint import (  # noqa: F401
    save_checkpoint,
    load_checkpoint,
    load_pretrained,
)


def get_trainer(name: str):
    if name == "uflow":
        from arflow_tpu.training.uflow_trainer import UFlowTrainer

        return UFlowTrainer
    if name == "uflow_elbo":
        from arflow_tpu.training.uflow_elbo_trainer import UFlowElboTrainer

        return UFlowElboTrainer
    if name in ("mse", "ChairsMse"):
        # The reference ships "ChairsMse" configs its own factory never
        # learned (trainer/get_trainer.py raises) — here the supervised
        # path is trainable (training/mse_trainer.py).
        from arflow_tpu.training.mse_trainer import MseTrainer

        return MseTrainer
    raise NotImplementedError(name)
