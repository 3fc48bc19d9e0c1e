"""Loss zoo. Mirrors the reference factory (losses/get_loss.py:9-24)."""

from arflow_tpu.losses.uflow import UFlowLoss  # noqa: F401
from arflow_tpu.losses.uflow_elbo import UFlowElboLoss  # noqa: F401
from arflow_tpu.losses.unflow import UnFlowLoss  # noqa: F401
from arflow_tpu.losses.elbo import ElboLoss  # noqa: F401
from arflow_tpu.losses.fullres import FullResLoss  # noqa: F401
from arflow_tpu.losses.mse import MseLoss  # noqa: F401


def get_loss(cfg):
    if cfg.type == "unflow":
        return UnFlowLoss(cfg)
    if cfg.type == "elbo":
        return ElboLoss(cfg)
    if cfg.type == "fullres":
        return FullResLoss(cfg)
    if cfg.type == "uflow":
        return UFlowLoss(cfg)
    if cfg.type == "uflow_elbo":
        return UFlowElboLoss(cfg)
    if cfg.type == "mse":
        return MseLoss(cfg)
    raise NotImplementedError(cfg.type)
