"""Config system semantics + factory coverage over the shipped config set."""

import glob
import json

import pytest

from arflow_tpu.config import Config, load_config
from arflow_tpu.losses import get_loss
from arflow_tpu.models import get_model


def test_config_attribute_access():
    cfg = Config({"a": 1, "b": {"c": [1, {"d": 2}]}})
    assert cfg.a == 1
    assert cfg.b.c[1].d == 2
    assert hasattr(cfg, "a") and not hasattr(cfg, "zzz")
    assert cfg.get("zzz", 5) == 5
    cfg.update({"b": {"e": 3}})
    assert cfg.b.e == 3
    cfg.x = {"y": 1}
    assert cfg.x.y == 1
    with pytest.raises(AttributeError):
        _ = cfg.nope


# Configs whose reference wiring is dead (SURVEY.md §7.4): chairs_flownet_mse
# requests the unimported 'flownet_prob' model and the unregistered 'ChairsMse'
# trainer; the mse loss itself is live and covered below.
DEAD_CONFIGS = {"chairs_flownet_mse.json"}


@pytest.mark.parametrize(
    "path", sorted(glob.glob("configs/*.json"))
)
def test_factories_accept_shipped_configs(path):
    name = path.split("/")[-1]
    cfg = load_config(path)
    if name in DEAD_CONFIGS:
        pytest.skip("dead reference config (unimplemented model/trainer)")
    model = get_model(cfg.model)
    assert model is not None
    if cfg.loss.get("type") is None:
        cfg.loss.type = cfg.loss.get("name")
    loss = get_loss(cfg.loss)
    assert loss is not None


def test_mse_loss_factory():
    cfg = Config(
        {
            "type": "mse",
            "w_mse": 1.0,
            "w_entropy": 0.1,
            "diag": True,
            "inv_cov": False,
            "n_samples": 1,
            "offdiag_reg": 0.0,
            "align_corners": False,
        }
    )
    assert get_loss(cfg) is not None
