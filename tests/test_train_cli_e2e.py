"""Full train.py wiring: config -> datasets on disk -> loaders -> trainer.

Covers the last integration seam (cli.train_main) on a synthetic
FlyingChairs directory with the real config schema.
"""

import numpy as np
import pytest

import jax

from arflow_tpu.config import Config
from arflow_tpu.cli import train_main
from arflow_tpu.utils.logger import init_logger
from tests.test_inference_e2e import make_chairs_dir
@pytest.mark.slow
def test_train_main_e2e(tmp_path, rng):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    root = make_chairs_dir(tmp_path, rng, n=10)
    save_root = tmp_path / "run"
    save_root.mkdir()

    cfg = Config(
        {
            "seed": 0,
            "save_root": str(save_root),
            "trainer": "uflow",
            "data": [
                {
                    "root_chairs": str(root),
                    "type": "train",
                    "name": "Chairs",
                    "n_frames": 2,
                    "split": "trainval",
                    "geometric_aug": {"hflip": True},
                    "photometric_aug": {"hue": 0.5, "swap_channels": True},
                },
                {
                    "root_chairs": str(root),
                    "type": "valid",
                    "name": "Chairs",
                    "n_frames": 2,
                    "split": "trainval",
                },
            ],
            "loss": {
                "type": "uflow",
                "w_census": 1.0,
                "w_smooth": 4.0,
                "smooth_order": 1,
                "edge_constant": 150.0,
                "with_bk": True,
            },
            "model": {"type": "uflow", "feature_norm": True, "level_dropout": 0.1},
            "train": {
                "batch_size": 8,
                "epoch_num": 1,
                "epoch_size": 1,
                "valid_size": 1,
                "valid_freq": 1,
                "optim": "adam",
                "lr": 1e-4,
                "beta1": 0.9,
                "beta2": 0.999,
                "eps": 1e-8,
                "weight_decay": 1e-6,
                "bias_decay": 0.0,
                "lr_decay_start_epoch": 100,
                "lr_decay_factor": 0.98,
                "print_freq": 1,
                "record_freq": 1,
                "save_iter": 0,
                "workers": 2,
                "clip": -1.0,
            },
        }
    )
    log = init_logger(log_dir=str(save_root), filename="test.log")
    trainer = train_main(cfg, log)
    assert trainer.i_epoch == 1
    assert trainer.i_iter >= 1
    assert (save_root / "events.jsonl").exists()
    assert list(save_root.glob("Chairs_*")), "no checkpoint written"
