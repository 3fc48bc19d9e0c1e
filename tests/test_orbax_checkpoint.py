"""Orbax checkpoint backend round trip."""

import numpy as np

from arflow_tpu.training.checkpoint import (
    load_checkpoint_orbax,
    save_checkpoint_orbax,
)


def test_orbax_roundtrip(tmp_path, rng):
    state = {
        "epoch": np.asarray(3),
        "params": {
            "conv": {"kernel": rng.randn(3, 3, 4, 8).astype(np.float32)},
            "bias": rng.randn(8).astype(np.float32),
        },
    }
    path = save_checkpoint_orbax(str(tmp_path), state, "Model", is_best=True)
    restored = load_checkpoint_orbax(path)
    np.testing.assert_array_equal(
        restored["params"]["conv"]["kernel"], state["params"]["conv"]["kernel"]
    )
    assert int(restored["epoch"]) == 3
    best = load_checkpoint_orbax(str(tmp_path / "Model_model_best_orbax"))
    np.testing.assert_array_equal(
        best["params"]["bias"], state["params"]["bias"]
    )
