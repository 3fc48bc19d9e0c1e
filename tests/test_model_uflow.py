"""Bit-comparability test: PWCFlow (flax) vs reference uflow_model (torch).

Identical weights (imported via torch_import) + identical inputs must produce
matching per-level flows (SURVEY.md §7.2 step 3 harness).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_oracle import import_reference
from arflow_tpu.config import Config
from arflow_tpu.models.uflow import PWCFlow
from arflow_tpu.models.torch_import import import_uflow

uflow_model = import_reference("models.uflow_model")

B, H, W = 1, 160, 160  # coarsest level 5x5 must exceed max_displacement=4


@pytest.mark.slow
def test_pwcflow_parity(rng):
    torch.manual_seed(0)
    cfg = Config({"feature_norm": True, "level_dropout": 0.0})
    ref = uflow_model.PWCFlow(cfg)
    ref.eval()

    img1 = rng.rand(B, H, W, 3).astype(np.float32)
    img2 = rng.rand(B, H, W, 3).astype(np.float32)
    t1 = torch.from_numpy(np.transpose(img1, (0, 3, 1, 2)))
    t2 = torch.from_numpy(np.transpose(img2, (0, 3, 1, 2)))

    with torch.no_grad():
        ref_out = ref(torch.cat([t1, t2], dim=1), with_bk=False)

    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    params = import_uflow(ref.state_dict())
    out = model.apply(
        {"params": params}, jnp.asarray(img1), jnp.asarray(img2), with_bk=False
    )

    assert len(out["flows_fw"]) == len(ref_out["flows_fw"]) == 6
    for key in ("flows_fw",):
        for lvl, (ours, theirs) in enumerate(zip(out[key], ref_out[key])):
            theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
            np.testing.assert_allclose(
                np.asarray(ours),
                theirs,
                atol=2e-4,
                rtol=1e-3,
                err_msg=f"{key} level {lvl}",
            )


def test_pwcflow_init_and_dropout(rng):
    """Fresh init runs; dropout draws from the 'dropout' rng in train mode."""
    model = PWCFlow(level_dropout=0.5, feature_norm=True)
    img = jnp.asarray(rng.rand(1, 160, 224, 3).astype(np.float32))
    # init/apply must be jitted: un-jitted linen init dispatches op-by-op
    # (minutes on a single CPU core).
    init_fn = jax.jit(
        lambda rngs: model.init(rngs, img, img, with_bk=False, train=True)
    )
    variables = init_fn(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    )
    apply_fn = jax.jit(
        lambda v, rngs: model.apply(
            v, img, img, with_bk=False, train=True, rngs=rngs
        )
    )
    out = apply_fn(variables, {"dropout": jax.random.PRNGKey(2)})
    assert len(out["flows_fw"]) == 6
    assert out["flows_fw"][0].shape == (1, 160, 224, 2)
