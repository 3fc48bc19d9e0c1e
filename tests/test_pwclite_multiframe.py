"""PWCLite 5-frame chaining shapes + the multi-frame result structure
(models/pwclite.py:274-283)."""

import numpy as np

import jax
import jax.numpy as jnp

from arflow_tpu.models.pwclite import PWCLite

B, H, W = 1, 64, 64


def test_pwclite_5frame_shapes(rng):
    model = PWCLite(n_frames=5, upsample=True, reduce_dense=True)
    imgs = [
        jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32)) for _ in range(5)
    ]
    init_fn = jax.jit(
        lambda r: model.init(r, *imgs, with_bk=True)
    )
    variables = init_fn(jax.random.PRNGKey(0))
    out = jax.jit(
        lambda v, *im: model.apply(v, *im, with_bk=True)
    )(variables, *imgs)
    # 5-frame: res['flows_fw'] = [flows_12, flows_23]; each is a level list.
    assert len(out["flows_fw"]) == 2
    assert len(out["flows_bw"]) == 2
    for group in out["flows_fw"] + out["flows_bw"]:
        assert len(group) == 5
        # 3-frame variant upsamples every level by 4 (pwclite.py:252-254):
        # finest level = 4x the 1/4-res level = full res.
        assert group[0].shape == (B, H, W, 2)
