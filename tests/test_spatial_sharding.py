"""Spatial (image-height) sharding of the flagship forward (GSPMD).

Validates SURVEY §2.3's spatial scale-out axis on the virtual 8-device CPU
mesh: the full PWCFlow coarse-to-fine forward — convs (one-row halos),
feature warps (cross-shard gathers), moment normalization (global means),
cost volumes (row shifts) — compiled with inputs H-sharded across devices,
numerically matching the single-device forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.models.uflow import PWCFlow
from arflow_tpu.parallel import (
    make_spatial_mesh,
    shard_images_spatial,
    spatial_apply,
    spatial_image_sharding,
)


@pytest.fixture(scope="module")
def model_and_inputs():
    rng = np.random.RandomState(0)
    b, h, w = 2, 128, 96
    img1 = rng.rand(b, h, w, 3).astype(np.float32)
    img2 = rng.rand(b, h, w, 3).astype(np.float32)
    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    variables = jax.jit(
        lambda r: model.init(r, jnp.asarray(img1), jnp.asarray(img2),
                             with_bk=False)
    )(jax.random.PRNGKey(0))
    return model, variables["params"], img1, img2


def test_spatial_mesh_shapes():
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    mesh = make_spatial_mesh(n_spatial=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("data", "space")
    with pytest.raises(ValueError):
        make_spatial_mesh(n_spatial=3)


def test_spatial_forward_matches_single_device(model_and_inputs):
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    model, params, img1, img2 = model_and_inputs

    def fwd(p, a, b):
        return model.apply({"params": p}, a, b, with_bk=False)["flows_fw"][0]

    # Single-device reference.
    ref = np.asarray(
        jax.jit(fwd)(params, jnp.asarray(img1), jnp.asarray(img2))
    )

    # 2-way batch x 4-way height over the 8 virtual devices.
    mesh = make_spatial_mesh(n_spatial=4)
    a_sh, b_sh = shard_images_spatial(mesh, img1, img2)
    assert a_sh.sharding.spec == spatial_image_sharding(mesh).spec
    out = jax.jit(spatial_apply(fwd))(params, a_sh, b_sh)
    # The program really ran sharded: the (replicated-params) output exists
    # on all 8 devices and its value matches the single-device forward.
    assert len(out.devices()) == 8
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)
@pytest.mark.slow
def test_spatial_train_grads_match_single_device(model_and_inputs):
    """The full train objective (fwd+bw flows, census+smooth loss, grads)
    partitions under the spatial mesh: gradients match single-device."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss

    model, params, img1, img2 = model_and_inputs
    loss = get_loss(Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
        "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
    }))

    def objective(p, a, b):
        res = model.apply({"params": p}, a, b, with_bk=True)
        return loss(res, a, b)["total"]

    grad_fn = jax.value_and_grad(objective)
    l_ref, g_ref = jax.jit(grad_fn)(
        params, jnp.asarray(img1), jnp.asarray(img2)
    )

    mesh = make_spatial_mesh(n_spatial=4)
    a_sh, b_sh = shard_images_spatial(mesh, img1, img2)
    l_sp, g_sp = jax.jit(spatial_apply(grad_fn))(params, a_sh, b_sh)

    np.testing.assert_allclose(float(l_ref), float(l_sp), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sp)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = np.sqrt(np.mean(a * a)) + 1e-12
        # partitioned reductions reorder f32 sums (measured ~5e-4 rel L2)
        assert np.sqrt(np.mean((a - b) ** 2)) / scale < 2e-3


def test_spatial_forward_pure_spatial_batch1(model_and_inputs):
    """Latency mode: ONE frame pair, H split over all 8 devices."""
    if len(jax.devices()) != 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    model, params, img1, img2 = model_and_inputs

    def fwd(p, a, b):
        return model.apply({"params": p}, a, b, with_bk=False)["flows_fw"][0]

    ref = np.asarray(
        jax.jit(fwd)(params, jnp.asarray(img1[:1]), jnp.asarray(img2[:1]))
    )
    mesh = make_spatial_mesh()  # (1, 8): pure spatial
    a_sh, b_sh = shard_images_spatial(mesh, img1[:1], img2[:1])
    out = jax.jit(spatial_apply(fwd))(params, a_sh, b_sh)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)
