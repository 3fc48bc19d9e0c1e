"""Worker process for the real 2-process jax.distributed test.

Executes the launch recipe from arflow_tpu/parallel/mesh.py:26-33 verbatim:
one process per "host", a reachable coordinator, then
``initialize_multihost`` -> ``make_hybrid_mesh`` -> one sharded train step
through the framework's shard_batch/replicate/create_optimizer path.
Process 0 writes the resulting params/metrics to an .npz for the parent
test to compare against a single-process run of the same step.

Invoked by tests/test_multiprocess_distributed.py as:
    python tests/distributed_worker.py --coordinator localhost:PORT \
        --num-processes 2 --process-id I --out OUT.npz
"""

import argparse
import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] = (
        os.environ["XLA_FLAGS"] + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402


def tiny_apply(params, x):
    """3x3 conv -> relu -> 3x3 conv (NHWC, SAME), pure-jnp so the worker
    compiles in seconds; the full-model sharded step is covered by
    __graft_entry__.dryrun_multichip."""
    h = jax.lax.conv_general_dilated(
        x, params["w1"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b1"]
    h = jax.nn.relu(h)
    return jax.lax.conv_general_dilated(
        h, params["w2"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b2"]


def make_data():
    rng = np.random.RandomState(0)
    params = {
        "w1": rng.randn(3, 3, 3, 8) * 0.1,
        "b1": np.zeros((8,)),
        "w2": rng.randn(3, 3, 8, 2) * 0.1,
        "b2": np.zeros((2,)),
    }
    global_x = rng.rand(8, 8, 8, 3)
    global_y = rng.randn(8, 8, 8, 2)
    return params, global_x, global_y


def make_data_pwc():
    """Real-model case (round-4 verdict weak #3): the full PWCFlow at a
    tiny 5-level-valid shape, float64 params/inputs so cross-topology
    reduction-order noise stays at the 1e-12 scale of the toy case."""
    from arflow_tpu.models.uflow import PWCFlow

    rng = np.random.RandomState(0)
    global_x = rng.rand(8, 64, 96, 3)  # f64 in [0, 1]
    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    x32 = jnp.asarray(global_x[:1], jnp.float32)
    params = jax.jit(
        lambda r: model.init(r, x32, x32, with_bk=True)
    )(jax.random.PRNGKey(0))["params"]
    params = jax.tree_util.tree_map(
        lambda l: np.asarray(l, np.float64), jax.device_get(params)
    )
    return model, params, global_x


def run_step_pwc(mesh, model, params, x1_local, x2_local):
    """One real unsupervised train step (PWCFlow + UFlowLoss + the
    framework optimizer) on the hybrid mesh — the composition the
    reference runs via torch.nn.DataParallel(self.model)
    (trainer/base_trainer.py:75)."""
    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss
    from arflow_tpu.parallel import replicate, shard_batch
    from arflow_tpu.training.optim import create_optimizer

    loss_fn = get_loss(Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
        "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
    }))
    cfg = Config({
        "optim": "adam", "lr": 1e-4, "beta1": 0.9, "beta2": 0.999,
        "eps": 1e-8, "weight_decay": 0.0, "bias_decay": 0.0,
        "lr_decay_start_epoch": 100, "lr_decay_factor": 0.5,
    })
    tx = create_optimizer(cfg, params, steps_per_epoch=1)
    state = replicate(mesh, {"params": params, "opt_state": tx.init(params)})
    batch = shard_batch(mesh, {"img1": x1_local, "img2": x2_local})

    @jax.jit
    def step(state, img1, img2):
        def loss(p):
            # train=True: the trainer's forward (inference-only relayout
            # gates stay off, as in UFlowTrainer._build_train_step).
            res = model.apply(
                {"params": p}, img1, img2, with_bk=True, train=True
            )
            return loss_fn(res, img1, img2)["total"]

        l, grads = jax.value_and_grad(loss)(state["params"])
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"]
        )
        return {
            "params": optax.apply_updates(state["params"], updates),
            "opt_state": opt_state,
        }, l, grads

    new_state, loss, grads = step(state, batch["img1"], batch["img2"])
    fetch = lambda a: np.asarray(  # noqa: E731 - local view of replicated
        a.addressable_shards[0].data
        if not a.sharding.is_fully_addressable else a
    )
    out = {"loss": fetch(loss)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        new_state["params"]
    ):
        out["param" + jax.tree_util.keystr(path)] = fetch(leaf)
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        out["grad" + jax.tree_util.keystr(path)] = fetch(leaf)
    return out


def run_step(mesh, params, x_local, y_local, shard_kwargs=None):
    from arflow_tpu.config import Config
    from arflow_tpu.parallel import replicate, shard_batch
    from arflow_tpu.training.optim import create_optimizer

    # 'kernel'-style decay masks don't apply to this toy tree; use wd=0.
    cfg = Config({
        "optim": "adam", "lr": 1e-2, "beta1": 0.9, "beta2": 0.999,
        "eps": 1e-8, "weight_decay": 0.0, "bias_decay": 0.0,
        "lr_decay_start_epoch": 100, "lr_decay_factor": 0.5,
    })
    tx = create_optimizer(cfg, params, steps_per_epoch=1)
    state = replicate(mesh, {"params": params, "opt_state": tx.init(params)})
    batch = shard_batch(mesh, {"x": x_local, "y": y_local},
                        **(shard_kwargs or {}))

    @jax.jit
    def step(state, x, y):
        def loss_fn(p):
            pred = tiny_apply(p, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = tx.update(
            grads, state["opt_state"], state["params"]
        )
        return {
            "params": optax.apply_updates(state["params"], updates),
            "opt_state": opt_state,
        }, loss, grads

    new_state, loss, grads = step(state, batch["x"], batch["y"])
    fetch = lambda a: np.asarray(  # noqa: E731 - local view of replicated
        a.addressable_shards[0].data
        if not a.sharding.is_fully_addressable else a
    )
    out = {f"param_{k}": fetch(v) for k, v in new_state["params"].items()}
    out.update({f"grad_{k}": fetch(v) for k, v in grads.items()})
    out["loss"] = fetch(loss)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", choices=("tiny", "pwc"), default="tiny")
    args = ap.parse_args()

    from arflow_tpu.parallel import initialize_multihost, make_hybrid_mesh

    joined = initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    assert joined, "initialize_multihost declined to initialize"
    assert jax.process_count() == args.num_processes, jax.process_count()
    assert len(jax.devices()) == 2 * args.num_processes, len(jax.devices())

    mesh = make_hybrid_mesh()
    assert mesh.devices.shape == (args.num_processes, 2), mesh.devices.shape
    # The dcn (outer) axis must actually cross processes.
    assert (
        mesh.devices[args.process_id, 0].process_index == args.process_id
    )

    if args.model == "pwc":
        model, params, gx = make_data_pwc()
        n_local = gx.shape[0] // args.num_processes
        lo = args.process_id * n_local
        # img2 = img1 rolled one sample: a fixed non-trivial pairing.
        gx2 = np.roll(gx, 1, axis=0)
        out = run_step_pwc(
            mesh, model, params, gx[lo : lo + n_local], gx2[lo : lo + n_local]
        )
    else:
        params, global_x, global_y = make_data()
        # Host-local shard: global batch = concat over processes in order.
        n_local = global_x.shape[0] // args.num_processes
        lo = args.process_id * n_local
        out = run_step(
            mesh, params,
            global_x[lo : lo + n_local], global_y[lo : lo + n_local],
        )

    if args.process_id == 0:
        np.savez(args.out, **out)
    jax.distributed.shutdown()
    print(f"worker {args.process_id} done", flush=True)


if __name__ == "__main__":
    main()
