"""Base training framework.

Reference: trainer/base_trainer.py:9-158 + the epoch loops of
trainer/uflow_trainer.py / uflow_elbo_trainer.py. TPU-native redesign:

- ONE jitted train step: model forward (fw+bw), loss, grad, optimizer update
  fused into a single XLA program with donated state (SURVEY.md §7.1).
- Data parallelism: 1-D device mesh, batch-sharded inputs, replicated params
  (replaces torch DataParallel, base_trainer.py:75).
- Explicit PRNG threading for level dropout and posterior sampling.
- Lazy init: parameters are initialized (jitted) from the first batch's
  shapes, or imported from a checkpoint (name-based; never positional).
- Training batches with a remainder that doesn't divide the mesh are dropped
  (static shapes keep XLA from recompiling); validation runs unsharded.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from arflow_tpu.parallel import make_mesh, replicate, shard_batch
from arflow_tpu.training.checkpoint import load_pretrained, save_checkpoint
from arflow_tpu.training.optim import create_optimizer
from arflow_tpu.utils.summary import SummaryWriter


class BaseTrainer:
    def __init__(self, train_loader, valid_loader, model, loss_func, _log,
                 save_root, cfg, model_cfg=None, full_cfg=None, mesh=None):
        self._log = _log
        self.cfg = cfg
        self.model_cfg = model_cfg
        self.full_cfg = full_cfg
        self.save_root = str(save_root)
        self.summary_writer = SummaryWriter(self.save_root)
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.model = model
        self.loss_func = loss_func
        self.mesh = mesh or make_mesh()
        self.n_devices = self.mesh.devices.size

        # cfg.train.wfold: opt the TRAINING step into the W-folded feature
        # pyramid (exact relayout; parameter-gradient parity pinned by
        # tests/test_wfold_pyramid.py::test_wfold_kernel_grads_match_direct).
        # Default (absent) leaves the trace-time gate at its per-path
        # default — OFF under train=True, so trajectories stay byte-
        # identical with prior rounds unless a config opts in. The gate is
        # trace-time process state, exactly like ARFLOW_WFOLD_PYR; the
        # trainer pins it before any step is traced.
        wfold = cfg.get("wfold")
        if wfold is not None:
            os.environ["ARFLOW_WFOLD_PYR"] = "1" if wfold else "0"

        self.best_error = np.inf
        self.i_epoch = 0
        self.i_iter = 0
        self.state = None  # lazy-initialized from the first batch
        self.tx = None
        self._train_step = None
        self._has_batch_stats = False
        self._pending_metrics = []  # deferred device-side step metrics

    # -- init ---------------------------------------------------------------

    def _maybe_remat(self, fwd):
        """Wrap the model forward in ``jax.checkpoint`` when
        ``cfg.train.remat`` is set: the backward pass recomputes cheap
        (elementwise/pad/normalize) values instead of keeping them alive
        in HBM, trading FLOPs for memory on memory-bound configs.

        Policy chosen by measurement (benchmarks/bench_remat_memory.py,
        uflow train step @448x1024 b4, XLA memory analysis): the
        ``dots_saveable`` policy — keep MXU (conv) outputs, recompute the
        rest — cuts peak temp HBM 8.47 -> 5.85 GB (-31%) and unlocks b8
        full-res training on a 16 GB chip. Whole-function checkpoint
        (10.98 GB), dots_with_no_batch_dims (11.0) and per-direction
        checkpointing (12.97) all measured WORSE than no remat; the
        replayed forward's live set exceeds what XLA's own scheduling
        keeps. Numerics are reassociation-noise-identical
        (tests/test_remat.py)."""
        if self.cfg.get("remat", False):
            return jax.checkpoint(
                fwd, policy=jax.checkpoint_policies.dots_saveable
            )
        return fwd

    def _model_inputs_from_batch(self, batch):
        """Return the positional model inputs used for initialization."""
        raise NotImplementedError

    def _ensure_init(self, batch):
        if self.state is not None:
            return
        inputs = self._model_inputs_from_batch(batch)
        inputs = [jnp.asarray(x) for x in inputs]
        rngs = {
            "params": jax.random.PRNGKey(self.cfg.get("seed", 0)),
            "dropout": jax.random.PRNGKey(self.cfg.get("seed", 0) + 1),
        }
        init_fn = jax.jit(
            lambda r: self.model.init(r, *inputs, with_bk=True, train=True)
        )
        variables = init_fn(rngs)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        self._has_batch_stats = batch_stats is not None

        if self.cfg.get("pretrained_model"):
            self._log.info(
                "=> using pre-trained weights %s.", self.cfg.pretrained_model
            )
            loaded = load_pretrained(self.cfg.pretrained_model, self.model_cfg)
            if isinstance(loaded, dict) and "params" in loaded:
                params = loaded["params"]
                batch_stats = loaded.get("batch_stats", batch_stats)
            else:
                params = loaded
        else:
            self._log.info("=> Train from scratch.")

        steps_per_epoch = max(
            1, min(self.cfg.epoch_size, len(self.train_loader))
        )
        self.tx = create_optimizer(self.cfg, params, steps_per_epoch)
        opt_state = self.tx.init(params)
        state = {
            "params": params,
            "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32),
        }
        if self.cfg.get("nan_revert", False):
            state["nan_skips"] = jnp.zeros((), jnp.int32)
        if self._has_batch_stats:
            state["batch_stats"] = batch_stats

        if self.cfg.get("resume"):
            state = self._restore_resume(state)

        self.state = replicate(self.mesh, state)
        self._train_step = self._build_train_step()

    def _restore_counters(self):
        """Eagerly read the epoch/iter/best-error counters from the resume
        checkpoint (raw msgpack — no state template needed) so ``train``'s
        loop bounds and the first epoch's ``set_epoch`` use the restored
        epoch. The array state (params/opt_state) is restored later by
        ``_restore_resume`` once the first batch fixes the tree structure."""
        from arflow_tpu.training.checkpoint import load_checkpoint

        raw = load_checkpoint(self.cfg.resume)
        self.i_epoch = int(raw["epoch"])
        self.i_iter = int(raw["i_iter"])
        self.best_error = float(raw["best_error"])

    def _restore_resume(self, state):
        """Full mid-run resume from a checkpoint written by ``save_model``:
        params, opt_state (moments + schedule count), epoch, iteration and
        best-error counters — the resumed run continues bit-identically to
        an unbroken one (tests/test_soak_convergence.py). The reference can
        only warm-start params (trainer/base_trainer.py:59-71); resume here
        goes beyond it (DIVERGENCES.md #15)."""
        from arflow_tpu.training.checkpoint import load_checkpoint

        path = self.cfg.resume
        template = {
            "epoch": np.asarray(0),
            "i_iter": np.asarray(0),
            "best_error": np.asarray(np.inf),
            "params": state["params"],
            "opt_state": state["opt_state"],
            "step": state["step"],
        }
        if self._has_batch_stats:
            template["batch_stats"] = state["batch_stats"]
        restored = load_checkpoint(path, target=template)
        self._log.info("=> resuming from %s (epoch %s, iter %s)", path,
                       int(restored["epoch"]), int(restored["i_iter"]))
        self.i_epoch = int(restored["epoch"])
        self.i_iter = int(restored["i_iter"])
        self.best_error = float(restored["best_error"])
        state = dict(state)
        state["params"] = restored["params"]
        state["opt_state"] = restored["opt_state"]
        state["step"] = jnp.asarray(restored["step"])
        if self._has_batch_stats:
            state["batch_stats"] = restored["batch_stats"]
        return state

    def _build_train_step(self):
        raise NotImplementedError

    def _run_one_epoch(self):
        raise NotImplementedError

    def _validate_with_gt(self):
        raise NotImplementedError

    # -- main loop (base_trainer.py:42-55) ------------------------------------

    def train(self):
        # The full state restore is lazy (_ensure_init needs the first
        # batch's shapes), but the epoch counter must be known BEFORE the
        # loop bounds and the first set_epoch call — peek it eagerly.
        if self.state is None and self.cfg.get("resume"):
            self._restore_counters()
        # range starts at i_epoch so a resumed run executes only the
        # remaining epochs (i_epoch is 0 unless cfg.resume restored it).
        for _ in range(self.i_epoch, self.cfg.epoch_num):
            self._run_one_epoch()
            if self.i_epoch % self.cfg.valid_freq == 0 and self.valid_loader:
                errors, error_names = self._validate_with_gt()
                valid_res = " ".join(
                    "{}: {:.2f}".format(*t) for t in zip(error_names, errors)
                )
                self._log.info(" * Epoch %d %s", self.i_epoch, valid_res)

    # -- helpers --------------------------------------------------------------

    def _shard(self, batch):
        return shard_batch(self.mesh, batch)

    def _trim_batch(self, arrays):
        """Drop the remainder so the batch divides the mesh."""
        b = arrays[0].shape[0]
        usable = (b // self.n_devices) * self.n_devices
        if usable == 0 or usable == b:
            return arrays if usable else None
        return [a[:usable] for a in arrays]

    def _shard_eval_batch(self, batch):
        """Shard a validation batch over the mesh for data-parallel eval.

        Pads to a multiple of the mesh size by repeating the last sample
        (static shapes — no recompile per remainder) and returns
        ``(sharded_batch, n_valid)``; callers slice per-sample outputs back
        to ``n_valid``. Batched scalar loss metrics computed over a padded
        batch include the duplicates — only the final partial batch of an
        eval set is affected, per-sample metrics (EPE etc.) never are.
        """
        n = next(iter(batch.values())).shape[0]
        pad = (-n) % self.n_devices
        if pad:
            batch = {
                k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
                for k, v in batch.items()
            }
        return self._shard(batch), n

    def _step_rng(self):
        return jax.random.fold_in(
            jax.random.PRNGKey(self.cfg.get("seed", 0) + 7919), self.i_iter
        )

    def save_model(self, error, name):
        is_best = error < self.best_error
        if is_best:
            self.best_error = error
        state = {
            "epoch": np.asarray(self.i_epoch),
            "i_iter": np.asarray(self.i_iter),
            "best_error": np.asarray(self.best_error),
            "params": jax.device_get(self.state["params"]),
            "opt_state": jax.device_get(self.state["opt_state"]),
            "step": jax.device_get(self.state["step"]),
        }
        if self._has_batch_stats:
            state["batch_stats"] = jax.device_get(self.state["batch_stats"])
        if self.cfg.get("checkpoint_backend", "msgpack") == "orbax":
            from arflow_tpu.training.checkpoint import save_checkpoint_orbax

            save_checkpoint_orbax(self.save_root, state, name, is_best)
        else:
            save_checkpoint(self.save_root, state, name, is_best)

    def maybe_profile(self):
        """Start a jax.profiler trace for this epoch when cfg.profile_epoch
        matches (replaces the reference's wall-clock-only instrumentation,
        SURVEY.md §5). Trace lands under <save_root>/profile."""
        if self.cfg.get("profile_epoch", -1) == self.i_epoch:
            import jax.profiler

            path = f"{self.save_root}/profile"
            jax.profiler.start_trace(path)
            self._log.info("jax.profiler trace started -> %s", path)
            return True
        return False

    def stop_profile(self, started):
        if started:
            import jax.profiler

            jax.profiler.stop_trace()

    def _maybe_stage1(self):
        """Scheduled loss-config switch (trainer/uflow_trainer.py:26-28).

        ``>=`` plus a fired-flag (not the reference's ``==``) so a run
        resumed past the switch epoch still applies it — the reference's
        in-object loss cfg would have been mutated before the kill."""
        if self.full_cfg is None or "stage1" not in self.full_cfg:
            return
        if (
            not getattr(self, "_stage1_fired", False)
            and self.i_epoch >= self.full_cfg.stage1.epoch
        ):
            self._stage1_fired = True
            self.loss_func.cfg.update(self.full_cfg.stage1.loss)
            self._train_step = self._build_train_step()  # loss cfg is static

    def _begin_epoch(self):
        """Per-epoch bookkeeping shared by all trainers: pin the loader's
        shuffle order to i_epoch (resume-deterministic) and apply any
        scheduled stage1 loss switch."""
        if hasattr(self.train_loader, "set_epoch"):
            self.train_loader.set_epoch(self.i_epoch)
        self._maybe_stage1()

    def _queue_step_metrics(self, metrics, metric_keys, batch_size, i_step,
                            key_meters, key_meter_names, am_batch_time,
                            am_data_time):
        """Record a step's device-side metrics without a host sync.

        Fetching ``float(metrics[...])`` every step forces a device
        round-trip per step (~25-30 ms over the remote-TPU tunnel against an
        ~80 ms step) and blocks async dispatch. Instead the tiny device
        scalars are queued and fetched in ONE bulk transfer whenever a
        print/record boundary (or epoch end) is reached; meters, summary
        rows and log lines are then replayed in order, preserving the exact
        reference cadence. The per-step NaN guard becomes a per-flush guard
        — a NaN loss poisons the params, so it is still caught, at most
        ``min(print_freq, record_freq)`` steps late.
        """
        self._pending_metrics.append(
            (self.i_iter, i_step, batch_size, metrics)
        )
        if (
            self.i_iter % self.cfg.record_freq == 0
            or self.i_iter % self.cfg.print_freq == 0
        ):
            self._flush_metrics(
                metric_keys, key_meters, key_meter_names, am_batch_time,
                am_data_time,
            )

    def _flush_metrics(self, metric_keys, key_meters, key_meter_names,
                       am_batch_time, am_data_time):
        if not self._pending_metrics:
            return
        fetched = jax.device_get([m for (_, _, _, m) in self._pending_metrics])
        for (it, step, n, _), vals in zip(self._pending_metrics, fetched):
            row = [float(vals[k]) for k in metric_keys]
            if not np.isfinite(row[0]):
                if self.cfg.get("nan_revert", False):
                    # The jitted step already discarded this update
                    # (apply_updates_step revert_nonfinite); keep the bad
                    # row out of the meters and carry on.
                    self._log.warning(
                        "non-finite training loss (%s) at iter %d "
                        "(epoch %d, step %d) — update reverted (nan_revert)",
                        row[0], it, self.i_epoch, step,
                    )
                    continue
                # The rows are queued per step, so the flush attributes the
                # exact failing iteration even though the fetch is deferred.
                raise FloatingPointError(
                    f"non-finite training loss ({row[0]}) at iter {it} "
                    f"(epoch {self.i_epoch}, step {step})"
                )
            key_meters.update(row, n)
            if it % self.cfg.record_freq == 0:
                for v, name in zip(key_meters.val, key_meter_names):
                    self.summary_writer.add_scalar("Train_" + name, v, it)
            if it % self.cfg.print_freq == 0:
                self._log.info(
                    "%d:%04d/%04d Time %s Data %s Info %s",
                    self.i_epoch, step, self.cfg.epoch_size,
                    am_batch_time, am_data_time, key_meters,
                )
        self._pending_metrics.clear()


def apply_updates_step(tx, state, grads, new_batch_stats=None, total=None,
                       revert_nonfinite=False):
    """Shared optimizer-update tail for train steps.

    With ``revert_nonfinite`` (cfg.train.nan_revert), a step whose loss or
    gradients are non-finite is discarded INSIDE the jitted step: params,
    opt_state and batch_stats keep their previous values (a device-side
    select — no host sync, no checkpoint reload) and ``nan_skips`` counts
    the discard. This is the working version of the reference's disabled
    revert-last-step-on-NaN mechanism (uflow_elbo_trainer.py:77-86,
    commented out there); default OFF preserves reference semantics (a
    non-finite loss aborts training via the deferred guard).
    """
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    new_state = {
        "params": params,
        "opt_state": opt_state,
        "step": state["step"] + 1,
    }
    if new_batch_stats is not None:
        new_state["batch_stats"] = new_batch_stats
    elif "batch_stats" in state:
        new_state["batch_stats"] = state["batch_stats"]
    if not revert_nonfinite:
        return new_state
    ok = jnp.isfinite(total) if total is not None else jnp.bool_(True)
    ok &= jax.tree_util.tree_reduce(
        lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads, jnp.bool_(True)
    )
    for key in ("params", "opt_state", "batch_stats"):
        if key in new_state and key in state:
            new_state[key] = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old),
                new_state[key], state[key],
            )
    new_state["nan_skips"] = state.get("nan_skips", jnp.zeros((), jnp.int32)) + (
        1 - ok.astype(jnp.int32)
    )
    return new_state


class Timer:
    def __init__(self):
        self.end = time.time()

    def lap(self):
        now = time.time()
        dt = now - self.end
        self.end = now
        return dt
