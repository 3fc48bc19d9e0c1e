"""Supervised MSE trainer: regress the probabilistic posterior to GT flow.

The reference ships the loss (losses/mse_loss.py) and configs
(configs/chairs_uflow_mse.json, trainer "ChairsMse") but its trainer factory
never learned the name (trainer/get_trainer.py:4-12 raises
NotImplementedError) — the supervised path is dead code there. Here it is a
first-class trainer: one jitted step = model forward (fw only), MseLoss
against the batch's GT flow, grads, optimizer update; validation is EPE on
the full-resolution mean flow like the uflow trainer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from arflow_tpu.training.trainer import BaseTrainer, Timer, apply_updates_step
from arflow_tpu.utils.meters import AverageMeter
from arflow_tpu.utils.metrics import evaluate_flow
from arflow_tpu.utils.viz import batch_flow2rgb


class MseTrainer(BaseTrainer):
    KEY_METERS = ["Loss", "l_mse", "entropy", "l_offdiag"]

    def _model_inputs_from_batch(self, batch):
        return [batch["img1"], batch["img2"]]

    def _apply(self, params, img1, img2, train, rngs=None, batch_stats=None):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return self.model.apply(
            variables, img1, img2, with_bk=False, train=train, rngs=rngs
        )

    def _build_train_step(self):
        model, loss_func, tx = self.model, self.loss_func, self.tx
        nan_revert = self.cfg.get("nan_revert", False)
        has_bs = self._has_batch_stats

        def fwd(params, bs, a, b, rng):
            variables = {"params": params}
            if has_bs:
                variables["batch_stats"] = bs
                res, mut = model.apply(
                    variables, a, b, with_bk=False, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
                return res, mut["batch_stats"]
            res = model.apply(
                variables, a, b, with_bk=False, train=True,
                rngs={"dropout": rng},
            )
            return res, None

        fwd = self._maybe_remat(fwd)

        def train_step(state, img1, img2, gt_flow, rng):
            rng_d, rng_s = jax.random.split(rng)

            def loss_fn(params):
                res, new_bs = fwd(
                    params, state.get("batch_stats"), img1, img2, rng_d
                )
                out = loss_func(res, gt_flow, rng=rng_s)
                return out["total"], (out, new_bs)

            (_, (out, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            new_state = apply_updates_step(
                tx, state, grads, new_bs, total=out["total"],
                revert_nonfinite=nan_revert,
            )
            metrics = {
                k: out[k] for k in ("total", "l_mse", "entropy", "l_offdiag")
            }
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        model = self.model
        has_bs = self._has_batch_stats

        def eval_step(state, img1, img2):
            variables = {"params": state["params"]}
            if has_bs:
                variables["batch_stats"] = state["batch_stats"]
            res = model.apply(variables, img1, img2, with_bk=False)
            return res["flows_fw"][0][..., 0:2]

        return jax.jit(eval_step)

    def _run_one_epoch(self):
        am_batch_time = AverageMeter()
        am_data_time = AverageMeter()
        key_meters = AverageMeter(i=len(self.KEY_METERS), precision=4)
        timer = Timer()

        self._begin_epoch()
        profiling = self.maybe_profile()

        metric_keys = ("total", "l_mse", "entropy", "l_offdiag")
        for i_step, data in enumerate(self.train_loader):
            if i_step > self.cfg.epoch_size:
                break
            img1, img2 = data["img1"], data["img2"]
            gt = data["target"]["flow"][..., 0:2]
            trimmed = self._trim_batch([img1, img2, gt])
            if trimmed is None:
                continue
            img1, img2, gt = trimmed
            self._ensure_init({"img1": img1, "img2": img2})
            batch = self._shard({"img1": img1, "img2": img2, "gt": gt})
            am_data_time.update(timer.lap())

            self.state, metrics = self._train_step(
                self.state, batch["img1"], batch["img2"], batch["gt"],
                self._step_rng(),
            )
            am_batch_time.update(timer.lap())
            self._queue_step_metrics(
                metrics, metric_keys, img1.shape[0], i_step, key_meters,
                self.KEY_METERS, am_batch_time, am_data_time,
            )
            self.i_iter += 1
        self._flush_metrics(metric_keys, key_meters, self.KEY_METERS,
                            am_batch_time, am_data_time)
        self.stop_profile(profiling)
        self.i_epoch += 1

    def _validate_with_gt(self):
        eval_step = getattr(self, "_eval_step", None)
        if eval_step is None:
            eval_step = self._eval_step = self._build_eval_step()

        loaders = self.valid_loader
        if not isinstance(loaders, list):
            loaders = [loaders]

        all_error_avgs = []
        all_error_names = []
        for i_set, loader in enumerate(loaders):
            error_names = ["EPE"]
            error_meters = AverageMeter(i=len(error_names))
            last = None
            for i_step, data in enumerate(loader):
                sb, n = self._shard_eval_batch(
                    {"img1": np.asarray(data["img1"]),
                     "img2": np.asarray(data["img2"])}
                )
                gt_flows = np.asarray(data["target"]["flow"])
                pred = eval_step(self.state, sb["img1"], sb["img2"])
                pred_np = np.asarray(pred)[:n]
                es = evaluate_flow(list(gt_flows), list(pred_np))
                error_meters.update([float(e) for e in es], n)
                last = (gt_flows, pred_np)
                if i_step % self.cfg.print_freq == 0 or i_step == len(loader) - 1:
                    self._log.info(
                        "Test: %d[%d/%d] %s", i_set, i_step, self.cfg.valid_size,
                        " ".join(f"{a:.2f}" for a in error_meters.avg),
                    )
                if i_step > self.cfg.valid_size:
                    break

            for value, name in zip(error_meters.avg, error_names):
                self.summary_writer.add_scalar(
                    f"Valid_{name}_{i_set}", value, self.i_epoch
                )
            if last is not None:
                gt_flows, pred_np = last
                self.summary_writer.add_images(
                    f"Valid/gt_{i_set}", batch_flow2rgb(gt_flows[..., :2]),
                    self.i_epoch,
                )
                self.summary_writer.add_images(
                    f"Valid/pred_{i_set}", batch_flow2rgb(pred_np), self.i_epoch
                )
            all_error_avgs.extend(error_meters.avg)
            all_error_names.extend(f"{n}_{i_set}" for n in error_names)

        if self.i_iter > self.cfg.get("save_iter", 0):
            self.save_model(all_error_avgs[0], name="Chairs")
        return all_error_avgs, all_error_names
