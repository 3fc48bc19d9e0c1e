"""UFlow trainer: predict on photometric-augmented images, loss on originals.

Reference: trainer/uflow_trainer.py:10-170. The "learning by analogy"
mechanism that survives in the fork: the model sees ``img{1,2}_ph`` while the
photometric loss compares against the un-augmented ``img{1,2}``
(uflow_trainer.py:38-54).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from arflow_tpu.training.trainer import BaseTrainer, Timer, apply_updates_step
from arflow_tpu.utils.meters import AverageMeter
from arflow_tpu.utils.metrics import evaluate_flow
from arflow_tpu.utils.viz import batch_flow2rgb


class UFlowTrainer(BaseTrainer):
    KEY_METERS = ["Loss", "l_ph", "l_sm", "flow_mean"]

    def _model_inputs_from_batch(self, batch):
        return [batch["img1"], batch["img2"]]

    def _device_photometric(self):
        """(sample_params, apply) when device-side aug is configured."""
        cached = getattr(self, "_device_ph", False)
        if cached is False:
            from arflow_tpu.data.device_aug import (
                device_photometric_cfg,
                make_photometric,
            )

            ph_cfg = device_photometric_cfg(self.full_cfg)
            self._device_ph = make_photometric(ph_cfg) if ph_cfg else None
        return self._device_ph

    def _build_train_step(self):
        model, loss_func, tx = self.model, self.loss_func, self.tx
        nan_revert = self.cfg.get("nan_revert", False)
        device_ph = self._device_photometric()

        def fwd(params, a, b, rng):
            return model.apply(
                {"params": params}, a, b, with_bk=True, train=True,
                rngs={"dropout": rng},
            )

        fwd = self._maybe_remat(fwd)

        def step_body(state, img1, img2, img1_ph, img2_ph, rng):
            def loss_fn(params):
                res = fwd(params, img1_ph, img2_ph, rng)
                out = loss_func(res, img1, img2)
                return out["total"], out

            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"]
            )
            new_state = apply_updates_step(
                tx, state, grads, total=out["total"],
                revert_nonfinite=nan_revert,
            )
            metrics = {
                k: out[k] for k in ("total", "l_ph", "l_sm", "flow_mean")
            }
            return new_state, metrics

        if device_ph is None:
            return jax.jit(step_body, donate_argnums=(0,))

        sample_params, apply_ph = device_ph

        def train_step(state, img1, img2, rng):
            # Augment on-device: one params draw per sample, shared by both
            # frames (the CPU path transforms the stacked frames together).
            rng_aug, rng_drop = jax.random.split(rng)
            params_ph = sample_params(rng_aug, img1.shape[0])
            ph = apply_ph(jnp.stack([img1, img2], axis=1), params_ph)
            return step_body(
                state, img1, img2, ph[:, 0], ph[:, 1], rng_drop
            )

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        model, loss_func = self.model, self.loss_func

        def eval_step(params, img1, img2):
            res = model.apply({"params": params}, img1, img2, with_bk=True)
            out = loss_func(res, img1, img2)
            return out, res["flows_fw"][0][..., 0:2]

        return jax.jit(eval_step)

    def _run_one_epoch(self):
        am_batch_time = AverageMeter()
        am_data_time = AverageMeter()
        key_meters = AverageMeter(i=len(self.KEY_METERS), precision=4)
        timer = Timer()

        self._begin_epoch()
        profiling = self.maybe_profile()

        metric_keys = ("total", "l_ph", "l_sm", "flow_mean")
        for i_step, data in enumerate(self.train_loader):
            if i_step > self.cfg.epoch_size:
                break
            img1, img2 = data["img1"], data["img2"]
            if self._device_photometric() is not None:
                trimmed = self._trim_batch([img1, img2])
                if trimmed is None:
                    continue
                img1, img2 = trimmed
                self._ensure_init({"img1": img1, "img2": img2})
                batch = self._shard({"img1": img1, "img2": img2})
                am_data_time.update(timer.lap())
                self.state, metrics = self._train_step(
                    self.state, batch["img1"], batch["img2"], self._step_rng()
                )
            else:
                img1_ph = data.get("img1_ph", img1)
                img2_ph = data.get("img2_ph", img2)
                trimmed = self._trim_batch([img1, img2, img1_ph, img2_ph])
                if trimmed is None:
                    continue
                img1, img2, img1_ph, img2_ph = trimmed
                self._ensure_init({"img1": img1, "img2": img2})
                batch = self._shard(
                    {"img1": img1, "img2": img2, "img1_ph": img1_ph,
                     "img2_ph": img2_ph}
                )
                am_data_time.update(timer.lap())
                self.state, metrics = self._train_step(
                    self.state,
                    batch["img1"],
                    batch["img2"],
                    batch["img1_ph"],
                    batch["img2_ph"],
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
            if self.cfg.get("valid_masks"):
                error_names += ["E_noc", "E_occ", "F1_all"]
            error_meters = AverageMeter(i=len(error_names))
            last = None
            for i_step, data in enumerate(loader):
                sb, n = self._shard_eval_batch(
                    {"img1": np.asarray(data["img1"]),
                     "img2": np.asarray(data["img2"])}
                )
                gt_flows = np.asarray(data["target"]["flow"])
                out, pred = eval_step(
                    self.state["params"], sb["img1"], sb["img2"]
                )
                pred_np = np.asarray(pred)[:n]
                es = evaluate_flow(list(gt_flows), list(pred_np))
                error_meters.update([float(e) for e in es], n)
                last = (data, out, pred_np, n)
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
                data, out, pred_np, n = last
                gt = np.asarray(data["target"]["flow"])[..., :2]
                self.summary_writer.add_images(
                    "Valid/gt", batch_flow2rgb(gt), self.i_epoch
                )
                self.summary_writer.add_images(
                    f"Valid/pred_{i_set}", batch_flow2rgb(pred_np), self.i_epoch
                )
                self.summary_writer.add_images(
                    f"Valid/mask_{i_set}", np.asarray(out["mask1"])[:n],
                    self.i_epoch,
                )
            all_error_avgs.extend(error_meters.avg)
            all_error_names.extend(f"{n}_{i_set}" for n in error_names)

        if self.i_iter > self.cfg.get("save_iter", 0):
            self.save_model(all_error_avgs[0], name="Chairs")
        return all_error_avgs, all_error_names
