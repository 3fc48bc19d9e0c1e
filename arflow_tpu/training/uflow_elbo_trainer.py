"""ELBO trainer: probabilistic flow training with uncertainty validation.

Reference: trainer/uflow_elbo_trainer.py:15-303 — same epoch loop as the
uflow trainer but the loss consumes (res_dict, img1, img2) and samples the
posterior; validation additionally tracks loss components, per-pixel entropy
maps, sparsification AUC, and calibration curves; gradient clipping comes
from cfg.clip (wired into the optax chain here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from arflow_tpu.training.entropy import extract_uv_entropy
from arflow_tpu.training.trainer import BaseTrainer, Timer, apply_updates_step
from arflow_tpu.utils.meters import AverageMeter
from arflow_tpu.utils.metrics import CalibrationCurve, evaluate_flow, evaluate_uncertainty
from arflow_tpu.utils.viz import batch_flow2rgb


def _draw_weights(images, weights):
    """Render each sample's mixture weight as text onto its flow image.

    ``images``: (B, H, W, 3) float [0,1]; ``weights``: (B,) floats.
    Reference: trainer/uflow_elbo_trainer.py:246-255 (PIL text, top-left).
    Falls back to the untouched images when PIL is unavailable.
    """
    try:
        import PIL.Image
        import PIL.ImageDraw
    except Exception:  # pragma: no cover
        return images
    out = (np.asarray(images) * 255.0).astype(np.uint8)
    for i in range(out.shape[0]):
        pimg = PIL.Image.fromarray(out[i])
        PIL.ImageDraw.Draw(pimg).text(
            (4, 4), f"{float(weights[i]):.2f}", fill=(0, 0, 0)
        )
        out[i] = np.array(pimg)
    return out.astype(np.float32) / 255.0


class UFlowElboTrainer(BaseTrainer):
    KEY_METERS = ["Loss", "l_ph", "l_sm", "entropy", "l_oof"]

    def _model_inputs_from_batch(self, batch):
        return [batch["img1"], batch["img2"]]

    def _apply_model(self, params, batch_stats, img1, img2, train, rngs):
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        kwargs = dict(with_bk=True, train=train)
        if train and batch_stats is not None:
            res, updates = self.model.apply(
                variables, img1, img2, rngs=rngs, mutable=["batch_stats"], **kwargs
            )
            return res, updates["batch_stats"]
        res = self.model.apply(variables, img1, img2, rngs=rngs, **kwargs)
        return res, batch_stats

    def _build_train_step(self):
        model, loss_func, tx = self.model, self.loss_func, self.tx
        nan_revert = self.cfg.get("nan_revert", False)
        has_bs = self._has_batch_stats

        def fwd(params, bs, a, b, rng):
            variables = {"params": params}
            if has_bs:
                variables["batch_stats"] = bs
                res, mut = model.apply(
                    variables, a, b, with_bk=True, train=True,
                    rngs={"dropout": rng}, mutable=["batch_stats"],
                )
                return res, mut["batch_stats"]
            res = model.apply(
                variables, a, b, with_bk=True, train=True,
                rngs={"dropout": rng},
            )
            return res, None

        fwd = self._maybe_remat(fwd)

        def train_step(state, img1, img2, rng):
            rng_d, rng_s = jax.random.split(rng)

            def loss_fn(params):
                res, new_bs = fwd(
                    params, state.get("batch_stats"), img1, img2, rng_d
                )
                out = loss_func(res, img1, img2, rng=rng_s)
                return out["total"], (out, new_bs)

            (_, (out, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state["params"])
            new_state = apply_updates_step(
                tx, state, grads, new_bs, total=out["total"],
                revert_nonfinite=nan_revert,
            )
            metrics = {
                k: out[k] for k in ("total", "l_ph", "l_sm", "entropy", "l_oof")
            }
            return new_state, metrics

        return jax.jit(train_step, donate_argnums=(0,))

    def _build_eval_step(self):
        model, loss_func = self.model, self.loss_func
        has_bs = self._has_batch_stats
        loss_cfg = self.loss_func.cfg

        def eval_step(state, img1, img2, rng):
            variables = {"params": state["params"]}
            if has_bs:
                variables["batch_stats"] = state["batch_stats"]
            res = model.apply(variables, img1, img2, with_bk=True)
            rng_l, rng_e = jax.random.split(rng)
            out = loss_func(res, img1, img2, rng=rng_l)
            flows = res["flows_fw"]
            pred = flows[0][..., 0:2]
            uv_entropy = extract_uv_entropy(flows, loss_cfg, res, rng_e)
            weights = res.get("weights_fw")
            return out, pred, uv_entropy, flows[2], flows[0], weights

        return jax.jit(eval_step)

    def _run_one_epoch(self):
        am_batch_time = AverageMeter()
        am_data_time = AverageMeter()
        key_meters = AverageMeter(i=len(self.KEY_METERS), precision=4)
        timer = Timer()

        self._begin_epoch()
        profiling = self.maybe_profile()

        metric_keys = ("total", "l_ph", "l_sm", "entropy", "l_oof")
        for i_step, data in enumerate(self.train_loader):
            if i_step > self.cfg.epoch_size:
                break
            img1, img2 = data["img1"], data["img2"]
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
        eval_step = getattr(self, "_eval_step_fn", None)
        if eval_step is None:
            eval_step = self._eval_step_fn = self._build_eval_step()

        loaders = self.valid_loader
        if not isinstance(loaders, list):
            loaders = [loaders]

        track_auc = bool(self.cfg.get("track_auc"))
        track_cc = bool(self.cfg.get("track_cc"))
        cc = CalibrationCurve() if track_cc else None

        all_error_avgs = []
        all_error_names = []
        for i_set, loader in enumerate(loaders):
            error_names = ["Loss", "l_ph", "l_sm", "entropy", "l_oof", "EPE"]
            if self.cfg.get("valid_masks"):
                error_names += ["E_noc", "E_occ", "F1_all"]
            if track_auc:
                error_names += ["AUC", "AUC_diff"]
            error_meters = AverageMeter(i=len(error_names))
            splots, oplots = [], []
            last = None

            for i_step, data in enumerate(loader):
                sb, n = self._shard_eval_batch(
                    {"img1": np.asarray(data["img1"]),
                     "img2": np.asarray(data["img2"])}
                )
                gt_flows = np.asarray(data["target"]["flow"])
                out, pred, uv_entropy, flows_l2, flows_l0, weights = eval_step(
                    self.state, sb["img1"], sb["img2"], self._step_rng()
                )
                error_values = [
                    float(out["total"]), float(out["l_ph"]), float(out["l_sm"]),
                    float(out["entropy"]), float(out["l_oof"]),
                ]
                pred_np = np.asarray(pred)[:n]
                error_values += [
                    float(e) for e in evaluate_flow(list(gt_flows), list(pred_np))
                ]
                ent_np = np.asarray(uv_entropy)[:n]
                if track_cc:
                    cc(list(gt_flows), list(pred_np), list(ent_np))
                if track_auc:
                    auc, splot, oplot = evaluate_uncertainty(
                        list(gt_flows), list(pred_np), list(ent_np),
                        sp_samples=self.cfg.get("sp_samples", 25),
                    )
                    splots += splot
                    oplots += oplot
                    error_values += [float(a) for a in auc]

                error_meters.update(error_values, n)
                last = (data, out, pred_np, ent_np, flows_l2, flows_l0,
                        weights, n)
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
                (data, out, pred_np, ent_np, flows_l2, flows_l0, weights,
                 n) = last
                np.save(
                    f"{self.save_root}/flow_fw_l2_{self.i_epoch}.npy",
                    np.asarray(flows_l2)[:n],
                )
                gt = np.asarray(data["target"]["flow"])[..., :2]
                self.summary_writer.add_images(
                    f"Valid/gt_{i_set}", batch_flow2rgb(gt), self.i_epoch
                )
                # Per-component predictions with the predicted mixture weight
                # drawn onto each image (trainer/uflow_elbo_trainer.py:241-257).
                flows_l0 = np.asarray(flows_l0)[:n]
                weights_np = None if weights is None else np.asarray(weights)[:n]
                for k in range(self.loss_func.cfg.get("n_components", 1)):
                    comp = batch_flow2rgb(flows_l0[..., 2 * k : 2 * (k + 1)])
                    if weights_np is not None:
                        comp = _draw_weights(comp, weights_np[:, k])
                    self.summary_writer.add_images(
                        f"Valid/pred_{i_set}_{k}", comp, self.i_epoch
                    )
                ent = ent_np.sum(-1, keepdims=True)
                ent = ent - ent.min()
                ent = ent / max(ent.max(), 1e-12)
                self.summary_writer.add_images(
                    f"Valid/entropy_{i_set}", ent, self.i_epoch
                )
                self.summary_writer.add_images(
                    f"Valid/sample_flows_{i_set}",
                    batch_flow2rgb(np.asarray(out["flow12_2"])[:n]),
                    self.i_epoch,
                )
                if out["occu_mask12"] is not None:
                    self.summary_writer.add_images(
                        f"Valid/occu_masks_{i_set}",
                        np.asarray(out["occu_mask12"])[:n],
                        self.i_epoch,
                    )
                self.summary_writer.add_images(
                    f"Valid/valid_masks_{i_set}",
                    np.asarray(out["valid_mask12"])[:n],
                    self.i_epoch,
                )
            if splots and oplots:
                self._plot_splots(splots, oplots, i_set)

            all_error_avgs.extend(error_meters.avg)
            all_error_names.extend(f"{n}_{i_set}" for n in error_names)

        if track_cc and cc is not None:
            self._plot_calibration(cc)

        if self.i_iter > self.cfg.get("save_iter", 0):
            self.save_model(all_error_avgs[0], name="Chairs")
        return all_error_avgs, all_error_names

    def _plot_splots(self, splots, oplots, i_set):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            x = np.linspace(0, 1, self.cfg.get("sp_samples", 25))
            fig, ax = plt.subplots()
            ax.plot(x, np.mean(splots, axis=0))
            ax.plot(x, np.mean(oplots, axis=0))
            ax.legend(["splot", "oracle"])
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
            plt.close(fig)
            self.summary_writer.add_image(
                f"Valid/splot_{i_set}", buf, self.i_epoch
            )
        except Exception as e:  # pragma: no cover
            self._log.warning("splot rendering failed: %s", e)

    def _plot_calibration(self, cc):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            vals, means, sigmas, numbers = cc.calibration_curve()
            fig, ax = plt.subplots(1, 2, figsize=(30, 10))
            ax[0].errorbar(vals, means, sigmas, fmt="o", linewidth=2, capsize=6)
            ax[0].set_xlabel("sigma")
            ax[0].set_ylabel("epe")
            ax[0].grid()
            ax[1].stem(vals, numbers)
            ax[1].set_yscale("log")
            fig.savefig(f"{self.save_root}/calibration_{self.i_epoch}.png")
            plt.close(fig)
        except Exception as e:  # pragma: no cover
            self._log.warning("calibration rendering failed: %s", e)
