"""Command-line entry points (reference: train.py, basic_train.py,
inference.py, evaluate_flo_files_sintel.py)."""

from __future__ import annotations

import argparse
import datetime
import math
import os
import pprint

import numpy as np

from arflow_tpu.config import load_config
from arflow_tpu.utils.logger import init_logger


def seed_everything(seed: int):
    np.random.seed(seed)
    import random

    random.seed(seed)


def build_loaders(cfg, log):
    from arflow_tpu.data import DataLoader, get_dataset

    train_set, valid_set = get_dataset(cfg, seed=cfg.seed)
    valid_len = sum(len(s) for s in valid_set)
    log.info(
        "%d samples found, %d train samples and %d test samples",
        valid_len + (len(train_set) if train_set else 0),
        len(train_set) if train_set else 0,
        valid_len,
    )
    train_loader = (
        DataLoader(
            train_set,
            batch_size=cfg.train.batch_size,
            num_workers=cfg.train.workers,
            shuffle=True,
            drop_last=True,
            seed=cfg.seed,
        )
        if train_set
        else None
    )
    valid_batch_size = cfg.train.get("valid_batch_size", 1)
    valid_loader = [
        DataLoader(
            s,
            batch_size=valid_batch_size,
            num_workers=min(4, cfg.train.workers),
            shuffle=False,
        )
        for s in valid_set
    ]
    return train_loader, valid_loader


def train_main(cfg, log):
    """basic_train.main equivalent (basic_train.py:10-46)."""
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model
    from arflow_tpu.training import get_trainer

    if cfg.model.get("dtype") == "int8" or os.environ.get(
        "ARFLOW_INT8_PYRAMID"
    ) == "1":
        raise ValueError(
            "int8 pyramid (model.dtype 'int8' / ARFLOW_INT8_PYRAMID=1) is a "
            "serving-only mode: the quantization round has zero gradient, "
            "so the feature pyramid would silently receive no training. "
            "Train with 'bfloat16' and switch the inference/serving config "
            "to 'int8'."
        )
    seed_everything(cfg.seed)
    train_loader, valid_loader = build_loaders(cfg, log)

    if cfg.train.epoch_size == 0 or cfg.train.epoch_size < 0:
        cfg.train.epoch_size = len(train_loader) if train_loader else 0
    if train_loader:
        cfg.train.epoch_size = min(cfg.train.epoch_size, len(train_loader))
    valid_size = sum(len(l) for l in valid_loader)
    if cfg.train.valid_size == 0:
        cfg.train.valid_size = valid_size
    cfg.train.valid_size = min(cfg.train.valid_size, valid_size)
    cfg.train.seed = cfg.seed

    model = get_model(cfg.model)
    loss = get_loss(cfg.loss)
    trainer = get_trainer(cfg.trainer)(
        train_loader,
        valid_loader,
        model,
        loss,
        log,
        cfg.save_root,
        cfg.train,
        model_cfg=cfg.model,
        full_cfg=cfg,
    )
    trainer.train()
    return trainer


def train_cli(argv=None):
    """train.py equivalent (train.py:12-51)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default="configs/sintel_uflow.json")
    parser.add_argument("-e", "--evaluate", action="store_true")
    parser.add_argument("-m", "--model", default=None)
    parser.add_argument("--resume", default=None,
                        help="checkpoint to resume mid-run from (restores "
                             "params, optimizer state, epoch/iter counters "
                             "and best-error; continues bit-identically to "
                             "an unbroken run)")
    parser.add_argument("--n_gpu", type=int, default=None,
                        help="kept for CLI parity; device count comes from JAX")
    # Multi-host launch (one process per host; SURVEY §2.3 DCN axis). After
    # initialize_multihost, jax.devices() spans all hosts and the trainer's
    # mesh shards the batch over the full DCN x ICI grid.
    parser.add_argument("--coordinator", default=None,
                        help="coordinator host:port for jax.distributed")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    args = parser.parse_args(argv)

    if args.coordinator is not None:
        from arflow_tpu.parallel import initialize_multihost

        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)

    cfg = load_config(args.config)
    if args.evaluate:
        cfg.train.update(
            {
                "batch_size": 16,
                # Eval batches shard over the device mesh (padded to a mesh
                # multiple) — see BaseTrainer._shard_eval_batch.
                "valid_batch_size": 16,
                "epoch_num": 1,
                "epoch_size": -1,
                "valid_size": 0,
                "workers": 1,
                "valid_freq": 1,
                "track_auc": True,
            }
        )
    if args.model is not None:
        cfg.train.pretrained_model = args.model
    if args.resume is not None:
        cfg.train.resume = args.resume

    curr_time = datetime.datetime.now().strftime("%y%m%d%H%M%S")
    cfg.save_root = os.path.join(
        "./outputs/checkpoints", curr_time[:6], curr_time[6:]
    )
    os.makedirs(cfg.save_root, exist_ok=True)

    log = init_logger(log_dir=cfg.save_root, filename=curr_time[6:] + ".log")
    log.info("=> will save everything to %s", cfg.save_root)
    log.info("=> configurations \n %s", pprint.pformat(cfg))
    return train_main(cfg, log)


def inference_main(cfg, log):
    """inference.py equivalent: dump .flo flow + .npy entropy per sample."""
    import jax
    import jax.numpy as jnp

    from arflow_tpu.data import DataLoader, get_dataset
    from arflow_tpu.models import get_model
    from arflow_tpu.training.checkpoint import load_pretrained
    from arflow_tpu.training.entropy import extract_uv_entropy
    from arflow_tpu.utils.flow_io import write_flo
    from arflow_tpu.utils.meters import AverageMeter
    from arflow_tpu.utils.metrics import _resize_bilinear_np

    _, valid_set = get_dataset(cfg, seed=cfg.get("seed", 0))
    valid_batch_size = cfg.inference.get("valid_batch_size", 1)
    loaders = [
        DataLoader(s, batch_size=valid_batch_size,
                   num_workers=min(4, cfg.inference.get("workers", 2)))
        for s in valid_set
    ]

    model = get_model(cfg.model)
    params = load_pretrained(cfg.inference.pretrained_model, cfg.model)
    if isinstance(params, dict) and "params" in params:
        variables = params
    else:
        variables = {"params": params}

    has_entropy = "approx" in cfg.loss

    @jax.jit
    def forward(img1, img2):
        res = model.apply(variables, img1, img2, with_bk=False)
        flows = res["flows_fw"]
        pred = flows[0][..., 0:2]
        if has_entropy:
            ent = extract_uv_entropy(flows, cfg.loss, res, jax.random.PRNGKey(0))
        else:
            ent = jnp.zeros_like(pred)
        return pred, ent

    batch_time = AverageMeter()
    import time

    for (i_set, loader), dataset_cfg in zip(enumerate(loaders), cfg.data):
        for i_step, data in enumerate(loader):
            end = time.time()
            pred, ent = forward(
                jnp.asarray(data["img1"]), jnp.asarray(data["img2"])
            )
            pred_np = np.asarray(pred)
            ent_np = np.asarray(ent)

            for pred_flow, pred_entropy, orgsize, rpath in zip(
                pred_np, ent_np, data["img1_orgsize"], data["img1_rpath"]
            ):
                orgsize = np.asarray(orgsize).squeeze()
                hh, ww = int(orgsize[0]), int(orgsize[1])
                h, w = pred_flow.shape[:2]
                pred_flow = pred_flow.copy()
                pred_flow[:, :, 0] *= ww / w
                pred_flow[:, :, 1] *= hh / h
                pred_flow = _resize_bilinear_np(pred_flow, (hh, ww))
                pred_entropy = pred_entropy.copy()
                pred_entropy[:, :, 0] += -2 * math.log(w) + 2 * math.log(ww)
                pred_entropy[:, :, 1] += -2 * math.log(h) + 2 * math.log(hh)
                pred_entropy = _resize_bilinear_np(pred_entropy, (hh, ww))

                out_root = dataset_cfg.out_root
                flow_path = os.path.join(
                    out_root, os.path.splitext(str(rpath))[0] + ".flo"
                )
                ent_path = os.path.join(
                    out_root, os.path.splitext(str(rpath))[0] + ".npy"
                )
                os.makedirs(os.path.dirname(flow_path), exist_ok=True)
                write_flo(flow_path, pred_flow)
                np.save(ent_path, pred_entropy)

            batch_time.update(time.time() - end)
            log.info(
                "Inference: %d[%d/%d] Time %s",
                i_set, i_step, len(loader), batch_time,
            )


def inference_cli(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-m", "--model", default=None)
    args = parser.parse_args(argv)
    cfg = load_config(args.config)
    if args.model is not None:
        cfg.inference.pretrained_model = args.model
    log = init_logger(log_dir=".", filename="inference.log")
    log.info("=> configurations \n %s", pprint.pformat(cfg))
    inference_main(cfg, log)


def evaluate_flo_cli(argv=None):
    """Offline EPE + sparsification AUC over dumped .flo/.npy files
    (evaluate_flo_files_sintel.py equivalent)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_root", required=True)
    parser.add_argument("--gt_root", required=True)
    parser.add_argument("--sp_samples", type=int, default=25)
    args = parser.parse_args(argv)

    from pathlib import Path

    from arflow_tpu.utils.flow_io import read_flo
    from arflow_tpu.utils.metrics import evaluate_flow, evaluate_uncertainty

    preds, gts, ents = [], [], []
    for pred_path in sorted(Path(args.pred_root).rglob("*.flo")):
        rel = pred_path.relative_to(args.pred_root)
        gt_path = Path(args.gt_root) / rel
        if not gt_path.is_file():
            continue
        preds.append(read_flo(str(pred_path)))
        gts.append(read_flo(str(gt_path)))
        ent_path = pred_path.with_suffix(".npy")
        if ent_path.is_file():
            ents.append(np.load(ent_path))
    epe = evaluate_flow(gts, preds)
    print(f"EPE: {epe[0]:.4f} over {len(preds)} files")
    if ents and len(ents) == len(preds):
        auc, _, _ = evaluate_uncertainty(gts, preds, ents, args.sp_samples)
        print(f"AUC: {auc[0]:.4f} AUC_diff: {auc[1]:.4f}")


def fit_penalty_cli(argv=None):
    """GMM penalty fitting CLI (reference: train_penalty_em.py:223-346).

    Samples data/smoothness residuals from a dataset with GT flow, fits a
    K-component mixture by variational EM, and prints the (pi, beta) arrays
    to paste into a config's penalty_{smooth,census}_{pi,beta} keys.
    """
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True,
                        help="training config providing data + loss sections")
    parser.add_argument("--penalty", choices=["data", "smooth"], default="smooth")
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--n_iter", type=int, default=30)
    parser.add_argument("--n_samples", type=float, default=3e6)
    parser.add_argument("--subsample", type=float, default=0.95)
    parser.add_argument(
        "--init_vars", type=float, nargs="+",
        default=[0.001, 0.005, 0.01, 0.05, 0.1, 0.5, 1, 5, 10, 50],
    )
    args = parser.parse_args(argv)

    from arflow_tpu.data import DataLoader, get_dataset
    from arflow_tpu.tools.penalty_em import (
        EM,
        abs_robust_loss_fwhm,
        collect_residuals,
        fwhm_scale,
        robust_l1_fwhm,
    )

    cfg = load_config(args.config)
    train_set, valid_set = get_dataset(cfg, seed=cfg.get("seed", 0))
    dataset = train_set if train_set is not None else valid_set[0]
    loader = DataLoader(dataset, batch_size=cfg.train.get("batch_size", 4),
                        num_workers=cfg.train.get("workers", 2), shuffle=True)

    x0 = collect_residuals(
        loader, cfg.loss, penalty=args.penalty,
        subsample=args.subsample, n_samples=args.n_samples,
    )
    print(f"collected {x0.size} residual samples")
    em = EM(k=args.k, init_vars=args.init_vars)
    for j, obj in enumerate(em.fit(x0, n_iter=args.n_iter)):
        print(f"update {j}: objective {obj:.2f}")

    pi = np.asarray(em.state.pi)
    beta = np.asarray(em.state.beta)
    ref_fwhm = (
        abs_robust_loss_fwhm() if args.penalty == "data" else robust_l1_fwhm()
    )
    scale = fwhm_scale(pi, np.zeros_like(pi), beta, ref_fwhm)
    print("Pi: ", pi.tolist())
    print("Beta: ", beta.tolist())
    print("Scaling factor: ", scale)
    print("Beta scaled: ", (beta * scale).tolist())


def export_cli(argv=None):
    """AOT-export the inference program to a single serving artifact.

    No reference equivalent (serving there = re-running the torch model from
    source, /root/reference/inference.py:121-157); see arflow_tpu/serving.
    """
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True,
                        help="training/inference config (model + loss)")
    parser.add_argument("-m", "--model", default=None,
                        help="checkpoint (overrides cfg.inference.pretrained_model)")
    parser.add_argument("-o", "--output", required=True,
                        help="artifact file to write (e.g. model.afx)")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--size", default="384x640",
                        help="HxW input size (default 384x640)")
    parser.add_argument("--platforms", default="tpu",
                        help="comma list, e.g. 'tpu' or 'tpu,cpu' (portable)")
    parser.add_argument("--streaming", action="store_true",
                        help="export the split pyramid+decoder programs "
                             "(one-pyramid-per-frame streaming, source-free; "
                             "run with arflow-stream --artifact)")
    args = parser.parse_args(argv)

    cfg = load_config(args.config)
    ckpt = args.model or cfg.get("inference", {}).get("pretrained_model")
    if not ckpt:
        parser.error("no checkpoint: pass -m or set inference.pretrained_model")

    from arflow_tpu.serving import (
        export_inference,
        export_streaming,
        save_artifact,
        save_streaming_artifact,
    )
    from arflow_tpu.training.checkpoint import load_pretrained

    h, w = (int(s) for s in args.size.lower().split("x"))
    variables = load_pretrained(ckpt, cfg.model)
    platforms = tuple(p.strip() for p in args.platforms.split(","))
    if args.streaming:
        exported, meta = export_streaming(
            cfg, variables, args.batch, (h, w), platforms=platforms
        )
        meta["checkpoint"] = str(ckpt)
        save_streaming_artifact(args.output, exported, meta)
    else:
        exported, meta = export_inference(
            cfg, variables, args.batch, (h, w), platforms=platforms
        )
        meta["checkpoint"] = str(ckpt)
        save_artifact(args.output, exported, meta)
    print(f"wrote {args.output}: {meta}")


def stream_cli(argv=None):
    """Streaming video inference: one pyramid per frame, .flo per pair.

    Frames are consumed in sorted order from --frames (dir or glob); the
    flow for pair (t-1, t) is written as <stem_t>.flo under --out.
    """
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("-m", "--model", default=None)
    parser.add_argument("--artifact", default=None,
                        help="streaming AOT artifact (arflow-export "
                             "--streaming); replaces -c/-m — no model "
                             "source or checkpoint needed")
    parser.add_argument("--frames", required=True,
                        help="directory of frames or a glob pattern")
    parser.add_argument("--out", default=None, help="output dir for .flo")
    parser.add_argument("--size", default=None,
                        help="HxW inference size (default: native frame "
                             "size; artifacts use their exported size)")
    parser.add_argument("--bw", action="store_true",
                        help="also compute backward flow (written as "
                             "<stem>_bw.flo)")
    args = parser.parse_args(argv)

    import glob as _glob

    from arflow_tpu.serving import (
        StreamingFlowEngine,
        load_streaming_artifact,
        run_stream,
    )

    if args.artifact is None:
        if args.config is None:
            parser.error("pass --artifact or -c/--config")
        cfg = load_config(args.config)
        ckpt = args.model or cfg.get("inference", {}).get("pretrained_model")
        if not ckpt:
            parser.error(
                "no checkpoint: pass -m or set inference.pretrained_model"
            )

    from arflow_tpu.training.checkpoint import load_pretrained

    if os.path.isdir(args.frames):
        paths = sorted(
            p for p in _glob.glob(os.path.join(args.frames, "*"))
            if p.lower().endswith((".png", ".ppm", ".jpg", ".jpeg"))
        )
    else:
        paths = sorted(_glob.glob(args.frames))
    if len(paths) < 2:
        parser.error(f"need >=2 frames, found {len(paths)} in {args.frames}")

    size_hw = None
    if args.size:
        h, w = (int(s) for s in args.size.lower().split("x"))
        size_hw = (h, w)

    if args.artifact is not None:
        engine = load_streaming_artifact(args.artifact)
        engine.with_bw = args.bw
        # The exported programs have static shapes: resize to them.
        size_hw = (engine.meta["height"], engine.meta["width"])
    else:
        variables = load_pretrained(ckpt, cfg.model)
        engine = StreamingFlowEngine(
            cfg.model, variables, loss_cfg=cfg.get("loss"), with_bw=args.bw
        )
    stats = run_stream(engine, paths, size_hw=size_hw, out_root=args.out)
    print(
        f"{stats['flows']} flows from {stats['frames']} frames: "
        f"{stats['flows_per_sec']:.2f} flows/s steady-state"
    )


def to_torch_cli(argv=None):
    """Convert a native msgpack checkpoint into a reference-format
    ``.pth.tar`` loadable by the PyTorch reference (strict name-based
    restore, utils/torch_utils.py:54-79) — the reverse migration direction.
    """
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True,
                        help="config naming the model family (cfg.model)")
    parser.add_argument("-m", "--model", required=True,
                        help="native checkpoint (.msgpack) or orbax dir")
    parser.add_argument("-o", "--output", required=True,
                        help=".pth(.tar) file to write")
    args = parser.parse_args(argv)

    cfg = load_config(args.config)

    from arflow_tpu.models.torch_export import save_torch_checkpoint
    from arflow_tpu.training.checkpoint import load_checkpoint, load_checkpoint_orbax

    if os.path.isdir(args.model):
        state = load_checkpoint_orbax(args.model)
    else:
        state = load_checkpoint(args.model)
    variables = {"params": state.get("params", state)}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    else:
        variables = variables["params"]
    epoch = int(state.get("epoch", 0)) if isinstance(state, dict) else 0
    save_torch_checkpoint(args.output, variables, cfg.model, epoch=epoch)
    print(f"wrote {args.output} (epoch {epoch}, model type {cfg.model.type})")
