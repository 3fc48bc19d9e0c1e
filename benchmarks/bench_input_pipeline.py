"""Disk -> batch input-pipeline throughput benchmark.

Measures whether the threaded DataLoader + native C++ decoders can feed the
TPU train step from disk on this host. Builds a synthetic on-disk
FlyingChairs-style dataset (PPM pairs + .flo GT at the real 384x512
resolution), runs the REAL pipeline from configs/chairs_uflow.json (hflip
geometric aug + hue/channel-swap photometric aug), and reports samples/s.

Yardstick: the round-1 UFlow train step consumes 97.1 samples/s
(82.4 ms/step @ b8, BASELINE.md); the loader should sustain >=2x that so the
accelerator never starves even with transfer overhead.

Usage: python benchmarks/bench_input_pipeline.py [--n 256] [--workers 4]

``--real-png`` switches to the real-image variant the round-2 verdict asked
for: a KITTI-multiview-style tree (image_2/{seq}_{frame}.png) built from the
reference's real 1242x375 KITTI frames (/root/reference/examples/img0-2.png,
symlinked so libpng decodes the genuine ~880 KB compressed bytes every
read), run through the kitti_uflow.json train pipeline (scale aug to
640x640 + hue/channel-swap photometric aug). This prices PNG inflate at the
true compression ratio instead of the synthetic flat-PPM cost.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np


def make_chairs_dir(root: Path, n: int, h: int = 384, w: int = 512) -> None:
    rng = np.random.RandomState(0)
    # A handful of distinct images re-written under many names: disk reads
    # and decode cost are what we measure, not RNG throughput.
    protos = [rng.randint(0, 256, (h, w, 3), np.uint8) for _ in range(4)]
    flow = np.zeros((h, w, 2), np.float32)
    flo_bytes = (
        b"PIEH"
        + np.array([w, h], np.int32).tobytes()
        + flow.astype(np.float32).tobytes()
    )
    header = f"P6\n{w} {h}\n255\n".encode()
    for i in range(1, n + 1):
        for k in (1, 2):
            img = protos[(i + k) % len(protos)]
            (root / f"{i:05d}_img{k}.ppm").write_bytes(header + img.tobytes())
        (root / f"{i:05d}_flow.flo").write_bytes(flo_bytes)


def make_kitti_mv_dir(root: Path, n_seq: int) -> None:
    """image_2/{seq:06d}_{frame:02d}.png from the reference example frames.

    Symlinks: the page cache holds the compressed bytes either way; decode
    (libpng inflate + de-filter of real photographic content) is the cost
    being measured, and that runs per read regardless of linking.
    """
    examples = Path("/root/reference/examples")
    img_dir = root / "image_2"
    img_dir.mkdir()
    for s in range(n_seq):
        for k in range(3):
            (img_dir / f"{s:06d}_{k:02d}.png").symlink_to(
                examples / f"img{(s + k) % 3}.png"
            )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="dataset size (pairs)")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prefetch", type=int, default=4)
    ap.add_argument(
        "--device-aug", action="store_true",
        help="photometric aug on-device (host only decodes + stacks)",
    )
    ap.add_argument(
        "--real-png", action="store_true",
        help="real KITTI frames through the kitti_uflow KITTIMV pipeline",
    )
    args = ap.parse_args()
    if args.real_png:
        return real_png_main(args)

    from arflow_tpu.config import Config
    from arflow_tpu.data.get_dataset import get_dataset
    from arflow_tpu.data.loader import DataLoader

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        t0 = time.perf_counter()
        make_chairs_dir(root, args.n)
        print(f"dataset written in {time.perf_counter() - t0:.1f}s")

        cfg = Config(
            {
                "data": [
                    {
                        "root_chairs": str(root),
                        "type": "train",
                        "name": "Chairs",
                        "n_frames": 2,
                        "geometric_aug": {"hflip": True},
                        "photometric_aug": {
                            "hue": 0.5,
                            "swap_channels": True,
                            "device": args.device_aug,
                        },
                    }
                ]
            }
        )
        train_set, _ = get_dataset(cfg, seed=0)
        loader = DataLoader(
            train_set,
            batch_size=args.batch,
            shuffle=True,
            num_workers=args.workers,
            drop_last=True,
            prefetch=args.prefetch,
        )

        # Warm epoch (page cache, thread spin-up), then best of 3 timed
        # epochs — the shared host's wall clock is noisy (+-3x observed);
        # the best epoch reflects the steady state a long run sustains.
        for _ in loader:
            pass
        best_dt, nb = None, 0
        for _ in range(3):
            t0 = time.perf_counter()
            nb = 0
            for batch in loader:
                nb += 1
            dt = time.perf_counter() - t0
            best_dt = dt if best_dt is None else min(best_dt, dt)
        dt = best_dt
        samples_s = nb * args.batch / dt
        step_consumption = 97.1  # round-1 train step samples/s (BASELINE.md)
        print(
            json.dumps(
                {
                    "metric": "input_pipeline_samples_per_s",
                    "value": round(samples_s, 1),
                    "unit": "samples/s",
                    "batches": nb,
                    "epoch_s": round(dt, 2),
                    "vs_train_step_consumption": round(
                        samples_s / step_consumption, 2
                    ),
                }
            )
        )


def real_png_main(args) -> None:
    from arflow_tpu.config import Config
    from arflow_tpu.data.get_dataset import get_dataset
    from arflow_tpu.data.loader import DataLoader

    with tempfile.TemporaryDirectory() as tmp:
        root = Path(tmp)
        # 2 two-frame samples per 3-frame sequence.
        make_kitti_mv_dir(root, max(1, args.n // 2))

        cfg = Config(
            {
                "data": [
                    {
                        # kitti_uflow.json train entry, at this tree
                        "root": str(root),
                        "type": "train",
                        "name": "KITTIMV",
                        "n_frames": 2,
                        "geometric_aug": {
                            "scale": True,
                            "scale_size": [640, 640],
                        },
                        "photometric_aug": {
                            "hue": 0.5,
                            "swap_channels": True,
                            "device": args.device_aug,
                        },
                    }
                ]
            }
        )
        train_set, _ = get_dataset(cfg, seed=0)
        loader = DataLoader(
            train_set,
            batch_size=args.batch,
            shuffle=True,
            num_workers=args.workers,
            drop_last=True,
            prefetch=args.prefetch,
        )
        for _ in loader:  # warm epoch: page cache + thread spin-up
            pass
        best_dt, nb = None, 0
        for _ in range(3):
            t0 = time.perf_counter()
            nb = 0
            for batch in loader:
                nb += 1
            dt = time.perf_counter() - t0
            best_dt = dt if best_dt is None else min(best_dt, dt)
        samples_s = nb * args.batch / best_dt
        # bf16 uflow train step consumes ~135 samples/s (BASELINE.md r2)
        step_consumption = 135.0
        print(
            json.dumps(
                {
                    "metric": "input_pipeline_real_png_samples_per_s",
                    "value": round(samples_s, 1),
                    "unit": "samples/s",
                    "batches": nb,
                    "epoch_s": round(best_dt, 2),
                    "vs_bf16_step_consumption": round(
                        samples_s / step_consumption, 2
                    ),
                }
            )
        )


if __name__ == "__main__":
    main()
