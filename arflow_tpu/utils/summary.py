"""Training-event writer: JSONL scalars/metadata + optional TensorBoard.

The reference logs to tensorboardX (trainer/base_trainer.py:20). Here the
primary sink is an append-only ``events.jsonl`` (machine-readable, zero
dependencies); if ``tensorboardX`` or ``torch.utils.tensorboard`` is
importable, a TB writer is attached as a secondary sink. Images are saved as
PNGs under ``<log_dir>/images``.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class SummaryWriter:
    def __init__(self, log_dir: str):
        self.log_dir = str(log_dir)
        os.makedirs(self.log_dir, exist_ok=True)
        self._f = open(os.path.join(self.log_dir, "events.jsonl"), "a")
        self._tb = None
        for mod in ("tensorboardX", "torch.utils.tensorboard"):
            try:
                import importlib

                tb = importlib.import_module(mod)
                self._tb = tb.SummaryWriter(self.log_dir)
                break
            except Exception:
                continue

    def add_scalar(self, tag: str, value, step: int):
        rec = {"t": time.time(), "tag": tag, "value": float(value), "step": int(step)}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_image(self, tag: str, image: np.ndarray, step: int):
        """image: (H, W, C) float [0,1] or uint8."""
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        safe_tag = tag.replace("/", "_")
        path = os.path.join(img_dir, f"{safe_tag}_{step}.png")
        try:
            from PIL import Image

            Image.fromarray(img.squeeze()).save(path)
        except Exception:
            np.save(path + ".npy", img)
        self._f.write(
            json.dumps({"t": time.time(), "tag": tag, "image": path, "step": int(step)})
            + "\n"
        )
        self._f.flush()
        if self._tb is not None:
            self._tb.add_image(tag, img, step, dataformats="HWC")

    def add_images(self, tag: str, images: np.ndarray, step: int):
        for i, img in enumerate(np.asarray(images)):
            self.add_image(f"{tag}/{i}", img, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
