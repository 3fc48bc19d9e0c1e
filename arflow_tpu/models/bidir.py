"""Shared helper for the batched bidirectional forward pass.

The fw and bw flow passes of every 2-frame model family are the same program
on swapped feature pyramids, so they can ride ONE coarse-to-fine pass at
batch 2B. Whether that wins is workload-dependent, so the default is
per-model and ``ARFLOW_BIDIR_BATCH=0/1`` force-overrides at trace time.

Measured on TPU v5e (benchmarks/bench_bidir_ab.py, full train steps
@256x448): batching LOSES for PWCFlow (57.4 vs 53.7 ms b8) and PWCProbFlow
sparse-ELBO (55.2 vs 48.9 ms b4) — at training batch sizes the B-sized convs
already fill the MXU, and the 2B cost volume / warp gathers cross XLA's
per-descriptor gather cliff sooner. Defaults there are OFF. The PWCLite
families keep their own measured defaults (see each model's __call__).
"""

from __future__ import annotations

import os


def bidir_batch_enabled(default: bool = True) -> bool:
    env = os.environ.get("ARFLOW_BIDIR_BATCH")
    if env is not None:
        return env == "1"
    return default
