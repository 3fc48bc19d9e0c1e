"""Shared helper for the batched bidirectional forward pass.

The fw and bw flow passes of every 2-frame model family are the same program
on swapped feature pyramids, so they can ride ONE coarse-to-fine pass at
batch 2B. Whether that wins is workload-dependent, so the default is
per-model and ``ARFLOW_BIDIR_BATCH=0/1`` force-overrides at trace time.

Measured on TPU v5e under chained ground-truth timing (CHAIN train steps
inside one lax.scan, benchmarks/bench_chained_ab.py — single-shot fetch
timing under-reports the step by 2-3x because the scalar is ready before
the backward tail finishes): batching LOSES for PWCFlow (78.1 vs 70.7
ms/step @256x448 b8), PWCLite 2-frame (227.2 vs 222.6 unflow step b8) and
PWCLite 5-frame windows (18.7 vs 12.6 ms fwd b4), but WINS for
PWCProbFlow sparse-ELBO (75.3 vs 86.7 ms/step b4) — the prob model's
smaller per-direction batch leaves MXU headroom that 2B fills. Defaults:
ON for PWCProbFlow only.
"""

from __future__ import annotations

import os


def bidir_batch_enabled(default: bool = False) -> bool:
    env = os.environ.get("ARFLOW_BIDIR_BATCH")
    if env is not None:
        return env == "1"
    return default


def component_batch_enabled(default: bool = True) -> bool:
    """Batch the K mixture components of PWCProbFlow (n_pyramids > 1)
    along the batch axis through ONE shared-weight decoder pass instead of
    K sequential passes. Exact numerics (the decoder weights are shared
    across components, uflow_prob_model.py:187,391-404; all per-sample
    ops). ``ARFLOW_COMPONENT_BATCH=0/1`` force-overrides at trace time."""
    env = os.environ.get("ARFLOW_COMPONENT_BATCH")
    if env is not None:
        return env == "1"
    return default
