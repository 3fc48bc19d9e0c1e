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


def pyramid_batch_enabled(default: bool = True) -> bool:
    """Run the feature pyramid once on [img1; img2] (batch 2B) instead of
    twice at B. Exact numerics; the thin 32-channel pyramid convs are
    MXU-tiling-bound, so the bigger batch fills more of the array.

    Chained A/B (benchmarks/bench_decoder_gates_ab.py, TPU v5e): WINS for
    the forward-only inference program (bf16 b8 384x640: 18.95 -> 18.19
    ms/batch, +4%) but LOSES inside the full train step (f32 b8 256x448:
    70.6 -> 78.7 ms/step — the 2B pyramid backward serializes against the
    loss tail). PWCFlow therefore defaults it to ``not with_bk``
    (inference on, training off); PWCProbFlow keeps its own
    always-batched pyramid (smaller per-direction batches leave MXU
    headroom there). ``ARFLOW_PYR_BATCH=0/1`` force-overrides at trace
    time."""
    env = os.environ.get("ARFLOW_PYR_BATCH")
    if env is not None:
        return env == "1"
    return default


def split_decoder_enabled(default: bool = False) -> bool:
    """Compute each dense-net decoder conv as a sum of per-chunk convs
    (kernel slices) instead of materializing the growing channel concat.
    Identical params and (up to f32 partial-sum order) identical numerics.

    Chained A/B (benchmarks/bench_decoder_gates_ab.py, TPU v5e): the
    per-chunk partial-sum convs LOSE everywhere — bf16 inference 18.95 ->
    20.40 ms/batch, f32 uflow train 70.6 -> 94.7 ms/step, sparse-ELBO
    75.8 -> 107.4 (XLA already fuses the incremental concat into the conv
    input, while the split form runs 4-8 narrower GEMMs) — so the default
    stays OFF and the incremental-concat path is canonical. The first A/B
    also showed the dense-net loop must build the concat INCREMENTALLY
    (2-way per layer): re-concatenating the chunk list N-way each layer
    cost +35% on the train step. Kept as a measured experiment gate:
    ``ARFLOW_SPLIT_DECODER=0/1`` force-overrides at trace time."""
    env = os.environ.get("ARFLOW_SPLIT_DECODER")
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


def wfold_pyramid_enabled(default: bool = False) -> bool:
    """Fold 4 W-columns into channels for the feature pyramid's thin convs.

    The pyramid's 32-out convs fill a quarter of the MXU's 128 lanes and
    run at ~10-12 TF/s; re-laying the SAME conv out as a fold-4 conv
    ((3,3,128,128) kernel with 4x structural zeros for stride 1,
    (3,2,8*cin,128) for the stride-2 stems) runs at 63% of peak MACHINE
    rate and nets 2.4-3.1x on the whole pyramid
    (benchmarks/bench_pyramid_fold_ab.py, TPU v5e, chained: 2B16 384x640
    4.67 -> 1.97 ms; 2B8 448x1024 5.07 -> 1.62; 2B2 1.06 -> 0.43).
    Numerics are exact up to MXU summation order (zeros add nothing; bf16
    parity 1 ULP, see tests/test_wfold_pyramid.py). Default ON at
    inference, OFF in training to keep trajectories byte-identical;
    ``ARFLOW_WFOLD_PYR=0/1`` force-overrides at trace time."""
    env = os.environ.get("ARFLOW_WFOLD_PYR")
    if env is not None:
        return env == "1"
    return default


def deconv_subpixel_enabled(default: bool = False) -> bool:
    """Compute the 4x4/stride-2/pad-1 ConvTranspose (the context up-convs,
    uflow_model.py context_up) as its exact subpixel decomposition: ONE
    (2,2,C,4*C_out) VALID conv on the 1-padded input followed by a
    4-phase interleave. XLA lowers the direct transposed conv via
    lhs_dilation (zero-stuffed input), computing 16 taps per output of
    which 12 are structural zeros; the subpixel form computes exactly the
    4 real taps in an MXU-shaped conv. Numerics: identical multiply-add
    set per output pixel (tests/test_deconv_subpixel.py pins fwd+grad).

    Chained A/B (benchmarks/bench_deconv_subpix_ab.py, TPU v5e, bf16): the
    ISOLATED layer wins 1.6-2.3x (b4 112x256: 0.311 -> 0.192 ms; b8
    96x160: 0.246 -> 0.107) but END-TO-END it is a wash-to-slight-LOSS
    (384x640 b8: 535.3 -> 527.9 maps/s; Sintel b4: 293.1 -> 291.7;
    streaming b1: 277.2 -> 273.8) — the direct deconv's output fuses into
    the next level's decoder concat, while the 4-phase stack+reshape
    forces a materialization that costs more than the removed zero-taps.
    Default therefore OFF everywhere (a measured experiment gate, like
    split_decoder); ``ARFLOW_DECONV_SUBPIX=0/1`` force-overrides at trace
    time."""
    env = os.environ.get("ARFLOW_DECONV_SUBPIX")
    if env is not None:
        return env == "1"
    return default


def hfold_k(batch: int, height: int, default_target: int = 0) -> int:
    """Slices to fold H into batch for the dense-net decoder stacks.

    XLA's TPU conv emitter under-utilizes at small batch: the same-FLOP
    decoder stack runs ~32 TF/s at b1-b4 but ~80 TF/s at b>=8 regardless of
    spatial shape (benchmarks/bench_decoder_shape_probe.py, v5e, bf16 —
    e.g. b4 112x256 9.20 ms vs b8 112x128 3.72 ms). Folding H into batch
    with exact per-layer halo exchange recovers the fast regime for
    small-batch inference (Sintel-res b4, streaming b1).

    Round-5 target sweep (bench_hfold_ab.py, e2e bf16): the emitter keeps
    gaining a little past the cliff — target 16 beats 8 at 384x640 b8
    (k=2: 14.56 -> 14.05 ms, +3.8%) and matches it at b4/b1 (13.55 vs
    13.58; 3.25 vs 3.27), while target 32 loses everywhere (14.16 /
    14.24 / 3.63). The PWCFlow decoder therefore defaults to target 16 at
    inference; PWCProbFlow keeps 8 (it serves at b<=4 where they tie).

    Returns the largest k <= target/batch that divides height (1 = off).
    ``ARFLOW_HFOLD=<target effective batch>`` overrides ``default_target``
    at trace time; 0 disables.
    """
    env = os.environ.get("ARFLOW_HFOLD")
    target = int(env) if env is not None else default_target
    if target <= batch:
        return 1
    k = max(1, target // batch)
    while k > 1 and height % k:
        k -= 1
    return k


def hfold_refine_k(batch: int, height: int, max_dil: int,
                   default_target: int = 0) -> int:
    """Fold factor for the dilated refinement stack (round-5).

    Same batch-cliff motivation as ``hfold_k``; additionally capped so each
    H-slice can supply its neighbor's halo rows — per-conv halo = dilation
    rows, so slice height must be >= the stack's max dilation (16 for the
    reference's stack, models/uflow_model.py:325-348).
    ``ARFLOW_HFOLD_REFINE=<target>`` overrides independently of
    ``ARFLOW_HFOLD`` (0 disables); unset, it follows ``ARFLOW_HFOLD`` /
    the per-path default like the decoder fold.

    Measured end-to-end (benchmarks/bench_refine_fold_ab.py, TPU v5e,
    bf16): a LOSS at the small-batch shapes it targets — Sintel b4
    13.48 -> 13.70 ms, streaming b1 3.34 -> 3.52 — because the d=16
    halo is 16 rows on 16-56-row slices (57-114% overhead rows for that
    conv), outweighing the batch-cliff win; in the bf16 train step it is
    a sub-spread wash (bench_train_breakdown.py). Callers therefore pass
    ``default_target=0`` (OFF everywhere); the fold + its exact parity
    (tests/test_hfold.py) remain as an opt-in measured experiment.
    """
    env = os.environ.get("ARFLOW_HFOLD_REFINE")
    if env is not None:
        target = int(env)
        k = max(1, target // batch) if target > batch else 1
    else:
        k = hfold_k(batch, height, default_target)
    while k > 1 and (height % k or height // k < max_dil):
        k -= 1
    return k
