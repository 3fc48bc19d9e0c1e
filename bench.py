#!/usr/bin/env python
"""Benchmark: UFlow PWCFlow inference throughput on one TPU chip.

Measures flow maps/sec for 2-frame forward inference at 384x640 (the
reference README's recommended KITTI/Cityscapes resolution,
/root/reference/README.md:50), batched to keep the chip busy.

Timing methodology (round 3): CHAIN forwards back-to-back inside one jitted
lax.scan with a data-dependent carry, total time minus the trivial-fetch RTT,
divided by CHAIN. Single-shot RTT-subtracted timing (rounds 1-2) is +-10 ms
noise on this host — BENCH_r02 measured bf16 slower than f32 from pure
methodology noise; the chained number is the steady-state rate a real
pipeline sees and is validated against a python-sequential loop in
BASELINE.md ("TIMING CORRECTION"). Run-to-run spread is reported per mode.

Baseline (vs_baseline denominator): the reference PyTorch PWCFlow
(models/uflow_model.py, correlation_native path — the only runnable path
without a CUDA-9 toolchain) measured on this machine's CPU:
1.195 flow maps/sec @ 384x640 batch 1 (see BASELINE.md). The BASELINE.json
north star is >=5x this.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mode", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_CPU_MAPS_PER_SEC = 1.195  # measured 2026-08-16, torch 2.13 CPU
CHAIN = 50
REPS = 5


def main():
    import os

    # The fused Pallas cost volume is the TPU default for all supported
    # shapes (wins 2.6x end-to-end at this resolution and 1.4-1.8x at
    # training shapes incl. gradients; see BASELINE.md). Pinned here so the
    # bench stays deterministic even if the caller exported =0.
    os.environ.setdefault("ARFLOW_USE_PALLAS", "1")
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    from arflow_tpu.models.uflow import PWCFlow

    h, w = 384, 640
    batch = 8
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))

    model = PWCFlow(level_dropout=0.0, feature_norm=True)
    variables = jax.jit(lambda r: model.init(r, img1, img2, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    params = variables["params"]

    # On the axon-tunneled TPU, block_until_ready does not wait for remote
    # execution; a scalar fetch does. RTT of a trivial fetch is subtracted
    # from the chained total.
    @jax.jit
    def trivial(a):
        return jnp.sum(a)

    def timed(f, *a, reps=REPS):
        float(f(*a))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            float(f(*a))
            ts.append(time.time() - t0)
        ts = np.asarray(ts, dtype=np.float64)
        return float(np.median(ts)), ts

    rtt, _ = timed(trivial, img1)

    # bf16 is the recommended inference mode — EPE-safe per BASELINE.md
    # round-2 validation and the round-3 REAL-IMAGE check (mean 0.0195 px /
    # max 0.13 px vs torch f32 at 448x1024 on the reference example frames,
    # tests/test_real_image_parity.py); params/outputs stay f32.
    modes = {
        "f32": model,
        "bf16": PWCFlow(level_dropout=0.0, feature_norm=True,
                        dtype=jnp.bfloat16),
    }
    results = {}
    for mode, m in modes.items():

        @jax.jit
        def chain(p, a, b, _m=m):
            def body(c, _):
                out = _m.apply(
                    {"params": p}, a + c * 1e-12, b, with_bk=False
                )["flows_fw"][0]
                return c + jnp.sum(out) * 1e-20, None

            c, _ = lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
            return c

        total, ts = timed(chain, params, img1, img2)
        dt = max(total - rtt, 1e-6) / CHAIN
        spread = float((ts.max() - ts.min()) / np.median(ts))

        # FLOPs of the single-forward program for this mode (XLA cost
        # analysis); MFU against the chip's bf16 MXU peak (TPU v5e:
        # 197 TFLOP/s — f32 convs run on the same MXU via multi-pass, so
        # bf16 peak is the honest denominator for BOTH modes).
        flops = None
        try:

            @jax.jit
            def fwd(p, a, b, _m=m):
                out = _m.apply({"params": p}, a, b, with_bk=False)
                return jnp.sum(out["flows_fw"][0])

            an = fwd.lower(params, img1, img2).compile().cost_analysis()
            if isinstance(an, (list, tuple)):
                an = an[0]
            flops = float(an.get("flops", 0.0)) or None
        except Exception:
            pass

        entry = {
            "maps_per_sec": round(batch / dt, 3),
            "ms_per_batch": round(dt * 1e3, 3),
            "spread_pct": round(100.0 * spread, 2),
        }
        if flops:
            tflops_s = flops / dt / 1e12
            entry["tflops_per_s"] = round(tflops_s, 2)
            entry["mfu_pct_of_bf16_peak"] = round(100.0 * tflops_s / 197.0, 2)
        results[mode] = entry

    headline_mode = max(results, key=lambda k: results[k]["maps_per_sec"])
    headline = results[headline_mode]["maps_per_sec"]

    extra = {
        "mode": headline_mode,
        "timing": f"chained_scan_x{CHAIN}_median_of_{REPS}",
        "rtt_ms": round(rtt * 1e3, 2),
    }
    for mode, entry in results.items():
        for k, v in entry.items():
            extra[f"{mode}_{k}"] = v

    # ---- Sintel-res inference (round-4: driver-verifiable H-fold win) ----
    # b4 448x1024 bf16, the reference README's Sintel resolution; the H-fold
    # decoder relayout (BASELINE.md round-4 attribution) engages by default
    # at inference and is the headline small-batch optimization.
    sh, sw, sb = 448, 1024, 4
    simg1 = jnp.asarray(rng.rand(sb, sh, sw, 3).astype(np.float32))
    simg2 = jnp.asarray(rng.rand(sb, sh, sw, 3).astype(np.float32))
    smodel = PWCFlow(level_dropout=0.0, feature_norm=True,
                     dtype=jnp.bfloat16)
    sparams = jax.jit(
        lambda r: smodel.init(r, simg1, simg2, with_bk=False)
    )(jax.random.PRNGKey(0))["params"]

    @jax.jit
    def schain(p, a, b):
        def body(c, _):
            out = smodel.apply(
                {"params": p}, a + c * 1e-12, b, with_bk=False
            )["flows_fw"][0]
            return c + jnp.sum(out) * 1e-20, None

        c, _ = lax.scan(body, jnp.float32(0.0), None, length=20)
        return c

    total, ts = timed(schain, sparams, simg1, simg2)
    sdt = max(total - rtt, 1e-6) / 20
    extra["sintel_448x1024_b4_bf16_maps_per_sec"] = round(sb / sdt, 3)
    extra["sintel_448x1024_b4_bf16_ms_per_batch"] = round(sdt * 1e3, 3)
    extra["sintel_448x1024_b4_bf16_spread_pct"] = round(
        100.0 * float((ts.max() - ts.min()) / np.median(ts)), 2
    )

    # ---- streaming serving (round-5: driver-verifiable engine rows) ----
    # The StreamingFlowEngine's steady-state device rate at the Sintel
    # serving shape 448x1024 b1 bf16 (one pyramid per frame, decoder
    # consumes cached (prev, cur) pyramids — scan carry IS the cache), plus
    # the 3-frame PWCLite window (VERDICT r4 weak #5).
    for key, entry in _bench_streaming(jax, jnp, lax, rtt, timed).items():
        extra[key] = entry

    # ---- training throughput (round-4: driver-verifiable train numbers) ----
    # Chained full train steps (fwd+bwd both directions, loss, Adam update,
    # state carried through the scan) at the BASELINE.md train-step shapes:
    # uflow b8 256x448 (f32 + bf16-compute), sparse-ELBO b4 f32+bf16, and
    # mixture-ELBO (k=2 pyramids, n4) b4 f32 (VERDICT r4 weak #6).
    for key, entry in _bench_training(jax, jnp, lax, rtt, timed).items():
        extra[key] = entry

    print(
        json.dumps(
            {
                "metric": "uflow_inference_384x640_maps_per_sec",
                "value": round(headline, 3),
                "unit": "flow_maps/s",
                "vs_baseline": round(headline / REFERENCE_CPU_MAPS_PER_SEC, 2),
                **extra,
            }
        )
    )


def _bench_streaming(jax, jnp, lax, rtt, timed):
    """Steady-state streaming rates at 448x1024 b1 bf16, both folds on.

    Mirrors benchmarks/bench_serving.py (engine: arflow_tpu/serving/
    engine.py): per-frame pyramid computed once, decoder consumes the
    cached previous pyramid from the scan carry. The monolithic loop a
    reference user would write recomputes every frame's pyramid twice
    (2-frame) / three times (3-frame window)."""
    from arflow_tpu.models.pwclite import PWCLite
    from arflow_tpu.models.uflow import PWCFlow

    chain_n = 30
    h, w = 448, 1024
    rng = np.random.RandomState(7)
    frames = jnp.asarray(rng.rand(chain_n, 1, h, w, 3).astype(np.float32))
    img0 = frames[0]
    out = {}

    # -- 2-frame PWCFlow streaming --
    model = PWCFlow(level_dropout=0.0, feature_norm=True, dtype=jnp.bfloat16)
    params = jax.jit(
        lambda r, a: model.init(r, a, a, with_bk=False)
    )(jax.random.PRNGKey(0), img0)["params"]

    def pyramid(p, img):
        return model.apply(
            {"params": p}, img, method=lambda m, x: m.feature_pyramid(x)
        )

    def decode(p, fp1, fp2):
        return model.apply(
            {"params": p}, fp1, fp2,
            method=lambda m, a, b: m.forward_2_frames(a, b),
        )[0]

    @jax.jit
    def chain_stream(p, fr):
        fp0 = pyramid(p, fr[0])

        def body(carry, frame):
            fp_prev, c = carry
            fp = pyramid(p, frame + c * 1e-12)
            flow = decode(p, fp_prev, fp)
            return (fp, c + jnp.sum(flow) * 1e-20), None

        (_, c), _ = lax.scan(body, (fp0, jnp.float32(0.0)), fr,
                             length=chain_n)
        return c

    total, ts = timed(chain_stream, params, frames)
    dt = max(total - rtt, 1e-6) / chain_n
    out["streaming_448x1024_b1_bf16_maps_per_sec"] = round(1.0 / dt, 1)
    out["streaming_448x1024_b1_bf16_ms_per_flow"] = round(dt * 1e3, 3)
    out["streaming_448x1024_b1_bf16_spread_pct"] = round(
        100.0 * float((ts.max() - ts.min()) / np.median(ts)), 2)

    # -- 3-frame PWCLite window streaming --
    lmodel = PWCLite(n_frames=3, dtype=jnp.bfloat16)
    lparams = jax.jit(
        lambda r, a: lmodel.init(r, a, a, a, with_bk=False)
    )(jax.random.PRNGKey(0), img0)["params"]

    def lpyramid(p, img):
        return lmodel.apply(
            {"params": p}, img, method=lambda m, x: m.feature_extractor(x)
        )

    def decode3(p, fp0, fp1, fp2):
        return lmodel.apply(
            {"params": p}, fp0, fp1, fp2,
            method=lambda m, a, b, c: m.forward_3_frames(a, b, c),
        )

    @jax.jit
    def chain_stream3(p, fr):
        fp0 = lpyramid(p, fr[0])
        fp1 = lpyramid(p, fr[1])

        def body(carry, frame):
            fp_a, fp_b, c = carry
            fp = lpyramid(p, frame + c * 1e-12)
            flows_10, flows_12 = decode3(p, fp_a, fp_b, fp)
            c = c + jnp.sum(flows_12[0] + flows_10[0]) * 1e-20
            return (fp_b, fp, c), None

        (_, _, c), _ = lax.scan(
            body, (fp0, fp1, jnp.float32(0.0)), fr, length=chain_n
        )
        return c

    total, ts = timed(chain_stream3, lparams, frames)
    dt = max(total - rtt, 1e-6) / chain_n
    out["streaming_3frame_448x1024_b1_bf16_windows_per_sec"] = round(
        1.0 / dt, 1)
    out["streaming_3frame_448x1024_b1_bf16_ms_per_window"] = round(
        dt * 1e3, 3)
    out["streaming_3frame_448x1024_b1_bf16_spread_pct"] = round(
        100.0 * float((ts.max() - ts.min()) / np.median(ts)), 2)
    return out


def _bench_training(jax, jnp, lax, rtt, timed):
    """Chained train-step throughput for the quotable training rows.

    chain_n=30 (round 5): at 20 the RTT spread leaves ~1% run-to-run on
    the bf16 row (134.6-136.1 samples/s across process histories); the
    longer chain amortizes it. The standalone dedicated-harness number is
    58.79 ms = 136.1 samples/s at 0.2% spread
    (benchmarks/bench_train_breakdown.py)."""
    import optax

    from arflow_tpu.config import Config
    from arflow_tpu.losses import get_loss
    from arflow_tpu.models import get_model

    chain_n = 30
    rng = np.random.RandomState(1)
    b, h, w = 8, 256, 448
    img1 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    tx = optax.adam(1e-4)

    uflow_loss = get_loss(Config({
        "type": "uflow", "w_census": 1.0, "w_smooth": 4.0,
        "smooth_order": 1, "edge_constant": 150.0, "with_bk": True,
    }))

    def train_chain(model, loss, p0, o0, a, bimg, with_rng=False):
        # train=True: the REAL trainer path (uflow_trainer.py lf traces with
        # train=True). Tracing train=False here silently engages the
        # inference-default W-folded pyramid inside the step (+5.0 ms bf16)
        # — the round-4 bench rows did exactly that, which with the
        # full-tree consumption below (+2.3 ms) fully explains BENCH_r04's
        # 120.9 samples/s vs the round-2 chained table's 135
        # (benchmarks/bench_train_breakdown.py, BASELINE.md round 5).
        @jax.jit
        def chain(p, o, x, y, k):
            def body(carry, kk):
                p, o = carry

                def lf(pp):
                    res = model.apply({"params": pp}, x, y, with_bk=True,
                                      train=True)
                    if with_rng:
                        return loss(res, x, y, rng=kk)["total"]
                    return loss(res, x, y)["total"]

                l, g = jax.value_and_grad(lf)(p)
                u, o2 = tx.update(g, o, p)
                return (optax.apply_updates(p, u), o2), l

            keys = jax.random.split(k, chain_n)
            (p2, _), ls = lax.scan(body, (p, o), keys)
            # Consume the per-step losses + one param leaf. Every step's
            # loss depends on ALL params at that step, so no step can fold
            # away (the round-3 gather-probe carry bug class, ADVICE.md);
            # only the final step's updates of the other leaves are
            # DCE-able (= the ~0.3 ms optimizer, /20 steps — sub-noise).
            # Summing every leaf instead costs a measured +2.3 ms/step of
            # pure harness overhead (bench_train_breakdown.py).
            return jnp.sum(ls) + jnp.sum(
                jax.tree_util.tree_leaves(p2)[0].astype(jnp.float32)
            )

        total, ts = timed(chain, p0, o0, a, bimg, jax.random.PRNGKey(2))
        dt = max(total - rtt, 1e-6) / chain_n
        spread = float((ts.max() - ts.min()) / np.median(ts))
        return dt, spread

    out = {}
    for mode, mcfg in (
        ("f32", {}),
        ("bf16", {"dtype": "bf16"}),
    ):
        model = get_model(Config({"type": "uflow", "feature_norm": True,
                                  "level_dropout": 0.0, **mcfg}))
        variables = jax.jit(
            lambda r, _m=model: _m.init(r, img1, img2, with_bk=True)
        )(jax.random.PRNGKey(0))
        params = variables["params"]
        dt, spread = train_chain(model, uflow_loss, params, tx.init(params),
                                 img1, img2)
        out[f"train_uflow_{mode}_samples_per_sec"] = round(b / dt, 1)
        out[f"train_uflow_{mode}_ms_per_step"] = round(dt * 1e3, 2)
        out[f"train_uflow_{mode}_spread_pct"] = round(100.0 * spread, 2)

    # ELBO trainers b4 (the probabilistic training headline; the reference's
    # CUDA path cannot run on this host — BASELINE.md train-step table):
    # sparse (cov_supp=3, n4) f32 + bf16, and the mixture (k=2 pyramids,
    # n4) — the slowest family, driver-pinned per VERDICT r4 weak #6.
    b2 = 4
    cov_supp = 3
    n_off = (cov_supp + 1) ** 2 - 1
    e_loss_base = {
        "type": "uflow_elbo", "edge_asymp": 0.01, "w_smooth": 4.0,
        "edge_constant": 150.0, "with_bk": True,
        "penalty_smooth": "charbonnier", "closed_form_smooth": False,
        "isotropic_smooth": False, "data_loss": ["census"],
        "data_weight": [1.0], "data_penalty": ["abs_robust_loss"],
        "w_entropy": 0.1, "w_oof": 0.0, "w_occ": 0.0,
        "approx_entropy": False, "occ_type": "sample", "n_samples": 4,
        "offdiag_reg": 0.1, "natural_grad": False, "inv_cov": False,
    }
    e_model_base = {
        "type": "uflow_prob", "inv_cov": False, "n_pyramids": 1,
        "mixture_weights": False, "feature_norm": True, "level_dropout": 0.0,
    }
    im1, im2 = img1[:b2], img2[:b2]
    for name, m_over, l_over in (
        ("elbo_sparse_f32", {"out_channels": [2, 2, 2 * n_off]},
         {"approx": "sparse", "cov_supp": cov_supp, "n_components": 1}),
        ("elbo_sparse_bf16",
         {"out_channels": [2, 2, 2 * n_off], "dtype": "bf16"},
         {"approx": "sparse", "cov_supp": cov_supp, "n_components": 1}),
        ("elbo_mixture_f32", {"out_channels": [2, 2, 0], "n_pyramids": 2},
         {"approx": "mixture", "cov_supp": 0, "n_components": 2}),
    ):
        e_model = get_model(Config({**e_model_base, **m_over}))
        e_loss = get_loss(Config({**e_loss_base, **l_over}))
        e_vars = jax.jit(lambda r, _m=e_model: _m.init(
            r, im1, im2, with_bk=True))(jax.random.PRNGKey(0))
        e_params = e_vars["params"]
        dt, spread = train_chain(e_model, e_loss, e_params,
                                 tx.init(e_params), im1, im2, with_rng=True)
        out[f"train_{name}_samples_per_sec"] = round(b2 / dt, 1)
        out[f"train_{name}_ms_per_step"] = round(dt * 1e3, 2)
        out[f"train_{name}_spread_pct"] = round(100.0 * spread, 2)
    return out


if __name__ == "__main__":
    main()
