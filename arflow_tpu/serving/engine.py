"""Streaming (video) optical-flow serving engine.

The reference's inference loop re-runs the FULL model per frame pair
(/root/reference/inference.py:121-157): for a video of T frames it computes
2(T-1) feature pyramids — every frame's pyramid twice, once as "img1" and
once as "img2". On TPU the pyramid is a meaningful slice of the forward
program, and the coarse-to-fine decoder only consumes pyramids, so a video
stream needs exactly ONE pyramid evaluation per frame:

    frame t  --pyramid-->  fp_t          (once)
    (fp_{t-1}, fp_t) --decoder--> flow_{t-1 -> t}

Splitting the jitted program this way runs the same linen submodules on the
same math as the monolithic ``model(img1, img2)`` call; the only difference
is the jit boundary between pyramid and decoder, which moves XLA fusion
boundaries and can reassociate the feature-norm reductions (measured: last-
ulp drift, max 2.4e-6 px at 64x96 on CPU). Validated against the monolithic
forward in tests/test_serving.py.

Host/device overlap comes for free from JAX's async dispatch: ``push`` only
enqueues device work and returns device arrays; the caller blocks when it
reads them. ``run_stream`` adds a bounded decode-prefetch thread (native
libpng fast path) and measures steady-state end-to-end throughput.
"""

from __future__ import annotations

import os
import queue
import threading
import time

import numpy as np

# Model families whose pyramid lives in a single submodule attribute.
_PYRAMID_ATTR = {
    "uflow": "feature_pyramid",
    "pwclite": "feature_extractor",
    "pwclite_prob": "feature_extractor",
    "pwclite_uflow": "feature_extractor",
}


class StreamingFlowEngine:
    """Per-frame pyramid reuse for consecutive-pair flow on a video stream.

    Parameters
    ----------
    model_cfg : config with ``type`` (all five families supported; PWCLite
        must be the 2-frame variant — multi-frame fusion consumes >2 pyramids
        per output and already reuses them inside one call).
    variables : flax variables (or bare params dict).
    loss_cfg : optional; when it carries ``approx`` the engine also emits the
        per-approximation (u, v) entropy map (training/entropy.py).
    with_bw : also emit the backward flow (prev <- cur). Costs one extra
        decoder pass, zero extra pyramids.
    """

    def __init__(self, model_cfg, variables, loss_cfg=None, with_bw=False):
        import jax
        import jax.numpy as jnp

        from arflow_tpu.models import get_model

        if isinstance(variables, dict) and "params" in variables:
            self._variables = variables
        else:
            self._variables = {"params": variables}
        self._model = get_model(model_cfg)
        self._type = model_cfg.type
        self._loss_cfg = loss_cfg if (loss_cfg and "approx" in loss_cfg) else None
        self._with_bw = with_bw
        model = self._model
        variables = self._variables

        n_frames = getattr(model, "n_frames", 2)
        if self._type == "pwclite" and n_frames not in (2, 3):
            raise ValueError(
                "StreamingFlowEngine supports the 2-frame and 3-frame "
                "PWCLite; the 5-frame variant chains multiple 3-frame "
                "windows inside one model call (use the monolithic forward)."
            )
        # Frames per output window: 3 for the multi-view PWCLite (the
        # sliding monolithic loop would recompute every frame's pyramid 3x;
        # streaming computes each exactly once), else 2.
        self._window = 3 if (self._type == "pwclite" and n_frames == 3) else 2

        if self._type == "uflow_prob":
            if getattr(model, "mixture_weights", False):
                raise ValueError(
                    "mixture_weights inference is bidirectional over raw "
                    "images (MixtureWeightsNet); use the monolithic forward."
                )
            k = model.n_pyramids

            def pyramid_m(m, img):
                return tuple(m.pyramids[i](img) for i in range(k))

            def pair_m(m, fps1, fps2):
                if k == 1:
                    outs = [m.forward_2_frames(fps1[0], fps2[0])]
                else:
                    # Component-batched decoder pass — the same exact-numerics
                    # batching the monolithic __call__ uses (uflow_prob.py).
                    nb = fps1[0][0].shape[0]
                    fa = [jnp.concatenate(p, axis=0) for p in zip(*fps1)]
                    fb = [jnp.concatenate(p, axis=0) for p in zip(*fps2)]
                    o = m.forward_2_frames(fa, fb, False, num_groups=k)
                    outs = [
                        [t[i * nb : (i + 1) * nb] for t in o] for i in range(k)
                    ]
                return m.flows_cat(outs)

        else:
            attr = _PYRAMID_ATTR[self._type]

            def pyramid_m(m, img, _attr=attr):
                return getattr(m, _attr)(img)

            def pair_m(m, fp1, fp2):
                return m.forward_2_frames(fp1, fp2)

        # Raw (un-jitted) closures are kept for AOT export of the streaming
        # programs (serving/export.py export_streaming).
        self._pyramid_raw = lambda img: model.apply(
            variables, img, method=pyramid_m
        )
        self._pyramid_fn = jax.jit(self._pyramid_raw)
        if self._window == 3:
            # Bidirectional 3-frame fusion centered on the middle frame
            # (models/pwclite.py:206-258 semantics): one call emits both
            # flow_10 (center -> prev) and flow_12 (center -> next).
            def triple_m(m, fp0, fp1, fp2):
                return m.forward_3_frames(fp0, fp1, fp2)

            self._triple_raw = lambda a, b, c: model.apply(
                variables, a, b, c, method=triple_m
            )
            self._triple_fn = jax.jit(self._triple_raw)
        else:
            self._pair_raw = lambda a, b: model.apply(
                variables, a, b, method=pair_m
            )
            self._pair_fn = jax.jit(self._pair_raw)
        self._prev_fps: list = []

    def reset(self):
        """Drop the cached pyramids (call at video/scene boundaries)."""
        self._prev_fps = []

    def _outputs(self, flows):
        import jax

        from arflow_tpu.training.entropy import extract_uv_entropy

        out = {"flow": flows[0][..., 0:2]}
        if self._loss_cfg is not None:
            out["entropy"] = extract_uv_entropy(
                flows, self._loss_cfg, {"flows_fw": flows}, jax.random.PRNGKey(0)
            )
        return out

    def push(self, frame) -> dict | None:
        """Feed the next frame (B,H,W,3) float32 in [0,1].

        Returns None until a full window is cached (1 frame for the 2-frame
        engine, 2 for the 3-frame one); afterwards a dict with 'flow'
        (B,H,W,2) [, 'flow_bw', 'entropy']. 2-frame: flow = prev -> cur.
        3-frame: the window is centered on the PREVIOUS frame, so flow =
        (t-1) -> t and flow_bw = (t-1) -> (t-2) — outputs trail the stream
        by one frame, like the reference's multi-view inference windows.
        Outputs are device arrays (async): reading them blocks on the device.
        """
        import jax.numpy as jnp

        frame = jnp.asarray(frame, jnp.float32)
        if frame.ndim == 3:
            frame = frame[None]
        fp = self._pyramid_fn(frame)
        prev = self._prev_fps
        self._prev_fps = (prev + [fp])[-(self._window - 1):]
        if len(prev) < self._window - 1:
            return None
        if self._window == 3:
            flows_10, flows_12 = self._triple_fn(prev[0], prev[1], fp)
            out = self._outputs(flows_12)
            if self._with_bw:
                out["flow_bw"] = flows_10[0][..., 0:2]
            return out
        out = self._outputs(self._pair_fn(prev[0], fp))
        if self._with_bw:
            out["flow_bw"] = self._pair_fn(fp, prev[0])[0][..., 0:2]
        return out


def _decode_frame(path, size_hw):
    """PNG/JPEG -> (H,W,3) float32 [0,1], resized host-side (native fast path)."""
    from arflow_tpu import native

    if native.available() and native.supports(path):
        img = native.load_image(path)  # (H,W,3) float32 [0,1]
        if size_hw is not None and tuple(img.shape[:2]) != tuple(size_hw):
            img = native.resize_bilinear(img, size_hw)
        return img
    from PIL import Image

    im = Image.open(path).convert("RGB")
    if size_hw is not None and (im.height, im.width) != tuple(size_hw):
        im = im.resize((size_hw[1], size_hw[0]), Image.BILINEAR)
    return np.asarray(im, dtype=np.float32) / 255.0


def run_stream(
    engine: StreamingFlowEngine,
    paths,
    *,
    size_hw=None,
    out_root: str | None = None,
    prefetch: int = 4,
    warmup: int = 2,
):
    """Drive the engine over an ordered frame-path list with decode prefetch.

    Returns stats: {'frames', 'flows', 'elapsed_s', 'flows_per_sec'} measured
    steady-state (after the first `warmup` flows, which include compiles).
    Writes <out_root>/<stem>.flo per flow when out_root is given (flow for
    pair (t-1, t) is named after frame t).
    """
    from arflow_tpu.utils.flow_io import write_flo

    paths = list(paths)
    q: queue.Queue = queue.Queue(maxsize=max(1, prefetch))

    def producer():
        for p in paths:
            q.put((p, _decode_frame(p, size_hw)))
        q.put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    engine.reset()
    n_frames = n_flows = 0
    pending = None  # (path, out) — keep one result in flight
    t0 = None
    start = time.time()

    def _drain(item):
        # When not writing outputs we deliberately do NOT fetch the full
        # flow field — device-side sync is a scalar fetch (see below); a
        # full-field D2H would bill host transfer into the compute rate.
        if out_root is None:
            return
        path, out = item
        flow = np.asarray(out["flow"])[0]
        os.makedirs(out_root, exist_ok=True)
        stem = os.path.splitext(os.path.basename(path))[0]
        write_flo(os.path.join(out_root, stem + ".flo"), flow)
        if "flow_bw" in out:
            write_flo(os.path.join(out_root, stem + "_bw.flo"),
                      np.asarray(out["flow_bw"])[0])

    def _sync(out):
        # Data-dependent scalar fetch: device execution is in-order, so a
        # scalar reduced from this flow proves every prior step finished.
        import jax.numpy as jnp

        return float(jnp.sum(out["flow"]))

    last = None
    while True:
        item = q.get()
        if item is None:
            break
        path, frame = item
        n_frames += 1
        out = engine.push(frame)
        if out is None:
            continue
        n_flows += 1
        if pending is not None:
            _drain(pending)
        pending = (path, out)
        last = out
        if n_flows == warmup:
            # Steady-state clock starts after compiles; sync first.
            _sync(out)
            t0 = time.time()
    if pending is not None:
        _drain(pending)
    if last is not None and out_root is None:
        _sync(last)
    now = time.time()
    steady = max(n_flows - warmup, 0) if t0 is not None else 0
    if steady > 0:
        elapsed = now - t0
        rate = steady / elapsed if elapsed > 0 else 0.0
    else:
        # Stream shorter than the warmup: report the overall (compile-
        # inclusive) rate rather than a meaningless 0.
        elapsed = now - start
        rate = n_flows / elapsed if elapsed > 0 and n_flows else 0.0
    return {
        "frames": n_frames,
        "flows": n_flows,
        "elapsed_s": elapsed,
        "steady_flows": steady,
        "flows_per_sec": rate,
    }
