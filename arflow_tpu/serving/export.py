"""AOT export of inference programs (``jax.export`` / StableHLO).

The reference has no deployment story: serving means re-running the PyTorch
model from source with a checkpoint (``/root/reference/inference.py:121-157``).
The TPU-native equivalent is ahead-of-time export — trace + lower the jitted
forward ONCE, embed the weights as constants, and serialize the StableHLO
program. The artifact runs under any matching jax runtime with no model
source, no flax, and no checkpoint import at serving time, and is immune to
Python-side drift in the model code.

Artifact layout (single file)::

    AFX1 | u32 header_len | header JSON (utf-8) | jax.export payload

The header carries the model/config identity, input signature, platforms,
and the jax version used to build it. The payload is
``jax.export.Exported.serialize()`` bytes.

Platform notes:
- ``platforms=('tpu',)`` (default) keeps the fused Pallas cost volume — the
  fast path; export from a TPU-visible host.
- Including a non-TPU platform (e.g. ``('tpu','cpu')``) forces the portable
  XLA cost-volume formulation for the whole artifact (the Pallas kernel has
  no CPU lowering); numerics are unchanged, speed on TPU is the XLA path.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass

import numpy as np

_MAGIC = b"AFX1"


def build_inference_fn(cfg, variables):
    """The canonical serving forward: (img1, img2) -> (flow, entropy).

    Mirrors the CLI inference program (arflow_tpu/cli.py:inference_main,
    reference /root/reference/inference.py:55-114): forward-only model call,
    full-res flow prediction, and per-approximation (u, v) entropy when the
    config carries a probabilistic loss (zeros otherwise, so the artifact
    signature is stable across model families).
    """
    import jax
    import jax.numpy as jnp

    from arflow_tpu.models import get_model
    from arflow_tpu.training.entropy import extract_uv_entropy

    model = get_model(cfg.model)
    if isinstance(variables, dict) and "params" in variables:
        pass
    else:
        variables = {"params": variables}
    has_entropy = "approx" in cfg.get("loss", {})

    def forward(img1, img2):
        res = model.apply(variables, img1, img2, with_bk=False)
        flows = res["flows_fw"]
        pred = flows[0][..., 0:2]
        if has_entropy:
            ent = extract_uv_entropy(flows, cfg.loss, res, jax.random.PRNGKey(0))
        else:
            ent = jnp.zeros_like(pred)
        return pred, ent

    return forward, {"model_type": cfg.model.type, "has_entropy": has_entropy}


def export_inference(
    cfg,
    variables,
    batch: int,
    size_hw,
    *,
    platforms=("tpu",),
):
    """Export the serving forward as a ``jax.export.Exported``.

    Inputs are two ``(batch, H, W, 3)`` float32 images in [0, 1] (the data
    pipeline's layout). Shapes are static: the warp gather's batch chunking
    and the matmul-form resizes require concrete sizes (the same reason the
    jitted trainer uses static shapes).
    """
    import jax
    from jax import export as jexport

    forward, meta = build_inference_fn(cfg, variables)
    h, w = int(size_hw[0]), int(size_hw[1])
    spec = jax.ShapeDtypeStruct((int(batch), h, w, 3), np.float32)

    non_tpu = any(p != "tpu" for p in platforms)
    prev = os.environ.get("ARFLOW_USE_PALLAS")
    try:
        if non_tpu:
            # The Pallas kernel only lowers for TPU; multi-platform artifacts
            # trace the portable XLA cost volume (identical numerics).
            os.environ["ARFLOW_USE_PALLAS"] = "0"
        exported = jexport.export(jax.jit(forward), platforms=tuple(platforms))(
            spec, spec
        )
    finally:
        if non_tpu:
            if prev is None:
                os.environ.pop("ARFLOW_USE_PALLAS", None)
            else:
                os.environ["ARFLOW_USE_PALLAS"] = prev

    meta.update(
        {
            "batch": int(batch),
            "height": h,
            "width": w,
            "platforms": list(platforms),
        }
    )
    return exported, meta


def export_streaming(
    cfg,
    variables,
    batch: int,
    size_hw,
    *,
    platforms=("tpu",),
):
    """Export the STREAMING serving programs: pyramid + decoder.

    The monolithic artifact (``export_inference``) re-computes every frame's
    feature pyramid per pair; this exports the engine's split programs so a
    source-free deployment gets the same one-pyramid-per-frame reuse
    (engine.py): ``pyramid(img) -> fp`` and either
    ``decode(fp_prev, fp_cur) -> (flow, entropy)`` (2-frame window) or
    ``decode(fp0, fp1, fp2) -> (flow_12, flow_10)`` (3-frame PWCLite).
    Returns ``(exported_dict, meta)`` for ``save_streaming_artifact``.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from arflow_tpu.serving.engine import StreamingFlowEngine
    from arflow_tpu.training.entropy import extract_uv_entropy

    loss_cfg = cfg.get("loss", {})
    engine = StreamingFlowEngine(cfg.model, variables, loss_cfg=loss_cfg)
    has_entropy = engine._loss_cfg is not None
    h, w = int(size_hw[0]), int(size_hw[1])
    spec = jax.ShapeDtypeStruct((int(batch), h, w, 3), np.float32)
    fp_spec = jax.eval_shape(engine._pyramid_raw, spec)

    non_tpu = any(p != "tpu" for p in platforms)
    prev = os.environ.get("ARFLOW_USE_PALLAS")
    try:
        if non_tpu:
            os.environ["ARFLOW_USE_PALLAS"] = "0"
        exported = {
            "pyramid": jexport.export(
                jax.jit(engine._pyramid_raw), platforms=tuple(platforms)
            )(spec)
        }
        if engine._window == 3:
            def decode3(fp0, fp1, fp2):
                flows_10, flows_12 = engine._triple_raw(fp0, fp1, fp2)
                return flows_12[0][..., 0:2], flows_10[0][..., 0:2]

            exported["decode"] = jexport.export(
                jax.jit(decode3), platforms=tuple(platforms)
            )(fp_spec, fp_spec, fp_spec)
        else:
            def decode(fp_prev, fp_cur):
                flows = engine._pair_raw(fp_prev, fp_cur)
                pred = flows[0][..., 0:2]
                if has_entropy:
                    ent = extract_uv_entropy(
                        flows, engine._loss_cfg, {"flows_fw": flows},
                        jax.random.PRNGKey(0),
                    )
                else:
                    ent = jnp.zeros_like(pred)
                return pred, ent

            exported["decode"] = jexport.export(
                jax.jit(decode), platforms=tuple(platforms)
            )(fp_spec, fp_spec)
    finally:
        if non_tpu:
            if prev is None:
                os.environ.pop("ARFLOW_USE_PALLAS", None)
            else:
                os.environ["ARFLOW_USE_PALLAS"] = prev

    meta = {
        "model_type": cfg.model.type,
        "has_entropy": bool(has_entropy),
        "window": engine._window,
        "batch": int(batch),
        "height": h,
        "width": w,
        "platforms": list(platforms),
    }
    return exported, meta


def save_streaming_artifact(path: str, exported: dict, meta: dict) -> None:
    """Multi-program artifact: same AFX1 container, ``format: 2`` header
    with a ``sections`` table; payloads are concatenated after the header."""
    import jax

    header = dict(meta)
    header["format"] = 2
    header["jax_version"] = jax.__version__
    payloads = [(name, ex.serialize()) for name, ex in exported.items()]
    header["sections"] = [[name, len(p)] for name, p in payloads]
    hbytes = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hbytes)))
        f.write(hbytes)
        for _, p in payloads:
            f.write(p)


@dataclass
class StreamingArtifact:
    """A loaded streaming artifact: a source-free StreamingFlowEngine.

    ``push(frame)`` mirrors engine.push: None until the pyramid window is
    full, then {'flow' [, 'flow_bw', 'entropy']}. 2-frame: flow = prev->cur
    (+ per-approximation entropy when exported from a probabilistic config);
    with ``with_bw`` the decoder program runs a second time on swapped
    pyramids — no extra export needed. 3-frame: flow = (t-1)->t and, with
    ``with_bw``, flow_bw = (t-1)->(t-2) (the fused pass computes it either
    way). Frames must carry the exported batch size (static shapes).
    """

    meta: dict
    pyramid: object
    decode: object
    with_bw: bool = False
    _prev: list = None
    _pyr_call: object = None
    _dec_call: object = None

    def reset(self):
        self._prev = []

    def push(self, frame):
        import jax
        import jax.numpy as jnp

        if self._pyr_call is None:
            self._pyr_call = jax.jit(self.pyramid.call)
            self._dec_call = jax.jit(self.decode.call)
            self._prev = self._prev or []
        frame = jnp.asarray(frame, jnp.float32)
        if frame.ndim == 3:
            frame = frame[None]
        want = (int(self.meta["batch"]), int(self.meta["height"]),
                int(self.meta["width"]), 3)
        if tuple(frame.shape) != want:
            raise ValueError(
                f"streaming artifact exported for frames {want}, got "
                f"{tuple(frame.shape)} (jax.export programs have static "
                "shapes; resize/re-batch the stream or re-export)"
            )
        fp = self._pyr_call(frame)
        window = int(self.meta.get("window", 2))
        prev = self._prev
        self._prev = (prev + [fp])[-(window - 1):]
        if len(prev) < window - 1:
            return None
        if window == 3:
            flow, flow_bw = self._dec_call(prev[0], prev[1], fp)
            out = {"flow": flow}
            if self.with_bw:
                out["flow_bw"] = flow_bw
            return out
        flow, ent = self._dec_call(prev[0], fp)
        out = {"flow": flow}
        if self.with_bw:
            out["flow_bw"] = self._dec_call(fp, prev[0])[0]
        if self.meta.get("has_entropy"):
            out["entropy"] = ent
        return out


def load_streaming_artifact(path: str) -> StreamingArtifact:
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an arflow export artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        if meta.get("format") != 2 or "sections" not in meta:
            raise ValueError(
                f"{path}: not a streaming artifact (use load_artifact)"
            )
        sections = {}
        for name, ln in meta["sections"]:
            sections[name] = jexport.deserialize(f.read(ln))
    return StreamingArtifact(
        meta=meta, pyramid=sections["pyramid"], decode=sections["decode"]
    )


def save_artifact(path: str, exported, meta: dict) -> None:
    """Write the single-file artifact (see module docstring for layout)."""
    import jax

    header = dict(meta)
    header.setdefault("format", 1)
    header["jax_version"] = jax.__version__
    payload = exported.serialize()
    hbytes = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hbytes)))
        f.write(hbytes)
        f.write(payload)


@dataclass
class ServingArtifact:
    """A loaded artifact: ``artifact(img1, img2) -> (flow, entropy)``."""

    meta: dict
    exported: object
    _call: object = None

    def __call__(self, img1, img2):
        import jax

        if self._call is None:
            self._call = jax.jit(self.exported.call)
        return self._call(img1, img2)


def load_artifact(path: str) -> ServingArtifact:
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{path}: not an arflow export artifact")
        (hlen,) = struct.unpack("<I", f.read(4))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        if "sections" in meta:
            raise ValueError(
                f"{path}: streaming artifact (use load_streaming_artifact)"
            )
        payload = f.read()
    exported = jexport.deserialize(payload)
    return ServingArtifact(meta=meta, exported=exported)
