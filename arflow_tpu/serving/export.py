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
        payload = f.read()
    exported = jexport.deserialize(payload)
    return ServingArtifact(meta=meta, exported=exported)
