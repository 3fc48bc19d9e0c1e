"""Serving/deployment: AOT export (jax.export) + streaming video engine.

The reference serves by re-running the torch model from source per pair
(/root/reference/inference.py:121-157). Here:
- ``export.py``: trace/compile once, serialize StableHLO + weights to a
  single artifact file, run anywhere with a matching jax runtime.
- ``engine.py``: video streaming with one feature-pyramid evaluation per
  frame (exact numerics) and host-decode prefetch overlap.
"""

from arflow_tpu.serving.export import (
    ServingArtifact,
    StreamingArtifact,
    build_inference_fn,
    export_inference,
    export_streaming,
    load_artifact,
    load_streaming_artifact,
    save_artifact,
    save_streaming_artifact,
)
from arflow_tpu.serving.engine import StreamingFlowEngine, run_stream

__all__ = [
    "ServingArtifact",
    "StreamingArtifact",
    "build_inference_fn",
    "export_inference",
    "export_streaming",
    "load_artifact",
    "load_streaming_artifact",
    "save_artifact",
    "save_streaming_artifact",
    "StreamingFlowEngine",
    "run_stream",
]
