"""Model zoo: PWC-style coarse-to-fine flow networks (flax.linen, NHWC).

Mirrors the reference factory (models/get_model.py:8-25):
  - 'uflow'         -> PWCFlow           (models/uflow_model.py)
  - 'uflow_prob'    -> PWCProbFlow       (models/uflow_prob_model.py)
  - 'component'     -> ComponentNet      (models/uflow_prob_model.py)
  - 'pwclite'       -> PWCLite           (models/pwclite.py)
  - 'pwclite_prob'  -> PWCLiteProb       (models/pwclite_prob.py)
  - 'pwclite_uflow' -> PWCLiteUflow      (models/pwclite_uflow.py)

(The reference's 'flownet_prob' branch references an unimported class —
models/get_model.py:19-20 — and is intentionally not reproduced.)
"""

from arflow_tpu.models.uflow import PWCFlow, PWCFeaturePyramid  # noqa: F401
from arflow_tpu.models.pwclite import PWCLite  # noqa: F401
from arflow_tpu.models.pwclite_prob import PWCLiteProb  # noqa: F401
from arflow_tpu.models.pwclite_uflow import PWCLiteUflow  # noqa: F401
from arflow_tpu.models.uflow_prob import PWCProbFlow, ComponentNet  # noqa: F401


def _parse_dtype(name):
    """Model 'dtype' config: None/'float32' -> f32 math; 'bfloat16' -> bf16
    compute with f32 params and f32 outputs (TPU mixed precision); 'int8' ->
    bf16 compute plus dynamically-quantized int8 feature-pyramid convs
    (SERVING-ONLY — the quantization round has zero gradient; trainers
    reject it). int8 is a PER-INSTANCE module attribute (``int8_pyramid``),
    never process state: other models built in the same process are
    unaffected."""
    if name in (None, "float32", "f32"):
        return None
    import jax.numpy as jnp

    if name in ("bfloat16", "bf16", "int8"):
        return jnp.bfloat16
    raise NotImplementedError(f"model dtype {name}")


def _int8(cfg, supported=True):
    if cfg.get("dtype") != "int8":
        return False
    if not supported:
        raise NotImplementedError(
            "model.dtype 'int8' quantizes the uflow-family feature pyramid "
            f"(Conv2dNPad); the '{cfg.type}' family has no int8 path "
            "(measured to lose to bf16 at its conv shapes, BASELINE.md)."
        )
    return True


def _normalize_out_channels(oc):
    """Accept both the [L, M, N] group list and the stale int schema used by
    older configs (configs/chairs_uflow_elbo_gmm.json: "out_channels": 4 means
    2 flow + 2 log-diag channels; the reference would crash on it)."""
    if isinstance(oc, int):
        return (2, oc - 2, 0)
    return tuple(oc)


def get_model(cfg):
    """Model factory: cfg.type -> linen module instance."""
    if cfg.type == "uflow":
        return PWCFlow(
            level_dropout=cfg.get("level_dropout", 0.0),
            feature_norm=cfg.get("feature_norm", True),
            dtype=_parse_dtype(cfg.get("dtype")),
            int8_pyramid=_int8(cfg),
        )
    if cfg.type == "uflow_prob":
        return PWCProbFlow(
            level_dropout=cfg.get("level_dropout", 0.0),
            feature_norm=cfg.get("feature_norm", True),
            out_channels=_normalize_out_channels(cfg.out_channels),
            inv_cov=cfg.get("inv_cov", False),
            n_pyramids=cfg.get("n_pyramids", 1),
            mixture_weights=cfg.get("mixture_weights", False),
            dtype=_parse_dtype(cfg.get("dtype")),
            int8_pyramid=_int8(cfg),
        )
    if cfg.type == "component":
        return ComponentNet(
            level_dropout=cfg.get("level_dropout", 0.0),
            feature_norm=cfg.get("feature_norm", True),
            out_channels=_normalize_out_channels(cfg.out_channels),
            inv_cov=cfg.get("inv_cov", False),
            n_pyramids=cfg.get("n_pyramids", 1),
            mixture_weights=cfg.get("mixture_weights", False),
            dtype=_parse_dtype(cfg.get("dtype")),
            int8_pyramid=_int8(cfg),
        )
    if cfg.type == "pwclite":
        _int8(cfg, supported=False)
        return PWCLite(
            n_frames=cfg.n_frames,
            upsample=cfg.get("upsample", True),
            reduce_dense=cfg.get("reduce_dense", True),
            dtype=_parse_dtype(cfg.get("dtype")),
        )
    if cfg.type == "pwclite_prob":
        _int8(cfg, supported=False)
        return PWCLiteProb(
            n_frames=cfg.n_frames,
            upsample=cfg.get("upsample", True),
            reduce_dense=cfg.get("reduce_dense", True),
            dtype=_parse_dtype(cfg.get("dtype")),
        )
    if cfg.type == "pwclite_uflow":
        _int8(cfg, supported=False)
        return PWCLiteUflow(
            n_frames=cfg.n_frames,
            reduce_dense=cfg.get("reduce_dense", True),
            level_dropout=cfg.get("level_dropout", 0.0),
            feature_norm=cfg.get("feature_norm", False),
            align_corners=cfg.get("align_corners", True),
            warp_pad=cfg.get("warp_pad", "zeros"),
            dtype=_parse_dtype(cfg.get("dtype")),
        )
    raise NotImplementedError(cfg.type)
