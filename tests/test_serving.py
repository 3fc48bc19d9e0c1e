"""Serving: AOT export artifact roundtrip + streaming engine parity.

The streaming engine's claim: same submodules/math as the monolithic
forward, up to jit-boundary fusion reassociation (<=1e-4 px); the export
artifact's claim is that a deserialized StableHLO program reproduces the
jitted forward (bit-exact on TPU; last-ulp AOT-codegen differences allowed
on CPU).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.models import get_model
from arflow_tpu.serving import (
    StreamingFlowEngine,
    export_inference,
    load_artifact,
    run_stream,
    save_artifact,
)

H, W = 64, 96


def _init_uflow():
    model_cfg = Config({"type": "uflow", "feature_norm": True, "level_dropout": 0.0})
    model = get_model(model_cfg)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, img, img, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    return model_cfg, model, variables


def _frames(rng, n, batch=1):
    return [rng.rand(batch, H, W, 3).astype(np.float32) for _ in range(n)]


def test_export_artifact_roundtrip(tmp_path, rng):
    model_cfg, model, variables = _init_uflow()
    cfg = Config({"model": dict(model_cfg), "loss": {}})

    backend = jax.default_backend()
    exported, meta = export_inference(cfg, variables, 1, (H, W),
                                      platforms=(backend,))
    path = str(tmp_path / "model.afx")
    meta["note"] = "test"
    save_artifact(path, exported, meta)

    art = load_artifact(path)
    assert art.meta["model_type"] == "uflow"
    assert art.meta["height"] == H and art.meta["width"] == W
    assert art.meta["batch"] == 1 and art.meta["note"] == "test"

    img1 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    flow, ent = art(img1, img2)
    ref = model.apply(variables, img1, img2, with_bk=False)["flows_fw"][0]
    # The deserialized program may run through XLA's AOT loader with
    # different codegen flags than the in-process JIT (observed on CPU:
    # last-ulp differences); on TPU the roundtrip measured bit-exact.
    np.testing.assert_allclose(
        np.asarray(flow), np.asarray(ref[..., :2]), atol=1e-5, rtol=1e-5
    )
    assert not np.asarray(ent).any()  # no 'approx' in loss -> zeros


def test_export_entropy_signature(tmp_path, rng):
    from tests.test_models_prob import prob_cfg  # small diag config

    model_cfg = dict(prob_cfg())
    model_cfg["type"] = "uflow_prob"
    cfg = Config({"model": model_cfg, "loss": {"approx": "diag"}})
    model = get_model(cfg.model)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, img, img, with_bk=False))(
        jax.random.PRNGKey(0)
    )

    exported, meta = export_inference(cfg, variables, 1, (H, W),
                                      platforms=(jax.default_backend(),))
    assert meta["has_entropy"]
    path = str(tmp_path / "prob.afx")
    save_artifact(path, exported, meta)
    art = load_artifact(path)
    img1 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    img2 = jnp.asarray(rng.rand(1, H, W, 3), jnp.float32)
    flow, ent = art(img1, img2)
    assert flow.shape == (1, H, W, 2) and ent.shape == (1, H, W, 2)
    assert np.isfinite(np.asarray(ent)).all() and np.asarray(ent).any()


@pytest.mark.slow
@pytest.mark.parametrize("mtype", ["uflow", "pwclite"])
def test_streaming_engine_matches_monolithic(rng, mtype):
    model_cfg = Config(
        {"type": mtype, "feature_norm": True, "level_dropout": 0.0}
        if mtype == "uflow"
        else {"type": mtype, "n_frames": 2, "reduce_dense": True, "upsample": True}
    )
    # PWCLite's deeper pyramid needs power-of-two-divisible sizes.
    h, w = (H, W) if mtype == "uflow" else (64, 64)
    model = get_model(model_cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, img, img, with_bk=False))(
        jax.random.PRNGKey(0)
    )

    engine = StreamingFlowEngine(model_cfg, variables, with_bw=True)
    frames = [rng.rand(1, h, w, 3).astype(np.float32) for _ in range(3)]
    assert engine.push(frames[0]) is None
    outs = [engine.push(frames[1]), engine.push(frames[2])]

    fwd = jax.jit(
        lambda a, b: model.apply(variables, a, b, with_bk=True)
    )
    for (a, b), out in zip(zip(frames, frames[1:]), outs):
        res = fwd(jnp.asarray(a), jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(out["flow"]),
            np.asarray(res["flows_fw"][0][..., :2]),
            atol=1e-4, rtol=0,
        )
        np.testing.assert_allclose(
            np.asarray(out["flow_bw"]),
            np.asarray(res["flows_bw"][0][..., :2]),
            atol=1e-4, rtol=0,
        )

    # reset() drops the cached pyramid: next push returns None again.
    engine.reset()
    assert engine.push(frames[0]) is None
@pytest.mark.slow
def test_streaming_engine_prob_entropy(rng):
    from tests.test_models_prob import prob_cfg

    model_cfg = dict(prob_cfg())
    model_cfg["type"] = "uflow_prob"
    model_cfg = Config(model_cfg)
    model = get_model(model_cfg)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, img, img, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    engine = StreamingFlowEngine(
        model_cfg, variables, loss_cfg=Config({"approx": "diag"})
    )
    frames = _frames(rng, 2)
    engine.push(frames[0])
    out = engine.push(frames[1])
    ref = model.apply(
        variables, jnp.asarray(frames[0]), jnp.asarray(frames[1]), with_bk=False
    )["flows_fw"][0]
    np.testing.assert_allclose(
        np.asarray(out["flow"]), np.asarray(ref[..., :2]), atol=1e-4, rtol=0
    )
    # diag entropy = predicted log-std channels.
    np.testing.assert_allclose(
        np.asarray(out["entropy"]), np.asarray(ref[..., 2:4]), atol=1e-4,
        rtol=0,
    )
@pytest.mark.slow
def test_streaming_engine_3frame_matches_monolithic(rng):
    """The 3-frame PWCLite streams with ONE pyramid per frame; outputs match
    the monolithic model(img0, img1, img2) windows (which recompute every
    frame's pyramid per window) up to jit-boundary reassociation."""
    model_cfg = Config({"type": "pwclite", "n_frames": 3,
                        "reduce_dense": True, "upsample": True})
    h = w = 64
    model = get_model(model_cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, img, img, img, with_bk=False))(
        jax.random.PRNGKey(0)
    )

    engine = StreamingFlowEngine(model_cfg, variables, with_bw=True)
    frames = [rng.rand(1, h, w, 3).astype(np.float32) for _ in range(4)]
    assert engine.push(frames[0]) is None
    assert engine.push(frames[1]) is None  # 3-frame window needs 2 cached
    outs = [engine.push(frames[2]), engine.push(frames[3])]

    fwd = jax.jit(
        lambda a, b, c: model.apply(variables, a, b, c, with_bk=True)
    )
    for i, out in enumerate(outs):  # window (i, i+1, i+2), centered i+1
        res = fwd(*(jnp.asarray(f) for f in frames[i : i + 3]))
        np.testing.assert_allclose(  # flows_fw = flow_12 (center -> next)
            np.asarray(out["flow"]),
            np.asarray(res["flows_fw"][0][..., :2]),
            atol=1e-4, rtol=0,
        )
        np.testing.assert_allclose(  # flows_bw = flow_10 (center -> prev)
            np.asarray(out["flow_bw"]),
            np.asarray(res["flows_bw"][0][..., :2]),
            atol=1e-4, rtol=0,
        )

    engine.reset()
    assert engine.push(frames[0]) is None


def test_streaming_engine_rejects_unsupported():
    model_cfg = Config({"type": "pwclite", "n_frames": 5})
    model = get_model(model_cfg)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda r: model.init(r, img, img, img, img, img, with_bk=False)
    )(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="5-frame"):
        StreamingFlowEngine(model_cfg, variables)


def test_streaming_export_roundtrip(tmp_path, rng):
    """The streaming artifact (pyramid + decoder programs, format 2) is a
    source-free engine: push() matches StreamingFlowEngine on the same
    frames after a save/load roundtrip."""
    from arflow_tpu.serving import (
        export_streaming,
        load_streaming_artifact,
        save_streaming_artifact,
    )

    model_cfg, model, variables = _init_uflow()
    cfg = Config({"model": dict(model_cfg), "loss": {}})
    exported, meta = export_streaming(
        cfg, variables, 1, (H, W), platforms=(jax.default_backend(),)
    )
    path = str(tmp_path / "model_stream.afx")
    save_streaming_artifact(path, exported, meta)

    art = load_streaming_artifact(path)
    assert art.meta["window"] == 2 and art.meta["format"] == 2
    art.with_bw = True

    engine = StreamingFlowEngine(model_cfg, variables, with_bw=True)
    frames = _frames(rng, 3)
    assert art.push(frames[0]) is None
    assert engine.push(frames[0]) is None
    for f in frames[1:]:
        out_art = art.push(f)
        out_eng = engine.push(f)
        for key in ("flow", "flow_bw"):
            np.testing.assert_allclose(
                np.asarray(out_art[key]), np.asarray(out_eng[key]),
                atol=1e-5, rtol=1e-5,
            )

    # static shapes: a wrong-sized frame is a clear error, not a crash
    with pytest.raises(ValueError, match="static shapes"):
        art.push(np.zeros((1, H * 2, W, 3), np.float32))

    # monolithic loader rejects the format-2 file with a clear error
    with pytest.raises(ValueError, match="streaming"):
        from arflow_tpu.serving import load_artifact

        load_artifact(path)
@pytest.mark.slow
def test_streaming_export_3frame(tmp_path, rng):
    from arflow_tpu.serving import (
        export_streaming,
        load_streaming_artifact,
        save_streaming_artifact,
    )

    model_cfg = Config({"type": "pwclite", "n_frames": 3,
                        "reduce_dense": True, "upsample": True})
    h = w = 64
    model = get_model(model_cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, img, img, img, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    cfg = Config({"model": dict(model_cfg), "loss": {}})
    exported, meta = export_streaming(
        cfg, variables, 1, (h, w), platforms=(jax.default_backend(),)
    )
    path = str(tmp_path / "mv_stream.afx")
    save_streaming_artifact(path, exported, meta)
    art = load_streaming_artifact(path)
    assert art.meta["window"] == 3
    art.with_bw = True

    engine = StreamingFlowEngine(model_cfg, variables, with_bw=True)
    frames = [rng.rand(1, h, w, 3).astype(np.float32) for _ in range(3)]
    for f in frames[:2]:
        assert art.push(f) is None
        engine.push(f)
    out_art = art.push(frames[2])
    out_eng = engine.push(frames[2])
    np.testing.assert_allclose(
        np.asarray(out_art["flow"]), np.asarray(out_eng["flow"]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_art["flow_bw"]), np.asarray(out_eng["flow_bw"]),
        atol=1e-5, rtol=1e-5,
    )


def test_streaming_export_entropy(tmp_path, rng):
    from tests.test_models_prob import prob_cfg

    from arflow_tpu.serving import (
        export_streaming,
        load_streaming_artifact,
        save_streaming_artifact,
    )

    model_cfg = dict(prob_cfg())
    model_cfg["type"] = "uflow_prob"
    model_cfg = Config(model_cfg)
    model = get_model(model_cfg)
    img = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, img, img, with_bk=False))(
        jax.random.PRNGKey(0)
    )
    cfg = Config({"model": dict(model_cfg), "loss": {"approx": "diag"}})
    exported, meta = export_streaming(
        cfg, variables, 1, (H, W), platforms=(jax.default_backend(),)
    )
    assert meta["has_entropy"]
    path = str(tmp_path / "prob_stream.afx")
    save_streaming_artifact(path, exported, meta)
    art = load_streaming_artifact(path)

    engine = StreamingFlowEngine(
        model_cfg, variables, loss_cfg=Config({"approx": "diag"})
    )
    frames = _frames(rng, 2)
    art.push(frames[0])
    engine.push(frames[0])
    out_art = art.push(frames[1])
    out_eng = engine.push(frames[1])
    np.testing.assert_allclose(
        np.asarray(out_art["flow"]), np.asarray(out_eng["flow"]),
        atol=1e-5, rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_art["entropy"]), np.asarray(out_eng["entropy"]),
        atol=1e-5, rtol=1e-5,
    )


def test_run_stream_writes_flo(tmp_path, rng):
    from PIL import Image

    from arflow_tpu.utils.flow_io import read_flo

    model_cfg, model, variables = _init_uflow()
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(4):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(frames_dir / f"frame_{i:03d}.png")

    engine = StreamingFlowEngine(model_cfg, variables, with_bw=True)
    out_dir = tmp_path / "flo"
    paths = sorted(str(p) for p in frames_dir.glob("*.png"))
    stats = run_stream(engine, paths, size_hw=(H, W), out_root=str(out_dir),
                       warmup=1)
    assert stats["frames"] == 4 and stats["flows"] == 3
    flos = sorted(out_dir.glob("*.flo"))
    assert [p.name for p in flos] == [
        "frame_001.flo", "frame_001_bw.flo",
        "frame_002.flo", "frame_002_bw.flo",
        "frame_003.flo", "frame_003_bw.flo",
    ]
    flow = read_flo(str(flos[0]))
    assert flow.shape == (H, W, 2) and np.isfinite(flow).all()


def test_stream_cli(tmp_path, rng):
    from PIL import Image

    from arflow_tpu.cli import stream_cli
    from arflow_tpu.training.checkpoint import save_checkpoint

    model_cfg, model, variables = _init_uflow()
    save_checkpoint(
        str(tmp_path), {"params": jax.device_get(variables["params"])}, "model"
    )
    ckpt = str(tmp_path / "model_ckpt.msgpack")

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(3):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(frames_dir / f"f{i}.png")

    cfg_path = tmp_path / "cfg.json"
    import json

    cfg_path.write_text(json.dumps({"model": dict(model_cfg), "loss": {}}))
    out_dir = tmp_path / "out"
    stream_cli([
        "-c", str(cfg_path), "-m", ckpt,
        "--frames", str(frames_dir), "--out", str(out_dir),
        "--size", f"{H}x{W}",
    ])
    assert len(list(out_dir.glob("*.flo"))) == 2

    # export --streaming then run source-free from the artifact
    from arflow_tpu.cli import export_cli

    art_path = str(tmp_path / "model_stream.afx")
    export_cli([
        "-c", str(cfg_path), "-m", ckpt, "-o", art_path,
        "--size", f"{H}x{W}", "--streaming",
        "--platforms", jax.default_backend(),
    ])
    out_dir2 = tmp_path / "out_art"
    stream_cli([
        "--artifact", art_path,
        "--frames", str(frames_dir), "--out", str(out_dir2),
    ])
    assert len(list(out_dir2.glob("*.flo"))) == 2
