"""Lockstep N-step training-trajectory parity vs the torch reference.

Single-evaluation parity (model forwards, loss values, loss grads) cannot
catch small systematic drift in the optimizer semantics, the decay/no-decay
param groups, the exponential-LR gating (reference
trainer/base_trainer.py:52-55,78-129), or the predict-on-``_ph``/
loss-on-original trainer contract (trainer/uflow_trainer.py:38-54). These
tests run N optimizer steps in BOTH frameworks from identical init, data and
injected noise — in float64, so reassociation noise sits ~1e-12 and any
semantic divergence is glaring — and compare per-step losses and final
params to tight bounds.

Learning-rate choice (root-caused divergence, see DIVERGENCES.md): at the
production lr=1e-4 the un-warmed-up Adam trajectory is measurably chaotic —
the cross-framework param diff starts at the f64 noise floor (1.7e-11 after
update 0, pure conv-reduction-order noise) and grows ~x30-70 PER STEP
(1.7e-11 -> 2e-10 -> 4e-8 -> 3e-6 -> 1.3e-4 over five updates, measured),
because early in training sqrt(v_hat) is far below the loss curvature scale
so Adam's normalized step amplifies any param perturbation. That growth is
identical-semantics chaos, not drift. Cases (a)/(b) therefore run at
lr=1e-7: the amplification factor scales with lr, so noise stays ~1e-12
over the whole horizon, while every SEMANTIC divergence these tests exist
to catch — a mis-grouped weight-decay leaf, a wrong LR-gate epoch, a wrong
eps placement, a broken predict-on-ph contract — produces an O(lr)=1e-7+
param error, five orders of magnitude above the floor. Optimizer semantics
at N=50 steps with healthy step sizes are pinned separately by
tests/test_lockstep_optimizer.py on synthetic gradients (no model, no
chaos).

Cases:
  a) uflow trainer + Adam(+L2-into-grad decay) + engaged exponential LR
     decay: OUR FULL TRAINER loop vs the reference's full TrainFramework,
     both driven by the same in-memory loader (3 epochs x 8 steps).
  b) diag-ELBO + Adam + engaged global-norm clipping: identical injected
     posterior noise per step; the reference's full elbo TrainFramework vs
     our loss+grad+create_optimizer composition (2 epochs x 6 steps).
  c) supervised MSE + the reference's custom AdamW (decoupled, lr-UNscaled
     multiplicative decay; utils/torch_utils.py:82-161) with both decay
     groups nonzero — pins scale_by_torch_adamw/torch_adamw_decay.
"""

import logging

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from arflow_tpu.config import Config
from arflow_tpu.losses import MseLoss, UFlowElboLoss, UFlowLoss
from arflow_tpu.models import get_model
from arflow_tpu.models.torch_import import import_uflow, import_uflow_prob
from arflow_tpu.parallel import make_mesh, replicate
from arflow_tpu.training.optim import create_optimizer
from arflow_tpu.training.uflow_trainer import UFlowTrainer
from tests.reference_oracle import import_reference

# Reference cost volume needs the coarsest (1/32) level > max_displacement=4
# (models/uflow_prob_model.py:75), so frames must be >= 160 px per side.
B, H, W = 2, 160, 192
H2, W2 = H // 4, W // 4

log = logging.getLogger("lockstep")


@pytest.fixture
def torch_f64():
    """The reference builds warp grids etc. with default-dtype factories
    (utils/uflow_utils.py:19-21 linspace); float64 lockstep needs the torch
    default dtype switched for the reference run."""
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _make_batches(rng, n, with_ph=True, with_flow=False):
    """n batches of NHWC float64 images (shared by both frameworks)."""
    batches = []
    for _ in range(n):
        b = {
            "img1": rng.rand(B, H, W, 3).astype(np.float64),
            "img2": rng.rand(B, H, W, 3).astype(np.float64),
        }
        if with_ph:
            # _ph copies deliberately DIFFER from the originals so the
            # predict-on-ph / loss-on-original contract is load-bearing.
            b["img1_ph"] = np.clip(b["img1"] * 1.15 + 0.02, 0.0, 1.0)
            b["img2_ph"] = np.clip(b["img2"] * 1.15 + 0.02, 0.0, 1.0)
        if with_flow:
            b["flow"] = (rng.randn(B, H, W, 2) * 2.0).astype(np.float64)
        batches.append(b)
    return batches


def _nchw(x):
    return torch.from_numpy(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))


def _cast_tree_f64(tree):
    return jax.tree_util.tree_map(
        lambda a: jnp.asarray(np.asarray(a), jnp.float64), tree
    )


def _single_device_mesh():
    return make_mesh(devices=np.array(jax.devices()[:1]))


def _inject_params(trainer, batch0, params_f64):
    """Initialize the trainer lazily, then overwrite params with the imported
    float64 tree and re-init the optimizer state on it.

    The shape-fixing init runs on a float32 copy of the batch (flax param
    init is hardcoded float32 — models/layers.py Conv2dTorch — so a float64
    batch would hit a mixed-dtype conv); the injected float64 params then
    retrace the jitted train step in full float64."""
    batch0_f32 = jax.tree_util.tree_map(
        lambda a: np.asarray(a, dtype=np.float32), batch0
    )
    trainer._ensure_init(batch0_f32)
    state = dict(jax.device_get(trainer.state))
    state["params"] = params_f64
    state["opt_state"] = trainer.tx.init(params_f64)
    trainer.state = replicate(trainer.mesh, state)


def _compare_param_trees(ours, ref_tree, atol, label):
    """Leaf-wise |a-b| max + overall relative L2 between two param trees.

    The bound is an ABSOLUTE drift bound against the reference after N
    optimizer steps. Adam normalizes updates by sqrt(v)+eps, so float64
    reassociation noise in near-zero gradients is amplified up to ~lr per
    step on dead leaves — the bound must sit above N*lr*noise-amplification
    but far below any systematic semantic error (a mis-grouped weight-decay
    leaf drifts by ~wd*|p|*N ≈ 1e-3; a wrong LR gate by ~|update|*N ≈ 1e-3).
    """
    o_leaves = jax.tree_util.tree_leaves_with_path(ours)
    r = {jax.tree_util.keystr(p): np.asarray(v)
         for p, v in jax.tree_util.tree_leaves_with_path(ref_tree)}
    sq_diff = sq_ref = 0.0
    diffs = []
    for path, leaf in o_leaves:
        key = jax.tree_util.keystr(path)
        a, b = np.asarray(leaf), r[key]
        diffs.append((float(np.max(np.abs(a - b))), key))
        sq_diff += float(np.sum((a - b) ** 2))
        sq_ref += float(np.sum(b**2))
    diffs.sort(reverse=True)
    rel_l2 = float(np.sqrt(sq_diff / max(sq_ref, 1e-300)))
    top = ", ".join(f"{k}={d:.3e}" for d, k in diffs[:8])
    log.info("%s: rel L2 %g; top leaf diffs: %s", label, rel_l2, top)
    assert diffs[0][0] <= atol, (
        f"{label}: rel L2 {rel_l2:.3e}; worst leaves over atol={atol}: {top}"
    )
    return rel_l2


class _StubNormal:
    """Queue-backed replacement for torch.distributions.Normal(0,1)."""

    def __init__(self):
        self.q = []

    def push(self, *draws):
        self.q.extend(draws)

    def sample(self, size):
        d = self.q.pop(0)
        assert tuple(size) == tuple(d.shape), (tuple(size), d.shape)
        return torch.from_numpy(d)


class _RecordingLoss:
    """Wraps a reference loss module, recording per-call scalar outputs."""

    def __init__(self, loss, n_scalars):
        self._loss = loss
        self._n = n_scalars
        self.records = []

    @property
    def cfg(self):
        return self._loss.cfg

    def __call__(self, *args, **kwargs):
        out = self._loss(*args, **kwargs)
        self.records.append([float(v) for v in out[: self._n]])
        return out


class _RecordingUFlowTrainer(UFlowTrainer):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.records = []

    def _queue_step_metrics(self, metrics, *a, **k):
        self.records.append(
            {key: metrics[key] for key in ("total", "l_ph", "l_sm")}
        )
        super()._queue_step_metrics(metrics, *a, **k)


def _ref_trainer(trainer_name, model_cfg, loss, batches_torch, train_cfg,
                 save_root):
    """Build the reference TrainFramework exactly as basic_train.py:40-46
    does, with an in-memory loader, then cast the model to float64."""
    get_model_ref = import_reference("models.get_model")
    get_trainer_ref = import_reference("trainer.get_trainer")
    torch.manual_seed(0)
    model = get_model_ref.get_model(model_cfg)
    TF = get_trainer_ref.get_trainer(trainer_name)
    tr = TF(batches_torch, [], model, loss, log, str(save_root), train_cfg)
    tr.model.module.double()
    return tr


# ---------------------------------------------------------------------------
# case (a): uflow trainer + Adam + engaged LR decay, full trainer vs trainer
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_lockstep_uflow_adam_full_trainer(tmp_path, rng, torch_f64):
    n_epochs, steps = 3, 4
    batches = _make_batches(rng, steps)

    loss_cfg = Config({
        "type": "uflow", "edge_constant": 150, "w_smooth": 4.0,
        "w_census": 1.0, "smooth_order": 1, "with_bk": True,
    })
    model_cfg = Config({"type": "uflow", "feature_norm": True,
                        "level_dropout": 0.0})
    # chairs_uflow.json train section, tiny-run overrides: LR decay STARTS
    # mid-run (epoch 2 of 3) with a glaring factor, and Adam L2 decay is
    # nonzero so the decay-group mask is load-bearing.
    train = {
        "batch_size": B, "epoch_num": n_epochs, "epoch_size": 1000,
        "lr": 1e-7, "lr_decay_start_epoch": 2, "lr_decay_factor": 0.5,
        "optim": "adam", "beta1": 0.9, "beta2": 0.999, "eps": 1e-8,
        "weight_decay": 1e-2, "bias_decay": 0.0, "n_gpu": 0,
        "pretrained_model": None, "print_freq": 100, "record_freq": 1,
        "save_iter": 10**9, "valid_freq": 10**9, "valid_size": 0,
        "workers": 0, "seed": 0, "clip": -1.0,
    }

    # --- reference side ----------------------------------------------------
    batches_torch = [
        {k: _nchw(v) for k, v in b.items()} for b in batches
    ]
    loss_ref = _RecordingLoss(
        import_reference("losses.get_loss").get_loss(loss_cfg), 4
    )
    tr_ref = _ref_trainer("uflow", model_cfg, loss_ref, batches_torch,
                          Config(train), tmp_path / "ref")
    sd0 = {k: v.detach().clone()
           for k, v in tr_ref.model.module.state_dict().items()}
    tr_ref.train()
    sd_final = tr_ref.model.module.state_dict()

    # --- our side ----------------------------------------------------------
    params0 = _cast_tree_f64(import_uflow(sd0))
    model = get_model(model_cfg)
    our_loss = UFlowLoss(loss_cfg)
    tr = _RecordingUFlowTrainer(
        batches, None, model, our_loss, log, str(tmp_path / "ours"),
        Config(train), model_cfg=model_cfg, mesh=_single_device_mesh(),
    )
    _inject_params(tr, batches[0], params0)
    tr.train()

    # --- compare -----------------------------------------------------------
    assert len(tr.records) == len(loss_ref.records) == n_epochs * steps
    ours_tot = np.array([float(r["total"]) for r in tr.records])
    ref_tot = np.array([r[0] for r in loss_ref.records])
    np.testing.assert_allclose(ours_tot, ref_tot, rtol=1e-8, atol=1e-12,
                               err_msg="per-step total loss trajectory")
    ours_ph = np.array([float(r["l_ph"]) for r in tr.records])
    ref_ph = np.array([r[1] for r in loss_ref.records])
    np.testing.assert_allclose(ours_ph, ref_ph, rtol=1e-8, atol=1e-12)

    final_ref = _cast_tree_f64(import_uflow(sd_final))
    rel_l2 = _compare_param_trees(
        jax.device_get(tr.state["params"]), final_ref, atol=1e-10,
        label="uflow+adam 24-step params",
    )
    assert rel_l2 < 1e-9


# ---------------------------------------------------------------------------
# case (b): diag-ELBO + Adam + clip, injected noise, ref trainer vs our step
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_lockstep_elbo_diag_adam_clip(tmp_path, rng, torch_f64):
    n_epochs, steps = 2, 4
    n_steps = n_epochs * steps
    batches = _make_batches(rng, steps, with_ph=False)

    loss_cfg = Config({
        "type": "uflow_elbo", "edge_constant": 150.0, "edge_asymp": 0.01,
        "w_smooth": 4.0, "order_smooth": 1, "isotropic_smooth": True,
        "penalty_smooth": "charbonnier", "closed_form_smooth": True,
        "data_loss": ["census"], "data_weight": [1.0],
        "data_penalty": ["abs_robust_loss"], "w_entropy": 0.1,
        "w_oof": 0.0, "w_occ": 0.0, "with_bk": True, "approx": "diag",
        "n_components": 1, "diag_dominant": False, "inv_cov": False,
        "approx_entropy": False, "occ_type": "sample", "n_samples": 1,
        "offdiag_reg": 0.0, "natural_grad": False,
    })
    model_cfg = Config({
        "type": "uflow_prob", "feature_norm": True, "level_dropout": 0.0,
        "out_channels": [2, 2, 0], "inv_cov": False, "n_pyramids": 1,
        "mixture_weights": False,
    })
    # Clipping forced to ENGAGE every step (tiny max-norm) to pin the
    # clip-before-Adam ordering and the global-norm computation.
    train = {
        "batch_size": B, "epoch_num": n_epochs, "epoch_size": 1000,
        "lr": 1e-7, "lr_decay_start_epoch": 1, "lr_decay_factor": 0.5,
        "optim": "adam", "beta1": 0.9, "beta2": 0.999, "eps": 1e-8,
        "weight_decay": 1e-6, "bias_decay": 0.0, "clip": 0.05, "n_gpu": 0,
        "pretrained_model": None, "print_freq": 100, "record_freq": 1,
        "save_iter": 10**9, "valid_freq": 10**9, "valid_size": 0,
        "workers": 0, "seed": 0,
    }

    # Pre-draw every posterior noise tensor (2 per loss call: eps12, eps21).
    eps_seq = [
        (rng.randn(B, 2, H2, W2), rng.randn(B, 2, H2, W2))
        for _ in range(n_steps)
    ]

    # --- reference side: the full elbo TrainFramework ----------------------
    uel = import_reference("losses.uflow_elbo_loss")
    ref_loss_inner = uel.UFlowElboLoss(loss_cfg)
    stub = _StubNormal()
    for e12, e21 in eps_seq:
        stub.push(e12, e21)
    ref_loss_inner.Normal = stub
    loss_ref = _RecordingLoss(ref_loss_inner, 4)
    batches_torch = [
        {k: _nchw(v) for k, v in b.items()} for b in batches
    ]
    tr_ref = _ref_trainer("uflow_elbo", model_cfg, loss_ref, batches_torch,
                          Config(train), tmp_path / "ref")
    sd0 = {k: v.detach().clone()
           for k, v in tr_ref.model.module.state_dict().items()}
    tr_ref.train()
    assert not stub.q, "reference consumed fewer noise draws than planned"
    sd_final = tr_ref.model.module.state_dict()

    # --- our side: loss + grad + create_optimizer composition --------------
    params = _cast_tree_f64(import_uflow_prob(sd0))
    model = get_model(model_cfg)
    our_loss = UFlowElboLoss(loss_cfg)
    tx = create_optimizer(Config(train), params, steps_per_epoch=steps)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img1, img2, noise):
        def lf(p):
            res = model.apply({"params": p}, img1, img2, with_bk=True,
                              train=True,
                              rngs={"dropout": jax.random.PRNGKey(0)})
            out = our_loss(res, img1, img2, noise=noise)
            return out["total"], out

        (_, out), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, out

    ours_records = []
    for i in range(n_steps):
        b = batches[i % steps]
        e12, e21 = eps_seq[i]
        noise = {
            "eps12": jnp.asarray(np.transpose(e12, (0, 2, 3, 1))),
            "eps21": jnp.asarray(np.transpose(e21, (0, 2, 3, 1))),
        }
        params, opt_state, out = step(
            params, opt_state, jnp.asarray(b["img1"]),
            jnp.asarray(b["img2"]), noise,
        )
        ours_records.append(
            [float(out["total"]), float(out["l_ph"]), float(out["l_sm"]),
             float(out["entropy"])]
        )

    assert len(loss_ref.records) == n_steps
    np.testing.assert_allclose(
        np.array(ours_records), np.array(loss_ref.records),
        rtol=1e-8, atol=1e-12,
        err_msg="per-step [total, l_ph, l_sm, entropy] trajectory",
    )
    final_ref = _cast_tree_f64(import_uflow_prob(sd_final))
    rel_l2 = _compare_param_trees(
        jax.device_get(params), final_ref, atol=1e-10,
        label="elbo+adam+clip 12-step params",
    )
    assert rel_l2 < 1e-9


# ---------------------------------------------------------------------------
# case (c): supervised MSE + the reference's custom AdamW
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_lockstep_mse_reference_adamw(tmp_path, rng, torch_f64):
    n_steps = 8
    batches = _make_batches(rng, n_steps, with_ph=False, with_flow=True)

    loss_cfg = Config({
        "type": "mse", "w_mse": 1.0, "w_entropy": 0.1, "diag": True,
        "diag_dominant": False, "inv_cov": False, "approx_entropy": False,
        "offdiag_reg": 0.0, "n_samples": 1, "align_corners": False,
    })
    model_cfg = Config({
        "type": "uflow_prob", "feature_norm": True, "level_dropout": 0.0,
        "out_channels": [2, 2, 0], "inv_cov": False, "n_pyramids": 1,
        "mixture_weights": False,
    })
    # BOTH decay groups nonzero: any mix-up between the lr-scaled paper
    # AdamW and the reference's unscaled post-step p*=(1-wd) is glaring.
    train = {
        "batch_size": B, "epoch_num": 1, "epoch_size": 1000, "lr": 1e-4,
        "lr_decay_start_epoch": 10**6, "lr_decay_factor": 0.98,
        "optim": "adamw", "momentum": 0.9, "beta": 0.999,
        "weight_decay": 1e-2, "bias_decay": 1e-3, "clip": -1.0, "n_gpu": 0,
        "pretrained_model": None, "print_freq": 100, "record_freq": 1,
        "save_iter": 10**9, "valid_freq": 10**9, "valid_size": 0,
        "workers": 0, "seed": 0,
    }

    eps_seq = [rng.randn(B, 2, H2, W2) for _ in range(n_steps)]

    # --- reference side: manual loop (its trainer factory never learned the
    # mse path, trainer/get_trainer.py raises on "ChairsMse") around the
    # REAL _create_optimizer-built AdamW + param groups ---------------------
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        ref_loss = import_reference("losses.mse_loss").MseLoss(loss_cfg)
        stub = _StubNormal()
        stub.push(*eps_seq)
        ref_loss.Normal = stub
        batches_torch = [
            {k: _nchw(v) for k, v in b.items()} for b in batches
        ]
        tr_ref = _ref_trainer("uflow", model_cfg, ref_loss, batches_torch,
                              Config(train), tmp_path / "ref")
        model_t, opt_t = tr_ref.model.module, tr_ref.optimizer
        sd0 = {k: v.detach().clone() for k, v in model_t.state_dict().items()}

        ref_records = []
        for b in batches_torch:
            res = model_t(b["img1"], b["img2"], with_bk=False)
            total, l_mse, l_ent, l_off = ref_loss(
                res["flows_fw"], b["flow"]
            )
            opt_t.zero_grad()
            total.backward()
            opt_t.step()
            ref_records.append([float(total), float(l_mse), float(l_ent)])
        assert not stub.q
        sd_final = model_t.state_dict()
    finally:
        torch.Tensor.cuda = orig_cuda

    # --- our side -----------------------------------------------------------
    params = _cast_tree_f64(import_uflow_prob(sd0))
    model = get_model(model_cfg)
    our_loss = MseLoss(loss_cfg)
    tx = create_optimizer(Config(train), params, steps_per_epoch=n_steps)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img1, img2, gt, noise):
        def lf(p):
            res = model.apply({"params": p}, img1, img2, with_bk=False,
                              train=True,
                              rngs={"dropout": jax.random.PRNGKey(0)})
            out = our_loss(res["flows_fw"], gt, noise=noise)
            return out["total"], out

        (_, out), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, out

    ours_records = []
    for i, b in enumerate(batches):
        noise = {"eps": jnp.asarray(np.transpose(eps_seq[i], (0, 2, 3, 1)))}
        params, opt_state, out = step(
            params, opt_state, jnp.asarray(b["img1"]),
            jnp.asarray(b["img2"]), jnp.asarray(b["flow"]), noise,
        )
        ours_records.append(
            [float(out["total"]), float(out["l_mse"]), float(out["entropy"])]
        )

    np.testing.assert_allclose(
        np.array(ours_records), np.array(ref_records), rtol=1e-8, atol=1e-12,
        err_msg="per-step [total, l_mse, entropy] trajectory",
    )
    final_ref = _cast_tree_f64(import_uflow_prob(sd_final))
    rel_l2 = _compare_param_trees(
        jax.device_get(params), final_ref, atol=1e-10,
        label="mse+reference-adamw 10-step params",
    )
    assert rel_l2 < 1e-9
