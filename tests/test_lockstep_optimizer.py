"""Pure-optimizer lockstep vs torch: N=50 steps on synthetic gradients.

The full-trainer trajectory tests (tests/test_lockstep_trajectory.py) pin the
loss->grad->update composition but must run at a tiny lr because the
un-warmed-up Adam trajectory through the real model is chaotic (measured
x30-70/step amplification of f64 conv noise; see that module's docstring and
DIVERGENCES.md). Here there is no model and no chaos: both frameworks consume
the IDENTICAL float64 gradient sequence, so every optimizer semantic runs at
a production-scale lr for 50 steps and must match torch to float64 rounding:

  - decay/no-decay param grouping (reference trainer/base_trainer.py:81-125:
    conv/dense 'weight' leaves get cfg.weight_decay, everything else
    cfg.bias_decay),
  - torch.optim.Adam's L2-into-gradient decay vs the reference AdamW's
    decoupled lr-UNscaled post-step p*=(1-wd) (utils/torch_utils.py:136-161),
  - the eps placement difference between the two (bias-corrected vs raw
    sqrt(v)),
  - torch.nn.utils.clip_grad_norm_'s +1e-6 denominator, engaged on some
    steps and not others,
  - the exponential-LR gate: scheduler.step() after epoch end only once
    i_epoch >= lr_decay_start_epoch (trainer/base_trainer.py:52-55),
  - graph-disconnected params (torch: p.grad is None -> skipped entirely,
    frozen moments, no decay; ours: dense zero grads + the used-gate in
    training/optim.py).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from arflow_tpu.config import Config
from arflow_tpu.training.optim import create_optimizer
from tests.reference_oracle import import_reference

STEPS_PER_EPOCH = 10
N_EPOCHS = 5

# A flax-shaped tree: 'kernel' leaves are the decay group (conv/dense
# weights in the reference's module-type whitelist), the rest no-decay.
SHAPES = {
    "conv1": {"kernel": (3, 3, 2, 4), "bias": (4,)},
    "conv2": {"kernel": (3, 3, 4, 4), "bias": (4,)},
    "norm": {"scale": (4,), "bias": (4,)},
    # Graph-disconnected leaf: grad is None in torch / zeros here.
    "dead": {"kernel": (2, 2, 4, 2), "bias": (2,)},
}
DEAD = ("dead",)


@pytest.fixture
def torch_f64():
    prev = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(prev)


def _leaves(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _leaves(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _make_params(rng):
    return {
        m: {n: rng.randn(*shp) for n, shp in sub.items()}
        for m, sub in SHAPES.items()
    }


def _grad_seq(rng, n_steps):
    """Per-step gradient trees; every third step is scaled x25 so global-norm
    clipping engages on some steps and not others. Dead leaves get zeros."""
    seq = []
    for t in range(n_steps):
        scale = 25.0 if t % 3 == 2 else 0.5
        g = {
            m: {
                n: (np.zeros(shp) if m in DEAD
                    else scale * rng.randn(*shp))
                for n, shp in sub.items()
            }
            for m, sub in SHAPES.items()
        }
        seq.append(g)
    return seq


def _run_torch(params0, grads, cfg):
    """The reference's optimizer stack verbatim: param groups split like
    _create_optimizer, clip_grad_norm_ when cfg.clip>0, ExponentialLR stepped
    per the reference's epoch gate."""
    tparams = {
        path: torch.nn.Parameter(torch.from_numpy(np.array(leaf)))
        for path, leaf in _leaves(params0)
    }
    decay = [p for path, p in tparams.items() if path[-1] == "kernel"]
    nodecay = [p for path, p in tparams.items() if path[-1] != "kernel"]
    groups = [
        {"params": decay, "weight_decay": cfg.weight_decay},
        {"params": nodecay, "weight_decay": cfg.bias_decay},
    ]
    if cfg.optim == "adam":
        opt = torch.optim.Adam(groups, cfg.lr, betas=(cfg.beta1, cfg.beta2),
                               eps=cfg.eps)
    elif cfg.optim == "adamw":
        AdamW = import_reference("utils.torch_utils").AdamW
        opt = AdamW(groups, cfg.lr, betas=(cfg.momentum, cfg.beta))
    elif cfg.optim == "sgd":
        opt = torch.optim.SGD(groups, cfg.lr, momentum=cfg.momentum)
    sched = torch.optim.lr_scheduler.ExponentialLR(opt, cfg.lr_decay_factor)

    live = [path for path, _ in _leaves(params0) if path[0] not in DEAD]
    snaps = []
    i_epoch = 0
    for e in range(N_EPOCHS):
        for t in range(STEPS_PER_EPOCH):
            g = grads[e * STEPS_PER_EPOCH + t]
            opt.zero_grad(set_to_none=True)
            gmap = dict(_leaves(g))
            for path in live:
                tparams[path].grad = torch.from_numpy(np.array(gmap[path]))
            if cfg.clip > 0:
                torch.nn.utils.clip_grad_norm_(
                    list(tparams.values()), cfg.clip)
            opt.step()
            snaps.append({p: t_.detach().clone().numpy()
                          for p, t_ in tparams.items()})
        i_epoch += 1  # the reference increments inside _run_one_epoch
        if i_epoch >= cfg.lr_decay_start_epoch:
            sched.step()
    return snaps


def _run_ours(params0, grads, cfg):
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float64), params0)
    tx = create_optimizer(cfg, params, steps_per_epoch=STEPS_PER_EPOCH)
    state = tx.init(params)
    snaps = []
    for g in grads:
        gj = jax.tree_util.tree_map(
            lambda a: jnp.asarray(a, jnp.float64), g)
        updates, state = tx.update(gj, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        snaps.append(dict(_leaves(jax.device_get(params))))
    return snaps


def _compare(ours, ref, tol):
    for t, (o, r) in enumerate(zip(ours, ref)):
        for path in r:
            np.testing.assert_allclose(
                np.asarray(o[path]), r[path], rtol=tol, atol=tol,
                err_msg=f"step {t}, leaf {'/'.join(path)}",
            )


def _base_cfg(**kw):
    cfg = {
        "lr": 1e-4, "lr_decay_start_epoch": 2, "lr_decay_factor": 0.5,
        "weight_decay": 1e-2, "bias_decay": 0.0, "clip": -1.0,
        "beta1": 0.9, "beta2": 0.999, "eps": 1e-8,
        "momentum": 0.9, "beta": 0.999,
    }
    cfg.update(kw)
    return Config(cfg)


def _run_case(cfg):
    rng = np.random.RandomState(0)
    params0 = _make_params(rng)
    grads = _grad_seq(rng, N_EPOCHS * STEPS_PER_EPOCH)
    ref = _run_torch(params0, grads, cfg)
    ours = _run_ours(params0, grads, cfg)
    _compare(ours, ref, tol=1e-11)
    # The dead leaves must be bitwise-frozen at init in BOTH frameworks.
    dead0 = {p: v for p, v in _leaves(params0) if p[0] in DEAD}
    for p, v0 in dead0.items():
        np.testing.assert_array_equal(np.asarray(ours[-1][p]), v0,
                                      err_msg=f"ours dead leaf {p} moved")
        np.testing.assert_array_equal(ref[-1][p], v0,
                                      err_msg=f"torch dead leaf {p} moved")


def test_optimizer_lockstep_adam_clip_decay(torch_f64):
    """torch.optim.Adam + L2-into-grad decay groups + intermittent clipping
    + the mid-run LR-decay gate, 50 steps."""
    _run_case(_base_cfg(optim="adam", clip=5.0))


def test_optimizer_lockstep_reference_adamw(torch_f64):
    """The reference's custom AdamW (raw-sqrt(v) eps, decoupled lr-unscaled
    p*=(1-wd) post-step) with BOTH decay groups nonzero, 50 steps."""
    _run_case(_base_cfg(optim="adamw", bias_decay=1e-3))


def test_optimizer_lockstep_sgd_momentum(torch_f64):
    """torch.optim.SGD + momentum + per-group L2 decay + clipping."""
    _run_case(_base_cfg(optim="sgd", clip=5.0, bias_decay=1e-3))
