"""Optimizer parity vs torch.optim (single and multi-step), and StepLR."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from chromegcn_tpu.train.optim import make_optimizer, set_learning_rate, steplr_lr


def _run_parity(optim_name, lr, torch_factory, steps=3):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(6, 4)).astype(np.float32)
    grads = [rng.normal(size=(6, 4)).astype(np.float32) for _ in range(steps)]

    # torch
    tw = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch_factory([tw])
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    # ours
    tx = make_optimizer(optim_name, lr)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_sgd_matches_torch():
    """SGD(momentum=.9, weight_decay=1e-6) — reference util_methods.py:17."""
    _run_parity(
        "sgd", 0.25,
        lambda ps: torch.optim.SGD(ps, lr=0.25, momentum=0.9, weight_decay=1e-6),
    )


def test_adam_matches_torch():
    """Adam(betas=(0.9,0.98)) — reference util_methods.py:15."""
    _run_parity(
        "adam", 2e-4,
        lambda ps: torch.optim.Adam(ps, lr=2e-4, betas=(0.9, 0.98)),
    )


def test_steplr_schedule():
    # reference: StepLR(step_size=100, gamma=0.5), stepped at epoch start
    assert steplr_lr(0.25, 1, enabled=True) == 0.25
    assert steplr_lr(0.25, 99, enabled=True) == 0.25
    assert steplr_lr(0.25, 100, enabled=True) == 0.125
    assert steplr_lr(0.25, 250, enabled=True) == 0.0625
    assert steplr_lr(0.25, 250, enabled=False) == 0.25


def test_set_learning_rate_applies():
    tx = make_optimizer("sgd", 1.0)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    state = set_learning_rate(state, 0.1)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    # lr 0.1, first step: update = -lr * grad (momentum buffer = grad)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1 * np.ones(3), rtol=1e-6)
