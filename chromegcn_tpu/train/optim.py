"""Optimizer and LR-schedule factories (torch-parity).

Reference: utils/util_methods.py:11-19 —
- Adam(betas=(0.9, 0.98), eps=1e-8, lr)
- SGD(lr, momentum=0.9, weight_decay=1e-6)  [L2 added to grad before momentum]
and the per-epoch StepLR(step_size=100, gamma=0.5) gated on ``lr_decay2 > 0``
(reference: main.py:86, runner.py:33).

Documented quirk preserved at the config layer: the reference parses
``-optim2``/``-lr2`` for the GCN stage but ``get_optimizer`` only ever reads
``opt.optim``/``opt.lr`` — our config mirrors the names but routes the ones
that are actually used.
"""

from __future__ import annotations

import optax


def make_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    """Build the reference's optimizer under a runtime-settable learning rate.

    Returns an ``optax.inject_hyperparams``-wrapped transform whose
    ``state.hyperparams['learning_rate']`` the runner updates per epoch to
    implement StepLR.
    """
    name = name.lower()
    if name == "adam":

        @optax.inject_hyperparams
        def tx(learning_rate):
            return optax.adam(learning_rate, b1=0.9, b2=0.98, eps=1e-8)

    elif name == "sgd":

        @optax.inject_hyperparams
        def tx(learning_rate):
            # torch SGD(weight_decay): grad += wd * param, then momentum.
            return optax.chain(
                optax.add_decayed_weights(1e-6),
                optax.trace(decay=0.9, nesterov=False),
                optax.scale_by_learning_rate(learning_rate),
            )

    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return tx(learning_rate=lr)


def steplr_lr(base_lr: float, epoch: int, enabled: bool,
              step_size: int = 100, gamma: float = 0.5) -> float:
    """StepLR as stepped once per epoch at epoch start (reference runner.py:33:
    ``scheduler.step()`` before training, so epoch e (1-based) uses
    gamma^(e // step_size))."""
    if not enabled:
        return base_lr
    return base_lr * (gamma ** (epoch // step_size))


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning-rate hyperparameter in-place (pytree-wise)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state
