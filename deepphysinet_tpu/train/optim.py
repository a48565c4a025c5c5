"""Optimizer registry on optax, equivalent of utils/optims/builder.py:8-16.

Semantics match the torch optimizers the reference builds:
* ``Adam`` with weight_decay adds ``wd * param`` to the gradient *before* the
  moment updates (torch's coupled L2, not AdamW) -> ``add_decayed_weights``
  placed ahead of ``scale_by_adam``.
* The learning rate is a mutable hyperparameter (``inject_hyperparams``) so the
  trainer can step epoch-based schedules exactly like torch's
  ``lr_scheduler.step()`` without re-jitting the update.
"""

from __future__ import annotations

import optax

from deepphysinet_tpu.registry import OPTIMIZERS


@OPTIMIZERS.register("Adam")
def adam(lr: float = 1e-3, weight_decay: float = 0.0, betas=(0.9, 0.999), eps: float = 1e-8, **_):
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
        steps.append(optax.scale(-1.0 * learning_rate))
        return optax.chain(*steps)

    return optax.inject_hyperparams(make)(learning_rate=lr)


@OPTIMIZERS.register("SGD")
def sgd(lr: float = 1e-3, momentum: float = 0.0, weight_decay: float = 0.0, **_):
    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        if momentum:
            steps.append(optax.trace(decay=momentum, nesterov=False))
        steps.append(optax.scale(-1.0 * learning_rate))
        return optax.chain(*steps)

    return optax.inject_hyperparams(make)(learning_rate=lr)


def build_optimizer(name: str = "Adam", **kwargs):
    kwargs.pop("params", None)  # reference passes torch param groups; not needed here
    return OPTIMIZERS.build(name, **kwargs)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place (trainer epoch boundary).

    Cast to a float32 HOST scalar so the opt_state pytree's leaf dtype stays
    stable (no retrace) and the assignment works in multi-process programs:
    a committed local device scalar inside an otherwise-global opt_state tree
    would be rejected by the sharded jit, while an identical numpy value on
    every process is auto-promoted to a replicated global array.
    """
    import numpy as np

    opt_state.hyperparams["learning_rate"] = np.asarray(lr, np.float32)
    return opt_state
