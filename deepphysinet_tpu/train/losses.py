"""Loss registry, equivalent of losses/builder.py:15-20 + losses/weights_loss.py.

Losses are pure functions ``loss(pred, target) -> scalar`` (mean reduction,
matching the torch modules' defaults).  Reductions accumulate in float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deepphysinet_tpu.registry import LOSSES


def _f32(x):
    return x.astype(jnp.float32)


@LOSSES.register("MSELoss")
def mse_loss(**_):
    def loss(pred, target):
        d = _f32(pred) - _f32(target)
        return jnp.mean(d * d)

    return loss


@LOSSES.register("L1Loss")
def l1_loss(**_):
    def loss(pred, target):
        return jnp.mean(jnp.abs(_f32(pred) - _f32(target)))

    return loss


@LOSSES.register("WeightSmoothL1Loss")
def weight_smooth_l1_loss(beta: float = 0.1, **_):
    """Mean SmoothL1 with configurable beta (losses/weights_loss.py:12-20)."""

    def loss(pred, target):
        d = jnp.abs(_f32(pred) - _f32(target))
        out = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        return jnp.mean(out)

    return loss


@LOSSES.register("SmoothL1Loss")
def smooth_l1_loss(beta: float = 1.0, **_):
    return weight_smooth_l1_loss(beta=beta)


@LOSSES.register("CrossEntropyLoss")
def cross_entropy_loss(**_):
    def loss(logits, labels):
        logp = jax.nn.log_softmax(_f32(logits), axis=-1)
        if labels.ndim == logits.ndim - 1:  # integer class labels
            nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
        else:
            nll = -jnp.sum(_f32(labels) * logp, axis=-1)
        return jnp.mean(nll)

    return loss


def build_loss(name: str = "CrossEntropyLoss", **kwargs):
    return LOSSES.build(name, **kwargs)
