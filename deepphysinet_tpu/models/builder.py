"""Model registry + builder, equivalent of model/builder.py:12-21."""

from __future__ import annotations

from deepphysinet_tpu.registry import MODELS


def build_model(name: str, **kwargs):
    return MODELS.build(name, **kwargs)
