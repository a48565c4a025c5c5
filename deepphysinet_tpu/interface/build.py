"""Interface registry, equivalent of interface/build.py:11-20."""

from __future__ import annotations

from deepphysinet_tpu.registry import INTERFACES


def builder_models(name: str = "InterfacePhysics", **kwargs):
    # import for registration side effect
    from deepphysinet_tpu.interface import interface_physics  # noqa: F401

    return INTERFACES.build(name, **kwargs)
