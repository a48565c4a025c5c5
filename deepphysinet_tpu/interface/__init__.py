from deepphysinet_tpu.interface.build import builder_models
from deepphysinet_tpu.interface.interface_physics import InterfacePhysics

__all__ = ["builder_models", "InterfacePhysics"]
