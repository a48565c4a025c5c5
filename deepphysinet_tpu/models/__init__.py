from deepphysinet_tpu.models.builder import build_model
from deepphysinet_tpu.models.transformer_net import TransformerNet
from deepphysinet_tpu.models.variable_net import VariableNet
from deepphysinet_tpu.models.physics_net import PhysicsNet, VARIABLE_ORDER

__all__ = ["build_model", "TransformerNet", "VariableNet", "PhysicsNet", "VARIABLE_ORDER"]
