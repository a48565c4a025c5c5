from deepphysinet_tpu.physics.constants import PhysicalConstants
from deepphysinet_tpu.physics.equations import (
    continuity_residual,
    energy_residual,
    gas_residual,
    momentum_u_residual,
    momentum_v_residual,
    saturation_specific_humidity,
    vapor_residual,
)
from deepphysinet_tpu.physics.engine import FieldDerivatives, pde_residual_losses

__all__ = [
    "PhysicalConstants",
    "momentum_u_residual",
    "momentum_v_residual",
    "continuity_residual",
    "energy_residual",
    "vapor_residual",
    "gas_residual",
    "saturation_specific_humidity",
    "FieldDerivatives",
    "pde_residual_losses",
]
