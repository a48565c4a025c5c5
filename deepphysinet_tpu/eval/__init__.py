from deepphysinet_tpu.eval.residuals import evaluate_residuals, residual_field_maps
from deepphysinet_tpu.eval.rmse import evaluate_rmse, evaluate_rmse_fullgrid

__all__ = [
    "evaluate_rmse",
    "evaluate_rmse_fullgrid",
    "evaluate_residuals",
    "residual_field_maps",
]
