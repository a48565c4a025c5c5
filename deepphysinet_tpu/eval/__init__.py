from deepphysinet_tpu.eval.rmse import evaluate_rmse

__all__ = ["evaluate_rmse"]
