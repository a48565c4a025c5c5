from deepphysinet_tpu.inference.runner import predict_grid, predict_points, run_inference

__all__ = ["predict_grid", "predict_points", "run_inference"]
