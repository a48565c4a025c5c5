"""DeepPhysiNet-TPU: a TPU-native physics-informed neural-field weather framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of flyakon/DeepPhysiNet
(arXiv 2401.04125): a transformer encodes windows of coarse NWP forecast grids into
tokens that hypernetwork-condition six coordinate MLPs mapping continuous (x, y, t)
to surface variables (u10, v10, PSFC, T2, q2, rho), trained jointly on ERA5 point
labels and atmospheric primitive-equation residuals evaluated at collocation points.

TPU-first design decisions (vs. the reference's torch/CUDA patterns):
  * one jitted ``train_step`` holds encode + decode + data loss + PDE residuals +
    grad + clip + update (reference: eager epoch loop, interface_physics.py:433-829)
  * forward-mode ``jax.linearize`` supplies all space-time derivatives with one
    primal trace + 3 tangent passes (reference: 19 reverse-mode autograd.grad calls
    per batch, interface_physics.py:90-95)
  * Pallas fused attention for the token encoder (reference: cuBLAS einsum,
    model/attn.py:55-63)
  * data parallelism via jax.sharding.Mesh + psum (reference: DDP/NCCL,
    interface_physics.py:848-1404)
"""

from deepphysinet_tpu.version import __version__

__all__ = ["__version__"]
