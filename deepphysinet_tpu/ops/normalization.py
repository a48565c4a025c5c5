"""Variable normalization / inverse normalization.

Reimplements the reference's normalization semantics exactly:

* forward ``norm_data`` (dataset/physics_dataset.py:270-290):
  - ``mean_norm``: (x - mean) / std
  - ``min_max`` with 2 factors: (x - min) / (max - min)
  - ``min_max`` with 1 factor:  x / factor
  - ``min_max`` with 3 factors: sqrt(x - min), then (.. - a_min) / (a_max - a_min)
* inverse ``inverse_single`` (interface/interface_physics.py:234-254), including
  the optional clip to physical bounds.  Clipping participates in autodiff with
  zero gradient outside the bounds, same as ``torch.clip`` -- this matters
  because PDE residual derivatives flow through the inverse normalization.

Norm specs are jit-friendly: plain float tuples captured as compile-time
constants (they come from the config and never change during a run).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NormSpec:
    """One variable's normalization config (configs/DeepPhysiNet_NCEP_cfg.py:36-83)."""

    name: str
    norm_type: str = "mean_norm"
    # For mean_norm: (mean, std); entries may be vectors (pressure-level stacks).
    norm_factor: Tuple = (0.0, 1.0)
    use_norm: bool = True
    bound: Optional[Tuple[float, float]] = None

    def factors(self) -> Tuple[np.ndarray, ...]:
        return tuple(np.asarray(f, dtype=np.float32) for f in np.atleast_1d(
            np.asarray(self.norm_factor, dtype=object)
        ))


def _as_arrays(norm_factor) -> Tuple[np.ndarray, ...]:
    if isinstance(norm_factor, (int, float)):
        return (np.float32(norm_factor),)
    return tuple(np.asarray(f, dtype=np.float32) for f in norm_factor)


def normalize(data: jnp.ndarray, spec: NormSpec) -> jnp.ndarray:
    """Forward normalization, matching dataset/physics_dataset.py:270-290."""
    if not spec.use_norm:
        return data
    if spec.norm_type.lower() == "min_max":
        fs = _as_arrays(spec.norm_factor)
        if len(fs) == 2:
            lo, hi = fs
            return (data - lo) / (hi - lo)
        if len(fs) == 1:
            return data / fs[0]
        if len(fs) == 3:
            a_min, a_max, lo = fs
            return (jnp.sqrt(data - lo) - a_min) / (a_max - a_min)
        raise NotImplementedError(f"min_max with {len(fs)} factors")
    mean, std = _as_arrays(spec.norm_factor)
    return (data - mean) / std


def inverse_normalize(
    data: jnp.ndarray, spec: NormSpec, with_clip: bool = False
) -> jnp.ndarray:
    """Inverse normalization, matching interface/interface_physics.py:234-254."""
    if not spec.use_norm:
        return data
    if spec.norm_type.lower() == "min_max":
        fs = _as_arrays(spec.norm_factor)
        if len(fs) == 2:
            lo, hi = fs
            data = data * (hi - lo) + lo
        else:
            a_min, a_max, lo = fs
            data = data * (a_max - a_min) + a_min
            data = data**2 + lo
    else:
        mean, std = _as_arrays(spec.norm_factor)
        data = data * std + mean
    if with_clip and spec.bound is not None:
        data = jnp.clip(data, spec.bound[0], spec.bound[1])
    return data


def norm_specs_from_cfg(variable_cfg: Dict[str, dict]) -> Dict[str, NormSpec]:
    """Hydrate NormSpecs from a reference-schema variable_cfg / obs_norm_cfg dict."""

    def _freeze(v):
        if isinstance(v, (list, tuple)):
            return tuple(_freeze(x) for x in v)
        return v

    out = {}
    for key, sub in variable_cfg.items():
        out[key] = NormSpec(
            name=sub.get("name", key),
            norm_type=sub.get("norm_type", "mean_norm"),
            norm_factor=_freeze(sub.get("norm_factor", (0.0, 1.0))),
            use_norm=sub.get("use_norm", True),
            bound=_freeze(sub.get("bound")) if sub.get("bound") is not None else None,
        )
    return out


# Order in which observation variables are stacked everywhere
# (dataset/physics_dataset.py:31 ``obs_name_order``).
OBS_NAME_ORDER = ("u10", "v10", "pres", "t2", "q2", "rio")
