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
    # atomic writes: saves run on a background thread concurrent with training
    # (and inside the preemption grace window) -- a hard kill mid-write must
    # never leave a truncated pickle at either destination, so each file is
    # written to a same-directory temp and os.replace()'d into place
    ckpt_file = os.path.join(checkpoint_path, f"{prefix}_{epoch}.ckpt")
    tmp = ckpt_file + ".tmp"
    with open(tmp, "wb") as fp:
        pickle.dump(payload, fp, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, ckpt_file)
    latest = os.path.join(checkpoint_path, f"{prefix}_latest.ckpt")
    shutil.copy(ckpt_file, latest + ".tmp")
    os.replace(latest + ".tmp", latest)
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
    try:
        with open(model_file, "rb") as fp:
            state_dict = pickle.load(fp)
    except Exception as e:  # corrupt file (e.g. pre-atomic-write legacy crash)
        fallback = _newest_epoch_ckpt(os.path.dirname(model_file), prefix,
                                      exclude=model_file)
        if fallback is None:
            raise
        print(f"warning:{model_file} is corrupt ({e!r}); "
              f"falling back to {fallback}")
        with open(fallback, "rb") as fp:
            state_dict = pickle.load(fp)
    global_step = state_dict.pop("gobal_step", 0)
    epoch = state_dict.pop("epoch", -1)
    return state_dict, epoch + 1, global_step


def _newest_epoch_ckpt(ckpt_dir: str, prefix: str, exclude: str = ""):
    """Highest-epoch ``{prefix}_{N}.ckpt`` in ``ckpt_dir`` (None if none)."""
    import re

    best, best_epoch = None, -1
    if not os.path.isdir(ckpt_dir):
        return None
    pat = re.compile(rf"^{re.escape(prefix)}_(\d+)\.ckpt$")
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        path = os.path.join(ckpt_dir, name)
        if m and path != exclude and int(m.group(1)) > best_epoch:
            best, best_epoch = path, int(m.group(1))
    return best


def gather_key_from_state(key: str, state_dict: dict, default):
    """interface_physics.py:1529-1536."""
    if key in state_dict:
        print(f"find {key}, set {key} to {state_dict[key]}")
        return state_dict[key]
    print(f"cannot find {key}, use it as default")
    return default


def save_checkpoint(
    checkpoint_path: str,
    epoch: int,
    global_step: int,
    params,
    opt_state=None,
    prefix: str = "physics",
    backend: str = "pickle",
    **metadata,
) -> str:
    """Backend-dispatched save: 'pickle' (default) or 'orbax'
    (train_cfg.tpu.ckpt_backend)."""
    if backend == "orbax":
        return save_model_orbax(checkpoint_path, epoch, global_step, params,
                                opt_state, prefix, **metadata)
    if backend != "pickle":
        raise ValueError(f"unknown ckpt_backend {backend!r} (pickle|orbax)")
    return save_model(checkpoint_path, epoch, global_step, params, opt_state,
                      prefix, **metadata)


class AsyncCheckpointer:
    """Epoch-boundary saves without stalling the training loop.

    A synchronous save fetches params + optimizer moments through the
    device->host link before writing (~10 s through a tunneled backend --
    measured to cut soak segments from ~125 to ~9 fps).  Here the caller
    thread only snapshots the trees as NEW device buffers (``jnp.copy``, so
    the train step's buffer donation cannot invalidate them); a worker
    thread (utils/async_worker.py) pays the fetch + serialization.  At most
    ONE snapshot exists at a time: ``submit`` drains any in-flight save
    BEFORE copying, so saves requested faster than they complete degrade to
    synchronous rather than stacking snapshots on the device.  ``close()``
    drains pending saves and re-raises any worker error; preemption/final
    synchronous saves should catch that error and save anyway."""

    def __init__(self):
        from deepphysinet_tpu.utils.async_worker import AsyncWorker

        self._w = AsyncWorker(maxsize=1)

    def submit(self, checkpoint_path: str, epoch: int, global_step: int,
               params, opt_state=None, prefix: str = "physics",
               backend: str = "pickle", **metadata) -> None:
        self._w.wait()  # <=1 snapshot alive: prior save's buffers released
        import jax.numpy as jnp

        params_c = jax.tree.map(jnp.copy, params)
        opt_c = (jax.tree.map(jnp.copy, opt_state)
                 if opt_state is not None else None)
        self._w.submit(lambda: save_checkpoint(
            checkpoint_path, epoch, global_step, params_c, opt_c,
            prefix=prefix, backend=backend, **metadata))

    def wait(self) -> None:
        """Block until every submitted save is durably on disk."""
        self._w.wait()

    def close(self) -> None:
        self._w.close()

    def close_quietly(self) -> None:
        self._w.close_quietly()


def load_checkpoint(
    checkpoint_path: str,
    current_epoch: Optional[int] = None,
    prefix: str = "physics",
    backend: str = "pickle",
    target=None,
):
    """Backend-dispatched load; falls back to the other backend's layout so a
    run can switch ckpt_backend mid-training and still resume."""
    if backend not in ("pickle", "orbax"):
        raise ValueError(f"unknown ckpt_backend {backend!r} (pickle|orbax)")
    if backend == "orbax":
        out = load_model_orbax(checkpoint_path, current_epoch, prefix, target)
        if out[0] is not None:
            return out
        return load_model(checkpoint_path, current_epoch, prefix)
    out = load_model(checkpoint_path, current_epoch, prefix)
    if out[0] is None and os.path.isdir(checkpoint_path):
        try:
            return load_model_orbax(checkpoint_path, current_epoch, prefix, target)
        except Exception:
            pass
    return out


# ---- orbax backend (optional; for sharded/multi-host checkpoints) ----

def save_model_orbax(
    checkpoint_path: str,
    epoch: int,
    global_step: int,
    params,
    opt_state=None,
    prefix: str = "physics",
    **metadata,
) -> str:
    """Orbax StandardCheckpointer backend: the pytree goes through orbax
    (sharding-aware, async-capable, multi-host-safe); the metadata bundle
    rides in a pickle sidecar inside the step directory."""
    import orbax.checkpoint as ocp

    root = os.path.abspath(checkpoint_path)
    step_dir = os.path.join(root, f"{prefix}_{epoch}_orbax")
    # crash-atomicity, same contract as the pickle backend above: saves run
    # inside the preemption grace window, so a hard kill mid-save must leave
    # either the previous complete checkpoint or the new one — never a
    # half-written step dir that latest points at, and never no latest at
    # all.  (1) the full step (state + meta sidecar) is assembled in a .tmp
    # dir and swapped in afterwards; (2) the latest pointer is updated via
    # symlink-to-tmp + os.replace (atomic rename) instead of remove+symlink.
    tmp_dir = step_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    ckptr = ocp.StandardCheckpointer()
    tree = {"model": params}
    if opt_state is not None:
        tree["opt_state"] = opt_state
    ckptr.save(os.path.join(tmp_dir, "state"), tree)
    ckptr.wait_until_finished()
    side = {"epoch": epoch, "gobal_step": global_step}
    side.update(metadata)
    with open(os.path.join(tmp_dir, "meta.pickle"), "wb") as fp:
        pickle.dump(side, fp)
    if os.path.exists(step_dir):  # re-save of the same epoch: swap, then
        old_dir = step_dir + ".old"  # drop the displaced copy
        if os.path.exists(old_dir):
            shutil.rmtree(old_dir)
        os.rename(step_dir, old_dir)
        os.rename(tmp_dir, step_dir)
        shutil.rmtree(old_dir)
    else:
        os.rename(tmp_dir, step_dir)
    latest = os.path.join(root, f"{prefix}_latest_orbax")
    if os.path.isdir(latest) and not os.path.islink(latest):
        shutil.rmtree(latest)  # legacy real-directory pointer
    tmp_link = latest + ".tmp"
    if os.path.islink(tmp_link) or os.path.exists(tmp_link):
        os.remove(tmp_link)
    os.symlink(step_dir, tmp_link)
    os.replace(tmp_link, latest)
    return step_dir


def load_model_orbax(
    checkpoint_path: str,
    current_epoch: Optional[int] = None,
    prefix: str = "physics",
    target=None,
):
    """Counterpart loader; ``target`` (a matching pytree of abstract/real
    arrays) restores with correct shardings when given."""
    import orbax.checkpoint as ocp

    root = os.path.abspath(checkpoint_path)
    if current_epoch is None:
        step_dir = os.path.join(root, f"{prefix}_latest_orbax")
    else:
        step_dir = os.path.join(root, f"{prefix}_{current_epoch}_orbax")
    if not os.path.exists(step_dir):
        print(f"warning:{step_dir} does not exist!")
        return None, 0, 0
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        tree = ckptr.restore(os.path.join(step_dir, "state"), target=target)
    else:
        tree = ckptr.restore(os.path.join(step_dir, "state"))
    with open(os.path.join(step_dir, "meta.pickle"), "rb") as fp:
        side = pickle.load(fp)
    global_step = side.pop("gobal_step", 0)
    epoch = side.pop("epoch", -1)
    state_dict = dict(tree)
    state_dict.update(side)
    return state_dict, epoch + 1, global_step
