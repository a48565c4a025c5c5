"""CLI: export a checkpoint trained here to the reference torch format.

  python tools/export_torch_checkpoint.py --config_file configs/X.py \
      [--checkpoint PATH] --output physics_latest.pth

The inverse of import_torch_checkpoint.py: loads a ``physics_*`` checkpoint
(pickle or orbax), converts the flax tree to a reference-named torch
state_dict (train/torch_import.py::export_torch_state_dict), and writes a
``torch.save`` bundle the reference loads with ``strict=True``
(reference interface_physics.py:74-88) -- for comparing models in the
reference's own tooling or handing a trained model back to a torch user.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("DPN_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["DPN_PLATFORM"])


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="file or dir (default: config checkpoints_path)")
    parser.add_argument("--output", type=str, required=True,
                        help="output .pth path")
    args = parser.parse_args()

    import torch

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.interface.build import builder_models
    from deepphysinet_tpu.train import checkpoint as ckpt
    from deepphysinet_tpu.train.torch_import import export_torch_state_dict

    cfg = Config.fromfile(args.config_file)
    interface = builder_models(**cfg["config"])
    ckpt_path = args.checkpoint or interface.train_cfg["checkpoints"]["checkpoints_path"]
    state_dict, epoch, step = ckpt.load_checkpoint(
        ckpt_path, prefix="physics", backend=interface.ckpt_backend)
    if state_dict is None:
        raise SystemExit(f"no checkpoint at {ckpt_path}")

    sd = export_torch_state_dict(state_dict["model"])
    bundle = {"model": {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
              "epoch": epoch - 1, "gobal_step": step}
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    torch.save(bundle, args.output)
    print(json.dumps({"output": os.path.abspath(args.output),
                      "epoch": epoch - 1, "gobal_step": step,
                      "n_tensors": len(sd)}))


if __name__ == "__main__":
    main()
