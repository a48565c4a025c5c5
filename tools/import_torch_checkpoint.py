"""CLI: convert a reference torch checkpoint into this framework's format.

  python tools/import_torch_checkpoint.py --torch_checkpoint physics_latest.pth \
      --config_file configs/DeepPhysiNet_NCEP_cfg.py [--output DIR] [--backend pickle|orbax]

Reads a reference ``physics_{epoch}.pth`` bundle (torch state_dict + epoch +
gobal_step, reference interface_physics.py:53-62), converts the model weights
to the flax parameter tree (train/torch_import.py), validates every leaf
shape against a freshly-initialized model from the config, and writes a
resumable checkpoint (physics_{epoch}.ckpt + physics_latest) to the config's
checkpoint directory.  Optimizer state starts fresh (torch Adam moments are
not portable); training resumes at the imported epoch/step.
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
    parser.add_argument("--torch_checkpoint", type=str, required=True)
    parser.add_argument("--config_file", type=str, required=True)
    parser.add_argument("--output", type=str, default=None,
                        help="checkpoint dir (default: config checkpoints_path)")
    parser.add_argument("--backend", type=str, default=None,
                        choices=["pickle", "orbax"],
                        help="default: config tpu.ckpt_backend or pickle")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.interface.build import builder_models
    from deepphysinet_tpu.train import checkpoint as ckpt
    from deepphysinet_tpu.train.torch_import import import_torch_checkpoint

    cfg = Config.fromfile(args.config_file)
    interface = builder_models(**cfg["config"])
    variables, epoch, step = import_torch_checkpoint(args.torch_checkpoint)

    # validate every leaf against a freshly-initialized model at config dims
    meta = interface.physics_net.meta_cfg
    net = interface.physics_net.net_cfg
    enc_in, in_ch = int(meta["enc_in"]), int(net["in_channels"])
    n_tokens = int(net.get("token_num", 4))  # encode() enforces this length
    ref = interface.physics_net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n_tokens, enc_in), jnp.float32),
        jnp.zeros((2, in_ch), jnp.float32), jnp.zeros((2, 6), jnp.float32),
        jnp.asarray([[0.1]], jnp.float32))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: x.shape, variables)
    if ref_shapes != got_shapes:
        flat_ref = jax.tree_util.tree_flatten_with_path(ref_shapes)[0]
        flat_got = dict(jax.tree_util.tree_flatten_with_path(got_shapes)[0])
        for path, shape in flat_ref:
            name = "/".join(str(k.key) for k in path)
            other = flat_got.get(path)
            if other != shape:
                print(f"shape mismatch at {name}: config wants {shape}, "
                      f"checkpoint has {other}", file=sys.stderr)
        raise SystemExit("torch checkpoint does not match the config's model dims")

    out_dir = args.output or interface.train_cfg["checkpoints"]["checkpoints_path"]
    backend = args.backend or getattr(interface, "ckpt_backend", "pickle")
    path = ckpt.save_checkpoint(out_dir, max(epoch, 0), step, variables,
                                opt_state=None, backend=backend,
                                imported_from=os.path.abspath(args.torch_checkpoint))
    print(json.dumps({"checkpoint": path, "epoch": epoch, "gobal_step": step,
                      "backend": backend}))


if __name__ == "__main__":
    main()
