"""CLI entry point: ``python train.py --config_file configs/X.py``.

Mirrors the reference CLI (train.py:15-48): load the Python-dict config,
snapshot the source tree next to the checkpoints for provenance, build the
interface by name, run training.  Extra flags select the mesh-parallel path
and cap steps for smoke runs.
"""

from __future__ import annotations

import argparse
import os
import zipfile

# DPN_PLATFORM=cpu forces the JAX backend (the axon sitecustomize pins
# JAX_PLATFORMS, so plain env vars cannot override it)
if os.environ.get("DPN_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["DPN_PLATFORM"])


def zip_codes(src_dir: str, dst_file: str) -> None:
    """Source snapshot into the checkpoint dir (reference train.py:45-46)."""
    with zipfile.ZipFile(dst_file, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(src_dir):
            dirs[:] = [d for d in dirs if d not in
                       (".git", "__pycache__", "checkpoints", "log", "results")]
            for f in files:
                if f.endswith((".py", ".md")):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, src_dir))


def apply_overrides(config: dict, items) -> None:
    """Apply ``--set key.path=value`` CLI overrides onto ``config``.

    Values parse as Python literals when possible (else raw strings).  A typo
    guard wraps ``update_params`` (reference semantics: it silently CREATES
    missing keys, so a misspelled --set would be accepted with no effect on
    the run): refuse to clobber a non-dict intermediate node, and warn loudly
    when the leaf is new — which IS legitimate for tpu.* keys that have
    defaults and are absent from the config file.
    """
    import ast

    from deepphysinet_tpu.config.config import update_params

    kv = {}
    for item in items:
        key, _, raw = item.partition("=")
        try:
            kv[key] = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            kv[key] = raw
    for key in kv:
        node = config
        parts = key.split(".")
        for i, p in enumerate(parts[:-1]):
            if not isinstance(node, dict) or p not in node:
                node = None
                break
            if not isinstance(node[p], dict):
                raise SystemExit(
                    f"--set {key}: config.{'.'.join(parts[:i + 1])} "
                    f"is not a dict; refusing to clobber it")
            node = node[p]
        if node is None or parts[-1] not in node:
            print(f"warning: --set {key} creates a NEW config key "
                  f"(not present in the config file); check the "
                  f"spelling if you meant to override an existing one")
    update_params(config, kv)


def main() -> None:
    parser = argparse.ArgumentParser("DeepPhysiNet-TPU trainer")
    parser.add_argument("--config_file", type=str,
                        default="configs/DeepPhysiNet_NCEP_cfg.py")
    parser.add_argument("--checkpoints_path", type=str, default=None)
    parser.add_argument("--log_path", type=str, default=None)
    parser.add_argument("--dist", action="store_true",
                        help="mesh data-parallel over all visible devices")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--mode", type=str, default=None,
                        choices=[None, "train", "test", "inference"], nargs="?")
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="dotted config override applied to config.*, e.g. "
                             "--set train_cfg.tpu.device_valid=False "
                             "(values parsed as python literals when possible)")
    args = parser.parse_args()

    if args.dist:
        # multi-host bring-up must precede the first jax backend touch
        # (building the interface reads jax.default_backend); no-op unless
        # the launcher env marks this a multi-process job
        from deepphysinet_tpu.parallel.multihost import initialize_distributed

        initialize_distributed()

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.interface.build import builder_models

    cfg = Config.fromfile(args.config_file)
    if args.overrides:
        apply_overrides(cfg["config"], args.overrides)
    mode = args.mode or cfg.get("mode", "train")
    models = builder_models(**cfg["config"])

    if mode == "train":
        import jax

        checkpoint_path = args.checkpoints_path or \
            cfg["config"]["train_cfg"]["checkpoints"]["checkpoints_path"]
        os.makedirs(checkpoint_path, exist_ok=True)
        if jax.process_index() == 0:
            zip_codes(os.path.dirname(os.path.abspath(__file__)),
                      os.path.join(checkpoint_path, "codes.zip"))
        run = models.run_train_interface_dist if args.dist else models.run_train_interface
        run(checkpoint_path=args.checkpoints_path, log_path=args.log_path,
            max_steps=args.max_steps)
    elif mode == "test":
        import json

        out = models.run_test_interface(checkpoint_path=args.checkpoints_path)
        print(json.dumps(out))
    else:
        models.run_inference_interface(checkpoint_path=args.checkpoints_path)


if __name__ == "__main__":
    main()
