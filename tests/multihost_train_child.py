"""Child program for the 2-process END-TO-END trainer test.

Each process owns 4 virtual CPU devices; jax.distributed joins them into one
8-device job.  Unlike multihost_child.py (which hand-builds one sharded step),
this drives the REAL production entry point --
``InterfacePhysics.run_train_interface_dist`` -- on the synthetic tree in
device-sampling mode over a global (data=2, points=4) mesh: each process
loads its stride of the window order (PrefetchLoader shard_id/num_shards),
contributes its local cube rows via the globalizing put
(parallel/mesh.py:put_sharded), and rank 0 owns logging + checkpoints.

With one window per data slot the strided loader maps window k of the global
shuffle to global batch row k exactly as a single process would, and the
device sampler's per-window keys come from the same global key split -- so
the training losses must MATCH the single-process run bit-for-bit up to
reduction order (asserted by the parent, tests/test_multihost.py).
"""

import os
import sys

pid, port, data_root, run_root = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4])
mode = sys.argv[5] if len(sys.argv) > 5 else "device"  # device | host | pool
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["DPN_SMOKE_DATA"] = data_root

import jax

jax.config.update("jax_platforms", "cpu")

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)

from deepphysinet_tpu.parallel.multihost import initialize_distributed

initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

from deepphysinet_tpu.config import Config
from deepphysinet_tpu.interface.build import builder_models

cfg = Config.fromfile(os.path.join(root, "configs", "smoke_cpu_cfg.py"))["config"]
tc = cfg["train_cfg"]
tc["tpu"]["sample_mode"] = "device" if mode == "pool" else mode
if mode == "pool":
    tc["tpu"]["ds_sampler"] = "pool"
tc["tpu"]["mesh"] = dict(data=2, points=4)
tc["num_epoch"] = 4
tc["checkpoints"]["checkpoints_path"] = os.path.join(run_root, "ckpt")
tc["log"]["log_path"] = os.path.join(run_root, f"log_p{pid}")
# log at steps 1 and 3 (the loop condition is `step % log_step == 1`,
# plus the final max_steps log)
tc["log"]["log_step"] = 2
if mode == "device":
    # >= mesh data-axis windows so the COLLECTIVE multi-process validation
    # path runs (each rank contributes one window to the sharded eval)
    tc["valid_data"]["start_time"] = tc["train_data"]["start_time"]
    tc["valid_data"]["end_time"] = tc["train_data"]["end_time"]
if mode == "host":
    # host sampling: each process assembles its own point batches; smaller
    # point counts keep the 2-process CPU run fast.  Loss parity with a
    # single process is NOT expected here (the per-item sampling RNG is
    # process-stateful); the parent checks wiring/gating/convergence only.
    for split in ("train_data", "valid_data"):
        tc[split]["label_batch_size"] = 256
        tc[split]["batch_size_inter"] = 64

models = builder_models(**cfg)
models.run_train_interface_dist(max_steps=3)
print("MHTRAIN_DONE", pid)
