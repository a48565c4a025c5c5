"""Child program for the 2-process multi-host test (tests/test_multihost.py).

Each process owns 4 virtual CPU devices; jax.distributed joins them into one
8-device job.  Both processes build the SAME global batch deterministically,
globalize their local window slices, run the full sharded physics training
step over the global (data=4, points=2) mesh, and print the resulting
replicated loss/grad-norm scalars for the parent to compare against a
single-process reference run.
"""

import os
import sys

pid, port = int(sys.argv[1]), sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepphysinet_tpu.parallel.multihost import initialize_distributed, process_shard

initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.parallel.mesh import MeshConfig, make_mesh
from deepphysinet_tpu.parallel.sharding import (
    _batch_shardings_pytree, make_sharded_train_step)
from deepphysinet_tpu.train.optim import build_optimizer
from deepphysinet_tpu.train.train_step import TrainState, create_train_state

from tests.test_train_step import _make_batch
from tests.test_parallel import _cfg
from tests.test_train_step import META, NET

model = PhysicsNet(meta_cfg=META, net_cfg=NET)
cfg = _cfg()
tx = build_optimizer("Adam", lr=1e-3, weight_decay=1e-4)
batch = _make_batch(np.random.RandomState(7), B=8, Nm=32, Ni=16)  # global

mesh = make_mesh(MeshConfig(data=4, points=2), devices=jax.devices())

# globalize: each process contributes its local window rows of the batch
batch_sh = _batch_shardings_pytree(mesh)


def globalize(leaf, sharding):
    local = np.asarray(leaf)

    def cb(idx):
        return local[idx]

    return jax.make_array_from_callback(local.shape, sharding, cb)


gbatch = jax.tree.map(globalize, batch, batch_sh)

# replicated global state: every process creates identical params (same seed)
state_local = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
repl = NamedSharding(mesh, P())
gstate = jax.tree.map(
    lambda leaf: globalize(np.asarray(jax.device_get(leaf)), repl), state_local)

step = make_sharded_train_step(model, tx, cfg, mesh)
gstate, metrics = step(gstate, gbatch, True)
vals = {k: float(np.asarray(metrics[k].addressable_data(0)))
        for k in ("total_loss", "grad_norm", "margin_loss", "inter_total")}

# second step: exercises the updated replicated state across processes
batch2 = _make_batch(np.random.RandomState(8), B=8, Nm=32, Ni=16)
gbatch2 = jax.tree.map(globalize, batch2, batch_sh)
gstate, metrics2 = step(gstate, gbatch2, True)
vals["total_loss_2"] = float(np.asarray(metrics2["total_loss"].addressable_data(0)))

assert list(process_shard(11)) == list(range(pid, 11, 2))
print("MHRESULT", pid, repr(vals))
