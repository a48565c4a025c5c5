"""Real multi-process (multi-host-shaped) training test.

Two OS processes, 4 virtual CPU devices each, joined by jax.distributed into
one 8-device job (the CPU stand-in for two TPU hosts on one slice): the full
sharded physics train step runs over the global (data=4, points=2) mesh with
each process feeding only its local window shards, and the resulting losses
must (a) agree across processes and (b) match the same step computed by one
process owning all 8 devices.  Upgrades parallel/multihost.py from
unit-level-only coverage (round-1 VERDICT row 28).
"""

import ast
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_training_step():
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(here)
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(here, "multihost_child.py"), str(i), port],
            cwd=root, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=540)
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        outs.append(out)

    results = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MHRESULT")][0]
        results.append(ast.literal_eval(line.split(" ", 2)[2]))

    # both processes observe identical replicated scalars
    for k in results[0]:
        np.testing.assert_allclose(results[0][k], results[1][k], rtol=1e-6,
                                   err_msg=k)

    # single-process 8-device reference (this test process has the 8-CPU mesh)
    import jax
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    from deepphysinet_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch
    from deepphysinet_tpu.parallel.sharding import make_sharded_train_step
    from deepphysinet_tpu.train.optim import build_optimizer
    from deepphysinet_tpu.train.train_step import create_train_state
    from tests.test_parallel import _cfg
    from tests.test_train_step import META, NET, _make_batch

    model = PhysicsNet(meta_cfg=META, net_cfg=NET)
    tx = build_optimizer("Adam", lr=1e-3, weight_decay=1e-4)
    batch = _make_batch(np.random.RandomState(7), B=8, Nm=32, Ni=16)
    mesh = make_mesh(MeshConfig(data=4, points=2))
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = make_sharded_train_step(model, tx, _cfg(), mesh)
    state, m = step(state, shard_batch(batch, mesh), True)
    for k in ("total_loss", "grad_norm", "margin_loss", "inter_total"):
        np.testing.assert_allclose(results[0][k], float(m[k]), rtol=1e-4,
                                   err_msg=k)
    batch2 = _make_batch(np.random.RandomState(8), B=8, Nm=32, Ni=16)
    state, m2 = step(state, shard_batch(batch2, mesh), True)
    np.testing.assert_allclose(results[0]["total_loss_2"],
                               float(m2["total_loss"]), rtol=1e-4)
