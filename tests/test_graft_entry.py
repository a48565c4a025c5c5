"""Guard the driver contract in __graft_entry__.py.

The driver compile-checks ``entry()`` single-chip and executes
``dryrun_multichip(n)`` on an n-device virtual CPU platform; this test keeps
both importable and runnable so a refactor can't silently break the gate
(round-1 MULTICHIP failure mode).
"""

import subprocess
import sys

import jax
import pytest


def test_entry_traces_and_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    assert out.shape == (args[1].shape[0], 6)  # six obs heads concatenated


def test_dryrun_multichip_inprocess():
    # conftest already forces the 8-device CPU platform, so this exercises
    # the "enough devices, run here" path end to end.
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_subprocess_bootstrap():
    # The latched-backend path: parent pins a 1-device backend, the entry
    # point must re-exec a clean child with the virtual 8-CPU platform.
    code = (
        "import os; os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=1';"
        "import jax; jax.config.update('jax_platforms','cpu');"
        "assert len(jax.devices()) == 1;"
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    import __graft_entry__ as ge
    import os

    env = dict(os.environ)
    env.pop("_DPN_DRYRUN_CHILD", None)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.abspath(ge.__file__)),
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout
