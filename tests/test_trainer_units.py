"""Trainer-internals unit tests: metric packing, batch conversion, checkpoints."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from deepphysinet_tpu.interface.interface_physics import InterfacePhysics
from deepphysinet_tpu.train import checkpoint as ckpt


MINI_CFG = dict(
    meta_cfg=dict(enc_in=8, c_out=8, d_model=8, n_heads=2, e_layers=1, d_ff=8,
                  learnable_token_num=2),
    net_cfg=dict(in_channels=192, hidden_channels=8, learnable_token_num=4),
    obs_norm_cfg={}, variable_cfg={},
    train_cfg=dict(img_size=(4, 6), tpu=dict(compute_dtype="float32")),
)


def test_fetch_metrics_single_transfer():
    metrics = {"a": jnp.asarray(1.5), "b": jnp.asarray(2.5), "c": jnp.asarray(-1.0)}
    out = InterfacePhysics._fetch_metrics(metrics)
    assert out == {"a": 1.5, "b": 2.5, "c": -1.0}


def test_to_batch_shapes():
    iface = InterfacePhysics(**MINI_CFG)
    B, Nm, Ni = 2, 5, 3
    data = {
        "field_data": np.zeros((B, 4, 8), np.float32),
        "forecast_h": np.array([24.0, 48.0], np.float32),
        "margin_x": np.zeros((B, Nm), np.float32),
        "margin_y": np.zeros((B, Nm), np.float32),
        "margin_t": np.zeros((B, Nm), np.float32),
        "margin_f": np.zeros((B, Nm, 1), np.float32),
        "margin_data": np.zeros((B, Nm, 6), np.float32),
        "margin_input_data": np.zeros((B, Nm, 6), np.float32),
        "inter_x": np.zeros((B, Ni), np.float32),
        "inter_y": np.zeros((B, Ni), np.float32),
        "inter_t": np.zeros((B, Ni), np.float32),
        "inter_f": np.zeros((B, Ni, 1), np.float32),
        "inter_data": np.zeros((B, Ni, 6), np.float32),
    }
    batch = iface._to_batch(data)
    assert batch.field.shape == (B, 4, 8)
    assert batch.forecast_h.shape == (B,)
    assert batch.margin.labels.shape == (B, Nm, 6)
    assert batch.inter.nwp.shape == (B, Ni, 6)


def test_checkpoint_roundtrip_with_opt_state(tmp_path):
    params = {"w": np.ones((3, 3), np.float32), "b": np.zeros(3, np.float32)}
    opt = {"mu": np.full(3, 0.5, np.float32)}
    path = str(tmp_path)
    f = ckpt.save_model(path, epoch=7, global_step=123, params=params,
                        opt_state=opt, dx=27000.0, obs_norm_cfg={"t2": {}})
    assert os.path.exists(f)
    assert os.path.exists(os.path.join(path, "physics_latest.ckpt"))

    state, next_epoch, step = ckpt.load_model(path)
    assert next_epoch == 8 and step == 123
    np.testing.assert_array_equal(state["model"]["w"], params["w"])
    np.testing.assert_array_equal(state["opt_state"]["mu"], opt["mu"])
    assert ckpt.gather_key_from_state("dx", state, 0.0) == 27000.0
    assert ckpt.gather_key_from_state("missing", state, "dflt") == "dflt"


def test_async_checkpointer_roundtrip(tmp_path):
    """AsyncCheckpointer: snapshot-on-submit, durable after wait()."""
    import jax.numpy as jnp

    params = {"w": jnp.ones((3, 3), jnp.float32)}
    opt = {"mu": jnp.full((3,), 0.5, jnp.float32)}
    path = str(tmp_path)
    ac = ckpt.AsyncCheckpointer()
    try:
        ac.submit(path, 7, 123, params=params, opt_state=opt, dx=27000.0)
        ac.wait()
        assert os.path.exists(os.path.join(path, "physics_latest.ckpt"))
        state, next_epoch, step = ckpt.load_checkpoint(path)
        assert next_epoch == 8 and step == 123
        np.testing.assert_array_equal(np.asarray(state["model"]["w"]),
                                      np.ones((3, 3), np.float32))
        np.testing.assert_array_equal(np.asarray(state["opt_state"]["mu"]),
                                      np.full((3,), 0.5, np.float32))
        assert ckpt.gather_key_from_state("dx", state, 0.0) == 27000.0
    finally:
        ac.close()


def test_async_checkpointer_surfaces_worker_errors():
    import jax.numpy as jnp
    import pytest as _pytest

    ac = ckpt.AsyncCheckpointer()
    # unwritable path (under /proc) -> the worker's failure must re-raise
    ac.submit("/proc/definitely/not/writable", 0, 0,
              params={"w": jnp.zeros(2)})
    with _pytest.raises(Exception):
        ac.close()


def test_checkpoint_by_epoch(tmp_path):
    path = str(tmp_path)
    for e in (0, 1, 2):
        ckpt.save_model(path, epoch=e, global_step=e * 10,
                        params={"w": np.full(2, float(e), np.float32)})
    state, ne, gs = ckpt.load_model(path, current_epoch=1)
    assert ne == 2 and gs == 10
    np.testing.assert_array_equal(state["model"]["w"], [1.0, 1.0])
    # latest resolves to epoch 2
    state, ne, gs = ckpt.load_model(path)
    assert gs == 20


def test_missing_checkpoint_graceful(tmp_path):
    state, epoch, step = ckpt.load_model(str(tmp_path / "nope"))
    assert state is None and epoch == 0 and step == 0


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    params = {"w": jnp.ones((4, 4)), "b": jnp.arange(4.0)}
    opt = {"mu": jnp.full((4,), 0.25)}
    path = str(tmp_path)
    ckpt.save_model_orbax(path, epoch=3, global_step=77, params=params,
                          opt_state=opt, dx=27000.0)
    state, ne, gs = ckpt.load_model_orbax(path)
    assert ne == 4 and gs == 77
    np.testing.assert_array_equal(np.asarray(state["model"]["w"]), np.ones((4, 4)))
    np.testing.assert_array_equal(np.asarray(state["opt_state"]["mu"]),
                                  np.full((4,), 0.25))
    assert state["dx"] == 27000.0
    # by-epoch resolution
    state, ne, gs = ckpt.load_model_orbax(path, current_epoch=3)
    assert gs == 77
    # missing -> graceful
    state, ne, gs = ckpt.load_model_orbax(str(tmp_path / "nope"))
    assert state is None


def test_checkpoint_backend_dispatch_and_fallback(tmp_path):
    """save/load_checkpoint dispatch on backend and fall back across layouts."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    params = {"w": np.arange(6.0).reshape(2, 3)}
    # pickle save, orbax-requested load falls back to the pickle layout
    p1 = str(tmp_path / "p")
    ckpt.save_checkpoint(p1, epoch=1, global_step=10, params=params, backend="pickle")
    state, ne, gs = ckpt.load_checkpoint(p1, backend="orbax")
    assert gs == 10 and np.allclose(state["model"]["w"], params["w"])
    # orbax save, pickle-requested load falls back to the orbax layout
    p2 = str(tmp_path / "o")
    ckpt.save_checkpoint(p2, epoch=2, global_step=20, params=params, backend="orbax")
    state, ne, gs = ckpt.load_checkpoint(p2, backend="pickle")
    assert gs == 20 and np.allclose(state["model"]["w"], params["w"])
    with pytest.raises(ValueError):
        ckpt.save_checkpoint(p2, epoch=2, global_step=20, params=params, backend="zip")


def test_pde_engine_none_means_auto():
    """An explicit pde_engine=None in the config (as README documents) must
    resolve to the auto default, not the string 'None'."""
    from tests.test_end_to_end import Config  # reuse imports
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault("DPN_SMOKE_DATA", "/tmp/dpn_unit_smoke")
    cfg = Config.fromfile(os.path.join(here, "configs", "smoke_cpu_cfg.py"))
    conf = cfg["config"]
    conf["train_cfg"].setdefault("tpu", {})["pde_engine"] = None

    from deepphysinet_tpu.interface.build import builder_models

    models = builder_models(**conf)
    assert models.pde_engine in ("jvp", "kernel", "linearize")


def test_drain_async_ckpt_tolerates_failed_prior_save(capsys):
    """A latched async-save error must not prevent the synchronous
    preemption/final save that follows (it is warned, not raised)."""
    from deepphysinet_tpu.interface.interface_physics import InterfacePhysics

    class FailingCkpt:
        def wait(self):
            raise OSError("disk full")

    InterfacePhysics._drain_async_ckpt(FailingCkpt())  # must not raise
    assert "async checkpoint save failed" in capsys.readouterr().out
    InterfacePhysics._drain_async_ckpt(None)  # no-op


def test_async_worker_close_idempotent_and_latch():
    from deepphysinet_tpu.utils.async_worker import AsyncWorker
    import pytest as _pytest

    w = AsyncWorker()
    w.submit(lambda: None)
    w.wait()
    w.close()
    w.close()  # idempotent
    w.close_quietly()

    w2 = AsyncWorker()
    w2.submit(lambda: (_ for _ in ()).throw(ValueError("boom")))
    with _pytest.raises(ValueError):
        w2.close()
    w2.close_quietly()  # after the latch was consumed: silent


def test_async_worker_full_reports_backpressure():
    """`full()` lets a single producer shed best-effort work instead of
    blocking: False guarantees the next submit is non-blocking (the worker
    thread only drains), True while a slow job holds the queue at maxsize."""
    import threading
    from deepphysinet_tpu.utils.async_worker import AsyncWorker

    gate, started = threading.Event(), threading.Event()
    w = AsyncWorker(maxsize=2)
    assert not w.full()
    w.submit(lambda: (started.set(), gate.wait()))  # occupies the worker
    assert started.wait(10)    # the blocker is OFF the queue, running
    # fill the queue behind the blocked job (2 queued + 1 running)
    w.submit(lambda: None)
    w.submit(lambda: None)
    assert w.full()
    gate.set()
    w.wait()
    assert not w.full()
    w.close()


def test_feasible_valid_batch_clamps(capsys):
    # split fills the scaled batch -> unchanged
    assert InterfacePhysics._feasible_valid_batch(64, 8, 4, 1) == 8
    # split smaller than the scaled batch -> largest shardable multiple
    assert InterfacePhysics._feasible_valid_batch(5, 8, 4, 1) == 4
    assert "clamped 8 -> 4" in capsys.readouterr().out
    # multi-process: granule is lcm(data_axis, nproc)
    assert InterfacePhysics._feasible_valid_batch(13, 16, 4, 2) == 12
    # split smaller than one granule -> keep granule, warn; drop_last then
    # yields an empty loader and the caller's >0 guard skips validation
    assert InterfacePhysics._feasible_valid_batch(3, 8, 4, 2) == 4
    assert "validation disabled" in capsys.readouterr().out


def test_agreed_preemption_single_process_and_cadence():
    # single process: local flag, every step
    assert not InterfacePhysics._agreed_preemption({"flag": False}, 1)
    assert InterfacePhysics._agreed_preemption({"flag": True}, 1)
    # multi-process off-cadence steps skip the collective entirely (returns
    # False without importing multihost_utils -- the flag check waits for the
    # next cadence step, which is lockstep across processes)
    assert not InterfacePhysics._agreed_preemption(
        {"flag": True}, 2, global_step=7, check_every=20)


def test_trim_points_multiple():
    """Valid point counts indivisible by the mesh points axis are trimmed
    (the sharded eval shards the point dim; a free-form valid
    label_batch_size must degrade, not crash the first log step)."""
    from deepphysinet_tpu.train.train_step import Batch, PointBatch

    B, nm, ni = 2, 10, 7

    def pts(n):
        return PointBatch(
            x=jnp.zeros((B, n)), y=jnp.zeros((B, n)), t=jnp.zeros((B, n)),
            f=jnp.zeros((B, n, 1)), nwp=jnp.zeros((B, n, 6)),
            labels=jnp.zeros((B, n, 6)))

    batch = Batch(field=jnp.zeros((B, 12, 65)), forecast_h=jnp.zeros((B,)),
                  margin=pts(nm), inter=pts(ni))
    out = InterfacePhysics._trim_points_multiple(batch, 4)
    assert out.margin.x.shape == (B, 8) and out.margin.labels.shape == (B, 8, 6)
    assert out.inter.x.shape == (B, 4)
    # already divisible -> unchanged object
    assert InterfacePhysics._trim_points_multiple(batch, 1) is batch
    same = InterfacePhysics._trim_points_multiple(batch, 2)
    assert same.margin.x.shape == (B, 10) and same.inter.x.shape == (B, 6)
    with pytest.raises(ValueError):
        InterfacePhysics._trim_points_multiple(batch, 16)


def test_apply_overrides_typo_guard(capsys):
    """--set overrides: existing leaves apply silently, NEW leaves apply with
    a loud warning (update_params keeps the reference's create-on-missing
    semantics, so a typo'd key would otherwise be silently ineffective), and
    a non-dict intermediate refuses to be clobbered."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import train as train_cli

    cfg = {"train_cfg": {"optimizer": {"lr": 0.1}, "tpu": {}}}
    train_cli.apply_overrides(cfg, ["train_cfg.optimizer.lr=0.5"])
    assert cfg["train_cfg"]["optimizer"]["lr"] == 0.5
    assert "NEW config key" not in capsys.readouterr().out

    # defaulted tpu.* key absent from the file: applied, but warned
    train_cli.apply_overrides(cfg, ["train_cfg.tpu.device_valid=False"])
    assert cfg["train_cfg"]["tpu"]["device_valid"] is False
    assert "NEW config key" in capsys.readouterr().out

    # a typo'd leaf is warned about instead of vanishing silently
    train_cli.apply_overrides(cfg, ["train_cfg.tpu.device_vaild=True"])
    assert "device_vaild" in capsys.readouterr().out

    # non-dict intermediate: refuse to clobber
    with pytest.raises(SystemExit):
        train_cli.apply_overrides(cfg, ["train_cfg.optimizer.lr.x=1"])

    # non-literal values fall back to raw strings
    train_cli.apply_overrides(cfg, ["train_cfg.tpu.ds_sampler=pool"])
    assert cfg["train_cfg"]["tpu"]["ds_sampler"] == "pool"


def test_orbax_resave_atomic_latest(tmp_path):
    """Re-saving the SAME epoch (preemption after a resume) must swap the
    step dir and latest pointer without dangling or leftovers: a hard kill
    mid-save must leave either the old or the new complete checkpoint."""
    import jax.numpy as jnp

    path = str(tmp_path)
    ckpt.save_model_orbax(path, epoch=1, global_step=10,
                          params={"w": jnp.ones((2,))})
    ckpt.save_model_orbax(path, epoch=1, global_step=20,
                          params={"w": jnp.full((2,), 2.0)})
    state, ne, gs = ckpt.load_model_orbax(path)
    assert gs == 20
    np.testing.assert_array_equal(np.asarray(state["model"]["w"]),
                                  np.full((2,), 2.0))
    leftovers = [p for p in os.listdir(path)
                 if p.endswith(".tmp") or p.endswith(".old")]
    assert leftovers == []
    latest = os.path.join(path, "physics_latest_orbax")
    assert os.path.islink(latest) and os.path.exists(latest)
