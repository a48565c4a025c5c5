"""Is the 3x sampler gap captured-constant vs runtime-argument cubes?

Every fast measurement (506 us) closed over the cubes (jit captures ->
XLA constants with compiler-chosen layout/specialization); the production
step takes them as arguments.  Compare the SAME un-vmapped sampler both
ways, and the label gather alone both ways.

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_capture_vs_arg.py
"""

import statistics
import time

import numpy as np


def median_slope(timed, reps: int = 5, k1: int = 20, k2: int = 220) -> float:
    timed(30)
    return statistics.median(
        (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))


def bench(name, fn, *args):
    import jax

    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]

    def timed(k):
        o = None
        t0 = time.monotonic()
        for _ in range(k):
            o = jfn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
        return time.monotonic() - t0

    s = median_slope(timed)
    print(f"{name}: {s*1e6:.1f} us", flush=True)
    return s


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.train.device_sampling import (
        SamplerConfig, sample_window_points)

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    Hl, Wl, Tl = 145, 257, 25
    nm = 20480
    label_cf = jnp.asarray(rng.randn(6, Hl, Wl, Tl), jnp.float32)
    label = jnp.moveaxis(label_cf, 0, -1)
    nwp = jnp.asarray(rng.randn(37, 65, 5, 6), jnp.float32)
    scfg = SamplerConfig(n_margin=nm, n_inter=4096, window_h=24,
                         input_time_step=6, label_time_step=1,
                         begin_lat=18.0, begin_lon=72.0, fine_step=0.25,
                         coarse_step=1.0)
    spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                     pred_t_span=86400.0)
    key = jax.random.PRNGKey(0)

    bench("A. sampler, cubes CAPTURED",
          lambda k: sample_window_points(k, nwp, label, scfg, spec), key)
    bench("B. sampler, cubes as ARGS",
          lambda n, l, k: sample_window_points(k, n, l, scfg, spec),
          nwp, label, key)

    mx = jnp.asarray(rng.randint(0, Wl, nm), jnp.int32)
    my = jnp.asarray(rng.randint(0, Hl, nm), jnp.int32)
    slot = jnp.asarray(rng.randint(0, Tl, nm), jnp.int32)

    def gather_cap(mx, my, slot):
        flat = (my * Wl + mx) * Tl + slot
        return jnp.take(label_cf.reshape(6, -1), flat, axis=-1).T

    bench("C. channel-first gather, operand CAPTURED", gather_cap, mx, my, slot)

    def gather_arg(lab, mx, my, slot):
        flat = (my * Wl + mx) * Tl + slot
        return jnp.take(lab.reshape(6, -1), flat, axis=-1).T

    bench("D. channel-first gather, operand as ARG", gather_arg, label_cf,
          mx, my, slot)

    # E. channel-LAST row gather as ARG (the layout CubeBatch now uses)
    def gather_pts(lab, mx, my, slot):
        flat = (my * Wl + mx) * Tl + slot
        return jnp.take(lab.reshape(-1, 6), flat, axis=0)  # [nm, 6]

    bench("E. channel-last row gather, ARG", gather_pts, label, mx, my, slot)


if __name__ == "__main__":
    main()
