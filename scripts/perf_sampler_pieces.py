"""Isolate WHICH piece makes the B=1-batched sampler 3x the un-vmapped one.

A=506us un-vmapped vs C=1537us python-loop+stack vs D=1680us flat-gather
(scripts/perf_vmap_sampler.py) -- C's math is all 1-D yet still slow, so
the penalty is NOT the batched gather form alone.  Measure each stage as
its own program, plus stack-only and 2-D-layout variants.

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_sampler_pieces.py
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
    from deepphysinet_tpu.ops.interp import (
        trilinear_interp_rows, trilinear_interp_rows_batched)
    from deepphysinet_tpu.train.device_sampling import (
        SamplerConfig, sample_window_points)

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    Hl, Wl, Tl = 145, 257, 25
    H, W, T = 37, 65, 5
    nm, ni = 20480, 4096
    label1 = jnp.asarray(rng.randn(1, Hl, Wl, Tl, 6), jnp.float32)
    nwp1 = jnp.asarray(rng.randn(1, H, W, T, 6), jnp.float32)
    scfg = SamplerConfig(n_margin=nm, n_inter=ni, window_h=24,
                         input_time_step=6, label_time_step=1,
                         begin_lat=18.0, begin_lon=72.0, fine_step=0.25,
                         coarse_step=1.0)
    spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                     pred_t_span=86400.0)
    key = jax.random.PRNGKey(0)
    keys1 = jax.random.split(key, 1)

    # 1. un-vmapped full (baseline)
    bench("1. un-vmapped full",
          lambda k: sample_window_points(k, nwp1[0], label1[0], scfg, spec), key)

    # 2. un-vmapped full + jnp.stack of outputs (C's shape)
    def with_stack(k):
        m, i = sample_window_points(k, nwp1[0], label1[0], scfg, spec)
        return jax.tree.map(lambda x: x[None], (m, i))

    bench("2. un-vmapped + [None] outputs", with_stack, key)

    # 3. RNG block: un-vmapped vs vmapped(B=1)
    def rng_un(k):
        k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
        return (jax.random.randint(k1, (nm,), 0, Wl),
                jax.random.randint(k2, (nm,), 0, Hl),
                jax.random.randint(k3, (nm,), 0, 25),
                jax.random.uniform(k4, (ni,)),
                jax.random.uniform(k5, (ni,)),
                jax.random.randint(k6, (ni,), 0, 25))

    bench("3a. rng un-vmapped", rng_un, key)
    bench("3b. rng vmapped B=1", lambda ks: jax.vmap(rng_un)(ks), keys1)

    # 4. label gather: un-vmapped vs flat-batched
    mx = jnp.asarray(rng.randint(0, Wl, (1, nm)), jnp.int32)
    my = jnp.asarray(rng.randint(0, Hl, (1, nm)), jnp.int32)
    slot = jnp.asarray(rng.randint(0, Tl, (1, nm)), jnp.int32)

    def gather_un(mx, my, slot):
        flat = (my * Wl + mx) * Tl + slot
        return jnp.take(label1[0].reshape(-1, 6), flat, axis=0)

    bench("4a. gather un-vmapped", gather_un, mx[0], my[0], slot[0])

    X = Hl * Wl * Tl

    def gather_flat(mx, my, slot):
        lab = label1.reshape(X, 6)
        flat = (my * Wl + mx) * Tl + slot
        return jnp.take(lab, flat.reshape(-1), axis=0).reshape(1, nm, 6)

    bench("4b. gather flat-batched B=1", gather_flat, mx, my, slot)

    # 5. interp: un-vmapped vs batched
    m_lon = jnp.asarray(72.0 + rng.randint(0, Wl, (1, nm)) * 0.25, jnp.float32)
    m_lat = jnp.asarray(18.0 + rng.randint(0, Hl, (1, nm)) * 0.25, jnp.float32)
    m_t = jnp.asarray(rng.randint(0, 25, (1, nm)), jnp.float32)
    kw = dict(lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)

    bench("5a. interp un-vmapped",
          lambda lo, la, t: trilinear_interp_rows(nwp1[0], lo, la, t, **kw),
          m_lon[0], m_lat[0], m_t[0])
    bench("5b. interp batched B=1",
          lambda lo, la, t: trilinear_interp_rows_batched(
              nwp1, lo, la, t, **kw),
          m_lon, m_lat, m_t)


if __name__ == "__main__":
    main()
