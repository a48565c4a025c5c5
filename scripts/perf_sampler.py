"""Isolate the cost of on-device sampling (the 6.85 ms ds step vs 4.88 ms
host-mode step gap): RNG, label gather, trilinear interps, separately.

PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_sampler.py
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
    _ = np.asarray(jax.tree.leaves(out)[0])[..., 0]

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
    from deepphysinet_tpu.ops.interp import trilinear_interp_cube
    from deepphysinet_tpu.train.device_sampling import SamplerConfig, sample_window_points

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    Hl, Wl, Tl = 145, 257, 25
    H, W, T = 37, 65, 5
    label_cube = jnp.asarray(rng.randn(Hl, Wl, Tl, 6), jnp.float32)
    nwp_cube = jnp.asarray(rng.randn(H, W, T, 6), jnp.float32)
    scfg = SamplerConfig(n_margin=20480, n_inter=4096, window_h=24,
                         input_time_step=6, label_time_step=1,
                         begin_lat=18.0, begin_lon=72.0, fine_step=0.25,
                         coarse_step=1.0)
    spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                     pred_t_span=86400.0)
    key = jax.random.PRNGKey(0)

    bench("full sample_window_points",
          lambda k: sample_window_points(k, nwp_cube, label_cube, scfg, spec), key)

    # RNG alone (threefry)
    def rng_only(k):
        k1, k2, k3, k4, k5, k6 = jax.random.split(k, 6)
        return (jax.random.randint(k1, (20480,), 0, Wl)
                + jax.random.randint(k2, (20480,), 0, Hl)
                + jax.random.randint(k3, (20480,), 0, 25),
                jax.random.uniform(k4, (4096,)) + jax.random.uniform(k5, (4096,)),
                jax.random.randint(k6, (4096,), 0, 25))

    bench("rng alone (threefry)", rng_only, key)

    # label gather alone
    mx = jnp.asarray(rng.randint(0, Wl, 20480), jnp.int32)
    my = jnp.asarray(rng.randint(0, Hl, 20480), jnp.int32)
    slot = jnp.asarray(rng.randint(0, Tl, 20480), jnp.int32)

    def gather_only(mx, my, slot):
        flat = (my * Wl + mx) * Tl + slot
        return jnp.take(label_cube.reshape(-1, 6), flat, axis=0)

    bench("label gather [6->20480,6]", gather_only, mx, my, slot)

    # interp alone (margin-size)
    m_lon = jnp.asarray(72.0 + rng.randint(0, Wl, 20480) * 0.25, jnp.float32)
    m_lat = jnp.asarray(18.0 + rng.randint(0, Hl, 20480) * 0.25, jnp.float32)
    m_t = jnp.asarray(rng.randint(0, 25, 20480), jnp.float32)

    def interp_only(lon, lat, t):
        from deepphysinet_tpu.ops.interp import trilinear_interp_rows

        return trilinear_interp_rows(
            nwp_cube, lon, lat, t, lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0,
            t0=0.0, dt=6.0)

    bench("trilinear interp 20480", interp_only, m_lon, m_lat, m_t)


if __name__ == "__main__":
    main()
