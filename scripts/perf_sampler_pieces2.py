"""Today's runtime-arg breakdown of the iid sampling block (round-3 late).

perf_gather_variants.py found the isolated 20480-row label take costs only
~100 us with runtime-arg cubes -- so the iid block's ~1.4 ms premium over
the pool sampler (docs/PERF.md round-3 (i)/(j)) must live in the OTHER
pieces (threefry RNG, margin trilinear interp) or in scheduling.  Every
stage here takes its operands as RUNTIME ARGUMENTS (no constant
specialization) at production sizes, B=1.

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_sampler_pieces2.py
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

    from deepphysinet_tpu.ops.coords import CoordSpec, OMEGA
    from deepphysinet_tpu.ops.interp import trilinear_interp_rows
    from deepphysinet_tpu.train.device_sampling import (
        SamplerConfig, build_pool, sample_window_points_batched,
        sample_window_points_pooled_batched)

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

    # ---- the two production samplers, runtime args ----
    bench("full iid batched B=1",
          lambda ks, nc, lc: sample_window_points_batched(ks, nc, lc, scfg, spec),
          keys1, nwp1, label1)

    pr, pi = build_pool(np.asarray(label1[0]), nm, 0)
    pool_rows = jnp.asarray(pr)[None]
    pool_idx = jnp.asarray(pi)[None]
    pool_nwp = jnp.asarray(rng.randn(*pr.shape).astype(np.float32))[None]
    bench("full pool batched B=1",
          lambda ks, nc, a, b, c: sample_window_points_pooled_batched(
              ks, nc, a, b, c, scfg, spec),
          keys1, nwp1, pool_rows, pool_idx, pool_nwp)

    # ---- pieces (runtime args) ----
    def rng_margin(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return (jax.random.randint(k1, (nm,), 0, Wl),
                jax.random.randint(k2, (nm,), 0, Hl),
                jax.random.randint(k3, (nm,), 0, Tl))

    bench("rng margin (3x randint 20480)", rng_margin, key)

    def rng_inter(k):
        k4, k5, k6 = jax.random.split(k, 3)
        return (jax.random.uniform(k4, (ni,)), jax.random.uniform(k5, (ni,)),
                jax.random.randint(k6, (ni,), 0, 25))

    bench("rng inter (2x uniform + randint 4096)", rng_inter, key)

    mx = jnp.asarray(rng.randint(0, Wl, nm), jnp.int32)
    my = jnp.asarray(rng.randint(0, Hl, nm), jnp.int32)
    slot = jnp.asarray(rng.randint(0, Tl, nm), jnp.int32)

    bench("label take (runtime cube)",
          lambda lc, a, b, c: jnp.take(
              lc.reshape(-1, 6), (b * Wl + a) * Tl + c, axis=0),
          label1, mx, my, slot)

    kw = dict(lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)
    m_lon = (72.0 + mx * 0.25).astype(jnp.float32)
    m_lat = (18.0 + my * 0.25).astype(jnp.float32)
    m_t = slot.astype(jnp.float32)

    bench("margin interp 20480 (runtime cube)",
          lambda nc, lo, la, t: trilinear_interp_rows(nc[0], lo, la, t, **kw),
          nwp1, m_lon, m_lat, m_t)

    i_lon = jnp.asarray(72.0 + rng.rand(ni) * (Wl - 1) * 0.25, jnp.float32)
    i_lat = jnp.asarray(18.0 + rng.rand(ni) * (Hl - 1) * 0.25, jnp.float32)
    i_t = jnp.asarray(rng.randint(0, 25, ni), jnp.float32)
    bench("inter interp 4096 (runtime cube)",
          lambda nc, lo, la, t: trilinear_interp_rows(nc[0], lo, la, t, **kw),
          nwp1, i_lon, i_lat, i_t)

    bench("coriolis 20480",
          lambda la: (2.0 * OMEGA * jnp.sin(la / 180.0 * jnp.pi))[:, None],
          m_lat)

    # margin half alone (rng + take + interp + coriolis, one program)
    def margin_block(k, nc, lc):
        a, b, c = rng_margin(k)
        labels = jnp.take(lc.reshape(-1, 6), (b * Wl + a) * Tl + c, axis=0)
        lo = (72.0 + a * 0.25).astype(jnp.float32)
        la = (18.0 + b * 0.25).astype(jnp.float32)
        nwp = trilinear_interp_rows(nc[0], lo, la, c.astype(jnp.float32), **kw)
        f = (2.0 * OMEGA * jnp.sin(la / 180.0 * jnp.pi))[:, None]
        return labels, nwp, f

    bench("margin block (rng+take+interp+f)", margin_block, key, nwp1, label1)


if __name__ == "__main__":
    main()
