"""Is vmap(B=1) the sampling-block penalty? (round-3 (h) follow-up)

sample_window_points standalone measured ~0.5 ms; the same compute inside
the ds step's vmap costs ~1.8 ms as its own program.  Hypothesis: XLA
lowers the vmap-batched gathers (label gather + 2 trilinear interps) much
worse than the single-window forms.  Compare, as standalone programs:
  A. sample_window_points, no vmap
  B. vmap(sample_window_points) at B=1
  C. Python-loop-over-B + stack (B=1)   <- candidate fix

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_vmap_sampler.py
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
    H, W, T = 37, 65, 5
    label1 = jnp.asarray(rng.randn(1, Hl, Wl, Tl, 6), jnp.float32)
    nwp1 = jnp.asarray(rng.randn(1, H, W, T, 6), jnp.float32)
    scfg = SamplerConfig(n_margin=20480, n_inter=4096, window_h=24,
                         input_time_step=6, label_time_step=1,
                         begin_lat=18.0, begin_lon=72.0, fine_step=0.25,
                         coarse_step=1.0)
    spec = CoordSpec(lon_size=257, lat_size=145, dx=27000.0, dy=27000.0,
                     pred_t_span=86400.0)
    key = jax.random.PRNGKey(0)
    keys1 = jax.random.split(key, 1)

    bench("A. no-vmap single window",
          lambda k: sample_window_points(k, nwp1[0], label1[0], scfg, spec), key)

    def vmapped(nwp_b, label_b, keys):
        return jax.vmap(
            lambda n, l, k: sample_window_points(k, n, l, scfg, spec)
        )(nwp_b, label_b, keys)

    bench("B. vmap B=1", vmapped, nwp1, label1, keys1)

    def looped(nwp_b, label_b, keys):
        outs = [sample_window_points(keys[i], nwp_b[i], label_b[i], scfg, spec)
                for i in range(nwp_b.shape[0])]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)

    bench("C. python loop B=1 + stack", looped, nwp1, label1, keys1)

    from deepphysinet_tpu.train.device_sampling import sample_window_points_batched

    bench("D. batched flat-gather B=1",
          lambda n, l, k: sample_window_points_batched(k, n, l, scfg, spec),
          nwp1, label1, keys1)

    # E. are the gathers slow only when fused with in-program RNG?  Same
    # batched sampler but indices drawn in a FIRST program and fed as args
    # to a SECOND gather-only program (two dispatches timed together).
    nm, ni = scfg.n_margin, scfg.n_inter
    Hl_, Wl_ = 145, 257

    @jax.jit
    def draw(keys):
        ks = jax.vmap(lambda k: jax.random.split(k, 6))(keys)
        mk = lambda kk, n, hi: jax.vmap(
            lambda k: jax.random.randint(k, (n,), 0, hi))(kk)
        return (mk(ks[:, 0], nm, Wl_), mk(ks[:, 1], nm, Hl_),
                mk(ks[:, 2], nm, 25),
                jax.vmap(lambda k: jax.random.uniform(k, (ni,)))(ks[:, 3]),
                jax.vmap(lambda k: jax.random.uniform(k, (ni,)))(ks[:, 4]),
                mk(ks[:, 5], ni, 25))

    from deepphysinet_tpu.ops.interp import trilinear_interp_rows_batched

    @jax.jit
    def gathers(label_b, nwp_b, mx, my, slot, ixu, iyu, it):
        X = Hl_ * Wl_ * 25
        flat = (my * Wl_ + mx) * 25 + slot
        labels = jnp.take(label_b.reshape(X, 6), flat.reshape(-1), axis=0)
        kw = dict(lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)
        m_nwp = trilinear_interp_rows_batched(
            nwp_b, 72.0 + mx * 0.25, 18.0 + my * 0.25,
            slot.astype(jnp.float32), **kw)
        i_nwp = trilinear_interp_rows_batched(
            nwp_b, 72.0 + ixu * (Wl_ - 1) * 0.25, 18.0 + iyu * (Hl_ - 1) * 0.25,
            it.astype(jnp.float32), **kw)
        return labels, m_nwp, i_nwp

    idx = draw(keys1)
    out = gathers(label1, nwp1, *idx)
    _ = np.asarray(out[0])[0]

    def timed_two(k):
        o = None
        t0 = time.monotonic()
        for _ in range(k):
            o = gathers(label1, nwp1, *draw(keys1))
        _ = np.asarray(o[0]).ravel()[0]
        return time.monotonic() - t0

    s = median_slope(timed_two, k1=20, k2=220)
    print(f"E. draw-prog + gather-prog B=1: {s*1e6:.1f} us", flush=True)

    # F. margin conditioning from a PRECOMPUTED fine-grid NWP cube (one row
    # gather, same flat index as the label gather) -- interp only for the
    # 4096 inter points.  The fine cube is built once per window.
    from deepphysinet_tpu.train.device_sampling import sample_window_points_batched

    Tl_ = 25

    @jax.jit
    def make_fine(nwp_b):
        lon = 72.0 + (jnp.arange(Wl_, dtype=jnp.float32) * 0.25)
        lat = 18.0 + (jnp.arange(Hl_, dtype=jnp.float32) * 0.25)
        t = jnp.arange(Tl_, dtype=jnp.float32)
        LON = jnp.tile(lon[None, :, None], (Hl_, 1, Tl_)).reshape(-1)
        LAT = jnp.tile(lat[:, None, None], (1, Wl_, Tl_)).reshape(-1)
        TT = jnp.tile(t[None, None, :], (Hl_, Wl_, 1)).reshape(-1)
        kw = dict(lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)
        fine = trilinear_interp_rows_batched(
            nwp_b, LON[None], LAT[None], TT[None], **kw)  # [1, X, 6]
        return fine.reshape(1, Hl_, Wl_, Tl_, 6)

    nwp_fine = make_fine(nwp1)
    _ = np.asarray(nwp_fine)[0, 0, 0, 0, 0]

    @jax.jit
    def sampler_fine(label_b, nwp_b, fine_b, keys):
        ks = jax.vmap(lambda k: jax.random.split(k, 6))(keys)
        mk = lambda kk, n, hi: jax.vmap(
            lambda k: jax.random.randint(k, (n,), 0, hi))(kk)
        mx = mk(ks[:, 0], scfg.n_margin, Wl_)
        my = mk(ks[:, 1], scfg.n_margin, Hl_)
        slot = mk(ks[:, 2], scfg.n_margin, Tl_)
        X = Hl_ * Wl_ * Tl_
        flat = (my * Wl_ + mx) * Tl_ + slot
        labels = jnp.take(label_b.reshape(X, 6), flat.reshape(-1), axis=0)
        m_nwp = jnp.take(fine_b.reshape(X, 6), flat.reshape(-1), axis=0)
        ixu = jax.vmap(lambda k: jax.random.uniform(k, (scfg.n_inter,)))(ks[:, 3])
        iyu = jax.vmap(lambda k: jax.random.uniform(k, (scfg.n_inter,)))(ks[:, 4])
        it = mk(ks[:, 5], scfg.n_inter, Tl_)
        kw = dict(lon0=72.0, dlon=1.0, lat0=18.0, dlat=1.0, t0=0.0, dt=6.0)
        i_nwp = trilinear_interp_rows_batched(
            nwp_b, 72.0 + ixu * (Wl_ - 1) * 0.25, 18.0 + iyu * (Hl_ - 1) * 0.25,
            it.astype(jnp.float32), **kw)
        return labels, m_nwp, i_nwp, mx, my, slot, ixu, iyu, it

    bench("F. sampler w/ precomputed fine cube", sampler_fine,
          label1, nwp1, nwp_fine, keys1)

    def timed_fine_once(k):
        t0 = time.monotonic()
        o = None
        for _ in range(k):
            o = make_fine(nwp1)
        _ = np.asarray(o).ravel()[0]
        return time.monotonic() - t0

    s = median_slope(timed_fine_once, k1=5, k2=25)
    print(f"G. fine-cube precompute (once/window): {s*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
