"""Why is the in-program label take 10x the isolated one?

perf_gather_variants.py: take(rows[X,6] param, idx param) = ~100 us.
perf_sampler_pieces2.py: take(cube[1,Hl,Wl,Tl,6] param -> in-jit reshape,
idx computed in-jit from mx/my/slot) = ~1100 us.  Two suspects: the
5-D parameter's layout, and fusing the index computation into the gather.
Cross all four combinations + optimization_barrier variants.

Run ALONE on an idle host:
  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_gather_shape.py
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

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    Hl, Wl, Tl, C = 145, 257, 25, 6
    X = Hl * Wl * Tl
    nm = 20480

    rows_np = rng.randn(X, C).astype(np.float32)
    flat_param = jnp.asarray(rows_np)                       # [X, 6]
    cube_param = jnp.asarray(rows_np.reshape(Hl, Wl, Tl, C))  # 4-D
    cube5_param = cube_param[None]                          # 5-D [1,...]

    mx = jnp.asarray(rng.randint(0, Wl, nm), jnp.int32)
    my = jnp.asarray(rng.randint(0, Hl, nm), jnp.int32)
    slot = jnp.asarray(rng.randint(0, Tl, nm), jnp.int32)
    idx_param = (np.asarray(my) * Wl + np.asarray(mx)) * Tl + np.asarray(slot)
    idx_param = jnp.asarray(idx_param.astype(np.int32))

    # 1. both flat params (the fast case)
    bench("rows[X,6] param, idx param",
          lambda r, i: jnp.take(r, i, axis=0), flat_param, idx_param)

    # 2. flat rows param, idx computed in-jit
    bench("rows[X,6] param, idx computed",
          lambda r, a, b, c: jnp.take(r, (b * Wl + a) * Tl + c, axis=0),
          flat_param, mx, my, slot)

    # 3. flat rows param, idx computed + barrier
    bench("rows[X,6] param, idx computed+barrier",
          lambda r, a, b, c: jnp.take(
              r, jax.lax.optimization_barrier((b * Wl + a) * Tl + c), axis=0),
          flat_param, mx, my, slot)

    # 4. 4-D cube param reshaped in-jit, idx param
    bench("cube4d param reshape, idx param",
          lambda cb, i: jnp.take(cb.reshape(-1, C), i, axis=0),
          cube_param, idx_param)

    # 5. 5-D cube param reshaped in-jit, idx param
    bench("cube5d param reshape, idx param",
          lambda cb, i: jnp.take(cb.reshape(-1, C), i, axis=0),
          cube5_param, idx_param)

    # 6. 5-D cube param reshape+barrier, idx param
    bench("cube5d param reshape+barrier, idx param",
          lambda cb, i: jnp.take(
              jax.lax.optimization_barrier(cb.reshape(-1, C)), i, axis=0),
          cube5_param, idx_param)

    # 7. the production combination: 5-D param, computed idx
    bench("cube5d param, idx computed (production)",
          lambda cb, a, b, c: jnp.take(
              cb.reshape(-1, C), (b * Wl + a) * Tl + c, axis=0),
          cube5_param, mx, my, slot)

    # 8. production + barriers on both
    bench("cube5d param, both barriers",
          lambda cb, a, b, c: jnp.take(
              jax.lax.optimization_barrier(cb.reshape(-1, C)),
              jax.lax.optimization_barrier((b * Wl + a) * Tl + c), axis=0),
          cube5_param, mx, my, slot)

    # 9. 4-D take without reshape (multi-dim start indices via vmap-style)
    bench("cube4d param, 3-idx gather",
          lambda cb, a, b, c: cb[b, a, c, :],
          cube_param, my, mx, slot)


if __name__ == "__main__":
    main()
