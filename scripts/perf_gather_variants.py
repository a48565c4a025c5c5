"""Label-gather mechanisms for the EXACT-iid device sampler.

docs/PERF.md round-3 (i) ends at "~1.5 us per random 24-byte row from a
large HBM operand is the practical XLA gather floor; the remaining ~1.6 ms
would need a fundamentally different mechanism (e.g. sorted/clustered
access or a Pallas DMA-gather kernel)".  The 'pool' sampler (j) sidesteps
it with a distribution change; this script measures mechanisms that keep
the reference's exact iid draw and the exact gathered values:

  take        nm random rows from [X, 6]          (the current iid path)
  take-sorted same, indices pre-sorted            (pure locality effect)
  sort        device cost of sort_key_val(idx, iota)
  s+t+u       sort + take + scatter-unsort        (exact pipeline, no Pallas)
  chan-take   6 x 1-D takes from a [6, X] cube    (per-channel operands are
                                                   3.7 MB -- VMEM-stageable,
                                                   unlike the 22 MB rows)
  chan-sorted same, sorted + unsort
  bucket-mxu  sort + bincount buckets + per-chunk one-hot fp32 einsum
              (sequential cube read at bandwidth; MXU does the "gather")

All variants return values BITWISE equal to take (fp32 one-hot matmul picks
exactly one row; unsort restores order).  Run ALONE on an idle host:

  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python scripts/perf_gather_variants.py
"""

import statistics
import time

import numpy as np


def median_slope(timed, reps: int = 5, k1: int = 20, k2: int = 220) -> float:
    timed(30)
    return statistics.median(
        (timed(k2) - timed(k1)) / (k2 - k1) for _ in range(reps))


def bench(name, jfn, *args):
    import jax

    out = jfn(*args)
    ref = np.asarray(jax.tree.leaves(out)[0])

    def timed(k):
        o = None
        t0 = time.monotonic()
        for _ in range(k):
            o = jfn(*args)
        _ = np.asarray(jax.tree.leaves(o)[0]).ravel()[0]
        return time.monotonic() - t0

    s = median_slope(timed)
    print(f"{name}: {s*1e6:.1f} us", flush=True)
    return s, ref


def main() -> None:
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.RandomState(0)
    Hl, Wl, Tl, C = 145, 257, 25, 6
    X = Hl * Wl * Tl  # 931625
    nm = 20480

    rows_np = rng.randn(X, C).astype(np.float32)
    rows = jnp.asarray(rows_np)           # [X, 6] channel-last (current layout)
    cube_t = jnp.asarray(rows_np.T.copy())  # [6, X] channel-first flat
    idx_np = rng.randint(0, X, nm).astype(np.int32)
    idx = jnp.asarray(idx_np)
    idx_sorted = jnp.asarray(np.sort(idx_np))

    # ---- baselines ----
    t_take, ref = bench("take [X,6]", jax.jit(
        lambda r, i: jnp.take(r, i, axis=0)), rows, idx)
    bench("take [X,6] sorted-idx", jax.jit(
        lambda r, i: jnp.take(r, i, axis=0)), rows, idx_sorted)

    # ---- device sort cost ----
    iota = jnp.arange(nm, dtype=jnp.int32)

    @jax.jit
    def sort_pairs(i):
        return jax.lax.sort_key_val(i, iota)

    bench("sort_key_val(20480)", sort_pairs, idx)

    # ---- sort + take + scatter-unsort (exact) ----
    @jax.jit
    def sorted_take_unsort(r, i):
        s, order = jax.lax.sort_key_val(i, iota)
        g = jnp.take(r, s, axis=0)
        return jnp.zeros((nm, C), jnp.float32).at[order].set(g)

    _, out = bench("sort+take+unsort", sorted_take_unsort, rows, idx)
    assert np.array_equal(out, ref), "sort+take+unsort mismatch"

    # ---- per-channel 1-D takes ----
    @jax.jit
    def chan_take(ct, i):
        return jnp.stack([jnp.take(ct[v], i) for v in range(C)], axis=-1)

    _, out = bench("chan-take 6x[X]", chan_take, cube_t, idx)
    assert np.array_equal(out, ref), "chan-take mismatch"

    @jax.jit
    def chan_take_sorted(ct, i):
        s, order = jax.lax.sort_key_val(i, iota)
        g = jnp.stack([jnp.take(ct[v], s) for v in range(C)], axis=-1)
        return jnp.zeros((nm, C), jnp.float32).at[order].set(g)

    _, out = bench("chan-take sorted+unsort", chan_take_sorted, cube_t, idx)
    assert np.array_equal(out, ref), "chan-take-sorted mismatch"

    # single-channel cost in isolation
    bench("take 1x[X] (one channel)", jax.jit(
        lambda ct, i: jnp.take(ct[0], i)), cube_t, idx)

    # ---- bucket one-hot einsum (sequential cube read; MXU "gather") ----
    def make_bucket(Kc: int, P: int):
        ncha = -(-X // Kc)
        Xp = ncha * Kc

        @jax.jit
        def bucket(ct, i):
            s, order = jax.lax.sort_key_val(i, iota)
            counts = jnp.bincount(s // Kc, length=ncha)
            starts = jnp.concatenate(
                [jnp.zeros((1,), counts.dtype), jnp.cumsum(counts)])
            pos = starts[:-1, None] + jnp.arange(P)[None, :]  # [ncha, P]
            valid = jnp.arange(P)[None, :] < counts[:, None]
            s_pad = jnp.concatenate([s, jnp.full((P,), Xp, jnp.int32)])
            bidx = jnp.take(s_pad, jnp.minimum(pos, nm + P - 1))
            local = bidx - (jnp.arange(ncha) * Kc)[:, None]
            onehot = ((local[:, :, None] == jnp.arange(Kc)[None, None, :])
                      & valid[:, :, None]).astype(jnp.float32)
            ctp = jnp.pad(ct, ((0, 0), (0, Xp - X))).reshape(C, ncha, Kc)
            g = jnp.einsum("npk,vnk->npv", onehot, ctp,
                           preferred_element_type=jnp.float32)
            dump = nm + P - 1
            tgt = jnp.where(valid, pos, dump)
            ls = jnp.zeros((nm + P, C), jnp.float32).at[
                tgt.reshape(-1)].set(g.reshape(-1, C))[:nm]
            return jnp.zeros((nm, C), jnp.float32).at[order].set(ls)

        return bucket

    for Kc, P in ((128, 24), (256, 32), (512, 48), (1024, 80)):
        _, out = bench(f"bucket-mxu K={Kc} P={P}", make_bucket(Kc, P),
                       cube_t, idx)
        if not np.array_equal(out, ref):
            print(f"  !! bucket K={Kc} MISMATCH (max |d| = "
                  f"{np.abs(out - ref).max()})", flush=True)


if __name__ == "__main__":
    main()
