"""Break down PhysicsNet.encode's 0.62 ms: embedding vs encoder layers vs head.

Times (median-of-5 slopes, idle host):
  emb   : DataEmbedding only (the one big matmul, 159x7215 @ 7215x256)
  lay1  : embedding + 1 encoder layer
  full  : the whole encode (4 layers + final LN + projection)

Run: PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python
     scripts/perf_encode_breakdown.py
"""

from __future__ import annotations

import statistics
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deepphysinet_tpu.config import Config
    from deepphysinet_tpu.models.physics_net import PhysicsNet
    import os

    cfg_file = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "configs", "DeepPhysiNet_NCEP_cfg.py")
    cfg = Config.fromfile(cfg_file).config
    meta = {k: v for k, v in cfg["meta_cfg"].items() if k != "name"}
    net = {k: v for k, v in cfg["net_cfg"].items() if k != "name"}
    model = PhysicsNet(meta_cfg=meta, net_cfg=net, compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    field = jnp.asarray(rng.randn(1, 159, 2405) * 0.5, jnp.float32)
    fh = jnp.asarray([[24.0 / 360.0]], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), field,
                        jnp.zeros((8, net["in_channels"]), jnp.float32),
                        jnp.zeros((8, 6), jnp.float32), fh)

    tn = model.meta_cfg  # dims
    enc_params = params["params"]["meta_net"]

    from deepphysinet_tpu.models.transformer_net import (
        DataEmbedding, EncoderLayer, TransformerNet)

    d_model = tn["d_model"]

    emb_mod = DataEmbedding(tn["enc_in"], d_model, compute_dtype=jnp.bfloat16)
    lay_mod = EncoderLayer(d_model, tn["n_heads"], tn["d_ff"], "gelu", jnp.bfloat16)

    token = enc_params["learnable_token"]

    @jax.jit
    def emb(params, field):
        x = emb_mod.apply({"params": enc_params["enc_embedding"]}, field, fh, token)
        return jnp.sum(x)

    @jax.jit
    def lay1(params, field):
        x = emb_mod.apply({"params": enc_params["enc_embedding"]}, field, fh, token)
        x = lay_mod.apply({"params": enc_params["layer_0"]}, x)
        return jnp.sum(x)

    @jax.jit
    def full(params, field):
        tokens = model.apply(params, field, fh, method=PhysicsNet.encode)
        return jnp.sum(tokens[0])

    def median_slope(fn, args, reps=5, k1=50, k2=2050):
        _ = float(fn(*args))
        t0 = time.monotonic(); _ = float(fn(*args))
        if time.monotonic() - t0 > 5.0:
            reps = 3

        def timed(k):
            t0 = time.monotonic()
            out = None
            for _ in range(k):
                out = fn(*args)
            _ = float(out)
            return time.monotonic() - t0

        timed(100)
        return statistics.median((timed(k2) - timed(k1)) / (k2 - k1)
                                 for _ in range(reps))

    t_emb = median_slope(emb, (params, field))
    t_l1 = median_slope(lay1, (params, field))
    t_full = median_slope(full, (params, field))
    print(f"embedding only      : {t_emb*1e6:.1f} us")
    print(f"embedding + 1 layer : {t_l1*1e6:.1f} us  (layer ~ {(t_l1-t_emb)*1e6:.1f} us)")
    print(f"full encode         : {t_full*1e6:.1f} us  "
          f"(4 layers + head ~ {(t_full-t_emb)*1e6:.1f} us)", flush=True)


if __name__ == "__main__":
    main()
