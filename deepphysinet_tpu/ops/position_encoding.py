"""NeRF-style sine/cosine frequency encodings.

Functional JAX port of the reference SineCosPE (utils/position_encoding.py:11-49):
log-spaced frequency bands ``2**linspace(0, max_freq, N_freqs)``; the output
feature layout is frequency-major, then function (sin before cos), then channel
-- byte-for-byte the same ordering the torch module produces via its
transpose/stack/reshape sequence, so generated hypernetwork weights see features
in identical positions.

These encodings sit inside the differentiated collocation path: the spatial and
temporal derivatives of the model come entirely from d/dx of sin/cos features,
so they are always evaluated in float32 regardless of the compute dtype used
for the matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def make_freq_bands(n_freqs: int, max_freq: float = 4.0, log_sampling: bool = True) -> np.ndarray:
    """Frequency bands, matching utils/position_encoding.py:33-36."""
    if log_sampling:
        return np.asarray(2.0 ** np.linspace(0.0, max_freq, n_freqs), dtype=np.float32)
    return np.asarray(np.linspace(2.0**0.0, 2.0**max_freq, n_freqs), dtype=np.float32)


def sinecos_pe(
    x: jnp.ndarray,
    freq_bands: jnp.ndarray,
    include_input: bool = False,
) -> jnp.ndarray:
    """Apply the encoding to ``x[..., C]`` -> ``[..., (2*F*C [+ C])]``.

    Layout matches utils/position_encoding.py:38-49: [..., F, {sin,cos}, C]
    flattened over the last three axes.
    """
    x32 = x.astype(jnp.float32)
    fb = jnp.asarray(freq_bands, dtype=jnp.float32)
    xf = x32[..., :, None] * fb  # [..., C, F]
    xf = jnp.swapaxes(xf, -1, -2)  # [..., F, C]
    emb = jnp.stack([jnp.sin(xf), jnp.cos(xf)], axis=-2)  # [..., F, 2, C]
    emb = emb.reshape(x.shape[:-1] + (-1,))
    if include_input:
        emb = jnp.concatenate([x32, emb], axis=-1)
    return emb


def sinecos_pe_flat(
    x: jnp.ndarray,
    freq_bands: jnp.ndarray,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """``sinecos_pe(include_input=False)`` with the output cast fused in.

    Hot-path variant for the kernel engines: the encodings only ever feed
    compute-dtype matmuls there, so emitting ``dtype`` directly lets XLA
    fuse the cast into the producing fusion instead of running a separate
    pass over the lane-padded f32 form.  The trig computation itself stays
    the stacked reference formulation — layout-flat rewrites (lane tile /
    K=C matmul angle builds) measured slower on v5e
    (scripts/perf_prep_variants.py, docs/PERF.md round 4 (j)).
    """
    return sinecos_pe(x, freq_bands, include_input=False).astype(dtype)


class SineCosPE:
    """Stateless callable wrapper carrying the band configuration.

    Mirrors the constructor surface of the reference module
    (utils/position_encoding.py:13-14) minus torch-specific knobs.
    """

    def __init__(
        self,
        input_dim: int,
        N_freqs: int = 32,
        max_freq: float = 4.0,
        log_sampling: bool = True,
        include_input: bool = True,
    ):
        self.input_dim = input_dim
        self.n_freqs = N_freqs
        self.include_input = include_input
        self.freq_bands = make_freq_bands(N_freqs, max_freq, log_sampling)
        self.out_dim = 2 * input_dim * N_freqs + (input_dim if include_input else 0)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return sinecos_pe(x, self.freq_bands, self.include_input)

    # reference-parity alias (torch modules are invoked via .forward)
    forward = __call__
