"""Coordinate engine: grid geometry, coordinate encoding, Coriolis.

Covers the reference's coordinate handling:
* ``encoding_coord`` (interface/interface_physics.py:322-332): physical (x, y, t)
  in meters/seconds normalized by (dx*(lon_size-1), dy*(lat_size-1), pred_t_span)
  then SineCos-encoded with 3 input dims, 32 freqs -> 192 features.
* ``get_coriolis`` (dataset/physics_dataset.py:521-526): f = 2 * omega * sin(lat).
* grid geometry of the study area (72-136E / 18-54N; 1 deg = 37x65,
  0.25 deg = 145x257; auxiliary_data coord pickles).
"""

from __future__ import annotations

import dataclasses
import pickle
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe

OMEGA = 7.29e-5  # dataset/physics_dataset.py:522


@dataclasses.dataclass(frozen=True)
class CoordSpec:
    """Static geometry closed over by the jitted train step."""

    lon_size: int  # output grid columns (145x257 default: 257)
    lat_size: int  # output grid rows (default: 145)
    dx: float  # meters per output grid step (configs: 27000)
    dy: float
    pred_t_span: float  # seconds covered by one input window (4*6h = 86400)
    n_freqs: int = 32
    max_freq: float = 4.0

    @property
    def pe_dim(self) -> int:
        return 2 * 3 * self.n_freqs  # 192 with defaults

    def freq_bands(self) -> np.ndarray:
        return make_freq_bands(self.n_freqs, self.max_freq)


def encode_coord(
    x: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray, spec: CoordSpec
) -> jnp.ndarray:
    """Normalize physical coords and PE them (interface_physics.py:322-332).

    x, y in meters, t in seconds; shapes [...,] or [..., 1]; returns [..., 192].
    """
    xn = x / spec.dx / (spec.lon_size - 1)
    yn = y / spec.dy / (spec.lat_size - 1)
    tn = t / spec.pred_t_span
    if xn.ndim <= 1:  # [N] -> stack to [N, 3] (interface_physics.py:327-328)
        coords = jnp.stack([xn, yn, tn], axis=-1)
    else:  # [N, 1] -> concat to [N, 3] (interface_physics.py:330)
        coords = jnp.concatenate([xn, yn, tn], axis=-1)
    return sinecos_pe(coords, spec.freq_bands(), include_input=False)


def coriolis(lat_deg: jnp.ndarray) -> jnp.ndarray:
    """f = 2*Omega*sin(lat), [N] -> [N, 1] (dataset/physics_dataset.py:521-526)."""
    f = 2.0 * OMEGA * jnp.sin(lat_deg / 180.0 * jnp.pi)
    if f.ndim == 1:
        f = f[:, None]
    return f


def make_latlon_grid(
    lon0: float = 72.0,
    lat0: float = 18.0,
    lon1: float = 136.0,
    lat1: float = 54.0,
    step: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build the study-area meshgrid in the coord-pickle layout: (lon2d, lat2d).

    Matches auxiliary_data/coord_1d.pickle (37x65 at 1 deg) and
    coord_0p25d.pickle (145x257 at 0.25 deg); lat ascends from south (row 0 = 18N).
    """
    lons = np.arange(lon0, lon1 + step / 2, step, dtype=np.float64)
    lats = np.arange(lat0, lat1 + step / 2, step, dtype=np.float64)
    lon2d, lat2d = np.meshgrid(lons, lats)
    return lon2d, lat2d


def save_coord_pickle(path: str, lon2d: np.ndarray, lat2d: np.ndarray) -> None:
    with open(path, "wb") as fp:
        pickle.dump((lon2d, lat2d), fp)


def load_coord_pickle(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a (lon2d, lat2d) coord pickle (dataset/physics_dataset.py:98-105)."""
    with open(path, "rb") as fp:
        lon, lat = pickle.load(fp)
    return np.asarray(lon), np.asarray(lat)
