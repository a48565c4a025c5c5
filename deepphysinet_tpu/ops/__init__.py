from deepphysinet_tpu.ops.position_encoding import SineCosPE, sinecos_pe, make_freq_bands
from deepphysinet_tpu.ops.normalization import (
    NormSpec,
    normalize,
    inverse_normalize,
    norm_specs_from_cfg,
)
from deepphysinet_tpu.ops.coords import CoordSpec, encode_coord, coriolis
from deepphysinet_tpu.ops.interp import (
    trilinear_interp_cube,
    trilinear_interp_rows,
    trilinear_interp_rows_batched,
    trilinear_interp_table,
    trilinear_interp_table_batched,
)

__all__ = [
    "SineCosPE",
    "sinecos_pe",
    "make_freq_bands",
    "NormSpec",
    "normalize",
    "inverse_normalize",
    "norm_specs_from_cfg",
    "CoordSpec",
    "encode_coord",
    "coriolis",
    "trilinear_interp_cube",
    "trilinear_interp_rows",
    "trilinear_interp_rows_batched",
    "trilinear_interp_table",
    "trilinear_interp_table_batched",
]
