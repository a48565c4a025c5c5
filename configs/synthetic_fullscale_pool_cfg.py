"""Full-scale synthetic config with the 'pool' device sampler.

Identical to configs/synthetic_fullscale_cfg.py except
``train_cfg.tpu.ds_sampler='pool'`` (pre-permuted per-window label pools,
docs/PERF.md round-3 (j)) and its own data/checkpoint root so pool soaks
never clobber iid-soak artifacts.  Used to validate the pool sampler's
convergence at production scale.
"""

import os
import tempfile

os.environ.setdefault(
    "DPN_FULLSYNTH_DATA",
    os.path.join(tempfile.gettempdir(), "dpn_fullsynth_pool_data"))

_here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_here, "synthetic_fullscale_cfg.py")) as _f:
    _src = _f.read()
exec(compile(_src, "synthetic_fullscale_cfg.py", "exec"))
# Config.fromfile deepcopies every module global: drop non-copyable helpers
del _f, _src

config["train_cfg"]["tpu"]["ds_sampler"] = "pool"  # noqa: F821
