"""Full-scale synthetic config with the 'pool' device sampler.

Identical to configs/synthetic_fullscale_cfg.py except
``train_cfg.tpu.ds_sampler='pool'`` (pre-permuted per-window label pools,
docs/PERF.md round-3 (j)) and its own data/checkpoint root
(``DPN_FULLSYNTH_POOL_DATA`` overrides it) so pool soaks never clobber
iid-soak artifacts.  Used to validate the pool sampler's convergence at
production scale.
"""

import os
import tempfile

_here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_here, "synthetic_fullscale_cfg.py")) as _f:
    _src = _f.read()

# The base config resolves its root from DPN_FULLSYNTH_DATA at exec time.
# Pin it to the POOL root only for the duration of the exec, then restore:
# a leaked override would silently redirect a later same-process (or
# child-process) load of the iid config into the pool root, and an existing
# user DPN_FULLSYNTH_DATA would silently share the iid root -- the exact
# clobbering this config exists to prevent.
_pool_root = os.environ.get(
    "DPN_FULLSYNTH_POOL_DATA",
    os.path.join(tempfile.gettempdir(), "dpn_fullsynth_pool_data"))
_prev = os.environ.get("DPN_FULLSYNTH_DATA")
os.environ["DPN_FULLSYNTH_DATA"] = _pool_root
try:
    exec(compile(_src, "synthetic_fullscale_cfg.py", "exec"))
finally:
    if _prev is None:
        del os.environ["DPN_FULLSYNTH_DATA"]
    else:
        os.environ["DPN_FULLSYNTH_DATA"] = _prev

# Config.fromfile deepcopies every module global: drop non-copyable helpers
del _f, _src, _prev, _pool_root, _here

config["train_cfg"]["tpu"]["ds_sampler"] = "pool"  # noqa: F821
