from deepphysinet_tpu.utils import path_utils
from deepphysinet_tpu.utils.time_metric import TimeMetric

__all__ = ["path_utils", "TimeMetric"]
