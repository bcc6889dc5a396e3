from vcrnet_tpu.utils.logging import IOStream, MetricsWriter, StepTimer, profile_trace
from vcrnet_tpu.utils.params_io import (
    save_params_table,
    count_params,
    device_memory_mb,
)

__all__ = [
    "IOStream",
    "MetricsWriter",
    "StepTimer",
    "profile_trace",
    "save_params_table",
    "count_params",
    "device_memory_mb",
]
