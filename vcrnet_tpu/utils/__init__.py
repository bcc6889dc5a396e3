from vcrnet_tpu.utils.logging import IOStream, MetricsWriter, StepTimer, profile_trace

__all__ = ["IOStream", "MetricsWriter", "StepTimer", "profile_trace"]
