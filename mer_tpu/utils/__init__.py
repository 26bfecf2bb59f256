from mer_tpu.utils.logging import RunLogger
from mer_tpu.utils.profiling import StepTimer, trace

__all__ = ["RunLogger", "StepTimer", "trace"]
