from mer_tpu.utils.logging import RunLogger, tree_norms, watch_norms
from mer_tpu.utils.profiling import StepTimer, trace

__all__ = ["RunLogger", "StepTimer", "trace", "tree_norms", "watch_norms"]
