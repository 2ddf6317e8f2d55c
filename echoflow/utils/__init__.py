"""Host utilities: visualization, cleanup, IO, caching, profiling, metrics."""

from echoflow.utils.cleanup import cleanup_binary, cleanup_segmentation  # noqa: F401
from echoflow.utils.metrics_log import MetricsLogger  # noqa: F401
from echoflow.utils.profiling import StepTimer, measure_throughput  # noqa: F401
