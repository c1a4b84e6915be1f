from .runner import CheckpointedJob, KernelMetrics  # noqa: F401
from .rollup import ContinuousAggregate  # noqa: F401
