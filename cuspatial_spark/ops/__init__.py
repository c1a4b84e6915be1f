from .runner import CheckpointedJob, KernelMetrics  # noqa: F401
