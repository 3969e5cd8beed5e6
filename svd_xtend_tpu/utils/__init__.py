from .logging import MetricWriter, get_logger  # noqa: F401
