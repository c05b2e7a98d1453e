"""Host utilities: tracing spans, metrics registry."""

from leann_tpu.utils.trace import span, trace_log, configure_logging
from leann_tpu.utils.metrics import METRICS, Metrics

__all__ = ["span", "trace_log", "configure_logging", "METRICS", "Metrics"]
