"""Utility layer: logging, timing, metrics, profiling.

Replaces the reference's utils/ (Logging.h I3D_LOG macro logger,
timer.h Timer) with Python equivalents plus structured per-frame metrics
instead of log-scraping (SURVEY.md §5).
"""

from revo_tpu.utils.logging import get_logger, set_level, LEVELS
from revo_tpu.utils.timing import Timer, StageTimes, trace_to
from revo_tpu.utils.metrics import MetricsRecorder

__all__ = [
    "get_logger",
    "set_level",
    "LEVELS",
    "Timer",
    "StageTimes",
    "trace_to",
    "MetricsRecorder",
]
