from .pytree import PytreeNode, register_model
from .profiling import ThroughputMeter, annotate, capture_trace

__all__ = [
    "PytreeNode",
    "register_model",
    "ThroughputMeter",
    "annotate",
    "capture_trace",
]
