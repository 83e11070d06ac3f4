"""Cross-cutting utilities: observability, checkpoints."""

from .observe import ScalarLogger, stopwatch, trace

__all__ = ["ScalarLogger", "trace", "stopwatch"]
