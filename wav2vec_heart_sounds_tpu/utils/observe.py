"""Observability: scalar logging (JSONL + optional TensorBoard) and profiler hooks.

The reference's observability surface (SURVEY.md §5) is tqdm bars + optional TensorBoard
scalars. Here every trainer writes machine-readable JSONL scalars; TensorBoard mirrors them
when the package is importable; and :func:`trace` wraps a region in a ``jax.profiler`` trace
for TPU timeline capture — the profiling hook the reference lacks.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Iterator


class ScalarLogger:
    """Append-only scalar sink: ``scalars.jsonl`` rows + optional TensorBoard mirror."""

    def __init__(self, log_dir: str | None):
        self.log_dir = log_dir
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            try:
                from torch.utils.tensorboard.writer import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if not self.log_dir:
            return
        with open(os.path.join(self.log_dir, "scalars.jsonl"), "a") as fh:
            fh.write(json.dumps({"tag": tag, "value": float(value), "step": int(step),
                                 "time": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, prefix: str, values: dict[str, float], step: int) -> None:
        for name, value in values.items():
            self.scalar(f"{prefix}/{name}", value, step)

    def flush(self) -> None:
        if self._tb is not None:
            self._tb.flush()


@contextlib.contextmanager
def trace(log_dir: str | None, label: str = "trace") -> Iterator[None]:
    """Capture a ``jax.profiler`` trace of the enclosed region (no-op without a log_dir)."""
    if not log_dir:
        yield
        return
    import jax

    path = os.path.join(log_dir, label)
    os.makedirs(path, exist_ok=True)
    try:
        jax.profiler.start_trace(path)
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def stopwatch(sink: dict, key: str) -> Iterator[None]:
    """Accumulate wall time of the enclosed region into ``sink[key]``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink[key] = sink.get(key, 0.0) + time.perf_counter() - t0
