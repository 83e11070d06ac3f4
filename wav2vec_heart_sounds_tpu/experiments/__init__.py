"""Ablation runners: CinC (single/two-branch), vest multichannel, synthetic schedules."""

from . import cinc, multichannel, synthetic
from .common import append_result, make_loader

__all__ = ["cinc", "multichannel", "synthetic", "append_result", "make_loader"]
