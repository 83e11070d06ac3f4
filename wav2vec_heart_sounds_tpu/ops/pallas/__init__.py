"""Pallas TPU kernels for ops where XLA fusion isn't enough."""

from . import beamformer

__all__ = ["beamformer"]
