"""Pallas TPU kernels for ops where XLA fusion isn't enough.

* :mod:`.attention` — flash-style fused attention with in-kernel dropout (the profiled
  hot spot of wav2vec2 training at short sequence lengths).
* :mod:`.dropout` — hardware-PRNG dropout with backward mask recompute.
* :mod:`.beamformer` — fused time-varying sinc fractional delay with analytic VJP.
"""

from . import attention, beamformer, dropout

__all__ = ["attention", "beamformer", "dropout"]
