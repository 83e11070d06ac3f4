"""Batched overlapping window extraction (device twin of :mod:`..signal.segment`).

Matches the reference tensor twin's ``unfold`` semantics
(src/mpcg_wav2vec/signalproc/torchproc.py:118-129): drop the start pad, zero-pad up to one
window, then take hop-strided windows. Implemented as a static gather so it fuses under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..signal.segment import WindowSpec


def segment(x: jnp.ndarray, fs: float, spec: WindowSpec) -> jnp.ndarray:
    """``[B, T]`` -> ``[B, N, win]`` overlapping windows (also accepts ``[T]`` -> ``[N, win]``)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    win = spec.window_len(fs)
    hop = spec.hop_len(fs)
    x = x[:, spec.start_offset(fs):]
    if x.shape[-1] < win:
        x = jnp.pad(x, [(0, 0), (0, win - x.shape[-1])])
    n = 1 + (x.shape[-1] - win) // hop
    idx = hop * jnp.arange(n)[:, None] + jnp.arange(win)[None, :]   # [N, win]
    out = x[:, idx]
    return out[0] if squeeze else out
