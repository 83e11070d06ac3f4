"""Diffusion noise schedules and conditioning embeddings (shared by both vocoders).

Contract from reference src/mpcg_wav2vec/generative/schedules.py:22-92: linear beta schedule
with cached alpha terms; DiffWave trains on discrete steps (levels = cumprod(1-beta)) with a
sinusoidal step embedding supporting **fractional-step interpolation** for fast sampling;
WaveGrad trains on continuous noise levels (sqrt(cumprod) prefixed with 1.0) injected through
a Fourier noise-level encoding.
"""

from __future__ import annotations

from dataclasses import dataclass
from math import log
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NoiseSchedule:
    betas: tuple[float, ...]

    @classmethod
    def linear(cls, start: float, end: float, steps: int) -> "NoiseSchedule":
        return cls(tuple(np.linspace(start, end, steps, dtype=np.float64)))

    def __len__(self) -> int:
        return len(self.betas)

    @property
    def alphas(self) -> np.ndarray:
        return 1.0 - np.asarray(self.betas)

    @property
    def alpha_cumprod(self) -> np.ndarray:
        return np.cumprod(self.alphas)

    def training_noise_levels(self) -> np.ndarray:
        """cumprod(1-beta): signal variance retained at each discrete step (DiffWave)."""
        return self.alpha_cumprod

    def continuous_noise_levels(self) -> np.ndarray:
        """sqrt(cumprod(1-beta)) prefixed with 1.0 (WaveGrad continuous lookup)."""
        return np.concatenate([[1.0], np.sqrt(self.alpha_cumprod)])


def step_embedding_table(num_steps: int, dim: int = 128,
                         max_freq_exp: float = 4.0) -> np.ndarray:
    """Sinusoidal embedding of integer steps -> ``[num_steps, dim]`` (host-built constant)."""
    half = dim // 2
    freqs = 10.0 ** (np.arange(half) * max_freq_exp / (half - 1))
    args = np.arange(num_steps)[:, None] * freqs[None, :]
    return np.concatenate([np.sin(args), np.cos(args)], axis=-1).astype(np.float32)


class DiffusionStepEmbedding(nn.Module):
    """Cached step table + SiLU MLP with fractional-step interpolation (fast sampling)."""
    num_steps: int
    dim: int = 128
    hidden: int = 512
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, step: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(step_embedding_table(self.num_steps, self.dim))
        if jnp.issubdtype(step.dtype, jnp.integer):
            x = table[step]
        else:
            lo = jnp.floor(step).astype(jnp.int32)
            hi = jnp.ceil(step).astype(jnp.int32)
            frac = (step - lo)[..., None]
            x = table[lo] + (table[hi] - table[lo]) * frac
        x = nn.silu(nn.Dense(self.hidden, dtype=self.dtype, name="proj1")(x.astype(self.dtype)))
        return nn.silu(nn.Dense(self.hidden, dtype=self.dtype, name="proj2")(x))


def noise_level_encoding(x: jnp.ndarray, noise_level: jnp.ndarray) -> jnp.ndarray:
    """Add a Fourier encoding of a continuous noise level to ``[B, T, C]`` features."""
    channels = x.shape[-1]
    half = channels // 2
    steps = jnp.arange(half, dtype=x.dtype) / half
    enc = noise_level[:, None].astype(x.dtype) * jnp.exp(-log(1e4) * steps)[None, :]
    enc = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)
    return x + enc[:, None, :]
