"""DiffWave: class- and mel-conditioned discrete-step DDPM vocoder, in Flax.

Capability contract from reference src/mpcg_wav2vec/generative/diffwave.py:25-136 (itself a
re-expression of Kong et al. 2020): 1x1 in-projection -> 30 gated dilated residual conv blocks
(dilation 2^(i mod 10), 64 channels; each conditioned on the diffusion-step embedding, a
transposed-conv-upsampled mel and a class-label embedding) -> summed skips -> zero-init
out-projection predicting epsilon. 50-step training schedule, 6-step fast inference betas.

TPU notes: everything is channels-last so the dilated convs and 1x1 projections lower to MXU
matmuls; the transposed mel upsampler is expressed as an lhs-dilated convolution (exact
ConvTranspose2d semantics, no scatter).
"""

from __future__ import annotations

from dataclasses import dataclass
from math import sqrt
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .schedules import DiffusionStepEmbedding, NoiseSchedule


@dataclass(frozen=True)
class DiffWaveConfig:
    sample_rate: int = 4000
    n_mels: int = 80
    n_fft: int = 1024
    hop_length: int = 256
    residual_layers: int = 30
    residual_channels: int = 64
    dilation_cycle: int = 10
    step_hidden: int = 512
    num_classes: int = 2
    label_dim: int = 32
    train_beta: tuple[float, float, int] = (1e-4, 0.05, 50)
    inference_betas: tuple = (0.0001, 0.001, 0.01, 0.05, 0.2, 0.5)

    def training_schedule(self) -> NoiseSchedule:
        return NoiseSchedule.linear(*self.train_beta)

    def upsample_factors(self) -> tuple[int, int]:
        """Two transposed-conv strides whose product equals the hop length."""
        hop = self.hop_length
        for a in range(int(sqrt(hop)), 0, -1):
            if hop % a == 0:
                return a, hop // a
        return 1, hop


def conv_transpose2d_torchlike(x: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray, stride_w: int,
                               pad_h: int, pad_w: int) -> jnp.ndarray:
    """torch ConvTranspose2d(1->1, (kh, kw), stride (1, sw), padding (ph, pw)) on [B, H, W, 1].

    Expressed as an lhs-dilated correlation with a spatially flipped kernel — fuses cleanly
    under XLA instead of scattering.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = jnp.flip(kernel, axis=(0, 1))
    out = jax.lax.conv_general_dilated(
        x, flipped,
        window_strides=(1, 1),
        padding=[(kh - 1 - pad_h, kh - 1 - pad_h), (kw - 1 - pad_w, kw - 1 - pad_w)],
        lhs_dilation=(1, stride_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias


class MelUpsampler(nn.Module):
    """[B, n_mels, frames] -> [B, n_mels, frames * hop] via two leaky-ReLU transposed convs."""
    factors: tuple[int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        x = mel[:, :, :, None].astype(self.dtype)          # [B, M, F, 1]
        for i, f in enumerate(self.factors):
            kernel = self.param(f"kernel_{i}", nn.initializers.lecun_normal(),
                                (3, 2 * f, 1, 1))
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (1,))
            x = conv_transpose2d_torchlike(x, kernel.astype(self.dtype),
                                           bias.astype(self.dtype), f, 1, f // 2)
            x = nn.leaky_relu(x, 0.4)
        return x[:, :, :, 0]                               # [B, M, F * hop]


def _match_time(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Crop or zero-pad ``[B, T, C]`` along time to exactly ``length``."""
    if x.shape[1] > length:
        return x[:, :length, :]
    if x.shape[1] < length:
        return jnp.pad(x, [(0, 0), (0, length - x.shape[1]), (0, 0)])
    return x


class ResidualBlock(nn.Module):
    n_mels: int
    channels: int
    dilation: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, step_embed, conditioner, label_embed):
        c, d = self.channels, self.dilation
        y = x + nn.Dense(c, dtype=self.dtype, name="step_proj")(step_embed)[:, None, :]
        y = nn.Conv(2 * c, kernel_size=(3,), kernel_dilation=(d,), padding=[(d, d)],
                    kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
                    name="dilated")(y)
        y = y + nn.Dense(2 * c, kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
                         name="cond_proj")(conditioner)
        y = y + nn.Dense(2 * c, kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
                         name="label_proj")(label_embed)[:, None, :]
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        out = nn.Dense(2 * c, kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
                       name="out_proj")(y)
        residual, skip = jnp.split(out, 2, axis=-1)
        return (x + residual) / sqrt(2.0), skip


class DiffWave(nn.Module):
    config: DiffWaveConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, audio: jnp.ndarray, step: jnp.ndarray, conditioner: jnp.ndarray,
                 label: jnp.ndarray) -> jnp.ndarray:
        """audio [B, T], step [B], conditioner [B, n_mels, frames], label [B] -> eps [B, T]."""
        cfg = self.config
        c = cfg.residual_channels
        x = nn.relu(nn.Dense(c, kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
                             name="input_projection")(audio[:, :, None].astype(self.dtype)))
        step_embed = DiffusionStepEmbedding(len(cfg.training_schedule()),
                                            hidden=cfg.step_hidden, dtype=self.dtype,
                                            name="step_embedding")(step)
        cond = MelUpsampler(cfg.upsample_factors(), dtype=self.dtype,
                            name="mel_upsampler")(conditioner)
        cond = _match_time(jnp.swapaxes(cond, 1, 2), x.shape[1])    # [B, T, n_mels]
        label_embed = nn.Embed(cfg.num_classes, cfg.label_dim, dtype=self.dtype,
                               name="label_embedding")(label)

        skip = 0.0
        for i in range(cfg.residual_layers):
            x, s = ResidualBlock(cfg.n_mels, c, 2 ** (i % cfg.dilation_cycle),
                                 dtype=self.dtype, name=f"residual_{i}")(
                x, step_embed, cond, label_embed)
            skip = skip + s
        x = skip / sqrt(cfg.residual_layers)
        x = nn.relu(nn.Dense(c, kernel_init=nn.initializers.he_normal(), dtype=self.dtype,
                             name="skip_projection")(x))
        out = nn.Dense(1, kernel_init=nn.initializers.zeros, dtype=jnp.float32,
                       name="output_projection")(x)
        return out[:, :, 0]
