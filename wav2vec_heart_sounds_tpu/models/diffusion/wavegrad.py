"""WaveGrad: class- and mel-conditioned continuous-noise-level diffusion vocoder, in Flax.

Capability contract from reference src/mpcg_wav2vec/generative/wavegrad.py:19-155 (Chen et al.
2020): a waveform U-net — down-sampling DBlocks produce FiLM (shift, scale) pairs (with the
class label injected in the FiLM), up-sampling UBlocks decode from the mel conditioner under
those modulations, factors 5/5/3/2/2 whose product equals the hop (300). 1000-step training
schedule; inference may sub-sample steps.

Channels-last throughout; nearest-neighbour resizes express torch's default F.interpolate.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .schedules import NoiseSchedule, noise_level_encoding

_ortho = nn.initializers.orthogonal()


@dataclass(frozen=True)
class WaveGradConfig:
    sample_rate: int = 4000
    n_mels: int = 128
    hop_length: int = 300
    num_classes: int = 2
    label_dim: int = 32
    train_beta: tuple[float, float, int] = (1e-6, 0.01, 1000)

    def training_schedule(self) -> NoiseSchedule:
        return NoiseSchedule.linear(*self.train_beta)


def _resize(x: jnp.ndarray, length: int) -> jnp.ndarray:
    """Nearest-neighbour resize of [B, T, C] along time (torch F.interpolate default)."""
    return jax.image.resize(x, (x.shape[0], length, x.shape[2]), method="nearest")


def _conv(features: int, kernel: int, dilation: int = 1, name: str | None = None,
          dtype=jnp.float32) -> nn.Conv:
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(features, kernel_size=(kernel,), kernel_dilation=(dilation,),
                   padding=[(pad, pad)], kernel_init=_ortho,
                   bias_init=nn.initializers.zeros, dtype=dtype, name=name)


class FiLM(nn.Module):
    """(features, noise level, label) -> (shift, scale) modulations."""
    in_ch: int
    out_ch: int
    num_classes: int
    label_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, noise_level, label):
        label_embed = nn.Embed(self.num_classes, self.label_dim, dtype=self.dtype,
                               name="label_embedding")(label)
        label_feat = nn.Dense(self.in_ch, kernel_init=nn.initializers.xavier_uniform(),
                              dtype=self.dtype, name="label_proj")(label_embed)
        x = nn.Conv(self.in_ch, kernel_size=(3,), padding=[(1, 1)],
                    kernel_init=nn.initializers.xavier_uniform(),
                    dtype=self.dtype, name="input_conv")(x + label_feat[:, None, :])
        x = noise_level_encoding(nn.leaky_relu(x, 0.2), noise_level)
        out = nn.Conv(2 * self.out_ch, kernel_size=(3,), padding=[(1, 1)],
                      kernel_init=nn.initializers.xavier_uniform(),
                      dtype=self.dtype, name="output_conv")(x)
        shift, scale = jnp.split(out, 2, axis=-1)
        return shift, scale


class DBlock(nn.Module):
    """Down-sampling residual block."""
    out_ch: int
    factor: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        size = x.shape[1] // self.factor
        residual = _resize(_conv(self.out_ch, 1, name="residual", dtype=self.dtype)(x), size)
        x = _resize(x, size)
        for i, dil in enumerate((1, 2, 4)):
            x = _conv(self.out_ch, 3, dil, name=f"conv_{i}",
                      dtype=self.dtype)(nn.leaky_relu(x, 0.2))
        return x + residual


class UBlock(nn.Module):
    """Up-sampling residual block modulated by FiLM (shift, scale)."""
    out_ch: int
    factor: int
    dilations: tuple[int, int, int, int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, shift, scale):
        size = x.shape[1] * self.factor
        skip = _conv(self.out_ch, 1, name="skip", dtype=self.dtype)(_resize(x, size))

        h = _conv(self.out_ch, 3, self.dilations[0], name="conv_a0",
                  dtype=self.dtype)(_resize(nn.leaky_relu(x, 0.2), size))
        h = _conv(self.out_ch, 3, self.dilations[1], name="conv_a1",
                  dtype=self.dtype)(nn.leaky_relu(shift + scale * h, 0.2))
        x = skip + h

        h = _conv(self.out_ch, 3, self.dilations[2], name="conv_b0",
                  dtype=self.dtype)(nn.leaky_relu(shift + scale * x, 0.2))
        h = _conv(self.out_ch, 3, self.dilations[3], name="conv_b1",
                  dtype=self.dtype)(nn.leaky_relu(shift + scale * h, 0.2))
        return x + h


class WaveGrad(nn.Module):
    config: WaveGradConfig
    dtype: Any = jnp.float32

    _down = ((128, 2), (128, 2), (256, 3), (512, 5))
    _film = ((32, 128), (128, 128), (128, 256), (256, 512), (512, 512))
    _up = ((512, 5, (1, 2, 1, 2)), (512, 5, (1, 2, 1, 2)), (256, 3, (1, 2, 4, 8)),
           (128, 2, (1, 2, 4, 8)), (128, 2, (1, 2, 4, 8)))

    @nn.compact
    def __call__(self, audio: jnp.ndarray, conditioner: jnp.ndarray,
                 noise_level: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        """audio [B, T], conditioner [B, n_mels, frames], noise_level [B], label [B] -> [B, T]."""
        cfg = self.config
        x = _conv(32, 5, name="init_conv", dtype=self.dtype)(
            audio[:, :, None].astype(self.dtype))
        stages = [x]
        for i, (ch, factor) in enumerate(self._down):
            x = DBlock(ch, factor, dtype=self.dtype, name=f"down_{i}")(x)
            stages.append(x)

        modulations = []
        for i, ((in_ch, out_ch), feat) in enumerate(zip(self._film, stages)):
            modulations.append(FiLM(in_ch, out_ch, cfg.num_classes, cfg.label_dim,
                                    dtype=self.dtype, name=f"film_{i}")(
                feat, noise_level, label))

        # Keep exactly audio_len / hop mel frames so the upsample path matches the audio.
        frames = audio.shape[-1] // cfg.hop_length
        cond = jnp.swapaxes(conditioner[:, :, :frames], 1, 2).astype(self.dtype)  # [B, F, M]
        h = _conv(768, 3, name="first_conv", dtype=self.dtype)(cond)
        for i, ((ch, factor, dils), (shift, scale)) in enumerate(
                zip(self._up, reversed(modulations))):
            h = UBlock(ch, factor, dils, dtype=self.dtype, name=f"up_{i}")(h, shift, scale)
        out = _conv(1, 3, name="last_conv", dtype=jnp.float32)(h.astype(jnp.float32))
        return out[:, :, 0]
