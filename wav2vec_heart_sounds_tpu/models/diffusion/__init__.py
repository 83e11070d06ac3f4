"""Diffusion vocoders (DiffWave, WaveGrad) with scan-based samplers."""

from .diffwave import DiffWave, DiffWaveConfig
from .samplers import align_fast_steps, diffwave_sample, wavegrad_sample
from .schedules import DiffusionStepEmbedding, NoiseSchedule, noise_level_encoding
from .wavegrad import WaveGrad, WaveGradConfig

__all__ = [
    "DiffWave",
    "DiffWaveConfig",
    "WaveGrad",
    "WaveGradConfig",
    "NoiseSchedule",
    "DiffusionStepEmbedding",
    "noise_level_encoding",
    "diffwave_sample",
    "wavegrad_sample",
    "align_fast_steps",
]
