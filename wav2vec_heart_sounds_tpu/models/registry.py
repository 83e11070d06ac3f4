"""Generator registry: name -> model builder, loss strategy, sampler, conditioning mel.

Contract from reference src/mpcg_wav2vec/generative/registry.py:27-71: DiffWave mel
n_fft 1024 / hop 256 / 80 mels; WaveGrad win 1200 / n_fft next-pow2 (2048) / hop 300 /
128 mels; ``f_max`` 500 Hz for PCG vs 200 Hz for ECG conditioning; sample rate 4 kHz,
crop 96 frames. Fresh configs per lookup so nothing leaks between calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..signal.spectrogram import MelConfig
from .diffusion.diffwave import DiffWave, DiffWaveConfig
from .diffusion.samplers import diffwave_sample, wavegrad_sample
from .diffusion.wavegrad import WaveGrad, WaveGradConfig

_F_MAX = {"ecg": 200.0, "pcg": 500.0, "pcg_ref": 500.0}


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@dataclass
class GeneratorSpec:
    build_model: Callable
    loss: Callable                       # train.generative loss strategy
    sample: Callable                     # (model, variables, cond, label, key, **kw)
    mel: Callable[[str], MelConfig]
    sample_rate: int
    hop_length: int
    crop_frames: int


def _diffwave_mel(signal: str) -> MelConfig:
    return MelConfig(sample_rate=4000, n_fft=1024, hop_length=256, n_mels=80,
                     f_max=_F_MAX.get(signal, 500.0))


def _wavegrad_mel(signal: str) -> MelConfig:
    win = 300 * 4
    return MelConfig(sample_rate=4000, n_fft=_next_pow2(win), win_length=win,
                     hop_length=300, n_mels=128, f_max=_F_MAX.get(signal, 500.0))


def _registry() -> dict[str, GeneratorSpec]:
    from ..train.generative import diffwave_loss, wavegrad_loss

    return {
        "diffwave": GeneratorSpec(
            build_model=lambda num_classes, **kw: DiffWave(
                DiffWaveConfig(num_classes=num_classes), **kw),
            loss=diffwave_loss,
            sample=diffwave_sample,
            mel=_diffwave_mel,
            sample_rate=4000, hop_length=256, crop_frames=96,
        ),
        "wavegrad": GeneratorSpec(
            build_model=lambda num_classes, **kw: WaveGrad(
                WaveGradConfig(num_classes=num_classes), **kw),
            loss=wavegrad_loss,
            sample=wavegrad_sample,
            mel=_wavegrad_mel,
            sample_rate=4000, hop_length=300, crop_frames=96,
        ),
    }


def get_spec(name: str) -> GeneratorSpec:
    registry = _registry()
    key = name.lower()
    if key not in registry:
        raise ValueError(f"Unknown generator '{name}'. Options: {sorted(registry)}")
    return registry[key]
