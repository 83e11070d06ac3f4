"""TPU-native heart-sound classification framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the reference
MilanMarocchi/wav2vec-heart-sounds pipeline (see SURVEY.md): dual-path signal processing
(NumPy oracle + batched jit-compiled device twin), waveform augmentation, CinC/vest/generated
dataset assembly, a Flax wav2vec2 classifier family (LoRA / freeze / beamformer / fusion),
DiffWave + WaveGrad diffusion vocoders with scan-based samplers, experiment runners and a CLI.

Layer map (bottom-up), mirroring reference src/mpcg_wav2vec/__init__.py:3-10:

    config -> signal (oracle) / ops (device kernels) -> augment -> data
           -> models -> train -> experiments -> reporting -> cli
"""

__version__ = "0.1.0"

__all__ = [
    "config",
    "signal",
    "ops",
    "augment",
    "data",
    "models",
    "train",
    "parallel",
    "experiments",
    "reporting",
]
