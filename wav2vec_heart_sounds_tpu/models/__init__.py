"""Model family: wav2vec2 encoder/classifier, beamformer, fusion, diffusion vocoders."""

from .beamformer import TimeVaryingSincBeamformer
from .classifier import ClassifierConfig, MLPHead, Wav2VecClassifier, trainable_mask
from .fusion import EncoderFusion, FusionHead, two_branch_pcg_ecg
from .wav2vec2 import HIDDEN, Wav2Vec2Config, Wav2Vec2Model

__all__ = [
    "TimeVaryingSincBeamformer",
    "ClassifierConfig",
    "MLPHead",
    "Wav2VecClassifier",
    "trainable_mask",
    "EncoderFusion",
    "FusionHead",
    "two_branch_pcg_ecg",
    "HIDDEN",
    "Wav2Vec2Config",
    "Wav2Vec2Model",
]
