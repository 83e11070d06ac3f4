"""Model family: wav2vec2 encoder/classifier, beamformer, fusion, diffusion vocoders."""

from .beamformer import TimeVaryingSincBeamformer
from .build import build_classifier, build_two_branch, default_compute_dtype
from .classifier import ClassifierConfig, MLPHead, Wav2VecClassifier, trainable_mask
from .fusion import EncoderFusion, FusionHead, two_branch_pcg_ecg
from .registry import GeneratorSpec, get_spec
from .wav2vec2 import HIDDEN, Wav2Vec2Config, Wav2Vec2Model
from . import diffusion, hf_port

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
    "build_classifier",
    "build_two_branch",
    "default_compute_dtype",
    "GeneratorSpec",
    "get_spec",
    "diffusion",
    "hf_port",
]
