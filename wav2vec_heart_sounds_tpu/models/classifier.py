"""Wav2Vec 2.0 heart-sound classifier family.

One model covers every configuration the reference exercises
(src/mpcg_wav2vec/classify/wav2vec.py:26-90): pretrained or random-init encoder; full
fine-tune, frozen encoder, or LoRA adapters (q/v projections); single-channel input or
multichannel collapsed by the sinc beamformer before the encoder. Mean-pooled encoder output
feeds a small MLP head; ``encode`` is exposed for feature losses, the SVM probe and fusion.

Freezing is expressed the JAX way: :func:`trainable_mask` yields a boolean pytree the
optimizer masks on (see train/optim.py), instead of mutating requires_grad.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .beamformer import TimeVaryingSincBeamformer
from .wav2vec2 import HIDDEN, Wav2Vec2Config, Wav2Vec2Model


@dataclass(frozen=True)
class ClassifierConfig:
    num_classes: int = 2
    num_channels: int = 1
    head_hidden: tuple[int, ...] = (256,)
    pretrained_name: str = "facebook/wav2vec2-base-960h"
    random_init: bool = False
    lora: bool = False
    freeze_encoder: bool = False
    fs: int = 4125
    encoder: Wav2Vec2Config = field(default_factory=Wav2Vec2Config)

    def encoder_config(self) -> Wav2Vec2Config:
        return replace(self.encoder, lora_rank=8 if self.lora else 0)


class MLPHead(nn.Module):
    hidden: tuple[int, ...]
    num_classes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = x.astype(self.dtype)
        for i, width in enumerate(self.hidden):
            h = nn.relu(nn.Dense(width, dtype=self.dtype, name=f"dense_{i}")(h))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(h)


class Wav2VecClassifier(nn.Module):
    config: ClassifierConfig
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Wav2Vec2Model(self.config.encoder_config(), dtype=self.dtype,
                                     name="encoder")
        if self.config.num_channels > 1:
            self.channel_mixer = TimeVaryingSincBeamformer(
                self.config.num_channels, self.config.fs, dtype=self.dtype,
                name="channel_mixer")
        self.head = MLPHead(self.config.head_hidden, self.config.num_classes,
                            dtype=self.dtype, name="head")

    def encode(self, x: jnp.ndarray, *, train: bool = False,
               mask_key: jax.Array | None = None) -> jnp.ndarray:
        """Mean-pooled encoder features [B, 768] for waveforms [B, T] or [B, T, C]."""
        if x.ndim == 3:
            x = jnp.swapaxes(x, 1, 2)                      # [B, C, T]
        if self.config.num_channels > 1:
            x = self.channel_mixer(x, deterministic=not train)
        elif x.ndim == 3:
            x = x[:, 0, :] if x.shape[1] == 1 else jnp.mean(x, axis=1)
        feats = self.encoder(x, train=train, mask_key=mask_key)
        return jnp.mean(feats, axis=1).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, *, train: bool = False,
                 mask_key: jax.Array | None = None) -> jnp.ndarray:
        return self.head(self.encode(x, train=train, mask_key=mask_key))

    def forward_with_features(self, x: jnp.ndarray, *, train: bool = False,
                              mask_key: jax.Array | None = None
                              ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(pooled features, logits) — the feature-aware loss path (ContrastiveFocal)."""
        feats = self.encode(x, train=train, mask_key=mask_key)
        return feats, self.head(feats)


def trainable_mask(params, config: ClassifierConfig):
    """Boolean pytree: True = trained, mirroring the reference's freeze/LoRA policy.

    * ``freeze_encoder``: everything under ``encoder`` frozen (head/beamformer train).
    * ``lora`` (and not frozen): encoder base frozen, only ``lora_a``/``lora_b`` train.
    * otherwise: everything trains.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        in_encoder = keys and keys[0] == "encoder"
        if not in_encoder:
            return True
        if config.freeze_encoder:
            return False
        if config.lora:
            return keys[-1] in ("lora_a", "lora_b")
        return True

    leaves = {jax.tree_util.keystr(path): decide(path) for path, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: leaves[jax.tree_util.keystr(path)], params)
