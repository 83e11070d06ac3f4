"""Per-channel encoder fusion — the two-branch PCG+ECG ``big_rnn:2:wav2vec`` topology.

Contract from reference src/mpcg_wav2vec/classify/fusion.py:17-38: each input channel goes
through its own Wav2Vec encoder; the mean-pooled 768-d features are concatenated and
classified by a 3-layer MLP (2h -> h -> classes, h = 128). Branches are trained separately
upstream and carried here as (module, params) pairs; only the fusion head's params live in
this module, so the standard trainer optimises exactly the reference's trainable surface.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .classifier import Wav2VecClassifier
from .wav2vec2 import HIDDEN


class FusionHead(nn.Module):
    num_classes: int = 2
    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> jnp.ndarray:
        h = features.astype(self.dtype)
        h = nn.relu(nn.Dense(2 * self.hidden, dtype=self.dtype, name="dense_0")(h))
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, name="dense_1")(h))
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="logits")(h)


class EncoderFusion:
    """Orchestrates N frozen branch encoders + one trainable fusion head.

    Exposes the same (encode / apply) surface the trainer expects from a classifier:
    branch params are closed over as constants (they are not updated during fusion fitting,
    mirroring the reference where branch training happens before fusion fitting).
    """

    def __init__(self, branches: list[tuple[Wav2VecClassifier, Any]], num_classes: int = 2,
                 hidden: int = 128, dtype: Any = jnp.float32):
        self.branches = branches
        self.head = FusionHead(num_classes=num_classes, hidden=hidden, dtype=dtype)
        self.feature_dim = sum(
            getattr(model.config.encoder, "hidden_size", HIDDEN) for model, _ in branches)

    def init_head(self, key: jax.Array):
        feats = jnp.zeros((1, self.feature_dim), jnp.float32)
        return self.head.init(key, feats)

    def encode(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        """``x``: [B, T, C] with one channel per branch -> [B, 768 * n_branches]."""
        if x.ndim != 3 or x.shape[2] != len(self.branches):
            raise ValueError(
                f"Expected [B, T, {len(self.branches)}] input, got {tuple(x.shape)}")
        feats = [
            model.apply(params, x[:, :, i], method=Wav2VecClassifier.encode)
            for i, (model, params) in enumerate(self.branches)
        ]
        return jnp.concatenate(feats, axis=1)

    def apply(self, head_params, x: jnp.ndarray, *, train: bool = False,
              mask_key=None, rngs=None) -> jnp.ndarray:
        return self.head.apply(head_params, self.encode(x, train=train))


def two_branch_pcg_ecg(pcg_branch: tuple[Wav2VecClassifier, Any],
                       ecg_branch: tuple[Wav2VecClassifier, Any],
                       num_classes: int = 2) -> EncoderFusion:
    return EncoderFusion([pcg_branch, ecg_branch], num_classes=num_classes)
