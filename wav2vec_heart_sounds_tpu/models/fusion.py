"""Per-channel encoder fusion — the two-branch PCG+ECG ``big_rnn:2:wav2vec`` topology.

Contract from reference src/mpcg_wav2vec/classify/fusion.py:17-38: each input channel goes
through its own Wav2Vec encoder; the mean-pooled 768-d features are concatenated and
classified by a 3-layer MLP (2h -> h -> classes, h = 128). Branches arrive pre-trained and
keep fine-tuning during fusion fitting (the reference optimises all fusion parameters).

Parameters are one explicit bundle ``{"head": ..., "branch_i": ...}`` passed through
``apply`` — never closed over — so jitted programs ship no weight constants (the remote
compiler rejects multi-hundred-MB constant-embedded HLO).
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
    """N branch encoders + fusion head behind the classifier (model, variables) surface."""

    def __init__(self, branch_models: list[Wav2VecClassifier], num_classes: int = 2,
                 hidden: int = 128, dtype: Any = jnp.float32):
        self.branch_models = branch_models
        self.head = FusionHead(num_classes=num_classes, hidden=hidden, dtype=dtype)
        self.feature_dim = sum(
            getattr(m.config.encoder, "hidden_size", HIDDEN) for m in branch_models)

    def init_variables(self, key: jax.Array, branch_variables: list[dict]) -> dict:
        """Bundle pre-trained branch params with a fresh fusion-head init."""
        feats = jnp.zeros((1, self.feature_dim), jnp.float32)
        head = self.head.init(key, feats)["params"]
        params = {"head": head}
        for i, variables in enumerate(branch_variables):
            params[f"branch_{i}"] = variables["params"]
        return {"params": params}

    def encode(self, variables: dict, x: jnp.ndarray, *, train: bool = False,
               mask_key=None, rngs=None) -> jnp.ndarray:
        """``x``: [B, T, C], one channel per branch -> concatenated pooled features."""
        if x.ndim != 3 or x.shape[2] != len(self.branch_models):
            raise ValueError(
                f"Expected [B, T, {len(self.branch_models)}] input, got {tuple(x.shape)}")
        p = variables["params"]
        feats = []
        for i, model in enumerate(self.branch_models):
            kwargs = {"train": train}
            if train and rngs is not None:
                kwargs["rngs"] = rngs
            if train and mask_key is not None:
                kwargs["mask_key"] = jax.random.fold_in(mask_key, i)
            feats.append(model.apply({"params": p[f"branch_{i}"]}, x[:, :, i],
                                     method=Wav2VecClassifier.encode, **kwargs))
        return jnp.concatenate(feats, axis=1)

    def apply(self, variables: dict, x: jnp.ndarray, *, train: bool = False,
              mask_key=None, rngs=None) -> jnp.ndarray:
        feats = self.encode(variables, x, train=train, mask_key=mask_key, rngs=rngs)
        return self.head.apply({"params": variables["params"]["head"]}, feats)


def two_branch_pcg_ecg(pcg_branch: tuple[Wav2VecClassifier, dict],
                       ecg_branch: tuple[Wav2VecClassifier, dict],
                       num_classes: int = 2,
                       key: jax.Array | None = None) -> tuple[EncoderFusion, dict]:
    """(fusion model, initial variables) from two trained (model, variables) branches."""
    (pcg_model, pcg_vars), (ecg_model, ecg_vars) = pcg_branch, ecg_branch
    fusion = EncoderFusion([pcg_model, ecg_model], num_classes=num_classes)
    variables = fusion.init_variables(key if key is not None else jax.random.key(0),
                                      [pcg_vars, ecg_vars])
    return fusion, variables
