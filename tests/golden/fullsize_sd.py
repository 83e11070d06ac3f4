"""Synthetic full-size wav2vec2-base state dict in HF's torch key layout, numpy-only.

Why this exists: the reference's default mode consumes the real
``facebook/wav2vec2-base-960h`` checkpoint (reference src/mpcg_wav2vec/classify/
wav2vec.py:48-51), which cannot be downloaded in this environment — so full-size
(768-d / 12-layer / 64 000-sample) conversion correctness would otherwise never be
exercised. This module regenerates a deterministic full-size "checkpoint" from a numpy
seed using HF's exact key names and tensor shapes (validated once against a live
``transformers.Wav2Vec2Model`` by ``make_fullsize_golden.py``, which also records the
torch forward as ground truth). The parity test then reruns the conversion + our Flax
forward in any environment — no torch, no network, ~1 MB of stored goldens.

Distributions are chosen so 12 post-norm layers stay well-conditioned: dense/conv
weights ~ N(0, 0.05), norms ~ 1 + N(0, 0.05), biases ~ N(0, 0.02), weight-norm g ~
|N(1, 0.1)|.
"""

from __future__ import annotations

import numpy as np

CONV_DIM = (512, 512, 512, 512, 512, 512, 512)
CONV_KERNEL = (10, 3, 3, 3, 3, 2, 2)
HIDDEN = 768
LAYERS = 12
INTERMEDIATE = 3072
POS_K = 128
POS_GROUPS = 16


def _shapes() -> dict[str, tuple[int, ...]]:
    s: dict[str, tuple[int, ...]] = {"masked_spec_embed": (HIDDEN,)}
    cin = 1
    for i, (d, k) in enumerate(zip(CONV_DIM, CONV_KERNEL)):
        s[f"feature_extractor.conv_layers.{i}.conv.weight"] = (d, cin, k)
        cin = d
    s["feature_extractor.conv_layers.0.layer_norm.weight"] = (CONV_DIM[0],)
    s["feature_extractor.conv_layers.0.layer_norm.bias"] = (CONV_DIM[0],)
    s["feature_projection.layer_norm.weight"] = (CONV_DIM[-1],)
    s["feature_projection.layer_norm.bias"] = (CONV_DIM[-1],)
    s["feature_projection.projection.weight"] = (HIDDEN, CONV_DIM[-1])
    s["feature_projection.projection.bias"] = (HIDDEN,)
    s["encoder.pos_conv_embed.conv.bias"] = (HIDDEN,)
    s["encoder.pos_conv_embed.conv.parametrizations.weight.original0"] = (1, 1, POS_K)
    s["encoder.pos_conv_embed.conv.parametrizations.weight.original1"] = (
        HIDDEN, HIDDEN // POS_GROUPS, POS_K)
    s["encoder.layer_norm.weight"] = (HIDDEN,)
    s["encoder.layer_norm.bias"] = (HIDDEN,)
    for i in range(LAYERS):
        p = f"encoder.layers.{i}"
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            s[f"{p}.attention.{proj}.weight"] = (HIDDEN, HIDDEN)
            s[f"{p}.attention.{proj}.bias"] = (HIDDEN,)
        for lnm in ("layer_norm", "final_layer_norm"):
            s[f"{p}.{lnm}.weight"] = (HIDDEN,)
            s[f"{p}.{lnm}.bias"] = (HIDDEN,)
        s[f"{p}.feed_forward.intermediate_dense.weight"] = (INTERMEDIATE, HIDDEN)
        s[f"{p}.feed_forward.intermediate_dense.bias"] = (INTERMEDIATE,)
        s[f"{p}.feed_forward.output_dense.weight"] = (HIDDEN, INTERMEDIATE)
        s[f"{p}.feed_forward.output_dense.bias"] = (HIDDEN,)
    return s


def make_state_dict(seed: int = 42) -> dict[str, np.ndarray]:
    """Deterministic synthetic state dict; one child RNG per key so key order is free."""
    root = np.random.default_rng(seed)
    shapes = _shapes()
    out: dict[str, np.ndarray] = {}
    for name in sorted(shapes):
        shape = shapes[name]
        rng = np.random.default_rng(root.integers(0, 2**63))
        if name.endswith("original0"):
            v = np.abs(rng.normal(1.0, 0.1, shape))
        elif "norm.weight" in name:
            v = 1.0 + rng.normal(0.0, 0.05, shape)
        elif name.endswith(".bias") or "norm.bias" in name:
            v = rng.normal(0.0, 0.02, shape)
        elif name == "masked_spec_embed":
            v = rng.uniform(0.0, 1.0, shape)
        else:
            v = rng.normal(0.0, 0.05, shape)
        out[name] = v.astype(np.float32)
    return out


def make_inputs(seed: int = 7, lengths=(64000, 63489)) -> list[np.ndarray]:
    """Deterministic test waveforms (unit-scale), one [1, L] array per length.

    64 000 = the reference's 4 s @ 16 kHz CinC window; 63 489 exercises odd conv-length
    edge behavior at full scale.
    """
    rng = np.random.default_rng(seed)
    return [rng.normal(0.0, 0.5, (1, n)).astype(np.float32) for n in lengths]
