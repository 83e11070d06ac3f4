"""HF ``transformers`` Wav2Vec2 checkpoint -> Flax parameter conversion.

Ports a torch ``Wav2Vec2Model`` state dict (e.g. ``facebook/wav2vec2-base-960h``, reference
src/mpcg_wav2vec/classify/wav2vec.py:48-51) into this framework's parameter pytree. The
weight-normalised positional conv is materialised (g * v / ||v||, norm over dims (0, 1) per
torch ``weight_norm(dim=2)``), conv kernels transpose (out, in, k) -> (k, in, out), and dense
kernels transpose. Loading is offline-tolerant: if the checkpoint is not in the local HF
cache, callers fall back to random init exactly like the reference's offline-skip strategy
(reference tests/test_classify.py:6-8).
"""

from __future__ import annotations

import numpy as np

from .wav2vec2 import Wav2Vec2Config


def config_from_hf(hf_config) -> Wav2Vec2Config:
    return Wav2Vec2Config(
        conv_dim=tuple(hf_config.conv_dim),
        conv_kernel=tuple(hf_config.conv_kernel),
        conv_stride=tuple(hf_config.conv_stride),
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        intermediate_size=hf_config.intermediate_size,
        pos_conv_kernel=hf_config.num_conv_pos_embeddings,
        pos_conv_groups=hf_config.num_conv_pos_embedding_groups,
        layer_norm_eps=hf_config.layer_norm_eps,
        hidden_dropout=hf_config.hidden_dropout,
        attention_dropout=hf_config.attention_dropout,
        activation_dropout=hf_config.activation_dropout,
        feat_proj_dropout=hf_config.feat_proj_dropout,
        mask_time_prob=hf_config.mask_time_prob,
        mask_time_length=hf_config.mask_time_length,
    )


def _materialise_pos_conv(sd: dict) -> tuple[np.ndarray, np.ndarray]:
    """Return (kernel [k, in/groups, out], bias) of the weight-normed positional conv."""
    prefix = "encoder.pos_conv_embed.conv."
    if prefix + "weight_g" in sd:                          # legacy torch weight_norm keys
        g = sd[prefix + "weight_g"]
        v = sd[prefix + "weight_v"]
    else:                                                  # parametrize-style keys
        g = sd[prefix + "parametrizations.weight.original0"]
        v = sd[prefix + "parametrizations.weight.original1"]
    g = np.asarray(g, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    norm = np.sqrt(np.sum(v ** 2, axis=(0, 1), keepdims=True))
    weight = g * v / np.maximum(norm, 1e-12)               # [out, in/groups, k]
    bias = np.asarray(sd[prefix + "bias"])
    return weight.transpose(2, 1, 0).astype(np.float32), bias.astype(np.float32)


def convert_state_dict(sd: dict, cfg: Wav2Vec2Config) -> dict:
    """HF torch state dict -> Flax param dict for :class:`..wav2vec2.Wav2Vec2Model`."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def dense(prefix: str) -> dict:
        out = {"kernel": sd[prefix + ".weight"].T.astype(np.float32)}
        if prefix + ".bias" in sd:
            out["bias"] = sd[prefix + ".bias"].astype(np.float32)
        return out

    def ln(prefix: str) -> dict:
        return {"scale": sd[prefix + ".weight"].astype(np.float32),
                "bias": sd[prefix + ".bias"].astype(np.float32)}

    params: dict = {}

    fe: dict = {}
    for i in range(len(cfg.conv_dim)):
        w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]   # [out, in, k]
        fe[f"conv_{i}"] = {"kernel": w.transpose(2, 1, 0).astype(np.float32)}
    fe["group_norm"] = ln("feature_extractor.conv_layers.0.layer_norm")
    params["feature_encoder"] = fe

    params["feature_projection"] = {
        "layer_norm": ln("feature_projection.layer_norm"),
        "projection": dense("feature_projection.projection"),
    }

    pos_kernel, pos_bias = _materialise_pos_conv(sd)
    params["pos_conv_embed"] = {"conv": {"kernel": pos_kernel, "bias": pos_bias}}
    params["layer_norm"] = ln("encoder.layer_norm")
    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = sd["masked_spec_embed"].astype(np.float32)
    else:  # HF omits it when spec-augment is disabled in the config
        params["masked_spec_embed"] = np.random.default_rng(0).uniform(
            0, 1, cfg.hidden_size).astype(np.float32)

    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        layer = {
            "attention": {
                "q_proj": {"base": dense(f"{p}.attention.q_proj")},
                "k_proj": dense(f"{p}.attention.k_proj"),
                "v_proj": {"base": dense(f"{p}.attention.v_proj")},
                "out_proj": dense(f"{p}.attention.out_proj"),
            },
            "layer_norm": ln(f"{p}.layer_norm"),
            "intermediate_dense": dense(f"{p}.feed_forward.intermediate_dense"),
            "output_dense": dense(f"{p}.feed_forward.output_dense"),
            "final_layer_norm": ln(f"{p}.final_layer_norm"),
        }
        params[f"layers_{i}"] = layer
    return params


def load_pretrained_encoder(name: str = "facebook/wav2vec2-base-960h"):
    """Try to load + convert the HF checkpoint from the local cache.

    Returns ``(config, params)`` or ``None`` when the checkpoint (or transformers/torch) is
    unavailable — callers then build a random-init encoder, mirroring the reference's
    offline-skip convention.
    """
    try:
        import torch  # noqa: F401
        from transformers import Wav2Vec2Model as HFWav2Vec2Model

        hf = HFWav2Vec2Model.from_pretrained(name)
    except Exception:
        return None
    cfg = config_from_hf(hf.config)
    params = convert_state_dict(hf.state_dict(), cfg)
    return cfg, params
