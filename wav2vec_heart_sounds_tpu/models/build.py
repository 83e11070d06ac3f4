"""Model builders: init, pretrained-weight merge, dtype policy.

Replaces the reference's ``build_wav2vec``/``build_two_branch`` registry
(src/mpcg_wav2vec/classify/registry.py:9-16) with explicit (module, variables) construction:
random init always works offline; pretrained encoder weights are merged in from the local HF
cache when available (LoRA adapters and heads keep their fresh init).
"""

from __future__ import annotations

import os
from dataclasses import replace

import jax
import jax.numpy as jnp

from . import hf_port
from .classifier import ClassifierConfig, Wav2VecClassifier


def default_compute_dtype():
    """bfloat16 on accelerator backends (MXU-native), float32 on CPU tests."""
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def _merge(base: dict, loaded: dict) -> dict:
    """Recursively overwrite ``base`` leaves with ``loaded`` where paths match."""
    out = dict(base)
    for k, v in loaded.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = jnp.asarray(v)
    return out


def build_two_branch(pcg_cfg: ClassifierConfig, ecg_cfg: ClassifierConfig, key: jax.Array,
                     input_len: int, num_classes: int = 2, dtype=None):
    """Fresh (untrained) two-branch fusion; branches are trained separately upstream."""
    from .fusion import two_branch_pcg_ecg

    k1, k2 = jax.random.split(key)
    pcg = build_classifier(pcg_cfg, k1, input_len, dtype)
    ecg = build_classifier(ecg_cfg, k2, input_len, dtype)
    return two_branch_pcg_ecg(pcg, ecg, num_classes=num_classes)


def build_classifier(cfg: ClassifierConfig, key: jax.Array, input_len: int,
                     dtype=None) -> tuple[Wav2VecClassifier, dict]:
    """Construct + init a classifier; load pretrained encoder weights when requested.

    If the HF checkpoint is unavailable (offline, no cache) the encoder silently stays
    random-init — the reference's offline-skip convention (tests/test_classify.py:6-8).
    """
    dtype = dtype or default_compute_dtype()
    if not cfg.random_init:
        loaded = hf_port.load_pretrained_encoder(cfg.pretrained_name)
        if loaded is not None:
            enc_cfg, enc_params = loaded
            # Take only the architecture fields from the checkpoint config; fields the
            # caller may have tuned (dropouts, SpecAugment, LoRA, remat) stay theirs.
            arch = ("conv_dim", "conv_kernel", "conv_stride", "hidden_size", "num_layers",
                    "num_heads", "intermediate_size", "pos_conv_kernel", "pos_conv_groups",
                    "layer_norm_eps")
            cfg = replace(cfg, encoder=replace(
                cfg.encoder, **{f: getattr(enc_cfg, f) for f in arch}))
        else:
            enc_params = None
    else:
        enc_params = None

    model = Wav2VecClassifier(cfg, dtype=dtype)
    shape = (1, input_len) if cfg.num_channels == 1 else (1, input_len, cfg.num_channels)
    x0 = jnp.zeros(shape, jnp.float32)
    if jax.default_backend() != "cpu" and os.environ.get("W2VHS_AOT") != "0":
        # Param init is a ~2 min remote compile per fresh process on the relay; reuse the
        # serialized executable like the train/eval steps (utils/aot.py).
        from ..utils.aot import cached_compile

        variables = cached_compile(jax.jit(model.init), key, x0)(key, x0)
    else:
        variables = model.init(key, x0)
    if enc_params is not None:
        params = dict(variables["params"])
        params["encoder"] = _merge(params["encoder"], enc_params)
        variables = {"params": params}
    return model, variables
