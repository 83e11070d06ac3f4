"""Wav2Vec2 model tests, including numerical parity against HF transformers.

The parity test instantiates a *random-init tiny* HF torch Wav2Vec2Model locally (no network),
converts its weights via hf_port, and pins our Flax forward to the torch activations —
the "layer-by-layer parity, then pin" strategy from SURVEY.md §7 hard-part 3.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu.models import (
    ClassifierConfig,
    Wav2Vec2Config,
    Wav2Vec2Model,
    Wav2VecClassifier,
    trainable_mask,
)


def test_feature_extractor_output_length():
    cfg = Wav2Vec2Config()
    # 4 s at 16 kHz -> ~199 frames (20 ms stride)
    assert cfg.feat_extract_output_length(64000) == 199
    assert cfg.feat_extract_output_length(16500) == 51


def test_tiny_forward_shape():
    cfg = Wav2Vec2Config.tiny()
    model = Wav2Vec2Model(cfg)
    x = jnp.zeros((2, 1000))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, cfg.feat_extract_output_length(1000), cfg.hidden_size)


def test_classifier_forward_and_encode():
    cfg = ClassifierConfig(num_classes=2, head_hidden=(16,), encoder=Wav2Vec2Config.tiny())
    model = Wav2VecClassifier(cfg)
    x = jnp.zeros((2, 1000))
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 2)
    feats = model.apply(params, x, method=Wav2VecClassifier.encode)
    assert feats.shape == (2, cfg.encoder.hidden_size)


def test_classifier_multichannel_beamformer():
    enc = Wav2Vec2Config.tiny()
    cfg = ClassifierConfig(num_classes=2, num_channels=3, head_hidden=(8,),
                           fs=1000, encoder=enc)
    model = Wav2VecClassifier(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1500, 3)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (2, 2)
    assert "channel_mixer" in params["params"]


def test_beamformer_collapses_channels():
    from wav2vec_heart_sounds_tpu.models import TimeVaryingSincBeamformer
    bf = TimeVaryingSincBeamformer(num_mics=6, fs=4125)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 6, 1500)), jnp.float32)
    params = bf.init(jax.random.key(0), x)
    out = bf.apply(params, x)
    assert out.shape == (2, 1500)
    assert bool(jnp.isfinite(out).all())
    assert bool((out >= 0).all())     # sum of squares


@pytest.mark.fast
def test_chunked_attention_matches_flax_default():
    """Delay-predictor attention_fn: exact row-block softmax, fwd + grad parity."""
    from flax.linen.attention import dot_product_attention

    from wav2vec_heart_sounds_tpu.models.beamformer import _chunked_attention

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 300, 4, 8)), jnp.float32)
               for _ in range(3))
    ref = dot_product_attention(q, k, v)
    out = _chunked_attention(q, k, v, chunk=128)   # 300 -> 3 chunks, ragged tail
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    g_chunk = jax.grad(lambda a: jnp.sum(jnp.cos(_chunked_attention(a, k, v, chunk=128))))(q)
    g_ref = jax.grad(lambda a: jnp.sum(jnp.cos(dot_product_attention(a, k, v))))(q)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_ref), atol=2e-5)


def test_trainable_mask_policies():
    enc = Wav2Vec2Config.tiny()
    x = jnp.zeros((1, 1000))

    def flags(cfg):
        model = Wav2VecClassifier(cfg)
        params = model.init(jax.random.key(0), x)["params"]
        mask = trainable_mask(params, cfg)
        leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
        return {jax.tree_util.keystr(p): v for p, v in leaves}

    full = flags(ClassifierConfig(head_hidden=(8,), encoder=enc))
    assert all(full.values())

    frozen = flags(ClassifierConfig(head_hidden=(8,), freeze_encoder=True, encoder=enc))
    assert not any(v for k, v in frozen.items() if "encoder" in k)
    assert all(v for k, v in frozen.items() if "head" in k)

    lora = flags(ClassifierConfig(head_hidden=(8,), lora=True, encoder=enc))
    enc_flags = {k: v for k, v in lora.items() if "encoder" in k}
    assert all(v for k, v in enc_flags.items() if "lora_" in k)
    assert not any(v for k, v in enc_flags.items() if "lora_" not in k)
    assert all(v for k, v in lora.items() if "head" in k)


def test_lora_zero_init_is_identity():
    """With lora_b zero-init, LoRA output equals the base model's at init."""
    enc = Wav2Vec2Config.tiny()
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 1000)), jnp.float32)
    base = Wav2VecClassifier(ClassifierConfig(head_hidden=(8,), encoder=enc))
    params = base.init(jax.random.key(0), x)
    lora_model = Wav2VecClassifier(ClassifierConfig(head_hidden=(8,), lora=True, encoder=enc))
    lora_params = lora_model.init(jax.random.key(0), x)
    out_lora = lora_model.apply(lora_params, x)
    assert out_lora.shape == (2, 2)
    b_leaves = [np.asarray(v) for p, v in
                jax.tree_util.tree_flatten_with_path(lora_params)[0]
                if "lora_b" in jax.tree_util.keystr(p)]
    assert b_leaves and all((b == 0).all() for b in b_leaves)


def test_spec_augment_masking_changes_output():
    cfg = Wav2Vec2Config.tiny(mask_time_prob=0.5, mask_time_length=3)
    model = Wav2Vec2Model(cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 2000)), jnp.float32)
    params = model.init(jax.random.key(0), x)
    clean = model.apply(params, x)
    masked = model.apply(params, x, train=True, mask_key=jax.random.key(1),
                         rngs={"dropout": jax.random.key(2)})
    assert masked.shape == clean.shape
    assert not np.allclose(np.asarray(clean), np.asarray(masked))


@pytest.mark.parametrize("seq_len", [4000])
def test_hf_parity_tiny(seq_len):
    """Our Flax forward matches a random-init HF torch Wav2Vec2Model bit-for-bit-ish."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.Wav2Vec2Config(
        vocab_size=32, hidden_size=48, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=96, conv_dim=(24, 24, 24), conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=2, feat_extract_norm="group", conv_bias=False,
        do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    from wav2vec_heart_sounds_tpu.models import hf_port
    cfg = hf_port.config_from_hf(hf_cfg)
    params = hf_port.convert_state_dict(hf.state_dict(), cfg)

    x = np.random.default_rng(0).normal(size=(2, seq_len)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()

    model = Wav2Vec2Model(cfg)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


# --- torch-free golden parity (round-1 VERDICT "next #5") ---------------------------
#
# tests/golden/wav2vec2_tiny_parity.npz stores a tiny random-init HF Wav2Vec2Model's
# converted parameters plus its torch activations for three input lengths (even / odd /
# prime, exercising conv edge behavior). The pin survives environments without torch and
# catches any regression in the model or the weight-convention assumptions baked into
# hf_port (kernel transposes, weight-norm materialisation, padding).

GOLDEN = "tests/golden/wav2vec2_tiny_parity.npz"


def _golden_params_and_cases():
    import os
    data = np.load(os.path.join(os.path.dirname(os.path.dirname(__file__)), GOLDEN))
    params: dict = {}
    cases = {}
    for key in data.files:
        kind, _, rest = key.partition(":")
        if kind == "param":
            node = params
            *path, leaf = rest.split("/")
            for p in path:
                node = node.setdefault(p, {})
            node[leaf] = data[key]
        else:
            cases.setdefault(rest, {})[kind] = data[key]
    return params, cases


GOLDEN_CFG = Wav2Vec2Config(
    conv_dim=(24, 24, 24), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
    hidden_size=48, num_layers=2, num_heads=4, intermediate_size=96,
    pos_conv_kernel=16, pos_conv_groups=2,
)


@pytest.mark.parametrize("case", ["even", "odd", "prime"])
def test_golden_parity_without_torch(case):
    params, cases = _golden_params_and_cases()
    model = Wav2Vec2Model(GOLDEN_CFG)
    out = np.asarray(model.apply({"params": params}, jnp.asarray(cases[case]["in"])))
    ref = cases[case]["out"]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_lora_wrap_preserves_pretrained_forward():
    """LoRA adapters are additive-zero at init: a LoRA-wrapped encoder with converted
    weights must reproduce the plain encoder's output exactly (reference loads LoRA on top
    of the pretrained checkpoint, classify/wav2vec.py:54-57)."""
    params, cases = _golden_params_and_cases()
    x = jnp.asarray(cases["even"]["in"])

    plain = np.asarray(Wav2Vec2Model(GOLDEN_CFG).apply({"params": params}, x))

    import dataclasses
    lora_cfg = dataclasses.replace(GOLDEN_CFG, lora_rank=4)
    lora_model = Wav2Vec2Model(lora_cfg)
    fresh = lora_model.init(jax.random.key(0), x)["params"]

    def merge(init_tree, loaded):
        out = dict(init_tree)
        for k, v in loaded.items():
            out[k] = merge(out[k], v) if isinstance(v, dict) else jnp.asarray(v)
        return out

    merged = merge(fresh, params)
    wrapped = np.asarray(lora_model.apply({"params": merged}, x))
    np.testing.assert_allclose(wrapped, plain, atol=1e-6)


class TestTimeAlignedPath:
    """The tile-aligned time axis (time_align=8) must be bit-equivalent on real frames to
    the exact-length path (time_align=0): padded conv frames are masked out of GroupNorm
    stats, pad tokens are masked in attention, and the output is sliced back to the real
    frame count."""

    def test_conv_time_plan_full_size(self):
        from wav2vec_heart_sounds_tpu.models.wav2vec2 import conv_time_plan
        cfg = Wav2Vec2Config()
        pad_in, padded, real = conv_time_plan(64000, cfg.conv_kernel, cfg.conv_stride, 8)
        assert real == [12799, 6399, 3199, 1599, 799, 399, 199]
        assert all(p % 8 == 0 and p >= r for p, r in zip(padded, real))
        # every layer's frame slices stay in bounds
        t = pad_in
        for k, s, p in zip(cfg.conv_kernel, cfg.conv_stride, padded):
            assert t // s >= p + -(-k // s) - 1
            assert (t - k) // s + 1 >= p or p >= (t - k) // s + 1 - 8
            t = p

    @pytest.mark.parametrize("length", [1000, 1001, 997])
    def test_aligned_matches_exact(self, length):
        cfg8 = Wav2Vec2Config.tiny()
        cfg0 = Wav2Vec2Config.tiny(time_align=0)
        m8, m0 = Wav2Vec2Model(cfg8), Wav2Vec2Model(cfg0)
        x = jnp.asarray(np.random.default_rng(3).normal(size=(2, length)), jnp.float32)
        v = m8.init(jax.random.key(0), x)   # identical param trees across both paths
        out8, out0 = m8.apply(v, x), m0.apply(v, x)
        assert out8.shape == out0.shape
        np.testing.assert_allclose(np.asarray(out8), np.asarray(out0), atol=1e-5)

    def test_aligned_train_mode_runs(self):
        cfg = Wav2Vec2Config.tiny()
        model = Wav2Vec2Model(cfg)
        x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 1000)), jnp.float32)
        v = model.init(jax.random.key(0), x)
        out = model.apply(v, x, train=True, mask_key=jax.random.key(1),
                          rngs={"dropout": jax.random.key(2)})
        assert np.isfinite(np.asarray(out)).all()


def test_fused_qkv_matches_default(monkeypatch):
    """The packed fused-QKV path (one [cin, 3D] dot + packed flash kernel) must match the
    default per-projection path — including with LoRA adapters active."""
    from wav2vec_heart_sounds_tpu.models.wav2vec2 import Wav2Vec2Model

    for rank in (0, 8):
        cfg = Wav2Vec2Config.tiny(lora_rank=rank)
        model = Wav2Vec2Model(cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 2000)), jnp.float32)
        monkeypatch.delenv("W2VHS_QKVFUSE", raising=False)
        variables = model.init(jax.random.key(0), x)
        ref = model.apply(variables, x)
        monkeypatch.setenv("W2VHS_QKVFUSE", "1")
        # Param trees must be identical between the two declaration paths.
        v2 = model.init(jax.random.key(0), x)
        ref_leaves = jax.tree_util.tree_leaves_with_path(variables)
        fused_leaves = jax.tree_util.tree_leaves_with_path(v2)
        assert [p for p, _ in ref_leaves] == [p for p, _ in fused_leaves]
        for (_, a), (_, b) in zip(ref_leaves, fused_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = model.apply(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        monkeypatch.delenv("W2VHS_QKVFUSE", raising=False)


@pytest.mark.fast
def test_posconv_patchdot_matches_grouped_conv(monkeypatch):
    """The gated W2VHS_POSCONV=patchdot lowering (round-5 pos_conv A/B) must be a pure
    program-shape change: same params, same output as XLA's grouped conv."""
    from wav2vec_heart_sounds_tpu.models.wav2vec2 import PositionalConvEmbedding

    cfg = Wav2Vec2Config.tiny()          # pos_conv kernel 16, groups 2
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 23, cfg.hidden_size)),
                    jnp.float32)
    mod = PositionalConvEmbedding(cfg)
    monkeypatch.delenv("W2VHS_POSCONV", raising=False)
    variables = mod.init(jax.random.key(0), x)
    y_ref = mod.apply(variables, x)
    monkeypatch.setenv("W2VHS_POSCONV", "patchdot")
    y_alt = mod.apply(variables, x)
    assert y_alt.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y_alt), np.asarray(y_ref), atol=2e-6)
