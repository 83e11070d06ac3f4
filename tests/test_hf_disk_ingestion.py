"""On-disk HF checkpoint ingestion parity (round-4; VERDICT r3 item 4).

The reference's default mode loads ``facebook/wav2vec2-base-960h`` from disk
(reference src/mpcg_wav2vec/classify/wav2vec.py:48-51). No real checkpoint exists in
this offline environment, so these tests serialise the synthetic full-size state dict
(tests/golden/fullsize_sd.py — the one whose torch forward is pinned by
tests/test_hf_full_parity.py) to the real on-disk formats and load each through the
exact code path ``--no-random-init`` uses (``hf_port.load_pretrained_encoder`` ->
``transformers.from_pretrained`` -> ``convert_state_dict``):

* ``model.safetensors`` — the modern hub format;
* ``pytorch_model.bin`` with **legacy weight-norm keys** (``weight_g``/``weight_v``),
  the layout actually stored in the 2021-era facebook/wav2vec2-base-960h checkpoint
  (modern torch/transformers remaps them to ``parametrizations.weight.original0/1``
  at load time — that remap is part of what is under test).

Each must yield a parameter tree bit-identical to the in-memory conversion the stored
goldens pin, so pretrained parity reduces to "drop the real file in". A key-mapping bug
in file loading (from_pretrained silently random-inits missing keys) breaks exactness.

Deliberately not ``fast``: two from_pretrained round trips of a 95 M-param model.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent / "golden"))

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import fullsize_sd  # noqa: E402
from wav2vec_heart_sounds_tpu.models import hf_port  # noqa: E402
from wav2vec_heart_sounds_tpu.models.wav2vec2 import Wav2Vec2Config  # noqa: E402

FULL_CFG = Wav2Vec2Config()  # defaults are exactly wav2vec2-base


def _hf_model_with_synthetic_weights():
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    hf_cfg = HFConfig()  # base defaults match fullsize_sd's shapes
    model = HFModel(hf_cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in fullsize_sd.make_state_dict().items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # masked_spec_embed is in the synthetic dict; anything else missing means the
    # synthetic layout drifted from this transformers version — fail loudly.
    assert not unexpected, unexpected
    assert all("masked_spec" in k or "adapter" in k for k in missing), missing
    return model


@pytest.fixture(scope="module")
def reference_conversion():
    """The in-memory conversion the stored full-size goldens pin."""
    return hf_port.convert_state_dict(fullsize_sd.make_state_dict(), FULL_CFG)


@pytest.fixture(scope="module")
def hf_model():
    return _hf_model_with_synthetic_weights()


def _assert_tree_equal(got: dict, want: dict, path=""):
    assert set(got) == set(want), f"{path}: {set(got) ^ set(want)}"
    for k in want:
        g, w = got[k], want[k]
        if isinstance(w, dict):
            _assert_tree_equal(g, w, f"{path}/{k}")
        else:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=f"{path}/{k}")


def _ingest(directory) -> dict:
    loaded = hf_port.load_pretrained_encoder(str(directory))
    assert loaded is not None, (
        "load_pretrained_encoder returned None for an on-disk checkpoint that exists — "
        "the from_pretrained/convert path raised (run it by hand to see the error)")
    cfg, params = loaded
    assert cfg.hidden_size == FULL_CFG.hidden_size
    assert cfg.num_layers == FULL_CFG.num_layers
    return params


def test_safetensors_roundtrip(tmp_path, hf_model, reference_conversion):
    d = tmp_path / "safetensors"
    hf_model.save_pretrained(d)  # writes config.json + model.safetensors
    assert (d / "model.safetensors").exists()
    _assert_tree_equal(_ingest(d), reference_conversion)


def test_legacy_bin_with_weight_g_v_keys(tmp_path, hf_model, reference_conversion):
    """pytorch_model.bin with the real checkpoint's weight_g/weight_v key layout."""
    d = tmp_path / "legacy_bin"
    d.mkdir()
    hf_model.config.save_pretrained(d)
    legacy = {}
    for k, v in hf_model.state_dict().items():
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        legacy[k] = v
    assert any(k.endswith("weight_g") for k in legacy)
    torch.save(legacy, d / "pytorch_model.bin")
    _assert_tree_equal(_ingest(d), reference_conversion)


def test_materialise_pos_conv_accepts_legacy_keys():
    """convert_state_dict itself must handle a raw legacy state dict (a caller may
    bypass transformers and hand us torch.load output from the real .bin)."""
    sd = fullsize_sd.make_state_dict()
    prefix = "encoder.pos_conv_embed.conv."
    legacy_sd = dict(sd)
    legacy_sd[prefix + "weight_g"] = legacy_sd.pop(
        prefix + "parametrizations.weight.original0")
    legacy_sd[prefix + "weight_v"] = legacy_sd.pop(
        prefix + "parametrizations.weight.original1")
    a = hf_port.convert_state_dict(sd, FULL_CFG)
    b = hf_port.convert_state_dict(legacy_sd, FULL_CFG)
    _assert_tree_equal(b, a)
