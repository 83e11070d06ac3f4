"""Generate tests/golden/wav2vec2_fullsize_parity.npz (requires torch + transformers).

Validates that ``fullsize_sd.make_state_dict()`` matches a live HF wav2vec2-base model's
key set and shapes exactly, loads it into the torch model, and records the torch forward
activations for each ``fullsize_sd.make_inputs()`` case as ground truth. The stored file
holds only the outputs (~1.2 MB) — parameters and inputs are regenerated from seeds.

Run from the repo root: python tests/golden/make_fullsize_golden.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import fullsize_sd


def main():
    import torch
    import transformers

    cfg = transformers.Wav2Vec2Config(
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0,
        # mask_time_prob stays at its default: with 0.0 HF drops masked_spec_embed from
        # the state dict, and eval-mode forwards never apply SpecAugment anyway.
    )
    model = transformers.Wav2Vec2Model(cfg).eval()
    live = model.state_dict()
    synth = fullsize_sd.make_state_dict()
    assert set(live) == set(synth), (
        set(live) ^ set(synth)) or "key sets differ"
    for k in live:
        assert tuple(live[k].shape) == tuple(synth[k].shape), (
            k, tuple(live[k].shape), tuple(synth[k].shape))
    model.load_state_dict({k: torch.from_numpy(v) for k, v in synth.items()})

    payload = {}
    for i, x in enumerate(fullsize_sd.make_inputs()):
        with torch.no_grad():
            out = model(torch.from_numpy(x)).last_hidden_state.numpy()
        payload[f"out:{i}"] = out.astype(np.float32)
        print(f"case {i}: in {x.shape} -> out {out.shape}, "
              f"|out| mean {np.abs(out).mean():.4f}")
        assert np.isfinite(out).all() and np.abs(out).mean() > 1e-3, \
            "degenerate activations — adjust fullsize_sd distributions"

    dest = Path(__file__).parent / "wav2vec2_fullsize_parity.npz"
    np.savez_compressed(dest, **payload)
    print(f"wrote {dest} ({dest.stat().st_size >> 10} KiB)")


if __name__ == "__main__":
    main()
