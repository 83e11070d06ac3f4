"""Analytic FLOP estimate for the classify train step + MFU from a measured throughput.

Every performance number in PERF.md must trace to a script; this one produces the
per-step FLOP count and the MFU figure. Model: wav2vec2-base (reference
src/mpcg_wav2vec/classify/wav2vec.py architecture) at the CinC setting (4 s @ 16 kHz).

Usage: python scripts/flops_estimate.py [windows_per_sec] [batch_size]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from wav2vec_heart_sounds_tpu.models.wav2vec2 import Wav2Vec2Config

V5E_BF16_PEAK = 394e12  # TPU v5e peak bf16 FLOP/s (public spec)


def conv_encoder_flops(cfg: Wav2Vec2Config, batch: int, t: int) -> float:
    total, c_in = 0.0, 1
    for c_out, k, s in zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride):
        t = (t - k) // s + 1
        total += 2.0 * batch * t * c_out * k * c_in
        c_in = c_out
    return total


def transformer_flops(cfg: Wav2Vec2Config, batch: int, frames: int) -> float:
    d, ff = cfg.hidden_size, cfg.intermediate_size
    per_layer = (
        2.0 * batch * frames * d * d * 4          # q, k, v, o projections
        + 2.0 * batch * frames * d * ff * 2       # ffn in + out
        + 2.0 * batch * cfg.num_heads * frames * frames * (d // cfg.num_heads) * 2  # qk, av
    )
    return cfg.num_layers * per_layer


def train_step_flops(batch: int = 96, window_s: float = 4.0, fs: int = 16000,
                     head=(512, 512, 512), classes: int = 2) -> dict:
    cfg = Wav2Vec2Config()
    t = int(window_s * fs)
    frames = cfg.feat_extract_output_length(t)
    conv = conv_encoder_flops(cfg, batch, t)
    trans = transformer_flops(cfg, batch, frames)
    dims = [cfg.hidden_size, *head, classes]
    head_f = sum(2.0 * batch * a * b for a, b in zip(dims[:-1], dims[1:]))
    fwd = conv + trans + head_f
    # backward ~2x forward (dL/dx and dL/dW each cost one forward-equivalent)
    return {"frames": frames, "forward_tflop": fwd / 1e12, "step_tflop": 3 * fwd / 1e12}


if __name__ == "__main__":
    wps = float(sys.argv[1]) if len(sys.argv) > 1 else 376.2
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    est = train_step_flops(batch)
    step_s = batch / wps
    achieved = est["step_tflop"] * 1e12 / step_s
    print(f"batch={batch} frames={est['frames']} "
          f"forward={est['forward_tflop']:.2f} TFLOP step={est['step_tflop']:.2f} TFLOP")
    print(f"measured {wps} windows/s -> {step_s * 1e3:.1f} ms/step -> "
          f"{achieved / 1e12:.1f} TFLOP/s = {100 * achieved / V5E_BF16_PEAK:.1f}% "
          f"of v5e bf16 peak")
