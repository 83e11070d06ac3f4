"""Vest-path profiler: split the 'real loop' number into host-augment vs device-step cost.

The vest bench (bench.py::run_vest_bench) measures the reference-shaped real loop —
lazy host augmentation (shared-across-mics HPSS pipeline, reference
augment/pipelines.py:117-148) feeding the sinc-beamformer + LoRA wav2vec2 train step.
That one number cannot say whether the 67 w/s of round 4 is host-bound or device-bound.
This script times the two halves separately on the same shapes, then captures a
3-step device trace for scripts/trace_summary.py.

Usage: python scripts/profile_vest.py [--steps N]
"""

import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.augment import AugmentConfig
    from wav2vec_heart_sounds_tpu.data import Fragment, FragmentDataset
    from wav2vec_heart_sounds_tpu.data.vest import multi_augment
    from wav2vec_heart_sounds_tpu.experiments.common import make_loader
    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    steps = 6
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    batch_size, fs, channels, window_s = 16, 4125, 6, 2.0
    win_len = int(round(window_s * fs))
    aug_num = 15
    n_items = batch_size * (steps + 4)
    n_base = max(2, -(-n_items // (aug_num + 1)))
    rng = np.random.default_rng(0)
    t = np.arange(win_len) / fs
    base = np.sin(2 * np.pi * 85 * t) + 0.3 * np.sin(2 * np.pi * 190 * t)
    frags = []
    for i in range(n_base):
        wave = (base[:, None]
                + 0.05 * rng.normal(size=(win_len, channels))).astype(np.float32)
        wave /= np.max(np.abs(wave))
        frags.append(Fragment(wave, i % 2, f"p{i}"))
    ds = FragmentDataset(frags, fs=fs, augment_num=aug_num,
                         augment_fn=partial(multi_augment, cfg=AugmentConfig()))

    # --- host half: loader iteration alone (augment + pad + collate, no device) ---
    loader = make_loader(ds, batch_size, True, 0, win_len)
    first = None
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        if first is None:
            first = b
        n += 1
        if n >= steps:
            break
    host_s = time.perf_counter() - t0
    print(f"host loader: {n} batches in {host_s:.3f}s = "
          f"{batch_size * n / host_s:.1f} windows/s (host augment+collate only)",
          flush=True)

    # --- device half: fixed on-device batch, step in a tight loop ---
    ccfg = ClassifierConfig(num_classes=2, num_channels=channels, random_init=True,
                            lora=True, fs=fs, head_hidden=(256,))
    model, variables = build_classifier(ccfg, jax.random.key(0), win_len)
    trainer = SupervisedTrainer(model, variables, optimizer_name="adamw", lr=1e-4,
                                classifier_config=ccfg, log=lambda s: None)
    x = jnp.asarray(first["waveform"])
    y = jnp.asarray(first["label"])
    valid = jnp.asarray(first["valid"].astype(np.float32))
    lr = jnp.asarray(1e-4, jnp.float32)
    print("device batch:", x.shape, x.dtype, flush=True)
    if os.environ.get("W2VHS_AOT") != "0":
        trainer.aot_warm(x, y, valid)
    state = trainer.state
    key = jax.random.key(1)

    def step(key):
        nonlocal state
        key, sub = jax.random.split(key)
        (state.params, state.loss_params, state.opt_state, loss, _) = trainer._train_step(
            state.params, state.loss_params, state.opt_state, x, y, valid, lr, sub)
        return key, loss

    key, loss = step(key)                                   # compile/warm
    jax.device_get(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        key, loss = step(key)
    print("final loss", float(np.asarray(jax.device_get(loss))), flush=True)
    dev_s = time.perf_counter() - t0
    print(f"device step: {steps} steps in {dev_s:.3f}s = {dev_s / steps * 1e3:.1f} ms/step "
          f"= {batch_size * steps / dev_s:.1f} windows/s (device only)", flush=True)

    out = "/tmp/jaxtrace_vest"
    os.makedirs(out, exist_ok=True)
    try:
        jax.profiler.start_trace(out)
        for _ in range(3):
            key, loss = step(key)
        float(np.asarray(jax.device_get(loss)))
        jax.profiler.stop_trace()
        print("trace ok", flush=True)
        for root, _, files in os.walk(out):
            for f in files:
                p = os.path.join(root, f)
                print(os.path.getsize(p), p, flush=True)
    except Exception as e:
        print("trace failed:", type(e).__name__, str(e)[:300], flush=True)


if __name__ == "__main__":
    main()
