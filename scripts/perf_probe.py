"""Decompose end-to-end throughput: preproc-only vs forward vs full train step, batch sweep.

Run on the real chip: python scripts/perf_probe.py
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).resolve().parent.parent / ".jax_cache"))

import numpy as np


def log(msg):
    print(f"# {msg}", flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.signal import jaxproc
    from wav2vec_heart_sounds_tpu.ops import despike as despike_op
    from wav2vec_heart_sounds_tpu.ops import iir as iir_op
    from wav2vec_heart_sounds_tpu.ops import resample as resample_op
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    fs_in, fs = 2000, 16000
    win_len = 64000

    def timeit(fn, *args, steps=10):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    results = []
    for B in (64, 128):
        rng = np.random.default_rng(0)
        t = np.arange(int(fs_in * 4.0)) / fs_in
        raw = (np.sin(2 * np.pi * 90 * t)[None] + 0.05 * rng.normal(size=(B, t.size))
               ).astype(np.float32)
        raw_dev = jax.device_put(jnp.asarray(raw))

        # individual preprocessing stages
        log(f"B={B} compiling resample")
        rs = jax.jit(lambda x: resample_op.resample(x, fs_in, fs))
        resampled = rs(raw_dev)
        dt_resample = timeit(rs, raw_dev)
        log(f"resample {dt_resample*1e3:.2f} ms; compiling despike")
        ds = jax.jit(lambda x: despike_op.remove_spikes(x, float(fs)))
        dt_despike = timeit(ds, resampled)
        log(f"despike {dt_despike*1e3:.2f} ms; compiling bandpass")
        bp = jax.jit(lambda x: iir_op.bandpass_cascade(x, fs, 25.0, 450.0))
        dt_bandpass = timeit(bp, resampled)
        log(f"bandpass {dt_bandpass*1e3:.2f} ms; running stage-jitted preproc chain")
        pp = lambda x: jaxproc.preprocess_pcg(x, fs_in, fs)
        dt_preproc = timeit(pp, raw_dev)
        log(f"preproc {dt_preproc*1e3:.2f} ms; building model")

        cfg = ClassifierConfig(num_classes=2, num_channels=1, head_hidden=(512, 512, 512),
                               random_init=True, fs=fs)
        model, variables = build_classifier(cfg, jax.random.key(0), win_len)
        trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                    classifier_config=cfg, log=lambda s: None)
        waves = pp(raw_dev)[:, :win_len]
        log("compiling forward")
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        dt_fwd = timeit(fwd, trainer.variables, waves)
        log(f"forward {dt_fwd*1e3:.2f} ms; compiling train step")

        labels = jnp.asarray(np.arange(B) % 2, jnp.int32)
        valid = jnp.ones((B,), jnp.float32)
        lr = jnp.asarray(1e-3, jnp.float32)
        state = trainer.state

        def train_only(x, key):
            nonlocal state
            (state.params, state.loss_params, state.opt_state, loss, _) = trainer._train_step(
                state.params, state.loss_params, state.opt_state, x, labels, valid, lr, key)
            return loss

        key = jax.random.key(1)
        loss = train_only(waves, key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(10):
            key, sub = jax.random.split(key)
            loss = train_only(waves, sub)
        jax.block_until_ready(loss)
        dt_train = (time.perf_counter() - t0) / 10

        rec = {
            "batch": B,
            "resample_ms": round(dt_resample * 1e3, 2),
            "despike_ms": round(dt_despike * 1e3, 2),
            "bandpass_ms": round(dt_bandpass * 1e3, 2),
            "preproc_total_ms": round(dt_preproc * 1e3, 2),
            "forward_ms": round(dt_fwd * 1e3, 2),
            "train_step_ms": round(dt_train * 1e3, 2),
            "train_windows_per_sec": round(B / (dt_train + dt_preproc), 1),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main()
