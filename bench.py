"""Throughput benchmark: PCG 4 s-windows/sec/chip, end-to-end (preproc + wav2vec2 train step).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

What is measured (the BASELINE.json north-star path): a batch of raw 2 kHz PCG windows goes
through the on-device preprocessing chain (polyphase resample to 16 kHz -> batched Schmidt
despike -> 25-450 Hz causal cascade -> abs-max normalise; stage-jitted, all intermediates
device-resident) into a full wav2vec2-base classifier train step (forward + CE loss +
backward + SGD update; one donated jit program). Steady-state timing over ``steps``
iterations after warmup.

``vs_baseline`` compares against the measured reference-equivalent throughput stored in
BASELINE_MEASURED.json (the torch-CPU path of MilanMarocchi/wav2vec-heart-sounds on this very
host — the reference's own non-CUDA fallback; no GPU exists in this environment). Regenerate
with ``python bench.py --measure-baseline``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# Persistent compilation cache: TPU compiles through the remote-compile tunnel are slow,
# so pay them once across bench/driver invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(Path(__file__).parent / ".jax_cache"))

BASELINE_FILE = Path(__file__).parent / "BASELINE_MEASURED.json"


def _raw_batch(batch_size: int, fs_in: int, seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(fs_in * seconds)) / fs_in
    base = np.sin(2 * np.pi * 90 * t) + 0.4 * np.sin(2 * np.pi * 250 * t)
    batch = base[None, :] + 0.05 * rng.normal(size=(batch_size, t.size))
    return batch.astype(np.float32)


def run_gen_bench(batch_size: int = 8, steps: int = 3) -> dict:
    """DiffWave fast-sampling throughput: generated audio-seconds per wall second."""
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.diffusion import DiffWave, DiffWaveConfig
    from wav2vec_heart_sounds_tpu.models.diffusion.samplers import diffwave_sample

    cfg = DiffWaveConfig()
    model = DiffWave(cfg)
    frames = 96
    rng = np.random.default_rng(0)
    con = jnp.asarray(rng.uniform(0, 1, (batch_size, cfg.n_mels, frames)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, batch_size), jnp.int32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, cfg.hop_length * frames)),
                           jnp.zeros((1,), jnp.int32), con[:1], labels[:1])

    key = jax.random.key(1)
    audio, sr = diffwave_sample(model, variables, con, labels, key, fast=True)
    float(np.asarray(jax.device_get(audio)).ravel()[0])
    t0 = time.perf_counter()
    for i in range(steps):
        key, sub = jax.random.split(key)
        audio, sr = diffwave_sample(model, variables, con, labels, sub, fast=True)
    float(np.asarray(jax.device_get(audio)).ravel()[0])   # forces completion (see train mode)
    elapsed = time.perf_counter() - t0

    audio_seconds = batch_size * steps * (cfg.hop_length * frames / sr)
    baseline = None
    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text()).get("reference_gen_audio_s_per_s")
    value = audio_seconds / elapsed
    return {
        "metric": "diffwave_fast_sampling_audio_s_per_s",
        "value": round(value, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(value / baseline, 3) if baseline else None,
        "batch_size": batch_size,
        "backend": jax.default_backend(),
    }


def run_bench(batch_size: int = 96, fs: int = 16000, window_s: float = 4.0,
              steps: int = 20, mode: str = "train", fs_in: int = 2000) -> dict:
    if mode == "gen":
        return run_gen_bench()
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.build import build_classifier, default_compute_dtype
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.signal import jaxproc
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer
    from wav2vec_heart_sounds_tpu.data.loader import Batcher

    win_len = int(round(window_s * fs))
    raw = _raw_batch(batch_size, fs_in, window_s)

    cfg = ClassifierConfig(num_classes=2, num_channels=1, head_hidden=(512, 512, 512),
                           random_init=True, fs=fs)
    model, variables = build_classifier(cfg, jax.random.key(0), win_len)
    trainer = SupervisedTrainer(model, variables, optimizer_name="sgd", lr=1e-3,
                                classifier_config=cfg, log=lambda s: None)

    labels = jnp.asarray(np.arange(batch_size) % 2, jnp.int32)
    valid = jnp.ones((batch_size,), jnp.float32)
    lr = jnp.asarray(1e-3, jnp.float32)
    raw_dev = jax.device_put(jnp.asarray(raw))

    def prep(x):
        # Stage-jitted chain: intermediates stay on device; compiles in pieces (one fused
        # program is pathologically slow to compile on this toolchain).
        return jaxproc.preprocess_pcg(x, fs_in, fs)[:, :win_len]

    def fresh_input(key):
        # Perturb the input per step so the runtime cannot serve cached results for a
        # repeated identical pure computation (observed through the axon tunnel).
        return raw_dev * (1.0 + 1e-6 * jax.random.uniform(key, ()))

    if mode == "real":
        # The REAL training loop: Batcher assembly -> int16 wire -> threaded-prefetch
        # transfer -> jitted train step, exactly as experiments/*.py run it.
        #
        # Default wire is RAW: the loader ships raw 2 kHz windows (8x fewer bytes than
        # preprocessed 16 kHz — the relay link is the real-loop bottleneck) and the
        # preprocessing chain runs on device between transfer and train step
        # (trainer.device_preprocess; <1 ms/batch). W2VHS_REAL_WIRE=16k measures the
        # reference-style load-time-preprocessed wire instead.
        from wav2vec_heart_sounds_tpu.data import Fragment, FragmentDataset

        raw_wire = os.environ.get("W2VHS_REAL_WIRE", "raw") != "16k"
        # One training epoch yields len(dataset)//batch_size batches, so the dataset must
        # cover warmup + the timed window — with fewer windows the epoch ends early and
        # the reported rate silently over-counts (this inflated the round-1 real number).
        n_windows = batch_size * (steps + 4)
        if raw_wire:
            host_raw = _raw_batch(n_windows, fs_in, window_s)
            host_raw /= np.max(np.abs(host_raw))   # wire contract: [-1, 1]
            frags = [Fragment(w, i % 2, f"p{i}") for i, w in enumerate(host_raw)]
            wire_len = int(round(window_s * fs_in))

            def dev_prep(x):
                if jnp.issubdtype(x.dtype, jnp.integer):
                    x = x.astype(jnp.float32) * (1.0 / 32767.0)
                return prep(x)

            trainer.device_preprocess = dev_prep
        else:
            host_waves = np.asarray(jax.device_get(prep(jnp.asarray(
                _raw_batch(n_windows, fs_in, window_s)))), dtype=np.float32)
            frags = [Fragment(w, i % 2, f"p{i}") for i, w in enumerate(host_waves)]
            wire_len = win_len
        batcher = Batcher(FragmentDataset(frags, fs=fs if not raw_wire else fs_in),
                          batch_size, train=True, seed=0,
                          target_len=wire_len, wire_int16=True)
        if os.environ.get("W2VHS_AOT") != "0":
            # raw wire: the step sees float32 [B, win_len] after device preprocessing —
            # the same executable as train mode; 16k wire: int16 enters the step.
            trainer.aot_warm(jnp.zeros((batch_size, win_len), jnp.float32) if raw_wire
                             else jnp.zeros((batch_size, win_len), jnp.int16),
                             labels, valid)
        trainer._run_epoch(batcher, True, max_batches=3)        # compile + warm
        jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
        t0 = time.perf_counter()
        _, loss = trainer._run_epoch(batcher, True, max_batches=steps)
        # Hard sync: fetch an updated parameter leaf. Scalar loss fetches alone have been
        # observed to return before the donation chain finishes through the relay
        # (a 20-step epoch "completed" faster than device-only time), so the timed window
        # must end on a fetch that transitively requires every step's parameter update.
        jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
        elapsed = time.perf_counter() - t0
        value = batch_size * steps / elapsed / max(1, jax.device_count())
        baseline = None
        if BASELINE_FILE.exists():
            baseline = json.loads(BASELINE_FILE.read_text()).get("reference_windows_per_sec")
        return {
            "metric": "pcg_4s_windows_per_sec_per_chip_real_loop",
            "value": round(value, 3),
            "unit": "windows/s/chip",
            "vs_baseline": round(value / baseline, 3) if baseline else None,
            "mode": mode,
            "wire": "raw2k_int16" if raw_wire else "preproc16k_int16",
            "batch_size": batch_size,
            "steps": steps,
            "backend": jax.default_backend(),
            "final_fetch": round(float(loss), 6),
        }

    if mode == "preproc":
        def run_step(key):
            return prep(fresh_input(key))
    elif mode == "infer":
        fwd = jax.jit(lambda v, x: model.apply(v, x))

        def run_step(key):
            return fwd(trainer.variables, prep(fresh_input(key)))
    else:  # train: preprocess chained into the train-step jit, all device-resident
        if os.environ.get("W2VHS_AOT") != "0":
            # AOT executable cache: the first invocation pays the remote compile and
            # serializes the result; later fresh processes reload it in seconds (the
            # persistent HLO cache is bypassed by the relay toolchain — PERF.md).
            trainer.aot_warm(jnp.zeros((batch_size, win_len), jnp.float32), labels, valid)
        state = trainer.state

        def run_step(key):
            waves = prep(fresh_input(key))
            (state.params, state.loss_params, state.opt_state, loss, _) = trainer._train_step(
                state.params, state.loss_params, state.opt_state, waves, labels, valid,
                lr, key)
            return loss

    # Warmup (compile) then steady-state timing. Completion is forced by *fetching* a value
    # (device_get): block_until_ready does not reliably wait through the axon tunnel, and the
    # train steps are donation-chained so the final fetch transitively waits for every step.
    def force(x):
        return float(np.asarray(jax.device_get(x)).ravel()[0])

    key = jax.random.key(1)
    import jax.random as jr
    for _ in range(3):
        key, sub = jr.split(key)
        out = run_step(sub)
    force(out)

    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jr.split(key)
        out = run_step(sub)
    final_value = force(out)
    elapsed = time.perf_counter() - t0

    n_devices = jax.device_count()
    windows_per_sec = batch_size * steps / elapsed / max(1, n_devices)

    baseline = None
    if BASELINE_FILE.exists():
        ref = json.loads(BASELINE_FILE.read_text())
        baseline = ref.get("reference_windows_per_sec")
    return {
        "metric": "pcg_4s_windows_per_sec_per_chip_e2e",
        "value": round(windows_per_sec, 3),
        "unit": "windows/s/chip",
        "vs_baseline": round(windows_per_sec / baseline, 3) if baseline else None,
        "mode": mode,
        "batch_size": batch_size,
        "steps": steps,
        "backend": jax.default_backend(),
        "final_fetch": round(final_value, 6),
    }


def measure_reference_baseline(batch_size: int = 8, steps: int = 2) -> dict:
    """Measure the reference-equivalent path with torch on this host (its non-CUDA fallback).

    Pipeline: scipy/NumPy per-window preprocessing (the reference's load-time path) + a torch
    wav2vec2-base forward/backward/SGD step on [B, 64000] — timed per window and extrapolated.
    """
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model as HFModel

    from wav2vec_heart_sounds_tpu.signal import preprocess_pcg

    fs_in, fs = 2000, 16000
    raw = _raw_batch(batch_size, fs_in, 4.0)

    t0 = time.perf_counter()
    waves = np.stack([preprocess_pcg(raw[i], fs_in, fs)[:64000] for i in range(batch_size)])
    prep_time = time.perf_counter() - t0

    torch.manual_seed(0)
    encoder = HFModel(HFConfig())
    head = torch.nn.Sequential(
        torch.nn.Linear(768, 512), torch.nn.ReLU(),
        torch.nn.Linear(512, 512), torch.nn.ReLU(),
        torch.nn.Linear(512, 512), torch.nn.ReLU(),
        torch.nn.Linear(512, 2))
    params = list(encoder.parameters()) + list(head.parameters())
    opt = torch.optim.SGD(params, lr=1e-3, momentum=0.9)
    x = torch.from_numpy(waves.astype(np.float32))
    y = torch.from_numpy((np.arange(batch_size) % 2).astype(np.int64))

    def step():
        opt.zero_grad(set_to_none=True)
        logits = head(encoder(x).last_hidden_state.mean(dim=1))
        loss = torch.nn.functional.cross_entropy(logits, y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 5.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    train_time = (time.perf_counter() - t0) / steps

    per_window = train_time / batch_size + prep_time / batch_size
    result = {
        "reference_windows_per_sec": round(1.0 / per_window, 4),
        "train_step_s_per_batch": round(train_time, 3),
        "preproc_s_per_window": round(prep_time / batch_size, 4),
        "batch_size": batch_size,
        "device": "cpu",
        "note": ("reference-equivalent torch path (HF wav2vec2-base fwd+bwd+SGD + "
                 "NumPy preprocessing) measured on this host; the reference repo "
                 "publishes no numbers and no GPU exists here"),
    }
    BASELINE_FILE.write_text(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    if "--measure-baseline" in sys.argv:
        print(json.dumps(measure_reference_baseline()))
    else:
        mode = "train"
        for arg in sys.argv[1:]:
            if arg.startswith("--mode="):
                mode = arg.split("=", 1)[1]
        print(json.dumps(run_bench(mode=mode)))
