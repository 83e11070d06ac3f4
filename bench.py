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


def run_gen_bench(batch_size: int = 16, steps: int = 10) -> dict:
    """DiffWave fast-sampling throughput: generated audio-seconds per wall second.

    B=16 is the measured TPU optimum (round-3 sweep, docs/artifacts/r3/chain.log:
    B=8 -> 72.4, B=16 -> 102.9, B=32 -> 39.9 audio-s/s memory cliff). steps=10 keeps the
    timed window ~10 s: the 3-call window used through round 4 was 1.3-3.3 s, inside the
    relay's single-stall magnitude, which produced the r3->r4 sampling swings
    (PERF.md round 5)."""
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


def run_wavegrad_sample_bench(batch_size: int = 8, steps: int = 10,
                              num_steps: int = 6, frames: int = 80) -> dict:
    """WaveGrad sampling throughput (subsampled reverse schedule, WG-6 by default).

    steps=10 (was 3 through round 4) — same stall-proofing rationale as run_gen_bench."""
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.diffusion import WaveGrad, WaveGradConfig
    from wav2vec_heart_sounds_tpu.models.diffusion.samplers import wavegrad_sample

    cfg = WaveGradConfig()
    model = WaveGrad(cfg)
    rng = np.random.default_rng(0)
    con = jnp.asarray(rng.uniform(0, 1, (batch_size, cfg.n_mels, frames)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 2, batch_size), jnp.int32)
    variables = model.init(jax.random.key(0), jnp.zeros((1, cfg.hop_length * frames)),
                           con[:1], jnp.ones((1,), jnp.float32), labels[:1])

    key = jax.random.key(1)
    audio, sr = wavegrad_sample(model, variables, con, labels, key, num_steps=num_steps)
    float(np.asarray(jax.device_get(audio)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        key, sub = jax.random.split(key)
        audio, sr = wavegrad_sample(model, variables, con, labels, sub,
                                    num_steps=num_steps)
    float(np.asarray(jax.device_get(audio)).ravel()[0])
    elapsed = time.perf_counter() - t0

    audio_seconds = batch_size * steps * (cfg.hop_length * frames / sr)
    value = audio_seconds / elapsed
    baseline = None
    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text()).get(
            "reference_gen_audio_s_per_s_wavegrad")
    return {
        "metric": "wavegrad_sampling_audio_s_per_s",
        "value": round(value, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(value / baseline, 3) if baseline else None,
        "num_steps": num_steps,
        "batch_size": batch_size,
        "backend": jax.default_backend(),
    }


def run_gen_train_bench(which: str = "diffwave", batch_size: int = 16, steps: int = 10,
                        frames: int = 80) -> dict:
    """Generative train-step throughput: audio-seconds of training data per wall second.

    Covers SURVEY hot-loops 2-3 (reference generative/trainer.py:104-139): one jitted
    value_and_grad + adam step of the DiffWave / WaveGrad denoising loss on synthetic
    mel/label-conditioned batches.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.models.diffusion import (DiffWave, DiffWaveConfig,
                                                           WaveGrad, WaveGradConfig)
    from wav2vec_heart_sounds_tpu.train.generative import (GenerativeTrainer,
                                                           diffwave_loss, wavegrad_loss)

    rng = np.random.default_rng(0)
    if which == "wavegrad":
        cfg = WaveGradConfig()
        model = WaveGrad(cfg)
        loss_fn = wavegrad_loss
    else:
        cfg = DiffWaveConfig()
        model = DiffWave(cfg)
        loss_fn = diffwave_loss
    n = cfg.hop_length * frames
    con = rng.uniform(0, 1, (batch_size, cfg.n_mels, frames)).astype(np.float32)
    labels = rng.integers(0, 2, batch_size).astype(np.int32)
    audio = rng.normal(size=(batch_size, n)).astype(np.float32) * 0.1
    if which == "wavegrad":
        variables = model.init(jax.random.key(0), jnp.zeros((1, n)),
                               jnp.asarray(con[:1]), jnp.ones((1,), jnp.float32),
                               jnp.asarray(labels[:1]))
    else:
        variables = model.init(jax.random.key(0), jnp.zeros((1, n)),
                               jnp.zeros((1,), jnp.int32), jnp.asarray(con[:1]),
                               jnp.asarray(labels[:1]))
    batch = {"ref_audio": audio, "con_spec": con, "label": labels}
    with tempfile.TemporaryDirectory() as tmp:
        trainer = GenerativeTrainer(model, variables, loss_fn, tmp, log=lambda s: None)
        for _ in range(2):
            trainer.train_step(batch)
        jax.device_get(jax.tree_util.tree_leaves(trainer.params)[0])
        t0 = time.perf_counter()
        for _ in range(steps):
            trainer.train_step(batch)
        jax.device_get(jax.tree_util.tree_leaves(trainer.params)[0])
        elapsed = time.perf_counter() - t0

    audio_seconds = batch_size * steps * (n / cfg.sample_rate)
    baseline = None
    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text()).get(
            f"reference_gen_train_audio_s_per_s_{which}")
    value = audio_seconds / elapsed
    return {
        "metric": f"{which}_train_audio_s_per_s",
        "value": round(value, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(value / baseline, 3) if baseline else None,
        "batch_size": batch_size,
        "steps": steps,
        "backend": jax.default_backend(),
    }


def run_vest_bench(batch_size: int = 16, steps: int = 6, window_s: float = 2.0,
                   fs: int = 4125, channels: int = 6, warm: int = 2) -> dict:
    """Vest 6-channel real loop: lazy host augmentation (shared-across-mics HPSS pipeline)
    -> Batcher int16 wire -> sinc beamformer + LoRA wav2vec2 train step (BASELINE.json
    config 3; reference classify/beamformer.py:15-55 + experiments/multichannel.py)."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.augment import AugmentConfig
    from wav2vec_heart_sounds_tpu.data import Fragment, FragmentDataset
    from wav2vec_heart_sounds_tpu.data.vest import (multi_augment,
                                                    multi_augment_host_residual)
    from wav2vec_heart_sounds_tpu.experiments.common import make_loader
    from wav2vec_heart_sounds_tpu.models.build import build_classifier
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    device_augment = os.environ.get("W2VHS_VEST_DEVAUG") == "1"
    # Bisect knobs (round-3 vest crash): shrink the step without touching the code path.
    batch_size = int(os.environ.get("W2VHS_VEST_BATCH", batch_size))
    steps = int(os.environ.get("W2VHS_VEST_STEPS", steps))
    window_s = float(os.environ.get("W2VHS_VEST_WINDOW_S", window_s))
    win_len = int(round(window_s * fs))
    aug_num = 15                                  # reference default expansion
    n_items = batch_size * (steps + warm + 2)
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
    host_fn = multi_augment_host_residual if device_augment else multi_augment
    ds = FragmentDataset(frags, fs=fs, augment_num=aug_num,
                         augment_fn=partial(host_fn, cfg=AugmentConfig()))

    batch_transform = None
    if device_augment:
        from wav2vec_heart_sounds_tpu.augment.jaxaug import augment_multi_pcg_batch

        batch_transform = partial(augment_multi_pcg_batch, fs=fs, cfg=AugmentConfig())
    ccfg = ClassifierConfig(num_classes=2, num_channels=channels, random_init=True,
                            lora=True, fs=fs, head_hidden=(256,))
    model, variables = build_classifier(ccfg, jax.random.key(0), win_len)
    trainer = SupervisedTrainer(model, variables, optimizer_name="adamw", lr=1e-4,
                                classifier_config=ccfg, batch_transform=batch_transform,
                                log=lambda s: None)
    loader = make_loader(ds, batch_size, True, 0, win_len)
    trainer._run_epoch(loader, True, max_batches=warm)     # compile + warm
    jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    t0 = time.perf_counter()
    _, loss = trainer._run_epoch(loader, True, max_batches=steps)
    jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    elapsed = time.perf_counter() - t0
    value = batch_size * steps / elapsed / max(1, jax.device_count())
    baseline = None
    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text()).get(
            "reference_vest_windows_per_sec")
    return {
        "metric": "vest_2s_windows_per_sec_per_chip_real_loop",
        "value": round(value, 3),
        "unit": "windows/s/chip",
        "vs_baseline": round(value / baseline, 3) if baseline else None,
        "device_augment": device_augment,
        "channels": channels,
        "batch_size": batch_size,
        "steps": steps,
        "backend": jax.default_backend(),
        "final_fetch": round(float(loss), 6),
    }


def run_fusion_bench(batch_size: int = 64, steps: int = 10, window_s: float = 4.0,
                     fs: int = 4125, warm: int = 3) -> dict:
    """Two-branch PCG+ECG fusion train step, e2e through the Batcher int16 wire
    (BASELINE.json config 2; reference classify/fusion.py:17-38, big_rnn:2:wav2vec)."""
    import jax
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.data import Fragment, FragmentDataset
    from wav2vec_heart_sounds_tpu.experiments.common import make_loader
    from wav2vec_heart_sounds_tpu.models.build import build_two_branch
    from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
    from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

    win_len = int(round(window_s * fs))
    n_items = batch_size * (steps + warm + 2)
    rng = np.random.default_rng(0)
    t = np.arange(win_len) / fs
    pcg = np.sin(2 * np.pi * 90 * t) + 0.4 * np.sin(2 * np.pi * 250 * t)
    ecg = np.sin(2 * np.pi * 1.2 * t)
    frags = []
    for i in range(n_items):
        wave = np.stack([pcg + 0.05 * rng.normal(size=win_len),
                         ecg + 0.02 * rng.normal(size=win_len)], axis=1)
        wave /= np.max(np.abs(wave))
        frags.append(Fragment(wave.astype(np.float32), i % 2, f"p{i}"))
    ds = FragmentDataset(frags, fs=fs)

    branch = lambda: ClassifierConfig(num_classes=2, num_channels=1, random_init=True,
                                      fs=fs)
    fusion, fusion_vars = build_two_branch(branch(), branch(), jax.random.key(0), win_len)
    trainer = SupervisedTrainer(fusion, fusion_vars, optimizer_name="adamw", lr=1e-4,
                                log=lambda s: None)
    loader = make_loader(ds, batch_size, True, 0, win_len)
    trainer._run_epoch(loader, True, max_batches=warm)
    jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    t0 = time.perf_counter()
    _, loss = trainer._run_epoch(loader, True, max_batches=steps)
    jax.device_get(jax.tree_util.tree_leaves(trainer.state.params)[0])
    elapsed = time.perf_counter() - t0
    value = batch_size * steps / elapsed / max(1, jax.device_count())
    baseline = None
    if BASELINE_FILE.exists():
        baseline = json.loads(BASELINE_FILE.read_text()).get(
            "reference_fusion_windows_per_sec")
    return {
        "metric": "fusion_4s_windows_per_sec_per_chip_e2e",
        "value": round(value, 3),
        "unit": "windows/s/chip",
        "vs_baseline": round(value / baseline, 3) if baseline else None,
        "batch_size": batch_size,
        "steps": steps,
        "backend": jax.default_backend(),
        "final_fetch": round(float(loss), 6),
    }


def run_bench(batch_size: int = 96, fs: int = 16000, window_s: float = 4.0,
              steps: int = 60, mode: str = "train", fs_in: int = 2000) -> dict:
    if mode == "gen":
        return run_gen_bench()
    if mode == "gen-wavegrad":
        return run_wavegrad_sample_bench()
    if mode in ("gen-train", "gen-train-diffwave"):
        return run_gen_train_bench("diffwave")
    if mode == "gen-train-wavegrad":
        return run_gen_train_bench("wavegrad")
    if mode == "vest":
        return run_vest_bench()
    if mode == "fusion":
        return run_fusion_bench()
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

    # Fused bench chain: per-program launch overhead through the relay is real headline
    # time (mode=preproc measures ~36 ms/step of launch train for <1 ms of device work),
    # so the per-step perturbation + resample + despike fuse into one program and the
    # IIR cascade + normalise + crop into a second — 2 launches instead of 5.
    # W2VHS_PREPROC_PAIRED=0 restores the 5-launch un-fused chain for A/B.
    from wav2vec_heart_sounds_tpu.signal.jaxproc import _pcg_head, _pcg_tail
    from wav2vec_heart_sounds_tpu.utils.aot import aot_jit

    def _bench_head(x, key, fs_in_, fs_):
        return _pcg_head(x * (1.0 + 1e-6 * jax.random.uniform(key, ())), fs_in_, fs_)

    def _bench_tail(x, fs_, n):
        return _pcg_tail(x, fs_)[:, :n]

    bench_head = aot_jit(_bench_head, static_argnames=("fs_in_", "fs_"))
    bench_tail = aot_jit(_bench_tail, static_argnames=("fs_", "n"))
    if os.environ.get("W2VHS_PREPROC_PAIRED", "1") != "0":
        def prep_fresh(key):
            return bench_tail(bench_head(raw_dev, key, fs_in, fs), fs, win_len)
    else:
        def prep_fresh(key):
            return prep(fresh_input(key))

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
            return prep_fresh(key)
    elif mode == "infer":
        fwd = jax.jit(lambda v, x: model.apply(v, x))

        def run_step(key):
            return fwd(trainer.variables, prep_fresh(key))
    elif os.environ.get("W2VHS_TAIL_IN_TRAIN") == "1":
        # Launch-count lever (round-5 A/B): fold the preproc tail (IIR cascade +
        # normalise + crop — a scan, no while_loop) into the train-step program, so each
        # bench step is TWO launches (head; tail+train) instead of three. The round-1
        # pathological-compile combination was conv + while_loop + scan in one program;
        # the despike while_loop stays in the head here, so this pairing is new ground.
        from wav2vec_heart_sounds_tpu.utils.aot import cached_compile

        state = trainer.state

        def _fused_impl(params, loss_params, opt_state, xh, y, v, lr_, key_):
            waves = _pcg_tail(xh, fs)[:, :win_len]
            return trainer._train_step_impl(params, loss_params, opt_state, waves,
                                            y, v, lr_, key_)

        fused = jax.jit(_fused_impl, donate_argnums=(0, 1, 2, 3))
        xh_ex = bench_head(raw_dev, jax.random.key(0), fs_in, fs)
        if os.environ.get("W2VHS_AOT") != "0":
            fused = cached_compile(fused, state.params, state.loss_params,
                                   state.opt_state, xh_ex, labels, valid, lr,
                                   jax.random.key(0))

        def run_step(key):
            xh = bench_head(raw_dev, key, fs_in, fs)
            (state.params, state.loss_params, state.opt_state, loss, _) = fused(
                state.params, state.loss_params, state.opt_state, xh, labels, valid,
                lr, key)
            return loss
    else:  # train: fused-pair preproc launches feeding the train-step executable
        if os.environ.get("W2VHS_AOT") != "0":
            # AOT executable cache: the first invocation pays the remote compile and
            # serializes the result; later fresh processes reload it in seconds (the
            # persistent HLO cache is bypassed by the relay toolchain — PERF.md).
            trainer.aot_warm(jnp.zeros((batch_size, win_len), jnp.float32), labels, valid)
        state = trainer.state

        def run_step(key):
            waves = prep_fresh(key)
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


def measure_reference_gen_baseline(batch_size: int = 4, steps: int = 2,
                                   frames: int = 80) -> dict:
    """Measure the reference-equivalent generative path with torch on this host.

    Equivalent-architecture torch DiffWave (30 res layers / 64 channels / dilation cycle
    10, mel+label conditioned — the reference generative/diffwave.py architecture,
    re-implemented here rather than imported): one adam train step on L1 denoising loss
    (reference generative/trainer.py:22-33) and 6-step fast sampling (reference
    generative/samplers.py:41-66), timed per audio-second and written into
    BASELINE_MEASURED.json next to the classifier numbers.
    """
    import math

    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    C, n_mels, hop, layers, cycle, num_classes = 64, 80, 256, 30, 10, 2
    sample_rate = 4000
    n = hop * frames

    class TorchDiffWave(tnn.Module):
        def __init__(self):
            super().__init__()
            j = torch.arange(64)
            self.register_buffer("freq", 10.0 ** (j * 4.0 / 63.0))
            self.fc1 = tnn.Linear(128, 512)
            self.fc2 = tnn.Linear(512, 512)
            self.label_emb = tnn.Embedding(num_classes, 512)
            self.inp = tnn.Conv1d(1, C, 1)
            self.up1 = tnn.ConvTranspose2d(1, 1, (3, 32), stride=(1, 16), padding=(1, 8))
            self.up2 = tnn.ConvTranspose2d(1, 1, (3, 32), stride=(1, 16), padding=(1, 8))
            self.step_proj = tnn.ModuleList([tnn.Linear(512, C) for _ in range(layers)])
            self.dil = tnn.ModuleList([
                tnn.Conv1d(C, 2 * C, 3, dilation=2 ** (i % cycle),
                           padding=2 ** (i % cycle)) for i in range(layers)])
            self.cond = tnn.ModuleList([tnn.Conv1d(n_mels, 2 * C, 1)
                                        for _ in range(layers)])
            self.out_res = tnn.ModuleList([tnn.Conv1d(C, 2 * C, 1)
                                           for _ in range(layers)])
            self.skip1 = tnn.Conv1d(C, C, 1)
            self.skip2 = tnn.Conv1d(C, 1, 1)

        def forward(self, audio, t, mel, label):
            emb = torch.cat([torch.sin(t[:, None] * self.freq),
                             torch.cos(t[:, None] * self.freq)], dim=1)
            emb = F.silu(self.fc1(emb))
            emb = F.silu(self.fc2(emb)) + self.label_emb(label)
            cond = F.leaky_relu(self.up1(mel[:, None]), 0.4)
            cond = F.leaky_relu(self.up2(cond), 0.4)[:, 0, :, :audio.shape[-1]]
            x = F.relu(self.inp(audio[:, None]))
            skip = 0.0
            for i in range(layers):
                h = self.dil[i](x + self.step_proj[i](emb)[:, :, None]) + self.cond[i](cond)
                h = torch.tanh(h[:, :C]) * torch.sigmoid(h[:, C:])
                h = self.out_res[i](h)
                x = (x + h[:, :C]) / math.sqrt(2.0)
                skip = skip + h[:, C:]
            return self.skip2(F.relu(self.skip1(skip / math.sqrt(layers))))[:, 0]

    torch.manual_seed(0)
    model = TorchDiffWave()
    opt = torch.optim.Adam(model.parameters(), lr=2e-4)
    audio = torch.randn(batch_size, n) * 0.1
    mel = torch.rand(batch_size, n_mels, frames)
    label = torch.arange(batch_size) % num_classes
    betas = np.linspace(1e-4, 0.05, 50)
    alpha_cum = np.cumprod(1.0 - betas)

    def train_step():
        opt.zero_grad(set_to_none=True)
        t = torch.randint(0, 50, (batch_size,))
        scale = torch.from_numpy(alpha_cum).float()[t][:, None]
        noise = torch.randn_like(audio)
        noisy = torch.sqrt(scale) * audio + torch.sqrt(1 - scale) * noise
        loss = F.l1_loss(model(noisy, t.float(), mel, label), noise)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    train_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step()
    train_s = (time.perf_counter() - t0) / steps

    fast_betas = np.asarray([0.0001, 0.001, 0.01, 0.05, 0.2, 0.5])
    fa = 1.0 - fast_betas
    fac = np.cumprod(fa)
    with torch.no_grad():
        x = torch.randn(batch_size, n)
        t0 = time.perf_counter()
        for i in range(len(fast_betas) - 1, -1, -1):
            eps = model(x, torch.full((batch_size,), float(i)), mel, label)
            x = (x - fast_betas[i] / math.sqrt(1 - fac[i]) * eps) / math.sqrt(fa[i])
            if i > 0:
                x = x + math.sqrt(fast_betas[i]) * torch.randn_like(x)
        sample_s = time.perf_counter() - t0

    audio_s = batch_size * n / sample_rate
    result = json.loads(BASELINE_FILE.read_text()) if BASELINE_FILE.exists() else {}
    result.update({
        "reference_gen_audio_s_per_s": round(audio_s / sample_s, 4),
        "reference_gen_train_audio_s_per_s_diffwave": round(audio_s / train_s, 4),
        "gen_note": ("reference-equivalent torch DiffWave (30x64 res stack, mel+label "
                     "conditioning) train step + 6-step fast sampling on this host's CPU; "
                     "the reference repo publishes no numbers and no GPU exists here"),
    })
    BASELINE_FILE.write_text(json.dumps(result, indent=2))
    return result


def measure_reference_wavegrad_baseline(batch_size: int = 2, steps: int = 2,
                                        frames: int = 80) -> dict:
    """Torch-CPU WaveGrad-equivalent baseline (same protocol as the DiffWave one).

    Mirrors this repo's `models/diffusion/wavegrad.py` (itself the reference
    generative/wavegrad.py:19-155 architecture): FiLM'd U-net with down factors
    2/2/3/5, continuous-noise-level training on L1 (reference trainer semantics) and a
    6-point subsampled reverse schedule, timed per audio-second.
    """
    import math

    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    n_mels, hop, num_classes, label_dim, sample_rate = 128, 300, 2, 32, 4000
    n = hop * frames
    DOWN = ((128, 2), (128, 2), (256, 3), (512, 5))
    FILM = ((32, 128), (128, 128), (128, 256), (256, 512), (512, 512))
    UP = ((512, 5, (1, 2, 1, 2)), (512, 5, (1, 2, 1, 2)), (256, 3, (1, 2, 4, 8)),
          (128, 2, (1, 2, 4, 8)), (128, 2, (1, 2, 4, 8)))

    def conv(cin, cout, k, dil=1):
        return tnn.Conv1d(cin, cout, k, dilation=dil, padding=dil * (k - 1) // 2)

    def resize(x, length):
        return F.interpolate(x, size=length, mode="nearest")

    class FiLM(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.emb = tnn.Embedding(num_classes, label_dim)
            self.proj = tnn.Linear(label_dim, cin)
            self.inp = conv(cin, cin, 3)
            self.out = conv(cin, 2 * cout, 3)
            half = cin // 2
            self.register_buffer("freq",
                                 torch.exp(-math.log(1e4) * torch.arange(half) / half))

        def forward(self, x, level, label):
            x = self.inp(x + self.proj(self.emb(label))[:, :, None])
            enc = level[:, None] * self.freq[None, :]
            enc = torch.cat([torch.sin(enc), torch.cos(enc)], dim=1)
            x = F.leaky_relu(x, 0.2) + enc[:, :, None]
            return self.out(x).chunk(2, dim=1)

    class DBlock(tnn.Module):
        def __init__(self, cin, cout, factor):
            super().__init__()
            self.factor = factor
            self.res = conv(cin, cout, 1)
            self.convs = tnn.ModuleList([conv(cin if i == 0 else cout, cout, 3, d)
                                         for i, d in enumerate((1, 2, 4))])

        def forward(self, x):
            size = x.shape[-1] // self.factor
            residual = resize(self.res(x), size)
            x = resize(x, size)
            for c in self.convs:
                x = c(F.leaky_relu(x, 0.2))
            return x + residual

    class UBlock(tnn.Module):
        def __init__(self, cin, cout, factor, dils):
            super().__init__()
            self.factor = factor
            self.skip = conv(cin, cout, 1)
            self.a0 = conv(cin, cout, 3, dils[0])
            self.a1 = conv(cout, cout, 3, dils[1])
            self.b0 = conv(cout, cout, 3, dils[2])
            self.b1 = conv(cout, cout, 3, dils[3])

        def forward(self, x, shift, scale):
            size = x.shape[-1] * self.factor
            skip = self.skip(resize(x, size))
            h = self.a0(resize(F.leaky_relu(x, 0.2), size))
            h = self.a1(F.leaky_relu(shift + scale * h, 0.2))
            x = skip + h
            h = self.b0(F.leaky_relu(shift + scale * x, 0.2))
            h = self.b1(F.leaky_relu(shift + scale * h, 0.2))
            return x + h

    class TorchWaveGrad(tnn.Module):
        def __init__(self):
            super().__init__()
            self.init_conv = conv(1, 32, 5)
            self.down = tnn.ModuleList(
                [DBlock(32 if i == 0 else DOWN[i - 1][0], ch, f)
                 for i, (ch, f) in enumerate(DOWN)])
            self.film = tnn.ModuleList([FiLM(cin, cout) for cin, cout in FILM])
            self.first_conv = conv(n_mels, 768, 3)
            up_in = (768, 512, 512, 256, 128)
            self.up = tnn.ModuleList([UBlock(up_in[i], ch, f, d)
                                      for i, (ch, f, d) in enumerate(UP)])
            self.last_conv = conv(128, 1, 3)

        def forward(self, audio, mel, level, label):
            x = self.init_conv(audio[:, None])
            stages = [x]
            for d in self.down:
                x = d(x)
                stages.append(x)
            mods = [f(s, level, label) for f, s in zip(self.film, stages)]
            h = self.first_conv(mel[:, :, :audio.shape[-1] // hop])
            for u, (shift, scale) in zip(self.up, reversed(mods)):
                h = u(h, shift, scale)
            return self.last_conv(h)[:, 0]

    torch.manual_seed(0)
    model = TorchWaveGrad()
    opt = torch.optim.Adam(model.parameters(), lr=2e-4)
    audio = torch.randn(batch_size, n) * 0.1
    mel = torch.rand(batch_size, n_mels, frames)
    label = torch.arange(batch_size) % num_classes
    betas = np.linspace(1e-6, 0.01, 1000)
    alpha_cum = np.cumprod(1.0 - betas)
    levels = np.concatenate([[1.0], np.sqrt(alpha_cum)])

    def train_step():
        opt.zero_grad(set_to_none=True)
        s = torch.randint(1, 1000, (batch_size,))
        lo = torch.from_numpy(levels).float()[s - 1]
        hi = torch.from_numpy(levels).float()[s]
        scale = (lo + torch.rand(batch_size) * (hi - lo))[:, None]
        noise = torch.randn_like(audio)
        noisy = scale * audio + torch.sqrt(1.0 - scale ** 2) * noise
        loss = F.l1_loss(model(noisy, mel, scale[:, 0], label), noise)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()

    train_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        train_step()
    train_s = (time.perf_counter() - t0) / steps

    order = np.unique(np.linspace(0, 999, 6).round().astype(int))[::-1].copy()
    alpha = 1.0 - betas
    with torch.no_grad():
        x = torch.randn(batch_size, n)
        t0 = time.perf_counter()
        for i in order:
            lvl = torch.full((batch_size,), float(np.sqrt(alpha_cum[i])))
            eps = model(x, mel, lvl, label)
            x = (x - (1 - alpha[i]) / math.sqrt(1 - alpha_cum[i]) * eps) \
                / math.sqrt(alpha[i])
            if i > 0:
                x = x + math.sqrt(betas[i]) * torch.randn_like(x)
        sample_s = time.perf_counter() - t0

    audio_s = batch_size * n / sample_rate
    result = json.loads(BASELINE_FILE.read_text()) if BASELINE_FILE.exists() else {}
    result.update({
        "reference_gen_audio_s_per_s_wavegrad": round(audio_s / sample_s, 4),
        "reference_gen_train_audio_s_per_s_wavegrad": round(audio_s / train_s, 4),
    })
    BASELINE_FILE.write_text(json.dumps(result, indent=2))
    return result


def measure_reference_vest_baseline(batch_size: int = 2, steps: int = 1,
                                    window_s: float = 2.0, fs: int = 4125,
                                    channels: int = 6) -> dict:
    """Measure the reference-equivalent vest path with torch on this host.

    Pipeline per reference src/mpcg_wav2vec/classify/beamformer.py:15-55 +
    experiments/multichannel.py:20-81: a tiny transformer predicts per-sample per-mic
    fractional delays (clamped [0, 0.01 s * fs]); each channel is delayed by a 41-tap
    Hamming-windowed dynamic sinc kernel (the memory-heavy unfold-einsum), squared and
    summed; the mono collapse feeds a LoRA-wrapped (peft r=8/alpha=16, q_proj/v_proj)
    wav2vec2-base + (256,) head under AdamW. Host augmentation cost per window uses this
    repo's in-house ``multi_augment`` (librosa/rubberband are absent here; the reference's
    own HPSS/stretch path is, if anything, slower). Timed per window and extrapolated —
    the same accounting as ``run_vest_bench``.
    """
    import torch
    import torch.nn.functional as F
    from peft import LoraConfig, get_peft_model
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model as HFModel

    from wav2vec_heart_sounds_tpu.augment import AugmentConfig
    from wav2vec_heart_sounds_tpu.data.vest import multi_augment

    win_len = int(round(window_s * fs))
    rng = np.random.default_rng(0)
    t = np.arange(win_len) / fs
    base = np.sin(2 * np.pi * 85 * t) + 0.3 * np.sin(2 * np.pi * 190 * t)
    waves = (base[:, None, None]
             + 0.05 * rng.normal(size=(win_len, channels, batch_size))).astype(np.float32)
    waves /= np.max(np.abs(waves))

    # Lazy per-epoch host augmentation (reference datasets/fragments.py:65-75 semantics).
    t0 = time.perf_counter()
    aug_reps = 3
    for i in range(aug_reps):
        multi_augment(waves[:, :, i % batch_size], fs, AugmentConfig(),
                      rng=np.random.default_rng(i))
    aug_time = (time.perf_counter() - t0) / aug_reps

    class SincBeamformer(torch.nn.Module):
        """Reference classify/beamformer.py:15-55 behaviour (fresh implementation)."""

        def __init__(self, mics: int, fs: float, k: int = 41, d_model: int = 32):
            super().__init__()
            self.k, self.max_delay = k, 0.01 * fs
            self.in_proj = torch.nn.Conv1d(mics, d_model, 1)
            layer = torch.nn.TransformerEncoderLayer(d_model, 4, 64, batch_first=True)
            self.encoder = torch.nn.TransformerEncoder(layer, 2)
            self.out_proj = torch.nn.Linear(d_model, mics)
            self.register_buffer("hamming", torch.hamming_window(k, periodic=False))
            self.register_buffer("taps", torch.arange(k, dtype=torch.float32) - k // 2)

        def forward(self, x):                                     # [B, M, T] -> [B, T]
            h = self.encoder(self.in_proj(x).transpose(1, 2))     # [B, T, d]
            delays = self.out_proj(h).clamp(0.0, self.max_delay)  # [B, T, M]
            frames = F.pad(x, (self.k // 2, self.k // 2)).unfold(-1, self.k, 1)
            arg = self.taps.view(1, 1, 1, -1) - delays.transpose(1, 2).unsqueeze(-1)
            kern = torch.sinc(arg) * self.hamming                 # [B, M, T, k]
            kern = kern / kern.sum(-1, keepdim=True).clamp_min(1e-8)
            return ((frames * kern).sum(-1) ** 2).sum(1)

    torch.manual_seed(0)
    bf = SincBeamformer(channels, fs)
    encoder = get_peft_model(
        HFModel(HFConfig()),
        LoraConfig(r=8, lora_alpha=16, target_modules=["q_proj", "v_proj"],
                   lora_dropout=0.05))
    # peft freezes the conv feature encoder's params but leaves HF's _requires_grad flag
    # set; the transformers version pinned here then raises on grad-carrying inputs
    # ("requires_grad flags of leaf variables") in train mode. Freezing the feature
    # extractor reconciles the flag with what peft already did — identical compute,
    # gradients still flow through the convs to the beamformer.
    encoder.get_base_model().feature_extractor._freeze_parameters()
    head = torch.nn.Sequential(torch.nn.Linear(768, 256), torch.nn.ReLU(),
                               torch.nn.Linear(256, 2))
    params = [p for m in (bf, encoder, head) for p in m.parameters() if p.requires_grad]
    opt = torch.optim.AdamW(params, lr=1e-4)
    x = torch.from_numpy(np.moveaxis(waves, (0, 1, 2), (2, 1, 0)).copy())  # [B, M, T]
    y = torch.from_numpy((np.arange(batch_size) % 2).astype(np.int64))

    def step():
        opt.zero_grad(set_to_none=True)
        logits = head(encoder(bf(x)).last_hidden_state.mean(dim=1))
        loss = torch.nn.functional.cross_entropy(logits, y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 5.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    train_time = (time.perf_counter() - t0) / steps

    per_window = train_time / batch_size + aug_time
    result = json.loads(BASELINE_FILE.read_text()) if BASELINE_FILE.exists() else {}
    result.update({
        "reference_vest_windows_per_sec": round(1.0 / per_window, 4),
        "vest_train_step_s_per_batch": round(train_time, 3),
        "vest_augment_s_per_window": round(aug_time, 4),
        "vest_batch_size": batch_size,
        "vest_note": ("reference-equivalent torch vest path (sinc beamformer + peft-LoRA "
                      "wav2vec2-base + host augmentation) measured on this host's CPU; "
                      "the reference repo publishes no numbers and no GPU exists here"),
    })
    BASELINE_FILE.write_text(json.dumps(result, indent=2))
    return result


def measure_reference_fusion_baseline(batch_size: int = 4, steps: int = 1,
                                      window_s: float = 4.0, fs: int = 4125) -> dict:
    """Measure the reference-equivalent two-branch PCG+ECG fusion path with torch.

    Reference classify/fusion.py:17-38: one wav2vec2-base per channel, concatenated
    mean-pooled features through the (2h -> h -> classes, h=128) MLP; both encoders train
    in the step (the e2e configuration ``run_fusion_bench`` measures). Per-window NumPy
    preprocessing (PCG + ECG chains) included, as in ``measure_reference_baseline``.
    """
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model as HFModel

    from wav2vec_heart_sounds_tpu.signal import preprocess_ecg, preprocess_pcg

    fs_in = 2000
    win_len = int(round(window_s * fs))
    raw = _raw_batch(batch_size, fs_in, window_s)

    t0 = time.perf_counter()
    pcg = np.stack([preprocess_pcg(raw[i], fs_in, fs)[:win_len]
                    for i in range(batch_size)])
    ecg = np.stack([preprocess_ecg(raw[i], fs_in, fs)[:win_len]
                    for i in range(batch_size)])
    prep_time = time.perf_counter() - t0

    torch.manual_seed(0)
    enc_pcg, enc_ecg = HFModel(HFConfig()), HFModel(HFConfig())
    head = torch.nn.Sequential(torch.nn.Linear(2 * 768, 256), torch.nn.ReLU(),
                               torch.nn.Linear(256, 128), torch.nn.ReLU(),
                               torch.nn.Linear(128, 2))
    params = (list(enc_pcg.parameters()) + list(enc_ecg.parameters())
              + list(head.parameters()))
    opt = torch.optim.AdamW(params, lr=1e-4)
    xp = torch.from_numpy(pcg.astype(np.float32))
    xe = torch.from_numpy(ecg.astype(np.float32))
    y = torch.from_numpy((np.arange(batch_size) % 2).astype(np.int64))

    def step():
        opt.zero_grad(set_to_none=True)
        feats = torch.cat([enc_pcg(xp).last_hidden_state.mean(dim=1),
                           enc_ecg(xe).last_hidden_state.mean(dim=1)], dim=-1)
        loss = torch.nn.functional.cross_entropy(head(feats), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(params, 5.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    train_time = (time.perf_counter() - t0) / steps

    per_window = (train_time + prep_time) / batch_size
    result = json.loads(BASELINE_FILE.read_text()) if BASELINE_FILE.exists() else {}
    result.update({
        "reference_fusion_windows_per_sec": round(1.0 / per_window, 4),
        "fusion_train_step_s_per_batch": round(train_time, 3),
        "fusion_preproc_s_per_window": round(prep_time / batch_size, 4),
        "fusion_batch_size": batch_size,
        "fusion_note": ("reference-equivalent torch two-branch fusion (2x wav2vec2-base "
                        "+ MLP head, both branches training) measured on this host's "
                        "CPU; no GPU exists here"),
    })
    BASELINE_FILE.write_text(json.dumps(result, indent=2))
    return result


def _wait_for_backend(max_wait_s: float = 900.0, probe_timeout_s: float = 240.0) -> bool:
    """Probe JAX backend init in a child process until it succeeds or the budget runs out.

    The tunneled TPU backend hangs indefinitely inside backend init when the relay is down
    (observed multi-hour outages); a hung bench run leaves the driver with no output at all.
    Probing in a child keeps this process un-initialized, so a recovered tunnel still gets a
    clean first init. Returns True when a backend came up. Budget override:
    ``W2VHS_BENCH_BACKEND_WAIT_S`` (0 disables probing entirely).
    """
    import subprocess

    max_wait_s = float(os.environ.get("W2VHS_BENCH_BACKEND_WAIT_S", max_wait_s))
    if max_wait_s <= 0:
        return True
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; assert jax.devices()"],
                timeout=min(probe_timeout_s, max(10.0, deadline - time.monotonic())),
                capture_output=True,
            )
            if proc.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.monotonic() >= deadline:
            return False
        time.sleep(30.0)


if __name__ == "__main__":
    if "--measure-baseline-vest" in sys.argv:
        print(json.dumps(measure_reference_vest_baseline()))
    elif "--measure-baseline-fusion" in sys.argv:
        print(json.dumps(measure_reference_fusion_baseline()))
    elif "--measure-baseline-wavegrad" in sys.argv:
        print(json.dumps(measure_reference_wavegrad_baseline()))
    elif "--measure-baseline-gen" in sys.argv:
        print(json.dumps(measure_reference_gen_baseline()))
    elif "--measure-baseline" in sys.argv:
        print(json.dumps(measure_reference_baseline()))
    else:
        mode = "train"
        # Timed-window length for train/infer/preproc modes. Default 60 steps (~10 s at
        # the headline step time): the round-5 chain showed single relay stalls run
        # seconds-to-minutes, so the previous 20-step (~3.3 s) window sat inside
        # single-stall magnitude — the same measurement fragility the 3-call sampling
        # windows had before round 5 lengthened them to 10 calls.
        steps = 60
        for arg in sys.argv[1:]:
            if arg.startswith("--mode="):
                mode = arg.split("=", 1)[1]
            elif arg.startswith("--steps="):
                steps = int(arg.split("=", 1)[1])
        if not _wait_for_backend():
            print(json.dumps({
                "metric": "pcg_4s_windows_per_sec_per_chip_e2e", "value": None,
                "unit": "windows/s/chip", "vs_baseline": None,
                "error": "jax backend init unavailable (relay TPU down) within the probe "
                         "budget; see W2VHS_BENCH_BACKEND_WAIT_S",
            }))
            sys.exit(0)
        print(json.dumps(run_bench(mode=mode, steps=steps)))
