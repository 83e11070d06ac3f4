"""Reverse-diffusion samplers as ``lax.scan`` loops.

Contract from reference src/mpcg_wav2vec/generative/samplers.py:26-97: both samplers start
from N(0, 1) of length ``hop * mel_frames`` and return ``(audio [B, T], sample_rate)``;
DiffWave's fast path maps its 6 inference betas onto fractional training steps by matching
alpha_cumprod; WaveGrad optionally sub-samples its 1000 steps. Per step: epsilon update, plus
sigma-scaled noise except at the last step, then clamp to [-1, 1].

TPU design: all per-step scalars (mapped step, beta, alpha, alpha_cum, sigma) are precomputed
on the host and stacked as scan inputs; the model call sits inside one ``lax.scan`` body so
the entire reverse process is a single compiled program — 6 or 1000 steps with zero host
round-trips.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import NoiseSchedule


def align_fast_steps(train_sched: NoiseSchedule, infer_sched: NoiseSchedule) -> np.ndarray:
    """Map each inference step to a fractional training step by matching alpha_cumprod."""
    train_cum = train_sched.alpha_cumprod
    infer_cum = infer_sched.alpha_cumprod
    steps = []
    for s in range(len(infer_cum)):
        for t in range(len(train_cum) - 1):
            if train_cum[t + 1] <= infer_cum[s] <= train_cum[t]:
                frac = ((train_cum[t] ** 0.5 - infer_cum[s] ** 0.5)
                        / (train_cum[t] ** 0.5 - train_cum[t + 1] ** 0.5))
                steps.append(t + frac)
                break
    return np.asarray(steps, dtype=np.float32)


def _sigmas(alpha_cum: np.ndarray, betas: np.ndarray, indices: np.ndarray) -> np.ndarray:
    """Posterior noise scale per visited step; 0 at the final (n == 0) step."""
    out = np.zeros(len(indices))
    for i, n in enumerate(indices):
        if n > 0:
            out[i] = ((1.0 - alpha_cum[n - 1]) / (1.0 - alpha_cum[n]) * betas[n]) ** 0.5
    return out


def _prepare(conditioner: jnp.ndarray, label) -> tuple[jnp.ndarray, jnp.ndarray]:
    if conditioner.ndim == 2:
        conditioner = conditioner[None]
    label = jnp.asarray(label).reshape(-1)
    if label.shape[0] == 1 and conditioner.shape[0] > 1:
        label = jnp.broadcast_to(label, (conditioner.shape[0],))
    return conditioner, label


@lru_cache(maxsize=64)
def _jitted_reverse(model, swap_args: bool, n_samples: int,
                    steps: tuple, c1: tuple, c2: tuple, sigma: tuple):
    """One compiled reverse process per (model, schedule, length); params are jit args.

    Cached so repeated sampling (e.g. generate_dataset iterating hundreds of items) pays
    tracing/compilation once.
    """

    @jax.jit
    def run(variables, key, conditioner, label):
        batch = conditioner.shape[0]
        key, init_key = jax.random.split(key)
        audio0 = jax.random.normal(init_key, (batch, n_samples))
        noise_keys = jax.random.split(key, len(c1))

        def apply_fn(audio, step, cond, lab):
            if swap_args:   # WaveGrad: (audio, conditioner, noise_level, label)
                return model.apply(variables, audio, cond, step, lab)
            return model.apply(variables, audio, step, cond, lab)

        def body(audio, xs):
            step, c1_n, c2_n, sigma_n, k = xs
            eps = apply_fn(audio, jnp.full((batch,), step), conditioner, label)
            audio = (audio - c2_n * eps) / c1_n
            audio = audio + sigma_n * jax.random.normal(k, audio.shape)
            return jnp.clip(audio, -1.0, 1.0), None

        xs = (jnp.asarray(steps, jnp.float32), jnp.asarray(c1, jnp.float32),
              jnp.asarray(c2, jnp.float32), jnp.asarray(sigma, jnp.float32), noise_keys)
        audio, _ = jax.lax.scan(body, audio0, xs)
        return audio

    return run


def diffwave_sample(model, variables, conditioner, label, key, *, fast: bool = True):
    """Returns (audio [B, hop*frames], sample_rate)."""
    cfg = model.config
    conditioner, label = _prepare(jnp.asarray(conditioner), label)

    train_sched = cfg.training_schedule()
    infer_sched = (NoiseSchedule(tuple(np.asarray(cfg.inference_betas, dtype=np.float64)))
                   if fast else train_sched)
    mapped = (align_fast_steps(train_sched, infer_sched) if fast
              else np.arange(len(train_sched), dtype=np.float32))

    beta = np.asarray(infer_sched.betas)
    alpha = infer_sched.alphas
    alpha_cum = infer_sched.alpha_cumprod
    order = np.arange(len(alpha))[::-1]                      # N-1 .. 0

    n_samples = cfg.hop_length * conditioner.shape[-1]
    steps = mapped[order].astype(np.float32)
    c1 = alpha[order] ** 0.5
    c2 = beta[order] / (1.0 - alpha_cum[order]) ** 0.5
    sigma = _sigmas(alpha_cum, beta, order)

    run = _jitted_reverse(model, False, int(n_samples), tuple(steps.tolist()),
                          tuple(c1.tolist()), tuple(c2.tolist()), tuple(sigma.tolist()))
    return run(variables, key, conditioner, label), cfg.sample_rate


def wavegrad_sample(model, variables, conditioner, label, key, *,
                    num_steps: int | None = None):
    """Returns (audio [B, hop*frames], sample_rate)."""
    cfg = model.config
    conditioner, label = _prepare(jnp.asarray(conditioner), label)

    sched = cfg.training_schedule()
    beta = np.asarray(sched.betas)
    alpha = sched.alphas
    alpha_cum = sched.alpha_cumprod
    noise_scale = np.sqrt(alpha_cum)

    order = np.arange(len(alpha))[::-1]
    if num_steps is not None and num_steps < len(alpha):
        order = np.unique(np.linspace(0, len(alpha) - 1, num_steps).round().astype(int))[::-1]

    n_samples = cfg.hop_length * conditioner.shape[-1]
    steps = noise_scale[order].astype(np.float32)            # the model's noise-level input
    c1 = alpha[order] ** 0.5
    c2 = (1.0 - alpha[order]) / (1.0 - alpha_cum[order]) ** 0.5
    sigma = _sigmas(alpha_cum, beta, order)

    run = _jitted_reverse(model, True, int(n_samples), tuple(steps.tolist()),
                          tuple(c1.tolist()), tuple(c2.tolist()), tuple(sigma.tolist()))
    return run(variables, key, conditioner, label), cfg.sample_rate
