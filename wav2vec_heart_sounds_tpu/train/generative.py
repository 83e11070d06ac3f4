"""Diffusion-vocoder training: epsilon-prediction L1, one jitted step, on-disk checkpoints.

Contract from reference src/mpcg_wav2vec/generative/trainer.py:22-171: both models train by
L1 epsilon-prediction; only how the noisy input and model call are formed differs (a per-model
*loss strategy*); shared machinery is grad-clip 1.0, Adam, non-finite-loss failure, per-epoch
``weights`` + best-validation ``weights-best`` checkpoints (model+optimizer+step), restore,
and periodic generated-sample logging from a fixed conditioner batch.

TPU notes: no AMP GradScaler — bf16 on TPU needs no loss scaling (the ``fp16`` flag of the
reference maps to ``compute_dtype=bfloat16``); checkpoints are flax msgpack files.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ..models.diffusion.diffwave import DiffWave
from ..models.diffusion.wavegrad import WaveGrad


def diffwave_loss(model: DiffWave, params, batch: dict, key: jax.Array) -> jnp.ndarray:
    """Discrete-step strategy: t ~ U{0..N-1}; noisy = sqrt(l_t)*ref + sqrt(1-l_t)*eps."""
    ref, con, label = batch["ref_audio"], batch["con_spec"], batch["label"]
    levels = jnp.asarray(model.config.training_schedule().training_noise_levels(),
                         dtype=jnp.float32)
    k_t, k_n = jax.random.split(key)
    t = jax.random.randint(k_t, (ref.shape[0],), 0, len(levels))
    scale = levels[t][:, None]
    noise = jax.random.normal(k_n, ref.shape)
    noisy = jnp.sqrt(scale) * ref + jnp.sqrt(1.0 - scale) * noise
    predicted = model.apply({"params": params}, noisy, t, con, label)
    return jnp.mean(jnp.abs(predicted - noise))


def wavegrad_loss(model: WaveGrad, params, batch: dict, key: jax.Array) -> jnp.ndarray:
    """Continuous-level strategy: level ~ U(l_{s-1}, l_s); noisy = l*ref + sqrt(1-l^2)*eps."""
    ref, con, label = batch["ref_audio"], batch["con_spec"], batch["label"]
    levels = jnp.asarray(model.config.training_schedule().continuous_noise_levels(),
                         dtype=jnp.float32)
    steps = len(levels) - 1
    k_s, k_u, k_n = jax.random.split(key, 3)
    s = jax.random.randint(k_s, (ref.shape[0],), 1, steps + 1)
    lo, hi = levels[s - 1], levels[s]
    scale = (lo + jax.random.uniform(k_u, (ref.shape[0],)) * (hi - lo))[:, None]
    noise = jax.random.normal(k_n, ref.shape)
    noisy = scale * ref + jnp.sqrt(1.0 - scale ** 2) * noise
    predicted = model.apply({"params": params}, noisy, con, scale[:, 0], label)
    return jnp.mean(jnp.abs(predicted - noise))


class GenBatcher:
    """Stack fixed-length generator items into device-ready numpy batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def __len__(self) -> int:
        return max(1, len(self.dataset) // self.batch_size) \
            if len(self.dataset) >= self.batch_size else 1

    def __iter__(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        self.epoch += 1
        bs = min(self.batch_size, n)
        for b in range(max(1, n // bs)):
            chunk = idx[b * bs:(b + 1) * bs]
            if len(chunk) < bs:
                break
            items = [self.dataset[int(i)] for i in chunk]
            yield {
                "ref_audio": np.stack([it["ref_audio"] for it in items]),
                "con_spec": np.stack([it["con_spec"] for it in items]),
                "label": np.asarray([it["label"] for it in items], dtype=np.int32),
                "patient": [it["patient"] for it in items],
            }


class GenerativeTrainer:
    def __init__(self, model, variables, loss_strategy: Callable, model_dir: str, *,
                 lr: float = 2e-4, max_grad_norm: float | None = 1.0,
                 sampler=None, sample_every: int = 10, log_dir: str | None = None,
                 seed: int = 0, log: Callable[[str], None] = print, mesh=None):
        self.model = model
        self.mesh = mesh
        self.params = variables["params"]
        if mesh is not None:
            # Data-parallel generative training: params replicated, batch sharded over
            # ``dp``; XLA inserts the gradient psum (same scheme as SupervisedTrainer).
            from ..parallel.mesh import replicate

            self.params = replicate(self.params, mesh)
        self.loss_strategy = loss_strategy
        self.model_dir = model_dir
        self.sampler = sampler
        self.sample_every = sample_every
        self.log = log
        self.log_dir = log_dir
        self.key = jax.random.key(seed)
        self.step = 0
        self.best_valid = float("inf")
        os.makedirs(model_dir, exist_ok=True)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)

        clip = [optax.clip_by_global_norm(max_grad_norm)] if max_grad_norm else []
        self.tx = optax.chain(*clip, optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        if mesh is not None:
            from ..parallel.mesh import replicate

            self.opt_state = replicate(self.opt_state, mesh)

        def train_step(params, opt_state, batch, key):
            loss, grads = jax.value_and_grad(
                lambda p: self.loss_strategy(self.model, p, batch, key))(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._loss = jax.jit(lambda p, b, k: self.loss_strategy(self.model, p, b, k))

    def train_step(self, batch: dict) -> float:
        self.key, sub = jax.random.split(self.key)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, _device(batch, self.mesh), sub)
        self.step += 1
        return float(loss)

    def validate(self, batcher, max_batches: int | None = None) -> float:
        total, count = 0.0, 0
        for i, batch in enumerate(batcher):
            self.key, sub = jax.random.split(self.key)
            total += float(self._loss(self.params, _device(batch, self.mesh), sub))
            count += 1
            if max_batches is not None and i + 1 >= max_batches:
                break
        return total / max(1, count)

    def train(self, train_batcher, epochs: int, valid_batcher=None,
              max_train_batches: int | None = None):
        name = type(self.model).__name__
        sample_batch = next(iter(train_batcher)) if (self.log_dir and self.sampler) else None
        for epoch in range(1, epochs + 1):
            running, n = 0.0, 0
            t0 = time.time()
            for i, batch in enumerate(train_batcher):
                loss = self.train_step(batch)
                if not np.isfinite(loss):
                    raise RuntimeError(f"non-finite loss at step {self.step}")
                running += loss
                n += 1
                if max_train_batches is not None and i + 1 >= max_train_batches:
                    break
            train_loss = running / max(1, n)
            msg = f"{name} epoch {epoch}/{epochs}: train L1={train_loss:.4f}"
            self._scalar(epoch, "train_L1", train_loss)
            if valid_batcher is not None:
                valid_loss = self.validate(valid_batcher, max_train_batches)
                msg += f" valid L1={valid_loss:.4f}"
                self._scalar(epoch, "valid_L1", valid_loss)
                if valid_loss < self.best_valid:
                    self.best_valid = valid_loss
                    self.save("weights-best")
            self._log_sample(epoch, sample_batch)
            self.log(msg + f" [{time.time() - t0:.1f}s]")
            self.save("weights")

    # --- observability ----------------------------------------------------

    def _scalar(self, epoch: int, tag: str, value: float) -> None:
        if not self.log_dir:
            return
        with open(os.path.join(self.log_dir, "scalars.jsonl"), "a") as fh:
            fh.write(json.dumps({"epoch": epoch, "tag": f"gen/{tag}",
                                 "value": value, "step": self.step}) + "\n")

    def _log_sample(self, epoch: int, sample_batch) -> None:
        """Periodically generate one clip from a fixed conditioner and write it to log_dir."""
        if sample_batch is None or self.sampler is None or epoch % self.sample_every:
            return
        from scipy.io import wavfile

        from ..signal.normalize import abs_max_normalise

        self.key, sub = jax.random.split(self.key)
        audio, sr = self.sampler(self.model, {"params": self.params},
                                 jnp.asarray(sample_batch["con_spec"][:1]),
                                 int(sample_batch["label"][0]), sub)
        wave = abs_max_normalise(np.asarray(audio)[0]).astype(np.float32)
        wavfile.write(os.path.join(self.log_dir, f"sample_e{epoch}.wav"), sr, wave)

    # --- checkpointing ------------------------------------------------------

    def save(self, name: str) -> str:
        path = os.path.join(self.model_dir, f"{name}.msgpack")
        payload = {"step": self.step, "params": jax.device_get(self.params),
                   "opt_state": jax.device_get(self.opt_state)}
        with open(path, "wb") as fh:
            fh.write(serialization.to_bytes(payload))
        return path

    def restore(self, path: str) -> bool:
        if not path or not os.path.exists(path):
            return False
        with open(path, "rb") as fh:
            template = {"step": 0, "params": jax.device_get(self.params),
                        "opt_state": jax.device_get(self.opt_state)}
            payload = serialization.from_bytes(template, fh.read())
        self.params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        self.opt_state = jax.tree_util.tree_map(jnp.asarray, payload["opt_state"])
        self.step = int(payload["step"])
        return True


def _device(batch: dict, mesh=None) -> dict:
    if mesh is not None:
        from ..parallel.mesh import maybe_shard_batch

        return {k: maybe_shard_batch(np.asarray(v), mesh)
                for k, v in batch.items() if k != "patient"}
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "patient"}
