"""Supervised classifier training: one jitted train step, best-MCC keeping, DP sharding.

The reference's epoch loop (src/mpcg_wav2vec/classify/trainer.py:16-120) becomes a single
donated, jit-compiled train step (forward + loss + backward + masked/clipped optimizer update)
driven by the host batcher. TPU specifics:

* static batch shapes -> one compilation per stage; per-epoch StepLR enters as a traced scalar;
* params/opt-state are donated so updates happen in place in HBM;
* with more than one device, batches are sharded over the ``dp`` mesh axis and parameters are
  replicated — XLA inserts the gradient psum (the only collective this workload needs,
  SURVEY.md §2.7);
* optional on-device batch augmentation (:mod:`..augment.jaxaug`) fuses into the same program;
* the best-validation-MCC parameters are kept on host and restored after fit (reference
  trainer.py:90-112 semantics — classification checkpoints are in-memory only).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.classifier import Wav2VecClassifier, trainable_mask
from ..parallel.mesh import maybe_shard_batch, replicate
from .losses import (
    ContrastiveFocalConfig,
    contrastive_focal_loss,
    cross_entropy,
    init_contrastive_focal,
)
from .metrics import ConfusionMatrix
from .optim import build_master_optimizer, build_optimizer


@dataclass
class TrainState:
    params: Any
    loss_params: Any
    opt_state: Any
    epoch: int = 0


class SupervisedTrainer:
    def __init__(
        self,
        model,                                    # Wav2VecClassifier or EncoderFusion
        params,                                   # init'd flax variables {"params": ...}
        *,
        optimizer_name: str = "sgd",
        lr: float = 1e-3,
        weight_decay: float = 1e-5,
        batch_transform: Callable | None = None,  # (key, [B,T(,C)], row_mask=[B]) -> same
                                                  # on-device augment; row_mask marks the
                                                  # replica rows (originals stay pristine)
        device_preprocess: Callable | None = None,  # [B,T_wire] -> [B,T] device preproc
        criterion: ContrastiveFocalConfig | None = None,
        classifier_config=None,                   # for trainable_mask; None = train all
        mesh=None,
        seed: int = 0,
        log: Callable[[str], None] = print,
        log_dir: str | None = None,
    ):
        from ..utils.observe import ScalarLogger

        self.model = model
        self.mesh = mesh
        self.log = log
        self.scalars = ScalarLogger(log_dir)
        self.batch_transform = batch_transform
        self.device_preprocess = device_preprocess
        self.criterion = criterion
        self.key = jax.random.key(seed)

        loss_params = {}
        if criterion is not None and criterion.use_center:
            self.key, sub = jax.random.split(self.key)
            loss_params = init_contrastive_focal(sub, criterion)

        mask = None
        if classifier_config is not None:
            enc_mask = trainable_mask(params["params"], classifier_config)
            mask = {"model": enc_mask,
                    "loss": jax.tree_util.tree_map(lambda _: True, loss_params)}
        # Packed-master default: f32 master params live inside the optimizer state, so
        # the per-step param pack + per-leaf apply_updates vanish from the train step
        # (PERF.md round-5 optimizer lever: +4.7 w/s on the headline). Restricted to the
        # fully-trainable case: the MASKED packed-master program composed with the
        # flash_kv + sinc Pallas kernels faulted the TPU worker exactly like the round-3
        # per-leaf chain did (PERF.md round-5 "vest re-fault"), so masked/frozen paths
        # keep the round-4 measured-clean packed-flattened form. W2VHS_PACKED_MASTER
        # forces either form for A/B; all forms are equivalence-pinned to the oracle.
        all_trainable = mask is None or all(jax.tree_util.tree_leaves(mask))
        forced = os.environ.get("W2VHS_PACKED_MASTER")
        self._packed_master = (all_trainable if forced is None else forced != "0")
        build = build_master_optimizer if self._packed_master else build_optimizer
        self.tx, self.schedule = build(
            optimizer_name, lr, weight_decay, trainable=mask, max_grad_norm=5.0)

        train_tree = {"model": params["params"], "loss": loss_params}
        self.state = TrainState(
            params=replicate(params["params"], mesh),
            loss_params=replicate(loss_params, mesh),
            opt_state=replicate(self.tx.init(jax.tree_util.tree_map(jnp.asarray, train_tree)),
                                mesh),
        )
        # bf16 live parameters under the packed f32 master — default on accelerator
        # backends (W2VHS_BF16_PARAMS=0 opts out; =1 forces on): the master inside
        # opt_state keeps full f32 precision (packed above from the f32 init), while the
        # tree the forward/backward reads is stored bf16. Compute is already bf16
        # (params cast at use, models/wav2vec2.py), so forward numerics are unchanged to
        # bf16 rounding; what this buys is bandwidth — the grad tree, the per-step grad
        # pack read, and the param unpack write all halve. Measured +7-9 w/s on the
        # headline (interleaved 2x2 A/B: 592.4/589.2 vs 583.1/582.6; PERF.md round-5
        # lever 3). Packed-master only: the update must accumulate into f32 somewhere,
        # and here that somewhere is the resident master. CPU stays f32 so the
        # torch-parity and oracle-equivalence suites keep exact f32 semantics.
        forced_bf16 = os.environ.get("W2VHS_BF16_PARAMS")
        self._bf16_params = self._packed_master and (
            forced_bf16 == "1" if forced_bf16 is not None
            else jax.default_backend() != "cpu")
        if self._bf16_params:
            to_bf16 = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, t)
            self.state.params = to_bf16(self.state.params)
        step_impl = (self._train_step_impl if batch_transform is None
                     else self._train_step_aug_impl)
        self._train_step = jax.jit(step_impl, donate_argnums=(0, 1, 2))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._aot_warmed = False

    def aot_warm(self, x, y, valid, aug=None) -> None:
        """Swap the jitted train step for an AOT-cached executable (``utils.aot``).

        On relay-attached TPUs every fresh process pays minutes of remote compilation for
        the train step because the persistent compilation cache is bypassed (PERF.md);
        this compiles once for the example batch shapes and reloads the serialized
        executable in later processes. Shapes/dtypes must match the real batches exactly
        (they do — the Batcher is static-shape by design).
        """
        from ..utils.aot import cached_compile

        lr = jnp.asarray(self.schedule(self.state.epoch), jnp.float32)
        self._aot_warmed = True
        if self.batch_transform is not None:
            aug_ex = aug if aug is not None else jnp.ones((x.shape[0],), jnp.float32)
            self._train_step = cached_compile(
                self._train_step, self.state.params, self.state.loss_params,
                self.state.opt_state, x, y, valid, aug_ex, lr, jax.random.key(0))
        else:
            self._train_step = cached_compile(
                self._train_step, self.state.params, self.state.loss_params,
                self.state.opt_state, x, y, valid, lr, jax.random.key(0))
        # Eval loaders ship float32 even when the train wire is int16 (loader policy:
        # eval batches feed plain apply fns) — warm eval with the float signature,
        # keeping x's sharding (a fabricated unsharded zeros array would pin the compiled
        # executable to the wrong input sharding under a dp mesh).
        if jnp.issubdtype(x.dtype, jnp.integer):
            xe = jax.device_put(jnp.zeros(x.shape, jnp.float32),
                                getattr(x, "sharding", None))
        else:
            xe = x
        self._eval_step = cached_compile(
            self._eval_step, self.state.params, self.state.loss_params, xe, y, valid)

    # --- jitted steps -------------------------------------------------------

    @staticmethod
    def _dequant(x):
        """int16 wire format -> float32 waveform; no-op for already-float input."""
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x.astype(jnp.float32) * (1.0 / 32767.0)
        return x

    def _forward(self, params, loss_params, x, y, valid, train, keys):
        x = self._dequant(x)
        feature_loss = self.criterion is not None
        apply_kwargs = dict(train=train)
        if train:
            apply_kwargs["rngs"] = {"dropout": keys["dropout"]}
            apply_kwargs["mask_key"] = keys["mask"]
        if feature_loss:
            feats, logits = self.model.apply(
                {"params": params}, x, method=Wav2VecClassifier.forward_with_features,
                **apply_kwargs)
            loss = contrastive_focal_loss(loss_params, self.criterion, feats, logits, y, valid)
        else:
            logits = self.model.apply({"params": params}, x, **apply_kwargs)
            loss = cross_entropy(logits, y, valid)
        return loss, logits

    def _train_step_impl(self, params, loss_params, opt_state, x, y, valid, lr, key):
        _, k_drop, k_mask = jax.random.split(key, 3)
        return self._step_tail(params, loss_params, opt_state, x, y, valid, lr,
                               k_drop, k_mask)

    def _train_step_aug_impl(self, params, loss_params, opt_state, x, y, valid, aug,
                             lr, key):
        """Train step with on-device batch augmentation.

        A separate jit root (selected at construction) so the transform-free step —
        the flagship bench program — keeps its exact signature and executable. ``aug``
        is the loader's per-row replica flag as float; the transform leaves rows with
        ``aug == 0`` (pristine originals) untouched, mirroring the host path where
        ``augment_fn`` runs only on replica draws."""
        k_aug, k_drop, k_mask = jax.random.split(key, 3)
        # Dequantise before augmenting: the transform contract is float [B, T]
        # waveforms, and the wire format may be int16.
        x = self.batch_transform(k_aug, self._dequant(x), row_mask=aug)
        return self._step_tail(params, loss_params, opt_state, x, y, valid, lr,
                               k_drop, k_mask)

    def _step_tail(self, params, loss_params, opt_state, x, y, valid, lr,
                   k_drop, k_mask):
        def loss_fn(train_tree):
            return self._forward(train_tree["model"], train_tree["loss"], x, y, valid,
                                 True, {"dropout": k_drop, "mask": k_mask})

        train_tree = {"model": params, "loss": loss_params}
        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(train_tree)
        if self._packed_master:
            # lr, the parameter add, and the momentum update all fuse in the packed
            # domain; the unpack emits the new parameter tree directly.
            train_tree, opt_state = self.tx.step(grads, opt_state, lr, train_tree)
        else:
            updates, opt_state = self.tx.update(grads, opt_state, train_tree)
            updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
            train_tree = optax.apply_updates(train_tree, updates)
        preds = jnp.argmax(logits, axis=1)
        return train_tree["model"], train_tree["loss"], opt_state, loss, preds

    def _eval_step_impl(self, params, loss_params, x, y, valid):
        loss, logits = self._forward(params, loss_params, x, y, valid, False, {})
        return loss, logits

    # --- epoch loop -----------------------------------------------------------

    def _run_epoch(self, batcher, train: bool, max_batches: int | None,
                   desc: str = "") -> tuple[ConfusionMatrix, float]:
        """One epoch. Device syncs are deferred to the end of the epoch: the step's loss and
        predictions stay on device while the host assembles (and augments) the next batch,
        so host data work overlaps device compute without an explicit prefetch thread."""
        from ..data.loader import prefetch_threaded

        cm = ConfusionMatrix()
        pending: list[tuple] = []
        lr = jnp.asarray(self.schedule(self.state.epoch), jnp.float32)

        want_aug = train and self.batch_transform is not None

        def to_device(batch):
            # Runs on the prefetch thread: host->device transfer overlaps device compute.
            aug = None
            if want_aug:
                # Per-row replica flag from the expansion plan; all-ones if the dataset
                # has none. Transforms wired with pristine_prob (the per-epoch raw-wire
                # policy) ignore this and draw their own participation instead.
                mask = batch.get("augmented")
                mask = (np.ones(len(batch["valid"]), dtype=np.float32)
                        if mask is None else mask.astype(np.float32))
                aug = maybe_shard_batch(mask, self.mesh)
            return (batch,
                    maybe_shard_batch(batch["waveform"], self.mesh),
                    maybe_shard_batch(batch["label"], self.mesh),
                    maybe_shard_batch(batch["valid"].astype(np.float32), self.mesh),
                    aug)

        for i, (batch, x, y, valid, aug) in enumerate(
                prefetch_threaded(batcher, to_device)):
            if max_batches is not None and i >= max_batches:
                break
            if (train and not self._aot_warmed and jax.default_backend() != "cpu"
                    and os.environ.get("W2VHS_AOT") != "0"):
                # First-batch AOT warm: every runner (not just bench) reuses serialized
                # executables across processes — minutes of remote compile per process
                # otherwise (utils/aot.py). Uses post-device_preprocess shapes.
                self._aot_warmed = True
                if self.device_preprocess is not None:
                    x = self.device_preprocess(x)   # reused below — don't run the chain twice
                self.aot_warm(x, y, valid, aug)
            elif self.device_preprocess is not None:
                # Raw-wire mode: the loader ships raw low-rate windows (8x fewer bytes on
                # the transfer-bound relay link) and the preprocessing chain runs on
                # device here — as chained jitted stages, NOT inside the train-step jit
                # (one fused program is pathologically slow to compile remotely, PERF.md).
                x = self.device_preprocess(x)
            if train:
                self.key, sub = jax.random.split(self.key)
                step_args = (x, y, valid) if aug is None else (x, y, valid, aug)
                (self.state.params, self.state.loss_params, self.state.opt_state,
                 loss, preds) = self._train_step(
                    self.state.params, self.state.loss_params, self.state.opt_state,
                    *step_args, lr, sub)
            else:
                loss, logits = self._eval_step(self.state.params, self.state.loss_params,
                                               x, y, valid)
                preds = jnp.argmax(logits, axis=1)
            pending.append((loss, preds, batch["label"], batch["valid"]))
        running = 0.0
        for loss, preds, labels, valid in pending:
            cm.update(labels, np.asarray(preds), valid)
            running += float(loss)
        return cm, running / max(1, len(pending))

    def fit(self, train_batcher, valid_batcher, epochs: int,
            max_batches: int | None = None, label: str = "") -> float:
        best_mcc = -1.0
        best_params = None
        prefix = f"{label} " if label else ""
        tag = label.strip("[] ").replace(" ", "_") or "run"
        for epoch in range(1, epochs + 1):
            t0 = time.time()
            train_cm, train_loss = self._run_epoch(train_batcher, True, max_batches)
            self.state.epoch += 1
            line = (f"{prefix}epoch {epoch}/{epochs}: loss={train_loss:.3f} "
                    f"train {train_cm} [{time.time() - t0:.1f}s]")
            self.scalars.scalars(f"{tag}/train", train_cm.stats(), self.state.epoch)
            self.scalars.scalar(f"{tag}/train_loss", train_loss, self.state.epoch)
            if valid_batcher is not None:
                valid_cm, _ = self._run_epoch(valid_batcher, False, max_batches)
                mcc = valid_cm.stats()["mcc"]
                line += f" | valid {valid_cm}"
                self.scalars.scalars(f"{tag}/valid", valid_cm.stats(), self.state.epoch)
                if mcc > best_mcc:
                    best_mcc = mcc
                    best_params = jax.device_get(self.state.params)
            self.log(line)
        self.scalars.flush()
        if valid_batcher is not None and best_params is not None:
            self.state.params = replicate(
                jax.tree_util.tree_map(jnp.asarray, best_params), self.mesh)
            if self._packed_master:
                # The packed f32 master inside opt_state must follow the restore, or the
                # next fit (synthetic runner: one trainer across stages) would silently
                # train from the pre-restore weights. Momentum/adam state is kept — the
                # reference's torch optimizer likewise persists across the restore.
                self.state.opt_state = self.tx.refresh(
                    self.state.opt_state,
                    {"model": self.state.params, "loss": self.state.loss_params})
        return best_mcc

    @property
    def variables(self):
        return {"params": self.state.params}

    # --- optional on-disk checkpointing (an extension: the reference keeps classification
    # checkpoints in memory only, src/mpcg_wav2vec/classify/trainer.py:90-112) ---------

    def save(self, path: str) -> str:
        import os

        from flax import serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {"epoch": self.state.epoch,
                   "params": jax.device_get(self.state.params),
                   "loss_params": jax.device_get(self.state.loss_params),
                   "opt_state": jax.device_get(self.state.opt_state)}
        with open(path, "wb") as fh:
            fh.write(serialization.to_bytes(payload))
        return path

    def restore(self, path: str) -> bool:
        import os

        from flax import serialization

        if not path or not os.path.exists(path):
            return False
        template = {"epoch": 0,
                    "params": jax.device_get(self.state.params),
                    "loss_params": jax.device_get(self.state.loss_params),
                    "opt_state": jax.device_get(self.state.opt_state)}
        with open(path, "rb") as fh:
            payload = serialization.from_bytes(template, fh.read())
        as_dev = lambda tree: replicate(
            jax.tree_util.tree_map(jnp.asarray, tree), self.mesh)
        self.state = TrainState(params=as_dev(payload["params"]),
                                loss_params=as_dev(payload["loss_params"]),
                                opt_state=as_dev(payload["opt_state"]),
                                epoch=int(payload["epoch"]))
        return True
