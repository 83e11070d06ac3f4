"""Optimizer factory: torch-semantics SGD/Adam/AdamW as optax chains, with freeze masks.

Contract from reference src/mpcg_wav2vec/classify/trainer.py:16-31: SGD(momentum .9, coupled
weight decay) + StepLR(step 7, gamma 0.1); Adam with coupled decay; AdamW decoupled — all over
trainable params only. Freezing is an optax mask (no requires_grad mutation): frozen leaves'
gradients are zeroed *before* the global-norm clip so the clip norm matches torch's
trainable-only behavior, and the inner transform is masked so weight decay never touches
frozen weights.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def lr_schedule(name: str, lr: float) -> optax.Schedule:
    """Per-epoch schedule (the trainer passes epoch index as the schedule step)."""
    if name == "sgd":
        return lambda epoch: lr * (0.1 ** (epoch // 7))     # StepLR(7, 0.1)
    return lambda epoch: lr


def _inner(name: str, weight_decay: float, momentum: float) -> optax.GradientTransformation:
    if name == "sgd":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),         # torch-coupled L2
            optax.trace(decay=momentum),
        )
    if name == "adam":
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
        )
    if name == "adamw":
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(weight_decay),         # decoupled
        )
    raise ValueError(f"Unknown optimizer '{name}'")


def _flatten_2d(inner: optax.GradientTransformation,
                cols: int = 1024,
                trainable: Any | None = None) -> optax.GradientTransformation:
    """Run ``inner`` on one lane-aligned [rows, cols] buffer holding all parameters.

    Each leaf is flattened and zero-padded to a multiple of ``cols`` *individually*, then the
    row blocks are concatenated — the packed array is born 2-D. (A single large 1-D ravel is
    a trap: XLA lays huge 1-D f32 arrays out as [N/2, 2] with (8, 128) tiling, 64x-inflating
    HBM — observed as a 24 GB allocation for 95 M params.) Per-leaf pad rows are zero in the
    gradients, so clipping/momentum/decay semantics are unchanged; pad lanes are dropped on
    unpack.

    ``trainable`` (a bool pytree over the same leaves) freezes entries *inside the packed
    domain*: gradients are zeroed before ``inner`` (so the global-norm clip sees trainable
    entries only — torch's trainable-only clip semantics) and the emitted update is zeroed
    after it (so frozen params and their dtypes never change). Every transform in ``inner``
    after the clip is elementwise (decay/momentum/adam moments), so per-entry masking is
    exactly equivalent to the per-leaf ``optax.masked`` chain — pinned by
    tests/test_train.py — while keeping the single-fused-buffer program shape (the per-leaf
    chain emits thousands of launch-bound ops; see build_optimizer).
    """
    import jax.numpy as jnp
    import numpy as np

    def _pack(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        blocks = []
        for leaf in leaves:
            flat = leaf.reshape(-1).astype(jnp.float32)
            rows = -(-flat.shape[0] // cols)
            blocks.append(jnp.pad(flat, (0, rows * cols - flat.shape[0])).reshape(rows, cols))
        return jnp.concatenate(blocks, axis=0)

    def _unpack(packed, tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        row = 0
        for leaf in leaves:
            rows = -(-leaf.size // cols)
            block = packed[row:row + rows].reshape(-1)[:leaf.size]
            out.append(block.reshape(leaf.shape).astype(leaf.dtype))
            row += rows
        return jax.tree_util.tree_unflatten(treedef, out)

    def _row_mask(tree):
        # Leaves are padded to whole rows, so the freeze mask needs only per-row
        # granularity: a [rows, 1] host-constant bool, not a full [rows, cols] tensor
        # (which would bake a params-sized constant into the program).
        flags = []
        for t, leaf in zip(jax.tree_util.tree_leaves(trainable),
                           jax.tree_util.tree_leaves(tree)):
            flags.extend([bool(t)] * (-(-leaf.size // cols)))
        return np.asarray(flags, dtype=bool)[:, None]

    def init(params):
        return inner.init(_pack(params))

    def update(updates, state, params=None):
        u2 = _pack(updates)
        if trainable is not None:
            u2 = jnp.where(_row_mask(updates), u2, 0.0)
        p2 = _pack(params) if params is not None else None
        new_u, state = inner.update(u2, state, p2)
        if trainable is not None:
            new_u = jnp.where(_row_mask(updates), new_u, 0.0)
        return _unpack(new_u, updates), state

    return optax.GradientTransformation(init, update)


def build_optimizer(
    name: str = "sgd",
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    momentum: float = 0.9,
    max_grad_norm: float | None = 5.0,
    trainable: Any | None = None,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Returns (transform, per-epoch lr schedule).

    The transform emits **unit-learning-rate descent directions** (already negated); the
    trainer multiplies them by ``schedule(epoch)`` inside the jitted step — a traced scalar,
    so per-epoch StepLR decay never recompiles. ``trainable`` is a bool pytree mask.
    """
    import os

    schedule = lr_schedule(name, lr)
    all_trainable = (trainable is None
                     or all(jax.tree_util.tree_leaves(trainable)))

    clip = [optax.clip_by_global_norm(max_grad_norm)] if max_grad_norm is not None else []
    inner = optax.chain(*clip, _inner(name, weight_decay, momentum), optax.scale(-1.0))

    if all_trainable or os.environ.get("W2VHS_FLAT_OPT") != "0":
        # Run the whole transform on ONE raveled buffer (masked in the packed domain when
        # a freeze mask is given). Per-leaf optimizer chains emit thousands of tiny
        # launch-bound kernels per step (profiled at ~45 us each on the v5e — dominating
        # the train step); flattening collapses them into a handful of large fused ops.
        # The buffer is reshaped to [rows, 1024] rather than 1-D: XLA lowers huge 1-D
        # reductions through a [N/2, 2] relayout whose (8, 128) tile padding 64x-inflates
        # HBM (observed 24 GB OOM). The masked-path flattening is also the vest-crash
        # fix: the per-leaf optax.masked chain in the same program as the flash_kv + sinc
        # Pallas kernels faulted the TPU worker (PERF.md round-4 bisect), while the
        # packed form compiles to the same program shape as the clean unmasked path.
        return _flatten_2d(inner, trainable=None if all_trainable else trainable), schedule

    # Per-leaf reference path (W2VHS_FLAT_OPT=0): the optax.masked chain the flattened
    # form is equivalence-tested against.
    frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), frozen),   # zero frozen grads pre-clip
        optax.masked(inner, trainable),              # no decay/updates on frozen leaves
    )
    return tx, schedule
