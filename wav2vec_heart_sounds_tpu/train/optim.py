"""Optimizer factory: torch-semantics SGD/Adam/AdamW as optax chains, with freeze masks.

Contract from reference src/mpcg_wav2vec/classify/trainer.py:16-31: SGD(momentum .9, coupled
weight decay) + StepLR(step 7, gamma 0.1); Adam with coupled decay; AdamW decoupled — all over
trainable params only. Freezing is an optax mask (no requires_grad mutation): frozen leaves'
gradients are zeroed *before* the global-norm clip so the clip norm matches torch's
trainable-only behavior, and the inner transform is masked so weight decay never touches
frozen weights.

Two execution forms, equivalence-pinned against each other:

* :func:`build_optimizer` — the standard optax ``(updates, state, params) -> updates`` API.
  Default: the whole transform runs on ONE lane-aligned ``[rows, 1024]`` packed buffer
  (:func:`_flatten_2d`); ``W2VHS_FLAT_OPT=0`` restores the per-leaf ``optax.masked`` chain
  (the semantic oracle — and the program shape that faults the TPU worker next to the
  flash_kv + sinc Pallas kernels, PERF.md round-4 bisect).
* :func:`build_master_optimizer` — the packed-master form the trainer uses on device:
  master parameters LIVE in the packed f32 domain as part of the optimizer state, so the
  per-step param pack (the round-4 HLO audit's ``concatenate.83``), the per-leaf
  ``lr * update`` multiplies, and ``optax.apply_updates`` adds all vanish; one fused packed
  op updates momentum and parameters, and the unpack emits the new parameter tree directly.
  Equivalence vs the per-leaf oracle: tests/test_optim_flatten.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

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


# --- packed-domain helpers ---------------------------------------------------------------
#
# Each leaf is flattened and zero-padded to a multiple of ``cols`` *individually*, then the
# row blocks are concatenated — the packed array is born 2-D. (A single large 1-D ravel is
# a trap: XLA lays huge 1-D f32 arrays out as [N/2, 2] with (8, 128) tiling, 64x-inflating
# HBM — observed as a 24 GB allocation for 95 M params.) Per-leaf pad rows are zero in the
# gradients, so clipping/momentum/decay semantics are unchanged; pad lanes are dropped on
# unpack.

def _pack_tree(tree, cols: int):
    import jax.numpy as jnp

    blocks = []
    for leaf in jax.tree_util.tree_leaves(tree):
        flat = leaf.reshape(-1).astype(jnp.float32)
        rows = -(-flat.shape[0] // cols)
        blocks.append(jnp.pad(flat, (0, rows * cols - flat.shape[0])).reshape(rows, cols))
    return jnp.concatenate(blocks, axis=0)


def _unpack_tree(packed, template, cols: int):
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    row = 0
    for leaf in leaves:
        rows = -(-leaf.size // cols)
        block = packed[row:row + rows].reshape(-1)[:leaf.size]
        out.append(block.reshape(leaf.shape).astype(leaf.dtype))
        row += rows
    return jax.tree_util.tree_unflatten(treedef, out)


def _row_mask(trainable, template, cols: int):
    """[rows, 1] host-constant bool freeze mask over the packed buffer.

    Leaves pad to whole rows, so per-row granularity is exact — no params-sized mask
    tensor gets baked into the program. The mask tree must share the template's treedef:
    a same-leaf-count tree with different structure would silently freeze the wrong rows
    (advisor r4 finding), where the per-leaf ``optax.masked`` oracle raises instead.
    """
    import numpy as np

    td_mask = jax.tree_util.tree_structure(trainable)
    td_tree = jax.tree_util.tree_structure(template)
    if td_mask != td_tree:
        raise ValueError(
            f"freeze-mask treedef {td_mask} does not match the parameter treedef {td_tree}")
    flags = []
    for t, leaf in zip(jax.tree_util.tree_leaves(trainable),
                       jax.tree_util.tree_leaves(template)):
        flags.extend([bool(t)] * (-(-leaf.size // cols)))
    return np.asarray(flags, dtype=bool)[:, None]


def _flatten_2d(inner: optax.GradientTransformation,
                cols: int = 1024,
                trainable: Any | None = None) -> optax.GradientTransformation:
    """Run ``inner`` on one lane-aligned [rows, cols] buffer holding all parameters.

    ``trainable`` (a bool pytree over the same leaves) freezes entries *inside the packed
    domain*: gradients are zeroed before ``inner`` (so the global-norm clip sees trainable
    entries only — torch's trainable-only clip semantics), frozen rows of the packed params
    are zeroed before the inner transform (so coupled weight decay never injects
    ``wd * param`` into frozen rows' momentum/adam moments — the stored state matches the
    per-leaf ``optax.masked`` oracle exactly, advisor r4 finding), and the emitted update is
    zeroed after it (so frozen params and their dtypes never change). Every transform in
    ``inner`` after the clip is elementwise (decay/momentum/adam moments), so per-entry
    masking is exactly equivalent to the per-leaf ``optax.masked`` chain — pinned by
    tests/test_optim_flatten.py::test_flattened_masked_matches_per_leaf_masked — while
    keeping the single-fused-buffer program shape (the per-leaf chain emits thousands of
    launch-bound ops; see build_optimizer).
    """
    import jax.numpy as jnp

    def init(params):
        return inner.init(_pack_tree(params, cols))

    def update(updates, state, params=None):
        u2 = _pack_tree(updates, cols)
        mask = _row_mask(trainable, updates, cols) if trainable is not None else None
        if mask is not None:
            u2 = jnp.where(mask, u2, 0.0)
        p2 = _pack_tree(params, cols) if params is not None else None
        if mask is not None and p2 is not None:
            p2 = jnp.where(mask, p2, 0.0)
        new_u, state = inner.update(u2, state, p2)
        if mask is not None:
            new_u = jnp.where(mask, new_u, 0.0)
        return _unpack_tree(new_u, updates, cols), state

    return optax.GradientTransformation(init, update)


@dataclass(frozen=True)
class PackedMasterOptimizer:
    """Packed-master optimizer: f32 master params live inside the optimizer state.

    ``init(params) -> state``; ``step(grads, state, lr, template) -> (new_params, state)``;
    ``refresh(state, params) -> state`` re-packs the master copy after the trainer
    overwrites parameters outside the step (best-MCC restore, checkpoint load).
    """
    init: Callable[[Any], Any]
    step: Callable[[Any, Any, Any, Any], tuple[Any, Any]]
    refresh: Callable[[Any, Any], Any]


def _packed_master(inner: optax.GradientTransformation,
                   cols: int = 1024,
                   trainable: Any | None = None) -> PackedMasterOptimizer:
    """The packed-master execution form (see module docstring).

    State is ``(inner_state, p2)`` with ``p2 = _pack_tree(params)`` as the f32 master.
    Per step: pack grads (the only per-step pack), run the masked inner transform against
    the resident ``p2``, fold ``lr`` and the parameter add into the same packed domain,
    and unpack the new parameter tree once. For f32 leaves the emitted tree bit-matches
    the master, so the ``p2 == pack(params)`` invariant self-maintains.
    """
    import jax.numpy as jnp

    def init(params):
        p2 = _pack_tree(params, cols)
        return inner.init(p2), p2

    def step(grads, state, lr, template):
        inner_state, p2 = state
        u2 = _pack_tree(grads, cols)
        mask = _row_mask(trainable, grads, cols) if trainable is not None else None
        if mask is not None:
            u2 = jnp.where(mask, u2, 0.0)
        p2_in = jnp.where(mask, p2, 0.0) if mask is not None else p2
        new_u, inner_state = inner.update(u2, inner_state, p2_in)
        if mask is not None:
            new_u = jnp.where(mask, new_u, 0.0)
        p2 = p2 + lr * new_u          # inner ends in scale(-1): descent direction
        return _unpack_tree(p2, template, cols), (inner_state, p2)

    def refresh(state, params):
        return state[0], _pack_tree(params, cols)

    return PackedMasterOptimizer(init, step, refresh)


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
        # The masked-path flattening is also the vest-crash fix: the per-leaf
        # optax.masked chain in the same program as the flash_kv + sinc Pallas kernels
        # faulted the TPU worker (PERF.md round-4 bisect), while the packed form compiles
        # to the same program shape as the clean unmasked path.
        return _flatten_2d(inner, trainable=None if all_trainable else trainable), schedule

    # Per-leaf reference path (W2VHS_FLAT_OPT=0): the optax.masked chain the flattened
    # form is equivalence-tested against.
    frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), frozen),   # zero frozen grads pre-clip
        optax.masked(inner, trainable),              # no decay/updates on frozen leaves
    )
    return tx, schedule


def build_master_optimizer(
    name: str = "sgd",
    lr: float = 1e-3,
    weight_decay: float = 1e-5,
    momentum: float = 0.9,
    max_grad_norm: float | None = 5.0,
    trainable: Any | None = None,
) -> tuple[PackedMasterOptimizer, optax.Schedule]:
    """Packed-master variant of :func:`build_optimizer` (same semantics, trainer-side API).

    Used by SupervisedTrainer by default (``W2VHS_PACKED_MASTER=0`` restores the
    :func:`build_optimizer` path for A/B). vs the _flatten_2d form it removes, per step:
    the param pack (read tree + write packed ≈ 2x381 MB for wav2vec2-base), the update
    unpack's role as an intermediate (the unpack now emits final params), and the ~300
    per-leaf ``lr * u`` / ``apply_updates`` fusions.
    """
    schedule = lr_schedule(name, lr)
    all_trainable = (trainable is None
                     or all(jax.tree_util.tree_leaves(trainable)))
    clip = [optax.clip_by_global_norm(max_grad_norm)] if max_grad_norm is not None else []
    inner = optax.chain(*clip, _inner(name, weight_decay, momentum), optax.scale(-1.0))
    return _packed_master(inner, trainable=None if all_trainable else trainable), schedule
