"""Batched Schmidt spike removal as a fixed-shape ``lax.while_loop``.

The oracle's loop (one spike flattened per iteration, data-dependent iteration count — see
:mod:`..signal.despike`) is re-expressed with static shapes so it jit-compiles: every iteration
computes, for **all** batch rows at once, the worst 500 ms window (argmax of max-abs-amplitude),
the spike peak, and the surrounding zero-crossings via sign-difference masks, then applies a
masked one-window update only to rows that are still active. The loop exits when no row's MAA
exceeds ``threshold`` x its median MAA (or after ``max_iterations``).

This removes the per-sample Python inner loop the reference's tensor twin still had
(src/mpcg_wav2vec/signalproc/torchproc.py:84-96) — the whole batch despikes on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

SPIKE_FLOOR = 1e-4


@partial(jax.jit, static_argnames=("fs", "threshold", "max_iterations"))
def remove_spikes(x: jnp.ndarray, fs: float, threshold: float = 3.0,
                  max_iterations: int = 1000) -> jnp.ndarray:
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    B, T = x.shape
    win = round(float(fs) / 2.0)
    if win < 1 or T < win:
        return x[0] if squeeze else x

    usable = T - T % win
    frames = x[:, :usable].reshape(B, -1, win)
    W = frames.shape[1]
    pos = jnp.arange(win)
    flip_pos = jnp.arange(win - 1)

    def active_rows(frames):
        maa = jnp.max(jnp.abs(frames), axis=2)                     # [B, W]
        med = jnp.median(maa, axis=1, keepdims=True)
        return jnp.any(maa > threshold * med, axis=1), maa          # [B], [B, W]

    def cond(state):
        frames, it, go = state
        return jnp.logical_and(go, it < max_iterations)

    def body(state):
        frames, it, _ = state
        active, maa = active_rows(frames)
        worst = jnp.argmax(maa, axis=1)                             # [B]
        window = jnp.take_along_axis(frames, worst[:, None, None], axis=1)[:, 0, :]  # [B, win]
        peak = jnp.argmax(jnp.abs(window), axis=1)                  # [B]

        signs = jnp.sign(window)
        flips = jnp.abs(signs[:, 1:] - signs[:, :-1]) > 1           # [B, win-1]
        before = flips & (flip_pos[None, :] < peak[:, None])
        after = flips & (flip_pos[None, :] >= peak[:, None])
        start = jnp.max(jnp.where(before, flip_pos[None, :], -1), axis=1) + 1
        end = jnp.min(jnp.where(after, flip_pos[None, :], win - 1), axis=1)

        span = (pos[None, :] >= start[:, None]) & (pos[None, :] < end[:, None])  # [B, win]
        target = jax.nn.one_hot(worst, W, dtype=bool)               # [B, W]
        hit = target[:, :, None] & span[:, None, :] & active[:, None, None]
        frames = jnp.where(hit, SPIKE_FLOOR, frames)

        go, _ = active_rows(frames)
        return frames, it + 1, jnp.any(go)

    go0, _ = active_rows(frames)
    frames, _, _ = jax.lax.while_loop(cond, body, (frames, 0, jnp.any(go0)))

    out = x.at[:, :usable].set(frames.reshape(B, usable))
    return out[0] if squeeze else out
