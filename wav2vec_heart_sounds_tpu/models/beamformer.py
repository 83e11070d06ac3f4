"""Time-varying sinc delay-and-sum beamformer (multichannel -> mono collapse).

Behavioral contract from reference src/mpcg_wav2vec/classify/beamformer.py:15-55: a tiny
transformer predicts a per-sample fractional delay for each microphone (clamped to
[0, 0.01 s * fs]); each channel is fractionally delayed by a 41-tap Hamming-windowed dynamic
sinc kernel, squared, and summed across microphones.

TPU design: the unfold + per-(b, t) kernel einsum becomes a stack of 41 statically shifted
slices contracted against the kernel — one fused elementwise+reduce chain under XLA, no
gather. Channels are vmapped, so the whole collapse is one compiled region. (A Pallas kernel
fusing the sinc build with the contraction is the follow-on optimisation; see ops/pallas.)
"""

from __future__ import annotations

import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .wav2vec2 import FastLayerNorm


def _mem_efficient_attention(query, key, value, mask=None, bias=None,
                             dropout_rate: float = 0.0, **kwargs):
    """Drop-in for flax's ``dot_product_attention`` that never materialises [B, H, T, T].

    The delay predictor attends over every waveform sample (vest: T ~8k -> a 8.2 GB probs
    tensor per direction with the naive einsum — the train step OOM'd 15.75 GB HBM; the
    reference leans on torch SDPA's memory-efficient kernel for the same reason). On TPU
    this dispatches to the kv-blocked flash kernel (``ops/pallas/flash_kv.py``:
    probabilities live only in VMEM — the query-chunked XLA fallback below still moved
    ~10^2 GB/step through HBM and measured 574 ms of the vest step). Elsewhere it runs
    the exact chunked-softmax scan. Neither path implements masking/bias/dropout (the
    delay predictor is dropout-free and unmasked), so those arriving non-trivially is a
    wiring bug — fail loudly rather than silently drop them.
    """
    if mask is not None or bias is not None or dropout_rate:
        raise NotImplementedError(
            "DelayPredictor attention has no mask/bias/dropout support; got "
            f"mask={mask is not None}, bias={bias is not None}, rate={dropout_rate}")
    no_pallas = (os.environ.get("W2VHS_NO_FLASHKV") == "1"
                 or os.environ.get("W2VHS_NO_FLASH") == "1")   # repo-wide kill-switch
    if jax.default_backend() != "cpu" and not no_pallas:
        from ..ops.pallas.flash_kv import flash_attention_kv

        return flash_attention_kv(query, key, value)
    return _chunked_attention(query, key, value)


def _chunked_attention(query, key, value, chunk: int = 512, **unused_kwargs):
    """Exact row-block-softmax fallback: a rematerialised ``lax.scan`` over query chunks
    keeps the live score tensor at [B, H, chunk, T] in forward AND backward."""
    b, t, h, d = query.shape
    scale = 1.0 / np.sqrt(d).astype(np.float32)
    c = min(chunk, t)
    n = -(-t // c)
    qp = jnp.pad(query, ((0, 0), (0, n * c - t), (0, 0), (0, 0)))
    qc = jnp.moveaxis(qp.reshape(b, n, c, h, d), 1, 0)            # [n, B, c, H, d]

    @jax.checkpoint
    def body(carry, qi):
        s = jnp.einsum("bqhd,bkhd->bhqk", qi * scale, key).astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(value.dtype)
        return carry, jnp.einsum("bhqk,bkhd->bqhd", p, value)

    _, out = jax.lax.scan(body, None, qc)
    return jnp.moveaxis(out, 0, 1).reshape(b, n * c, h, d)[:, :t]


class DelayPredictor(nn.Module):
    """[B, M, T] -> per-sample per-mic delays [B, M, T] via a small transformer."""
    num_mics: int
    d_model: int = 32
    num_heads: int = 4
    ffn: int = 64
    num_layers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = jnp.swapaxes(x, 1, 2).astype(self.dtype)                  # [B, T, M]
        h = nn.Dense(self.d_model, dtype=self.dtype, name="input_proj")(h)
        for i in range(self.num_layers):
            # Post-norm transformer encoder layer (torch TransformerEncoderLayer layout).
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                attention_fn=_mem_efficient_attention,
                name=f"attn_{i}")(h, h, deterministic=deterministic)
            h = FastLayerNorm(dtype=self.dtype, name=f"norm1_{i}")(h + attn)
            f = nn.Dense(self.ffn, dtype=self.dtype, name=f"ff1_{i}")(h.astype(self.dtype))
            f = nn.relu(f)
            f = nn.Dense(self.d_model, dtype=self.dtype, name=f"ff2_{i}")(f)
            h = FastLayerNorm(dtype=self.dtype, name=f"norm2_{i}")(h + f)
        out = nn.Dense(self.num_mics, dtype=self.dtype, name="output_proj")(h.astype(self.dtype))
        return jnp.swapaxes(out, 1, 2)                                # [B, M, T]


def _delay_channel(x: jnp.ndarray, delays: jnp.ndarray, kernel_size: int,
                   window: jnp.ndarray) -> jnp.ndarray:
    """Fractionally delay ``x`` [B, T] by per-sample ``delays`` [B, T] (dynamic sinc).

    Dispatches to the fused Pallas kernel on TPU (ops/pallas/beamformer.py) — sinc build,
    normalisation and contraction in one VMEM pass with analytic VJP — and to the XLA
    reference elsewhere.
    """
    from ..ops.pallas.beamformer import delay_channel

    return delay_channel(x.astype(jnp.float32), delays.astype(jnp.float32), kernel_size,
                         window)


class TimeVaryingSincBeamformer(nn.Module):
    """[B, M, T] -> [B, T] sum-of-squares delay-and-sum with learned fractional delays."""
    num_mics: int
    fs: float
    max_delay_s: float = 0.01
    kernel_size: int = 41
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # Plain NumPy: stays a host constant through tracing (the Pallas path needs it
        # as static kernel weights, never as a traced array).
        window = np.hamming(self.kernel_size).astype(np.float32)
        delays = DelayPredictor(self.num_mics, dtype=self.dtype,
                                name="delay_predictor")(x, deterministic)
        delays = jnp.clip(delays, 0.0, self.max_delay_s * self.fs)
        # Static loop over microphones: vmapping the Pallas call would batch its whole-array
        # VMEM blocks into squeezed sub-tiles that violate the (8, 128) tiling rule on
        # hardware (interpret mode does not enforce it).
        total = jnp.zeros((x.shape[0], x.shape[2]), jnp.float32)
        for m in range(self.num_mics):
            total = total + _delay_channel(x[:, m, :], delays[:, m, :],
                                           self.kernel_size, window) ** 2
        return total
