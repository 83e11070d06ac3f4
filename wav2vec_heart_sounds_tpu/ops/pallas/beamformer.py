"""Pallas TPU kernel for the time-varying sinc fractional delay (beamformer hot op).

The XLA expression of the dynamic sinc delay materialises a [B, T, 41] kernel tensor and a
[B, T, 41] unfolded-window tensor (SURVEY.md §7 hard-part 7 — reference
src/mpcg_wav2vec/classify/beamformer.py:41-50 does the same through ``F.unfold``). This
kernel fuses the sinc-kernel construction, normalisation and windowed contraction into a
single VMEM-resident pass: 41 statically unrolled FMA sweeps over the [B, T] block, never
touching HBM with the K-expanded tensors.

A custom VJP supplies analytic gradients the same way:

    y[t]  = sum_k u[t,k] x[t+k] / s[t],        u[t,k] = sinc(c_k - d[t]) w_k,  s = sum_k u
    dd[t] = g[t]/s[t] * sum_k u'[t,k] (x[t+k] - y[t]),   u' = -sinc'(c_k - d[t]) w_k
    dx[p] = sum_k g[p-k] u[p-k,k] / s[p-k]

The grid partitions the batch into row blocks (full T per program): Mosaic's stack for the
41 statically unrolled sweeps is ~180 bytes/element (measured 22.8 MB for a whole-array
[16, 8250] block — over the 16 MB scoped-vmem default), so 8 rows at vest's T~8k keeps the
working set ~12 MB. A time-length guard falls back to the XLA path when one row block would
still blow VMEM. Tests run the kernel in interpreter mode on CPU against the XLA reference
and ``jax.grad``.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_GUARD_T = 32768  # fall back to XLA when rows are longer than this (~44k is the cliff)


def _sinc(z):
    return jnp.sinc(z)


def _sinc_grad(z):
    """d/dz sinc(z) with the removable singularity at 0 (sinc'(0) = 0)."""
    safe = jnp.where(jnp.abs(z) < 1e-6, 1.0, z)
    return jnp.where(jnp.abs(z) < 1e-6, 0.0, (jnp.cos(jnp.pi * z) - _sinc(z)) / safe)


def _forward_kernel(xpad_ref, d_ref, out_ref, *, K: int, window: tuple[float, ...]):
    d = d_ref[:, :]
    T = d.shape[1]
    half = K // 2
    acc = jnp.zeros_like(d)
    norm = jnp.zeros_like(d)
    for k in range(K):
        u = _sinc(float(k - half) - d) * window[k]
        norm = norm + u
        acc = acc + u * xpad_ref[:, k:k + T]
    out_ref[:, :] = acc / norm


def _grad_d_kernel(xpad_ref, d_ref, g_ref, out_ref, *, K: int, window: tuple[float, ...]):
    d = d_ref[:, :]
    T = d.shape[1]
    half = K // 2
    acc = jnp.zeros_like(d)
    norm = jnp.zeros_like(d)
    moment = jnp.zeros_like(d)   # sum_k u' x[t+k]
    dnorm = jnp.zeros_like(d)    # sum_k u'
    for k in range(K):
        z = float(k - half) - d
        u = _sinc(z) * window[k]
        du = -_sinc_grad(z) * window[k]
        xk = xpad_ref[:, k:k + T]
        acc = acc + u * xk
        norm = norm + u
        moment = moment + du * xk
        dnorm = dnorm + du
    y = acc / norm
    out_ref[:, :] = g_ref[:, :] / norm * (moment - y * dnorm)


def _grad_x_kernel(dpad_ref, gpad_ref, spad_ref, out_ref, *, K: int,
                   window: tuple[float, ...]):
    """dx over the padded axis: dx[p] = sum_k g[p-k] u[p-k, k] / s[p-k].

    dpad/gpad/spad are left- and right-padded by K-1 so p-k always indexes in bounds; the
    normaliser s is precomputed (zero-padded entries hold 1 to avoid division blowups —
    their g is 0 so they contribute nothing).
    """
    P = out_ref.shape[1]
    half = K // 2
    acc = jnp.zeros_like(out_ref[:, :])
    for k in range(K):
        # position p in padded-x coordinates corresponds to t = p - k in signal coordinates;
        # padded arrays are offset by K-1.
        sl = slice(K - 1 - k, K - 1 - k + P)
        d = dpad_ref[:, sl]
        u = _sinc(float(k - half) - d) * window[k]
        acc = acc + gpad_ref[:, sl] * u / spad_ref[:, sl]
    out_ref[:, :] = acc


def _call(kernel, out_shape, *args, interpret, name):
    b, t_out = out_shape
    rb = min(b, int(os.environ.get("W2VHS_BF_ROWS", "8")))
    if b % rb:
        pad = rb - b % rb
        args = tuple(jnp.pad(a, [(0, pad), (0, 0)]) for a in args)
        b = b + pad
    widths = [a.shape[1] for a in args]
    out = pl.pallas_call(
        kernel,
        name=f"{name}_rb{rb}",   # rb pins the block size into the AOT cache key
        out_shape=jax.ShapeDtypeStruct((b, t_out), jnp.float32),
        grid=(b // rb,),
        in_specs=[pl.BlockSpec((rb, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
                  for w in widths],
        out_specs=pl.BlockSpec((rb, t_out), lambda i: (i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out[:out_shape[0]]


def _norm_sum(xpad, delays, K, window):
    half = K // 2
    norm = jnp.zeros_like(delays)
    for k in range(K):
        norm = norm + _sinc(float(k - half) - delays) * window[k]
    return norm


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def sinc_delay(x: jnp.ndarray, delays: jnp.ndarray, kernel_size: int,
               window: tuple[float, ...], interpret: bool = False) -> jnp.ndarray:
    """Fractionally delay ``x`` [B, T] by per-sample ``delays`` [B, T] (fused Pallas path)."""
    return _sinc_delay_fwd(x, delays, kernel_size, window, interpret)[0]


def _params_tag(K, window):
    """K and the window taps live only in the unrolled kernel closure; the tag puts them
    in the pallas_call name so the AOT cache key (utils/aot.py) sees them."""
    import hashlib

    w = hashlib.sha256(repr(tuple(window)).encode()).hexdigest()[:8]
    return f"k{K}_w{w}"


def _sinc_delay_fwd(x, delays, kernel_size, window, interpret):
    half = kernel_size // 2
    xpad = jnp.pad(x, [(0, 0), (half, half)], mode="reflect").astype(jnp.float32)
    y = _call(partial(_forward_kernel, K=kernel_size, window=window),
              delays.shape, xpad, delays.astype(jnp.float32), interpret=interpret,
              name=f"bf_fwd_{_params_tag(kernel_size, window)}")
    return y, (x, delays)


def _sinc_delay_bwd(kernel_size, window, interpret, residuals, g):
    x, delays = residuals
    B, T = x.shape
    K = kernel_size
    half = K // 2
    xpad = jnp.pad(x, [(0, 0), (half, half)], mode="reflect").astype(jnp.float32)
    d32 = delays.astype(jnp.float32)
    g32 = g.astype(jnp.float32)

    dd = _call(partial(_grad_d_kernel, K=K, window=window), delays.shape,
               xpad, d32, g32, interpret=interpret,
               name=f"bf_grad_d_{_params_tag(K, window)}")

    snorm = _norm_sum(xpad, d32, K, window)
    pad = [(0, 0), (K - 1, K - 1)]
    dpad = jnp.pad(d32, pad)
    gpad = jnp.pad(g32, pad)
    spad = jnp.pad(snorm, pad, constant_values=1.0)
    dxpad = _call(partial(_grad_x_kernel, K=K, window=window), (B, T + 2 * half),
                  dpad, gpad, spad, interpret=interpret,
                  name=f"bf_grad_x_{_params_tag(K, window)}")

    # Undo the reflect padding: fold boundary-pad gradients back into the interior.
    dx = dxpad[:, half:half + T]
    left = dxpad[:, :half]
    right = dxpad[:, half + T:]
    dx = dx.at[:, 1:half + 1].add(left[:, ::-1])
    dx = dx.at[:, T - half - 1:T - 1].add(right[:, ::-1])
    return dx.astype(x.dtype), dd.astype(delays.dtype)


sinc_delay.defvjp(_sinc_delay_fwd, _sinc_delay_bwd)


def delay_channel_reference(x: jnp.ndarray, delays: jnp.ndarray, kernel_size: int,
                            window: jnp.ndarray) -> jnp.ndarray:
    """XLA reference (materialises [B, T, K]); used for fallback and tests."""
    half = kernel_size // 2
    t_idx = jnp.arange(-half, half + 1, dtype=x.dtype)
    kernel = jnp.sinc(t_idx[None, None, :] - delays[:, :, None]) * window[None, None, :]
    kernel = kernel / jnp.sum(kernel, axis=-1, keepdims=True)
    padded = jnp.pad(x, [(0, 0), (half, half)], mode="reflect")
    T = x.shape[-1]
    shifted = jnp.stack([padded[:, k:k + T] for k in range(kernel_size)], axis=-1)
    return jnp.einsum("btk,btk->bt", shifted, kernel)


def delay_channel(x: jnp.ndarray, delays: jnp.ndarray, kernel_size: int,
                  window: np.ndarray) -> jnp.ndarray:
    """Dispatch: fused Pallas kernel on TPU within the VMEM guard, XLA otherwise.

    ``W2VHS_NO_SINC=1`` forces the XLA reference — the vest-crash bisect knob (round-3
    chain: the full vest step killed the TPU worker 6/6; this isolates the sinc kernel
    from the flash_kv kernel, which has its own ``W2VHS_NO_FLASHKV`` gate)."""
    use_pallas = (jax.default_backend() != "cpu"
                  and os.environ.get("W2VHS_NO_SINC") != "1"
                  and x.shape[1] <= VMEM_GUARD_T)
    if use_pallas:
        return sinc_delay(x, delays, kernel_size, tuple(float(w) for w in window))
    return delay_channel_reference(x, delays, kernel_size,
                                   jnp.asarray(window, dtype=x.dtype))
