"""Fused residual tail: ``LayerNorm(x + dropout(h))`` in one Pallas pass, fused backward.

Why: every encoder layer ends its two sublayers with dropout -> residual add -> LayerNorm
(reference semantics: src/mpcg_wav2vec/classify/wav2vec.py's HF encoder layers). As separate
ops that is a PRNG-dropout Pallas call (read h, write h~) plus an XLA add+norm fusion
(read x, h~, write s, out) — all bandwidth, two custom-call/fusion launches per site, 24
sites per step. This op reads h and x once and writes the normalized output plus the bf16
residual sum (needed by autodiff anyway); the backward regenerates the dropout mask from
the same per-program seed (no stored mask) and folds the LayerNorm input/parameter
gradients and the mask application into a single pass, with per-block partials for
dscale/dbias exactly like ops/pallas/ffn.py's bias-grad partials.

Numerics match the unfused composition bit-for-bit in spirit: the residual sum is rounded
to the compute dtype (bf16 on TPU) before the float32 statistics, mirroring what the
separate-ops path materialises; forward and backward derive statistics from the same
rounded sum, so the VJP is exact for the function actually computed.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_rows(n: int, c: int) -> int:
    """Row block under a ~6 MB VMEM budget (~28 bytes/element live across h/x/s/out + f32).

    W2VHS_RESID_VMEM_MB overrides for block-size A/B sweeps."""
    import os

    budget = int(os.environ.get("W2VHS_RESID_VMEM_MB", "6")) * 1024 * 1024
    rows = max(8, min(n, budget // max(1, c * 28)))
    return max(8, (rows // 8) * 8)


def _keep(shape, rate: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(1.0, rate) * np.iinfo(np.uint32).max)
    return bits >= threshold


def _fwd_kernel(seed_ref, h_ref, x_ref, scale_ref, bias_ref, out_ref, s_ref, *,
                rate: float, eps: float):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    h = h_ref[...].astype(jnp.float32)
    if rate > 0.0:
        h = jnp.where(_keep(h.shape, rate), h / (1.0 - rate), 0.0)
    s = (x_ref[...].astype(jnp.float32) + h).astype(s_ref.dtype)
    s_ref[...] = s
    sf = s.astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(sf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (sf - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * scale_ref[...].astype(jnp.float32)
                    + bias_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, g_ref, s_ref, scale_ref, dh_ref, dx_ref, dsc_ref, dbi_ref, *,
                rate: float, eps: float, n: int):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    g = g_ref[...].astype(jnp.float32)
    sf = s_ref[...].astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(sf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    shat = (sf - mean) * rstd
    gs = g * scale_ref[...].astype(jnp.float32)
    ds = rstd * (gs - jnp.mean(gs, axis=-1, keepdims=True)
                 - shat * jnp.mean(gs * shat, axis=-1, keepdims=True))
    dx_ref[...] = ds.astype(dx_ref.dtype)
    dh = jnp.where(_keep(ds.shape, rate), ds / (1.0 - rate), 0.0) if rate > 0.0 else ds
    dh_ref[...] = dh.astype(dh_ref.dtype)
    # Per-block dscale/dbias partials; mask rows past n (the final block's tail rows read
    # undefined padding and this is a reduction). 8-row broadcast: Pallas wants 8-sublane
    # output blocks; the caller reads row 0 of each partial.
    rows = ds.shape[0]
    rid = pl.program_id(0) * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    live = rid < n
    gm = jnp.where(live, g, 0.0)
    sm = jnp.where(live, shat, 0.0)
    dsc_ref[...] = jnp.broadcast_to(jnp.sum(gm * sm, axis=0, keepdims=True), dsc_ref.shape)
    dbi_ref[...] = jnp.broadcast_to(jnp.sum(gm, axis=0, keepdims=True), dbi_ref.shape)


def _row_spec(rows, c):
    return pl.BlockSpec((rows, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)


def _vec_spec(c):
    return pl.BlockSpec((1, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def dropout_add_layernorm(h: jnp.ndarray, x: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, seed: jnp.ndarray, rate: float,
                          eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    """``LayerNorm(x + dropout(h))`` over the last axis of any-rank ``h``/``x``.

    ``scale``/``bias`` are float32 ``[D]`` (FastLayerNorm-compatible); statistics are
    float32 over the compute-dtype-rounded residual sum, output is ``h.dtype``.
    """
    return _fwd(h, x, scale, bias, seed, rate, eps, interpret)[0]


def _fwd(h, x, scale, bias, seed, rate, eps, interpret):
    shape = h.shape
    c = shape[-1]
    h2 = h.reshape(-1, c)
    x2 = x.reshape(-1, c).astype(h2.dtype)
    n = h2.shape[0]
    rows = _block_rows(n, c)
    grid = -(-n // rows)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    out, s = pl.pallas_call(
        partial(_fwd_kernel, rate=rate, eps=eps),
        # rate/eps live only in the kernel closure — the name pins them for the AOT
        # cache key (utils/aot.py strips backend_config payloads).
        name=f"resid_fwd_r{rate}_e{eps}_rows{rows}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[_row_spec(rows, c), _row_spec(rows, c), _vec_spec(c), _vec_spec(c)],
            out_specs=(_row_spec(rows, c), _row_spec(rows, c)),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, c), h2.dtype),
                   jax.ShapeDtypeStruct((n, c), h2.dtype)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, h2, x2, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(shape), (s, scale, seed, shape)


def _bwd(rate, eps, interpret, residuals, g):
    s, scale, seed, shape = residuals
    c = shape[-1]
    g2 = g.reshape(-1, c)
    n = g2.shape[0]
    rows = _block_rows(n, c)
    grid = -(-n // rows)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    dh, dx, dscp, dbip = pl.pallas_call(
        partial(_bwd_kernel, rate=rate, eps=eps, n=n),
        name=f"resid_bwd_r{rate}_e{eps}_rows{rows}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[_row_spec(rows, c), _row_spec(rows, c), _vec_spec(c)],
            out_specs=(_row_spec(rows, c), _row_spec(rows, c),
                       pl.BlockSpec((1, 8, c), lambda i, *_: (i, 0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((1, 8, c), lambda i, *_: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, c), g2.dtype),
                   jax.ShapeDtypeStruct((n, c), g2.dtype),
                   jax.ShapeDtypeStruct((grid, 8, c), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 8, c), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, g2, s, scale.reshape(1, c))
    dscale = dscp[:, 0, :].sum(axis=0).astype(scale.dtype)
    dbias = dbip[:, 0, :].sum(axis=0).astype(scale.dtype)
    return (dh.reshape(shape), dx.reshape(shape), dscale, dbias, jnp.zeros_like(seed))


dropout_add_layernorm.defvjp(_fwd, _bwd)


def reference_dropout_add_layernorm(h, x, scale, bias, key, rate, eps=1e-5):
    """XLA reference for tests: same composition via bernoulli (different RNG)."""
    hf = h.astype(jnp.float32)
    if rate > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - rate, h.shape)
        hf = jnp.where(keep, hf / (1.0 - rate), 0.0)
    s = (x.astype(jnp.float32) + hf).astype(h.dtype)
    sf = s.astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(sf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (sf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(h.dtype)
