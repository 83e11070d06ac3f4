"""KV-blocked flash attention for long sequences with small head dims.

The beamformer's delay predictor attends over every waveform sample (reference
src/mpcg_wav2vec/classify/beamformer.py:19-27 — torch's TransformerEncoderLayer, whose
SDPA kernel is memory-efficient). At vest shapes ([B=16, T~8k, H=4, d=8]) any path that
materialises probabilities in HBM moves ~10^2 GB per step (the naive einsum is 8.2 GB per
direction and OOMs; a query-chunked XLA scan fits but measured 574 ms/step). This kernel is
the classic online-softmax decomposition (FlashAttention-2): the grid tiles (batch, head,
query-block); each program keeps the full K/V rows in VMEM (T~8k at d=8 is ~0.5 MB) and
loops over KV blocks with running (max, sumexp, accumulator) carries, so probabilities
never leave VMEM. Forward stores the log-sum-exp per row; the backward recomputes
probabilities from it in ONE fused pass over kv blocks (dk/dv accumulate in VMEM; dq is
emitted as per-kv-block partials and reduced outside) — 5 score-shaped dots per block
pair instead of the textbook split's 7, which is wall time at d=8 where every dot is
MXU-pass-bound. ``W2VHS_FLASHKV_SPLIT_BWD=1`` restores the split dq/dkv kernels as the
equivalence oracle. Padded-query rows contribute zero because their cotangent rows are
zero.

Unlike ``ops/pallas/attention.py`` (whole-T-in-VMEM, in-kernel PRNG dropout — right for the
wav2vec2 encoder's T~200), this kernel has no dropout/mask support: the delay predictor
runs dropout-free.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)

_QK = (((1,), (1,)), ((), ()))   # [qb, d] x [kvb, d] -> [qb, kvb]
_PV = (((1,), (0,)), ((), ()))   # [qb, kvb] x [kvb, d] -> [qb, d]
_PT = (((0,), (0,)), ((), ()))   # [qb, kvb] x [qb, d] -> [kvb, d]


def _dot(a, b, dims, bf16: bool):
    """MXU dot with f32 accumulation; operands optionally rounded to bf16.

    Measured NEUTRAL on hardware (vest A/B 63.1 vs 63.0 w/s minutes apart): at d=8
    every dot is MXU-pass-bound — the pass count is set by output tiles, not operand
    dtype, so rounding operands to bf16 buys nothing while losing bits in the
    probability/ds operands. Default is therefore the exact-f32 path; the gate
    (``W2VHS_FLASHKV_BF16=1``) is kept as the documented A/B for future libtpu drops
    where the bf16 pass cost may diverge.
    """
    if bf16:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, t: int, kvb: int, scale: float,
                bf16: bool):
    q = q_ref[0, 0].astype(jnp.float32) * scale                    # [qb, d]
    qb, d = q.shape
    nkv = k_ref.shape[2] // kvb

    def body(j, carry):
        m, l, acc = carry
        kblk = k_ref[0, 0, pl.ds(j * kvb, kvb)].astype(jnp.float32)
        vblk = v_ref[0, 0, pl.ds(j * kvb, kvb)].astype(jnp.float32)
        s = _dot(q, kblk, _QK, bf16)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * kvb
        s = jnp.where(col < t, s, NEG_INF)
        mj = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - mj)
        corr = jnp.exp(m - mj)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + _dot(p, vblk, _PV, bf16)
        return mj, l, acc

    m0 = jnp.full((qb, 1), NEG_INF, jnp.float32)
    carry = (m0, jnp.zeros((qb, 1), jnp.float32), jnp.zeros((qb, d), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, nkv, body, carry)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    # Column layout [qb, 8] (lse broadcast along lanes): keeps every kernel value 2-D
    # with no sublane<->lane transposes, which Mosaic rejects/faults on for 1-D vectors.
    lse_ref[0, 0] = jnp.broadcast_to(m + jnp.log(l), (qb, 8))


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, *,
               t: int, kvb: int, scale: float, bf16: bool):
    q = q_ref[0, 0].astype(jnp.float32) * scale
    g = g_ref[0, 0].astype(jnp.float32)                            # [qb, d]
    lse = lse_ref[0, 0, :, :1]                                     # [qb, 1]
    delta = delta_ref[0, 0, :, :1]
    qb, d = q.shape
    nkv = k_ref.shape[2] // kvb

    def body(j, dq):
        kblk = k_ref[0, 0, pl.ds(j * kvb, kvb)].astype(jnp.float32)
        vblk = v_ref[0, 0, pl.ds(j * kvb, kvb)].astype(jnp.float32)
        s = _dot(q, kblk, _QK, bf16)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * kvb
        p = jnp.where(col < t, jnp.exp(s - lse), 0.0)
        dp = _dot(g, vblk, _QK, bf16)
        ds = p * (dp - delta)
        return dq + _dot(ds, kblk, _PV, bf16)

    dq = jax.lax.fori_loop(0, nkv, body, jnp.zeros((qb, d), jnp.float32))
    dq_ref[0, 0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dk_ref, dv_ref, *,
                t: int, qb: int, scale: float, bf16: bool):
    kblk = k_ref[0, 0].astype(jnp.float32)                         # [kvb, d]
    vblk = v_ref[0, 0].astype(jnp.float32)
    kvb, d = kblk.shape
    nq = q_ref.shape[2] // qb
    col0 = pl.program_id(2) * kvb

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * qb, qb)].astype(jnp.float32) * scale
        g = g_ref[0, 0, pl.ds(i * qb, qb)].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * qb, qb), :1]
        delta = delta_ref[0, 0, pl.ds(i * qb, qb), :1]
        s = _dot(q, kblk, _QK, bf16)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
        p = jnp.where(col < t, jnp.exp(s - lse), 0.0)              # [qb, kvb]
        dv = dv + _dot(p, g, _PT, bf16)
        dp = _dot(g, vblk, _QK, bf16)
        ds = p * (dp - delta)
        dk = dk + _dot(ds, q, _PT, bf16)
        return dk, dv

    zero = jnp.zeros((kvb, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (zero, zero))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)   # q already carried the scale
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _bwd_fused_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                      dk_ref, dv_ref, dq_ref, *,
                      t: int, qb: int, scale: float, bf16: bool):
    """One backward pass per kv block: dk/dv accumulate in VMEM (as in ``_dkv_kernel``)
    and dq accumulates into a VMEM-resident output block revisited across the kv grid
    dimension (its index map is constant in j, the innermost grid dim, so Pallas keeps
    it on-chip and flushes once per (b, h) — no HBM partials, no XLA reduce; the first
    fused variant's ``[B, H, nkv, Tp, d]`` partials cost a measured 7.1 ms/layer
    strided reduce). The split dq/dkv kernels each recompute the score and dp blocks,
    costing 7 score-shaped dots per block pair; fusing computes them once (5 dots) —
    at d=8 the dots are MXU-pass-bound, so dot count is wall time.
    """
    kblk = k_ref[0, 0].astype(jnp.float32)                         # [kvb, d]
    vblk = v_ref[0, 0].astype(jnp.float32)
    kvb, d = kblk.shape
    nq = q_ref.shape[2] // qb
    col0 = pl.program_id(2) * kvb

    @pl.when(pl.program_id(2) == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    def body(i, carry):
        dk, dv = carry
        q = q_ref[0, 0, pl.ds(i * qb, qb)].astype(jnp.float32) * scale
        g = g_ref[0, 0, pl.ds(i * qb, qb)].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(i * qb, qb), :1]
        delta = delta_ref[0, 0, pl.ds(i * qb, qb), :1]
        s = _dot(q, kblk, _QK, bf16)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + col0
        p = jnp.where(col < t, jnp.exp(s - lse), 0.0)              # [qb, kvb]
        dv = dv + _dot(p, g, _PT, bf16)
        dp = _dot(g, vblk, _QK, bf16)
        ds = p * (dp - delta)
        dk = dk + _dot(ds, q, _PT, bf16)
        sl = pl.ds(i * qb, qb)
        dq_ref[0, 0, sl] = dq_ref[0, 0, sl] + (
            _dot(ds, kblk, _PV, bf16) * scale).astype(dq_ref.dtype)
        return dk, dv

    zero = jnp.zeros((kvb, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (zero, zero))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)   # q already carried the scale
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _pad_t(x, tp):
    return x if x.shape[2] == tp else jnp.pad(x, ((0, 0), (0, 0), (0, tp - x.shape[2]),
                                                  (0, 0)))


def _specs(qb, tp, d):
    qspec = pl.BlockSpec((1, 1, qb, d), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    whole = pl.BlockSpec((1, 1, tp, d), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    return qspec, whole


def _flash_kv_fwd(q, k, v, q_block, kv_block, interpret, bf16_dots, split_bwd):
    b, t, h, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    qb = min(q_block, max(128, -(-t // 128) * 128))
    kvb = min(kv_block, qb)
    tp = -(-t // qb) * qb
    if tp % kvb:
        tp = -(-tp // kvb) * kvb
    qt, kt, vt = (_pad_t(jnp.moveaxis(x, 2, 1), tp) for x in (q, k, v))  # [B, H, Tp, d]
    nq = tp // qb
    qspec, whole = _specs(qb, tp, d)
    lspec = pl.BlockSpec((1, 1, qb, 8), lambda b_, h_, i: (b_, h_, i, 0),
                         memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        partial(_fwd_kernel, t=t, kvb=kvb, scale=scale, bf16=bf16_dots),
        name=f"flashkv_fwd_t{t}_q{qb}_k{kvb}_bf{int(bf16_dots)}",   # statics pinned for the AOT cache key
        grid=(b, h, nq),
        in_specs=[qspec, whole, whole],
        out_specs=(qspec, lspec),
        out_shape=(jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
                   jax.ShapeDtypeStruct((b, h, tp, 8), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qt, kt, vt)
    o = jnp.moveaxis(out, 1, 2)[:, :t]
    return o, (q, k, v, o, lse)


def _flash_kv_bwd(q_block, kv_block, interpret, bf16_dots, split_bwd, residuals, g):
    q, k, v, o, lse = residuals
    b, t, h, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    qb = min(q_block, max(128, -(-t // 128) * 128))
    kvb = min(kv_block, qb)
    tp = -(-t // qb) * qb
    if tp % kvb:
        tp = -(-tp // kvb) * kvb
    # delta[b, h, t] = sum_d g * o; padded rows are zero, so they drop out of dk/dv.
    delta = jnp.einsum("bthd,bthd->bht", g.astype(jnp.float32), o.astype(jnp.float32))
    lse_p = lse                                   # [B, H, Tp, 8] from the forward
    delta_p = jnp.broadcast_to(
        jnp.pad(delta, ((0, 0), (0, 0), (0, tp - t)))[..., None], lse.shape)
    qt, kt, vt, gt = (_pad_t(jnp.moveaxis(x, 2, 1), tp) for x in (q, k, v, g))
    nq, nkv = tp // qb, tp // kvb
    qspec, whole = _specs(qb, tp, d)
    rowspec = pl.BlockSpec((1, 1, qb, 8), lambda b_, h_, i: (b_, h_, i, 0),
                           memory_space=pltpu.VMEM)
    rowwhole = pl.BlockSpec((1, 1, tp, 8), lambda b_, h_, i: (b_, h_, 0, 0),
                            memory_space=pltpu.VMEM)

    kvspec = pl.BlockSpec((1, 1, kvb, d), lambda b_, h_, i: (b_, h_, i, 0),
                          memory_space=pltpu.VMEM)
    qwhole = pl.BlockSpec((1, 1, tp, d), lambda b_, h_, i: (b_, h_, 0, 0),
                          memory_space=pltpu.VMEM)

    if not split_bwd:
        # Fused backward (default): 5 score-shaped dots per block pair instead of 7.
        # dq lives in a VMEM-resident block revisited across the innermost (kv) grid
        # dim — written to HBM once per (b, h), exactly like the split dq kernel.
        dqspec = pl.BlockSpec((1, 1, tp, d), lambda b_, h_, j: (b_, h_, 0, 0),
                              memory_space=pltpu.VMEM)
        dk, dv, dq = pl.pallas_call(
            partial(_bwd_fused_kernel, t=t, qb=qb, scale=scale, bf16=bf16_dots),
            name=f"flashkv_bwd2_t{t}_q{qb}_k{kvb}_bf{int(bf16_dots)}",
            grid=(b, h, nkv),
            in_specs=[qwhole, kvspec, kvspec, qwhole, rowwhole, rowwhole],
            out_specs=(kvspec, kvspec, dqspec),
            out_shape=(jax.ShapeDtypeStruct((b, h, tp, d), k.dtype),
                       jax.ShapeDtypeStruct((b, h, tp, d), v.dtype),
                       jax.ShapeDtypeStruct((b, h, tp, d), q.dtype)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(qt, kt, vt, gt, lse_p, delta_p)
        crop = lambda x: jnp.moveaxis(x, 1, 2)[:, :t]
        return crop(dq), crop(dk), crop(dv)

    dq = pl.pallas_call(
        partial(_dq_kernel, t=t, kvb=kvb, scale=scale, bf16=bf16_dots),
        name=f"flashkv_dq_t{t}_q{qb}_k{kvb}_bf{int(bf16_dots)}",
        grid=(b, h, nq),
        in_specs=[qspec, whole, whole, qspec, rowspec, rowspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, h, tp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qt, kt, vt, gt, lse_p, delta_p)

    dk, dv = pl.pallas_call(
        partial(_dkv_kernel, t=t, qb=qb, scale=scale, bf16=bf16_dots),
        name=f"flashkv_dkv_t{t}_q{qb}_k{kvb}_bf{int(bf16_dots)}",
        grid=(b, h, nkv),
        in_specs=[qwhole, kvspec, kvspec, qwhole, rowwhole, rowwhole],
        out_specs=(kvspec, kvspec),
        out_shape=(jax.ShapeDtypeStruct((b, h, tp, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, tp, d), v.dtype)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qt, kt, vt, gt, lse_p, delta_p)

    crop = lambda x: jnp.moveaxis(x, 1, 2)[:, :t]
    return crop(dq), crop(dk), crop(dv)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_kv(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              q_block: int, kv_block: int, interpret: bool,
              bf16_dots: bool, split_bwd: bool) -> jnp.ndarray:
    return _flash_kv_fwd(q, k, v, q_block, kv_block, interpret, bf16_dots, split_bwd)[0]


_flash_kv.defvjp(_flash_kv_fwd, _flash_kv_bwd)


def flash_attention_kv(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       q_block: int = 512, kv_block: int = 512,
                       interpret: bool = False) -> jnp.ndarray:
    """Memory-efficient attention over ``[B, T, H, d]`` (flax ``attention_fn`` layout).

    Inputs are cast to f32 at the kernel boundary: Mosaic faults on bf16 refs at this
    d=8 lane width (the vest train step crashed under the bf16 compute dtype; the f32
    probe at identical shapes ran clean). In-kernel dots default to exact f32: the
    bf16-operand variant (``W2VHS_FLASHKV_BF16=1``) measured NEUTRAL on hardware —
    at d=8 the MXU pass count is set by output tiles, not operand dtype — so the
    exact path wins on accuracy at equal speed. See ``_dot``.
    """
    dt = q.dtype
    bf16_dots = (dt == jnp.bfloat16
                 and os.environ.get("W2VHS_FLASHKV_BF16", "0") == "1")
    # Read at call (trace) time and thread through as a static argument so the flag is
    # part of the traced signature — a jitted caller re-traces rather than silently
    # keeping the old backward if the env var changes (advisor r4 finding).
    split_bwd = os.environ.get("W2VHS_FLASHKV_SPLIT_BWD") == "1"
    if dt == jnp.bfloat16:
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    return _flash_kv(q, k, v, q_block, kv_block, interpret, bf16_dots, split_bwd).astype(dt)
