"""Fused attention (flash-style) Pallas kernel with in-kernel dropout.

Why: at wav2vec2's ~199 tokens the naive path materialises the [B, H, T, T] float32 score and
probability tensors (486 MB at B=64, H=12) plus a same-shaped dropout mask — profiled at
~64 ms/step across the 12 layers, ~100x off roofline, all HBM traffic. This kernel keeps the
whole per-batch-element attention ([H, T_pad, T_pad] probabilities, ~3 MB) resident in VMEM:
QK^T, padded-key masking, softmax, dropout (hardware PRNG, seeded deterministically per
program) and PV in one pass, so HBM sees only Q, K, V, O.

Grid layout matters on this part: one program per (batch, head) is launch-bound (768 tiny
programs); instead the grid is (batch,) and all heads are batched inside the kernel through
dot_general batch dimensions, giving each program ~50 MFLOP of MXU work.

Backward recomputes probabilities (and the identical dropout mask via the same per-program
seed) instead of storing them — the classic flash recompute — with closed-form softmax/dropout
gradients. Verified against autodiff of the reference einsum path in interpreter mode
(tests/test_pallas_attention.py); the dropout paths (hardware PRNG) are exercised on TPU.

Sequences here are short and fixed (<= ~200 frames), so no K/V tiling or online-softmax
streaming is needed. T is padded to a multiple of 8 sublanes only (Mosaic masks partial
128-lane register tiles itself — see ``_pad_len``); padded key columns are masked to -inf,
padded query rows produce garbage that callers slice off. Inputs may arrive in ``bhtd`` or
``bthd`` layout (the latter avoids a transpose at the call site).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_BH = (((2,), (2,)), ((0,), (0,)))       # contract d, batch H:  [H,T,d] x [H,T,d] -> [H,T,T]
_BT = (((1,), (1,)), ((0,), (0,)))       # contract first T, batch H
_PV = (((2,), (1,)), ((0,), (0,)))       # contract key-T, batch H: [H,T,T] x [H,T,d] -> [H,T,d]


def _pad_len(t: int) -> int:
    """Kernel-side sequence length: sublane-aligned (8) only.

    Mosaic masks partial register tiles itself, so T does not need host-side padding to a
    128-lane multiple — the old ``max(128, ceil128(t))`` forced a materialised jnp.pad of
    q/k/v/g (profiled 4.75 ms/step fwd alone at T=200->256) plus 28% extra score work."""
    return max(8, -(-t // 8) * 8)


def _head_block(h: int, tp: int) -> int:
    """Largest divisor of ``h`` whose working set fits comfortably in VMEM.

    The backward kernel keeps ~7 float32 [hb, Tp, Tp] buffers live; cap that at ~10 MB
    (the scoped-vmem limit is 16 MB). W2VHS_ATTN_VMEM_MB overrides the budget for
    block-size A/B sweeps (e.g. 16 -> all 12 heads in one program at T=200)."""
    import os

    budget = int(os.environ.get("W2VHS_ATTN_VMEM_MB", "10")) * 1024 * 1024
    per_head = 7 * tp * tp * 4
    for hb in range(h, 0, -1):
        if h % hb == 0 and hb * per_head <= budget:
            return hb
    return 1


def _keep_mask(shape, rate: float):
    """Dropout keep-mask from the per-core PRNG (must be seeded already)."""
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(min(1.0, rate) * np.iinfo(np.uint32).max)
    return pltpu.bitcast(bits, jnp.uint32) >= threshold


def _probs_parts(q, k, t: int, scale: float):
    """Unnormalised softmax numerator ``e`` and row sums ``l``: [H, Tp, Tp] / [H, Tp, 1]."""
    scores = jax.lax.dot_general(q, k, _BH, preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    scores = jnp.where(col < t, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    return e, jnp.sum(e, axis=-1, keepdims=True)


def _probs(q, k, t: int, scale: float):
    """Masked softmax probabilities for one batch element: [H, Tp, Tp] float32."""
    e, l = _probs_parts(q, k, t, scale)
    return e / l


def _defer_norm() -> bool:
    """Defer the softmax normalisation to the [H, T, d] output (W2VHS_ATTN_DN=1).

    ``p = e / l`` is a full [hb, Tp, Tp] VPU divide in forward AND in the backward
    recompute; dividing the 15x-smaller dot outputs by ``l`` instead is algebraically
    identical (dropout commutes: the kept entries are scaled by the same 1/(l(1-r))).
    Gated off until the full-step A/B on hardware lands (scripts/round3_levers.sh)."""
    import os

    return os.environ.get("W2VHS_ATTN_DN", "0") == "1"


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, t: int, scale: float,
                rate: float, bthd: bool = False, defer: bool = False,
                out_bthd: bool | None = None):
    # bthd historically swapped loads AND the store together; out_bthd decouples the
    # store side so the packed-QKV path can keep bhtd reads (no input relayout) while
    # emitting [T, H, d] blocks (kills the post-kernel XLA transpose + makes the
    # out-projection's [B, T, H*d] reshape a free bitcast).
    out_bthd = bthd if out_bthd is None else out_bthd
    load = (lambda r: jnp.swapaxes(r[0], 0, 1)) if bthd else (lambda r: r[0])
    q = load(q_ref).astype(jnp.float32)
    k = load(k_ref).astype(jnp.float32)
    v = load(v_ref).astype(jnp.float32)
    if defer:
        e, l = _probs_parts(q, k, t, scale)
        denom = l
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
                            + pl.program_id(1))
            e = jnp.where(_keep_mask(e.shape, rate), e, 0.0)
            denom = l * (1.0 - rate)
        out = jax.lax.dot_general(e, v, _PV, preferred_element_type=jnp.float32) / denom
    else:
        probs = _probs(q, k, t, scale)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
                            + pl.program_id(1))
            keep = _keep_mask(probs.shape, rate)
            probs = jnp.where(keep, probs / (1.0 - rate), 0.0)
        out = jax.lax.dot_general(probs, v, _PV, preferred_element_type=jnp.float32)
    o_ref[0] = (jnp.swapaxes(out, 0, 1) if out_bthd else out).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                t: int, scale: float, rate: float, bthd: bool = False,
                defer: bool = False, out_bthd: bool | None = None):
    # out_bthd: the *output cotangent* g arrives in [T, H, d] blocks (the forward
    # emitted bthd); q/k/v reads and dq/dk/dv writes keep the ``bthd`` layout flag.
    out_bthd = bthd if out_bthd is None else out_bthd
    load = (lambda r: jnp.swapaxes(r[0], 0, 1)) if bthd else (lambda r: r[0])
    load_g = (lambda r: jnp.swapaxes(r[0], 0, 1)) if out_bthd else (lambda r: r[0])
    q = load(q_ref).astype(jnp.float32)
    k = load(k_ref).astype(jnp.float32)
    v = load(v_ref).astype(jnp.float32)
    g = load_g(g_ref).astype(jnp.float32)

    if defer:
        # Same math as below with p = e / l, the 1/l factors pulled out of the full-size
        # [hb, Tp, Tp] tensors and attached to the small [hb, Tp, d] / [hb, Tp, 1] sides:
        #   dv[k] = sum_q p_d[q,k] g[q]            -> dot(e_kept, g / l) / (1-r)
        #   ds    = p * (dp - sum_k dp*p)          -> ds_un = e * (dp - u / l), u = sum dp*e
        #   dq[q] = dot(ds, k)[q] * scale          -> dot(ds_un, k)[q] * scale / l_q
        #   dk[k] = sum_q ds[q,k] q[q] * scale     -> dot(ds_un, q / l) * scale
        e, l = _probs_parts(q, k, t, scale)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
                            + pl.program_id(1))
            keep = _keep_mask(e.shape, rate)
            inv = 1.0 / (1.0 - rate)
            ed = jnp.where(keep, e, 0.0)
        else:
            keep, inv, ed = None, 1.0, e
        dv = jax.lax.dot_general(ed, g / l, _BT,
                                 preferred_element_type=jnp.float32) * inv
        dpd = jax.lax.dot_general(g, v, _BH, preferred_element_type=jnp.float32)
        dp = jnp.where(keep, dpd, 0.0) * inv if rate > 0.0 else dpd
        u = jnp.sum(dp * e, axis=-1, keepdims=True)
        ds_un = e * (dp - u / l)
        dq = jax.lax.dot_general(ds_un, k, _PV,
                                 preferred_element_type=jnp.float32) * scale / l
        dk = jax.lax.dot_general(ds_un, q / l, _BT,
                                 preferred_element_type=jnp.float32) * scale
    else:
        probs = _probs(q, k, t, scale)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * pl.num_programs(1)
                            + pl.program_id(1))
            keep = _keep_mask(probs.shape, rate)
            dropped = jnp.where(keep, probs / (1.0 - rate), 0.0)
        else:
            dropped = probs

        dv = jax.lax.dot_general(dropped, g, _BT, preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(g, v, _BH, preferred_element_type=jnp.float32)
        dp = jnp.where(keep, dpd / (1.0 - rate), 0.0) if rate > 0.0 else dpd
        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, k, _PV, preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, q, _BT, preferred_element_type=jnp.float32) * scale
    if bthd:
        dq, dk, dv = (jnp.swapaxes(a, 0, 1) for a in (dq, dk, dv))
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, seed: jnp.ndarray,
                    dropout_rate: float = 0.0, t: int | None = None,
                    interpret: bool = False, layout: str = "bhtd") -> jnp.ndarray:
    """Fused attention; returns the input shape.

    ``layout="bhtd"`` takes ``[B, H, T, d]``. ``layout="bthd"`` takes ``[B, T, H, d]`` —
    the projections' natural output — and swaps the head/time axes *inside* the kernel
    (cheap VMEM shuffles), so XLA never materialises the [B, H, T, d] transposes that the
    custom-call boundary otherwise forces (profiled ~9 ms/step across 12 layers).

    ``seed`` is an int32 scalar array driving the in-kernel dropout PRNG (ignored when
    ``dropout_rate == 0``); forward and backward derive identical per-program masks from it.
    """
    return _flash_fwd(q, k, v, seed, dropout_rate, t, interpret, layout)[0]


def _pad(x, tp, t_axis=2):
    t = x.shape[t_axis]
    if t == tp:
        return x
    pads = [(0, 0)] * x.ndim
    pads[t_axis] = (0, tp - t)
    return jnp.pad(x, pads)


def _geom(shape, layout):
    """(b, h, t_real, d) from an input shape in either layout."""
    if layout == "bthd":
        b, t_real, h, d = shape
    else:
        b, h, t_real, d = shape
    return b, h, t_real, d


def _blockspec(layout, hb, tp, d):
    if layout == "bthd":
        return pl.BlockSpec((1, tp, hb, d), lambda b, hh, *_: (b, 0, hh, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, hb, tp, d), lambda b, hh, *_: (b, hh, 0, 0),
                        memory_space=pltpu.VMEM)


def _flash_fwd(q, k, v, seed, dropout_rate, t, interpret, layout="bhtd"):
    bthd = layout == "bthd"
    b, h, t_real, d = _geom(q.shape, layout)
    t_axis = 1 if bthd else 2
    t_eff = t or t_real
    tp = _pad_len(t_real)
    scale = 1.0 / float(np.sqrt(d))
    qp, kp, vp = (_pad(x, tp, t_axis) for x in (q, k, v))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    # bthd blocks put (H, d) in the tiled minor positions; Pallas requires those to be
    # 8/128 multiples OR the full array dims, so bthd always takes all heads per program.
    hb = h if bthd else _head_block(h, tp)
    dn = _defer_norm()
    spec = _blockspec(layout, hb, tp, d)
    out_shape = (b, tp, h, d) if bthd else (b, h, tp, d)
    out = pl.pallas_call(
        partial(_fwd_kernel, t=t_eff, scale=scale, rate=dropout_rate, bthd=bthd,
                defer=dn),
        # Statics baked into the kernel closure are invisible in the payload-stripped
        # StableHLO the AOT cache keys on; the name pins them (utils/aot.py).
        name=f"flash_fwd_t{t_eff}_r{dropout_rate}_{layout}_hb{hb}_dn{int(dn)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hb),
            in_specs=[spec] * 3,
            out_specs=spec,
        ),
        out_shape=jax.ShapeDtypeStruct(out_shape, q.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, qp, kp, vp)
    out = out[:, :t_real] if bthd else out[:, :, :t_real, :]
    return out, (q, k, v, seed)


def _flash_bwd(dropout_rate, t, interpret, layout, residuals, g):
    q, k, v, seed = residuals
    bthd = layout == "bthd"
    b, h, t_real, d = _geom(q.shape, layout)
    t_axis = 1 if bthd else 2
    t_eff = t or t_real
    tp = _pad_len(t_real)
    scale = 1.0 / float(np.sqrt(d))
    qp, kp, vp, gp = (_pad(x, tp, t_axis) for x in (q, k, v, g))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    hb = h if bthd else _head_block(h, tp)
    dn = _defer_norm()
    spec = _blockspec(layout, hb, tp, d)
    shape = jax.ShapeDtypeStruct((b, tp, h, d) if bthd else (b, h, tp, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, t=t_eff, scale=scale, rate=dropout_rate, bthd=bthd,
                defer=dn),
        name=f"flash_bwd_t{t_eff}_r{dropout_rate}_{layout}_hb{hb}_dn{int(dn)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hb),
            in_specs=[spec] * 4,
            out_specs=(spec,) * 3,
        ),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, qp, kp, vp, gp)
    crop = (lambda x: x[:, :t_real]) if bthd else (lambda x: x[:, :, :t_real, :])
    return crop(dq), crop(dk), crop(dv), jnp.zeros_like(seed)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def flash_attention_qkv(qkv: jnp.ndarray, seed: jnp.ndarray, dropout_rate: float = 0.0,
                        t: int | None = None, interpret: bool = False,
                        out_layout: str = "bhtd") -> jnp.ndarray:
    """Fused attention over a *packed* projection tensor ``[B, 3H, T, d]``.

    The fused QKV projection emits one ``[B, T, 3D]`` tensor; reshaping it to heads and
    transposing once yields ``[B, 3H, T, d]`` with heads ``0..H-1`` = Q, ``H..2H-1`` = K,
    ``2H..3H-1`` = V. Slicing that tensor into q/k/v in XLA would materialise three copies
    at the custom-call boundary; instead the kernel reads all three roles from the *same*
    operand through head-offset index maps (same buffer, three views — no copies).
    Numerics and dropout semantics are identical to :func:`flash_attention`.

    ``out_layout="bthd"`` emits ``[B, T, H, d]`` directly (the out-projection's natural
    input: its ``[B, T, H*d]`` reshape becomes a free bitcast and the post-kernel XLA
    transpose disappears, in forward and for the cotangent in backward). The store-side
    relayout happens in VMEM; requires all heads in one program (block minor dims must
    be full array dims), which measured neutral at T=200 (round-3 hb=12 A/B).
    """
    return _packed_fwd(qkv, seed, dropout_rate, t, interpret, out_layout)[0]


def _packed_specs(h: int, hb: int, tp: int, d: int):
    """Three views of one [B, 3H, Tp, d] operand, offset by role in head-block units."""
    def spec(role):
        off = role * (h // hb)
        return pl.BlockSpec((1, hb, tp, d), lambda b, hh, *_, _o=off: (b, hh + _o, 0, 0),
                            memory_space=pltpu.VMEM)
    return [spec(0), spec(1), spec(2)]


def _packed_fwd(qkv, seed, dropout_rate, t, interpret, out_layout="bhtd"):
    b, h3, t_real, d = qkv.shape
    h = h3 // 3
    t_eff = t or t_real
    tp = _pad_len(t_real)
    scale = 1.0 / float(np.sqrt(d))
    qkvp = _pad(qkv, tp, 2)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    ob = out_layout == "bthd"
    # bthd output blocks put (H, d) in the tiled minor positions -> both must be full
    # array dims, i.e. all heads in one program (measured neutral vs hb=6 at T=200).
    hb = h if ob else _head_block(h, tp)
    dn = _defer_norm()
    out = pl.pallas_call(
        partial(_fwd_kernel, t=t_eff, scale=scale, rate=dropout_rate, defer=dn,
                out_bthd=ob),
        name=f"flash_fwd_qkv_t{t_eff}_r{dropout_rate}_hb{hb}_dn{int(dn)}_ob{int(ob)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hb),
            in_specs=_packed_specs(h, hb, tp, d),
            out_specs=_blockspec("bthd" if ob else "bhtd", hb, tp, d),
        ),
        out_shape=jax.ShapeDtypeStruct((b, tp, h, d) if ob else (b, h, tp, d),
                                       qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, qkvp, qkvp, qkvp)
    out = out[:, :t_real] if ob else out[:, :, :t_real, :]
    return out, (qkv, seed)


def _packed_bwd(dropout_rate, t, interpret, out_layout, residuals, g):
    qkv, seed = residuals
    b, h3, t_real, d = qkv.shape
    h = h3 // 3
    t_eff = t or t_real
    tp = _pad_len(t_real)
    scale = 1.0 / float(np.sqrt(d))
    qkvp = _pad(qkv, tp, 2)
    ob = out_layout == "bthd"
    gp = _pad(g, tp, 1 if ob else 2)   # cotangent arrives in the forward's out layout
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    hb = h if ob else _head_block(h, tp)
    dn = _defer_norm()
    spec = _blockspec("bhtd", hb, tp, d)
    g_spec = _blockspec("bthd" if ob else "bhtd", hb, tp, d)
    shape = jax.ShapeDtypeStruct((b, h, tp, d), qkv.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, t=t_eff, scale=scale, rate=dropout_rate, defer=dn,
                out_bthd=ob),
        name=f"flash_bwd_qkv_t{t_eff}_r{dropout_rate}_hb{hb}_dn{int(dn)}_ob{int(ob)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // hb),
            in_specs=_packed_specs(h, hb, tp, d) + [g_spec],
            out_specs=(spec,) * 3,
        ),
        out_shape=(shape, shape, shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, qkvp, qkvp, qkvp, gp)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1)[:, :, :t_real, :]
    return dqkv, jnp.zeros_like(seed)


flash_attention_qkv.defvjp(_packed_fwd, _packed_bwd)


def reference_attention(q, k, v, *, dropout_rate: float = 0.0, key=None):
    """XLA einsum reference ([B, H, T, d]); used for fallback and tests."""
    d = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
                        ) / np.sqrt(d)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)
