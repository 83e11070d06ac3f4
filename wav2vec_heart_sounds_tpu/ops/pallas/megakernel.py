"""FFN-block megakernel spike: the whole post-attention FFN sublayer in ONE Pallas pass.

Reference semantics covered (one encoder sublayer, post-norm wav2vec2-base —
/root/reference/src/mpcg_wav2vec/classify/wav2vec.py delegates to HF
``Wav2Vec2EncoderLayer``):

    y = LayerNorm(x + drop_h(W2 @ drop_a(gelu(W1 @ x + b1)) + b2))

The production path already runs this as five programs per layer (XLA W1 dot ->
Pallas GELU+dropout -> XLA W2 dot -> Pallas dropout+add+LN), each writing its
intermediate to HBM: per B=96 step the [19200, 3072] intermediate alone makes three
HBM passes (~350 MB/layer forward). This kernel keeps BOTH weight matrices resident in
VMEM (9.4 MB bf16 via constant index maps — fetched once, revisited across the row
grid) and streams x through in row blocks, so HBM sees x once in and y (+ the bf16
residual sum ``s``, which autodiff needs anyway) once out.

Numerics mirror the decomposed path's materialisation points: the [N, 3072]
pre-activation and the W2 output are rounded to the compute dtype exactly where the
decomposed path writes them to HBM, and the LayerNorm statistics are float32 over the
compute-dtype residual sum (same contract as ops/pallas/resid.py). GELU uses the same
dtype-gated tanh/erf rule as ops/pallas/ffn.py.

Status: measured spike (round 5) — see scripts/megakernel_spike.py and PERF.md
"Megakernel spike". Forward-only; not wired into the model.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv import _gelu_exact, _gelu_grad_kernel, _gelu_tanh, _gelu_tanh_grad
from .ffn import _tanh_act


def _block_rows(n: int) -> int:
    """Row block size. VMEM at rows=256, D=768, F=3072 (bf16 weights resident):
    w1+w2 9.4 MB + pre1 f32 3.1 MB + h bf16 1.6 MB + x/out/s blocks ~1.2 MB double
    buffered ≈ 15 MB — at the edge of the ~16 MB core VMEM, so the default is 128
    (≈12 MB). W2VHS_MEGA_ROWS overrides for block-size A/Bs."""
    import os

    rows = int(os.environ.get("W2VHS_MEGA_ROWS", "128"))
    return max(8, min(n, (rows // 8) * 8))


def _keep(shape, rate: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(1.0, rate) * np.iinfo(np.uint32).max)
    return bits >= threshold


def _masks(seed_ref, pid, shape_a, act_rate: float, shape_h, hid_rate: float):
    """Both dropout masks from ONE reseed in a canonical draw order (act then hid).

    The backward kernel regenerates the forward's masks, so the (seed, program id,
    draw order, draw shapes) tuple must be identical in both kernels — hence a single
    ``prng_seed`` at the top and fixed-order draws (two independent reseeds proved
    unsound on hardware: with two seed points per kernel the fwd and bwd programs'
    streams disagreed, failing the finite-difference check at rate>0)."""
    keep_a = keep_h = None
    if act_rate > 0.0 or hid_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pid)
    if act_rate > 0.0:
        keep_a = _keep(shape_a, act_rate)
    if hid_rate > 0.0:
        keep_h = _keep(shape_h, hid_rate)
    return keep_a, keep_h


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, sc_ref, bi_ref,
                out_ref, s_ref, pre_ref, *, act_rate: float, hid_rate: float,
                eps: float, tanh: bool):
    pid = pl.program_id(0)
    x = x_ref[...]
    rows = x.shape[0]
    f = w1_ref.shape[1]
    keep_a, keep_h = _masks(seed_ref, pid, (rows, f), act_rate,
                            (rows, x.shape[1]), hid_rate)
    # W1 matmul, f32 accumulation, then round at the decomposed path's HBM
    # materialisation point (jnp.dot in the compute dtype writes compute-dtype pre).
    pre1 = jax.lax.dot_general(x, w1_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    pre1 = (pre1 + b1_ref[...].astype(jnp.float32)).astype(x.dtype)
    pre_ref[...] = pre1                        # backward residual (dW1 / gelu-grad)
    act = _gelu_tanh if tanh else _gelu_exact
    h = act(pre1.astype(jnp.float32))
    if act_rate > 0.0:
        h = jnp.where(keep_a, h / (1.0 - act_rate), 0.0)
    h = h.astype(x.dtype)                      # gelu kernel writes compute dtype
    y2 = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y2 = (y2 + b2_ref[...].astype(jnp.float32)).astype(x.dtype)   # dense output round
    hf = y2.astype(jnp.float32)
    if hid_rate > 0.0:
        hf = jnp.where(keep_h, hf / (1.0 - hid_rate), 0.0)
    s = (x.astype(jnp.float32) + hf).astype(s_ref.dtype)
    s_ref[...] = s
    sf = s.astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(sf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (sf - mean) * jax.lax.rsqrt(var + eps)
    out_ref[...] = (y * sc_ref[...].astype(jnp.float32)
                    + bi_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def _bwd_kernel(seed_ref, g_ref, s_ref, pre_ref, w2_ref, sc_ref,
                ds_ref, dhid_ref, dpre_ref, h_ref, db1_ref, db2_ref, dsc_ref, dbi_ref,
                *, act_rate: float, hid_rate: float, eps: float, tanh: bool, n: int):
    """Everything of the FFN-sublayer backward except the three large-k dots.

    Regenerates both dropout masks with the forward's exact (seed, program id, block
    shape) discipline, folds the LayerNorm backward, the hidden-dropout application,
    the k=768 ``dh = dhid @ W2^T`` dot (same k-bound MXU efficiency in-kernel as in
    XLA), the GELU gradient, the act-dropout mask and the activation recompute
    (``h``, needed for the XLA dW2 dot) into one pass, emitting per-block partials for
    all four vector grads. ``dW1 = x^T @ dpre``, ``dW2 = h^T @ dhid`` and
    ``dx = dpre @ W1^T + ds`` stay XLA dots (k = 19200 / 19200 / 3072 — those lowerings
    run at 162-190 TF/s, far above what a row-blocked kernel could reach)."""
    pid = pl.program_id(0)
    g = g_ref[...].astype(jnp.float32)
    rows = g.shape[0]
    keep_a, keep_h = _masks(seed_ref, pid, (rows, pre_ref.shape[1]), act_rate,
                            (rows, g.shape[1]), hid_rate)
    sf = s_ref[...].astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(sf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    shat = (sf - mean) * rstd
    gs = g * sc_ref[...].astype(jnp.float32)
    ds = rstd * (gs - jnp.mean(gs, axis=-1, keepdims=True)
                 - shat * jnp.mean(gs * shat, axis=-1, keepdims=True))
    ds_ref[...] = ds.astype(ds_ref.dtype)
    if hid_rate > 0.0:
        dhid = jnp.where(keep_h, ds / (1.0 - hid_rate), 0.0)
    else:
        dhid = ds
    dhid_ref[...] = dhid.astype(dhid_ref.dtype)
    # dh = dhid @ W2^T : contract the model dim of both ([r, D] x [F, D] -> [r, F]).
    dh = jax.lax.dot_general(dhid.astype(dhid_ref.dtype), w2_ref[...],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pre = pre_ref[...].astype(jnp.float32)
    if act_rate > 0.0:
        dh = jnp.where(keep_a, dh / (1.0 - act_rate), 0.0)
    act = _gelu_tanh if tanh else _gelu_exact
    grad_fn = _gelu_tanh_grad if tanh else _gelu_grad_kernel
    dpre = dh * grad_fn(pre_ref[...])
    dpre_ref[...] = dpre.astype(dpre_ref.dtype)
    h = act(pre)
    if act_rate > 0.0:
        h = jnp.where(keep_a, h / (1.0 - act_rate), 0.0)
    h_ref[...] = h.astype(h_ref.dtype)
    # Per-block vector-grad partials; mask rows past n (tail rows of the last block read
    # undefined padding and these are reductions). 8-row broadcast: Pallas wants
    # 8-sublane output blocks; the caller reads row 0 of each partial.
    rows = ds.shape[0]
    rid = pl.program_id(0) * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    live = rid < n
    dprem = jnp.where(live, dpre, 0.0)
    dhidm = jnp.where(live, dhid, 0.0)
    gm = jnp.where(live, g, 0.0)
    sm = jnp.where(live, shat, 0.0)
    db1_ref[...] = jnp.broadcast_to(jnp.sum(dprem, axis=0, keepdims=True), db1_ref.shape)
    db2_ref[...] = jnp.broadcast_to(jnp.sum(dhidm, axis=0, keepdims=True), db2_ref.shape)
    dsc_ref[...] = jnp.broadcast_to(jnp.sum(gm * sm, axis=0, keepdims=True), dsc_ref.shape)
    dbi_ref[...] = jnp.broadcast_to(jnp.sum(gm, axis=0, keepdims=True), dbi_ref.shape)


def _row_spec(rows, c):
    return pl.BlockSpec((rows, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)


def _const_spec(r, c):
    return pl.BlockSpec((r, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)


def _part_spec(r, c):
    return pl.BlockSpec((1, r, c), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)


def ffn_block_fwd(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                  b2: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                  seed: jnp.ndarray, act_rate: float, hid_rate: float,
                  eps: float = 1e-5, interpret: bool = False):
    """One-pass FFN sublayer forward over ``[N, D]`` rows.

    Returns ``(y, s, pre)`` — the normalised output, the compute-dtype residual sum and
    the W1 pre-activation (the latter two are the backward's residuals, exactly what the
    decomposed path materialises for autodiff).
    """
    n, d = x.shape
    f = w1.shape[1]
    rows = _block_rows(n)
    tanh = _tanh_act(x.dtype)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    dt = x.dtype
    grid = -(-n // rows)
    return pl.pallas_call(
        partial(_fwd_kernel, act_rate=act_rate, hid_rate=hid_rate, eps=eps, tanh=tanh),
        name=f"ffn_mega_fwd_ra{act_rate}_rh{hid_rate}_rows{rows}_tanh{int(tanh)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[_row_spec(rows, d),          # x
                      _const_spec(d, f),           # w1 (VMEM-resident)
                      _const_spec(1, f),           # b1
                      _const_spec(f, d),           # w2 (VMEM-resident)
                      _const_spec(1, d),           # b2
                      _const_spec(1, d),           # ln scale
                      _const_spec(1, d)],          # ln bias
            out_specs=(_row_spec(rows, d), _row_spec(rows, d), _row_spec(rows, f)),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, d), dt),
                   jax.ShapeDtypeStruct((n, d), dt),
                   jax.ShapeDtypeStruct((n, f), dt)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, x, w1.astype(dt), b1.reshape(1, f), w2.astype(dt), b2.reshape(1, d),
      scale.reshape(1, d).astype(jnp.float32), bias.reshape(1, d).astype(jnp.float32))


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def ffn_block(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
              b2: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
              seed: jnp.ndarray, act_rate: float, hid_rate: float,
              eps: float = 1e-5, interpret: bool = False) -> jnp.ndarray:
    """Differentiable one-pass FFN sublayer: ``LN(x + drop(W2 drop(gelu(W1 x))))``.

    Forward is one Pallas program (both weight matrices VMEM-resident); backward is one
    Pallas program plus the three large-k XLA dots. Parameter vector grads (b1, b2,
    scale, bias) come from per-block partials, float32.
    """
    return _vjp_fwd(x, w1, b1, w2, b2, scale, bias, seed, act_rate, hid_rate, eps,
                    interpret)[0]


def _vjp_fwd(x, w1, b1, w2, b2, scale, bias, seed, act_rate, hid_rate, eps, interpret):
    y, s, pre = ffn_block_fwd(x, w1, b1, w2, b2, scale, bias, seed, act_rate, hid_rate,
                              eps, interpret)
    return y, (x, w1, b1, w2, b2, scale, bias, s, pre, seed)


def _vjp_bwd(act_rate, hid_rate, eps, interpret, residuals, g):
    x, w1, b1, w2, b2, scale, bias, s, pre, seed = residuals
    n, d = x.shape
    f = pre.shape[1]
    rows = _block_rows(n)
    grid = -(-n // rows)
    tanh = _tanh_act(x.dtype)
    dt = x.dtype
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    ds, dhid, dpre, h, db1p, db2p, dscp, dbip = pl.pallas_call(
        partial(_bwd_kernel, act_rate=act_rate, hid_rate=hid_rate, eps=eps, tanh=tanh,
                n=n),
        name=f"ffn_mega_bwd_ra{act_rate}_rh{hid_rate}_rows{rows}_tanh{int(tanh)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[_row_spec(rows, d),          # g
                      _row_spec(rows, d),          # s
                      _row_spec(rows, f),          # pre
                      _const_spec(f, d),           # w2 (VMEM-resident)
                      _const_spec(1, d)],          # ln scale
            out_specs=(_row_spec(rows, d), _row_spec(rows, d), _row_spec(rows, f),
                       _row_spec(rows, f), _part_spec(8, f), _part_spec(8, d),
                       _part_spec(8, d), _part_spec(8, d)),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, d), dt),
                   jax.ShapeDtypeStruct((n, d), dt),
                   jax.ShapeDtypeStruct((n, f), dt),
                   jax.ShapeDtypeStruct((n, f), dt),
                   jax.ShapeDtypeStruct((grid, 8, f), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 8, d), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 8, d), jnp.float32),
                   jax.ShapeDtypeStruct((grid, 8, d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, g.astype(dt), s, pre, w2.astype(dt),
      scale.reshape(1, d).astype(jnp.float32))
    # The large-k dots stay in XLA (162-190 TF/s lowerings).
    dx = jnp.dot(dpre, w1.astype(dt).T).astype(dt) + ds
    dw1 = jnp.dot(x.T, dpre).astype(w1.dtype)
    dw2 = jnp.dot(h.T, dhid).astype(w2.dtype)
    db1 = db1p[:, 0, :].sum(axis=0).astype(b1.dtype)
    db2 = db2p[:, 0, :].sum(axis=0).astype(b2.dtype)
    dsc = dscp[:, 0, :].sum(axis=0).astype(scale.dtype)
    dbi = dbip[:, 0, :].sum(axis=0).astype(bias.dtype)
    return (dx, dw1, db1, dw2, db2, dsc, dbi, jnp.zeros_like(seed))


ffn_block.defvjp(_vjp_fwd, _vjp_bwd)


def reference_ffn_block(x, w1, b1, w2, b2, scale, bias, eps=1e-5):
    """Dropout-free XLA reference (tests): the decomposed composition's math."""
    pre = (jnp.dot(x, w1.astype(x.dtype)) + b1.astype(x.dtype))
    h = jax.nn.gelu(pre.astype(jnp.float32), approximate=False).astype(x.dtype)
    y2 = jnp.dot(h, w2.astype(x.dtype)) + b2.astype(x.dtype)
    s = (x.astype(jnp.float32) + y2.astype(jnp.float32)).astype(x.dtype)
    sf = s.astype(jnp.float32)
    mean = jnp.mean(sf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(jnp.square(sf), axis=-1, keepdims=True)
                      - jnp.square(mean), 0.0)
    y = (sf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype), s
