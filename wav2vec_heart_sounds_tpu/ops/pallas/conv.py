"""Fused strided-conv + exact-GELU Pallas kernel for the wav2vec2 feature encoder.

STATUS: opt-in only (``W2VHS_CONVFUSE=1``), measured a net loss in the full train step
across TWO configurations at B=96 on the v5e: all-k3s2-layers with XLA backward
(377.8 w/s), and conv_1-only with the fully-fused Pallas backward below (377.7 w/s),
vs 406.1 w/s for plain XLA convs on the tile-aligned plan. The kernel wins in isolation
(1.57x on the conv alone) and conv_1 is XLA's weakest lowering (~63 TF/s vs 135-160 on
the shorter layers), but the ``custom_vjp`` boundary breaks XLA's surrounding fusions
(GroupNorm backward, GELU-gradient prologues) and materialises ``pre``/``dpre`` in HBM —
a constant ~17 ms/step penalty that outweighs any in-kernel win. Kept (with tests) as
working infrastructure and as a negative result worth not re-learning.

Why it was tried: XLA lowers the encoder's k=3 / stride-2 512-channel convolutions (reference consumes
them through HF transformers, src/mpcg_wav2vec/classify/wav2vec.py:48) at ~15% MFU — the
conv1 forward alone profiled at 16.3 ms/step of a 228 ms B=96 train step. Expressed as
phase-split matmuls (``y[t] = x[2t..2t+1] @ W01 + x[2t+2] @ W2``) the same math runs at
full MXU rate, but doing the phase split with XLA ops materialises a [B, T/2, 2C] frame
view in HBM — a tile-crossing physical reshape that profiled at 6.6 ms per tensor. This
kernel forms the frame view *in VMEM* (free reindexing), runs the two matmuls with float32
accumulation, and applies the exact (erf) GELU epilogue in-register, so HBM sees only x,
the pre-activation (saved for backward), and the GELU output.

The shifted-by-one-frame tap (x[2t+2]) is fed through a second, 8-row haloed input ref so
blocks never overlap; :func:`wav2vec_heart_sounds_tpu.models.wav2vec2.conv_time_plan`
guarantees the halo stays in bounds (``P_in >= 2*P_out + 8``).

Backward (fully fused, ``_bwd_kernel``): dpre in-register from a pre/g halo read, dx as
non-overlapping shifted-dpre frame matmuls, dW as per-batch-group partial sums reduced by
the caller (a single globally-revisited dW block measured ~2x slower than XLA's
conv-grad; per-group partials along the inner grid dimension pipeline properly). Even so,
the whole fused path loses in-model — see STATUS above.

Numerics: matmuls in the input dtype (bf16 on TPU) with float32 accumulation — the same
contract as the XLA conv — and the erf-based GELU, so the aligned-path parity tests hold.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = float(np.sqrt(2.0))
_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs error 1.5e-7; Mosaic has no erf).

    The 1.5e-7 deviation from XLA's erf is two orders of magnitude below the aligned-path
    parity bar (1e-5) and vanishes against bf16 activation rounding.
    """
    sign = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-a * a))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf_approx(x / _SQRT2))


def gelu_grad(x):
    """d/dx gelu(x) = Phi(x) + x * phi(x) (exact erf, float32) — for XLA-side use."""
    x = x.astype(jnp.float32)
    return 0.5 * (1.0 + jax.lax.erf(x / _SQRT2)) \
        + x * jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI


def _gelu_grad_kernel(x):
    """gelu'(x) with the rational erf (Mosaic has no erf primitive)."""
    x = x.astype(jnp.float32)
    return 0.5 * (1.0 + _erf_approx(x / _SQRT2)) \
        + x * jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI


_TANH_K0 = 0.7978845608028654    # sqrt(2/pi)
_TANH_K1 = 0.044715


def _gelu_tanh(x):
    """tanh-approximate GELU (|err| vs erf < 1e-3 — below one bf16 ulp at unit scale).

    The erf rational costs exp + divide per element; tanh is a single VPU
    transcendental. Measured on the conv cascade (models/wav2vec2._cascade_gelu):
    the switch was worth ~45 w/s at B=96."""
    x = x.astype(jnp.float32)
    u = _TANH_K0 * (x + _TANH_K1 * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(x):
    """d/dx of the tanh-approximate GELU (consistent with _gelu_tanh, not erf)."""
    x = x.astype(jnp.float32)
    u = _TANH_K0 * (x + _TANH_K1 * x * x * x)
    th = jnp.tanh(u)
    du = _TANH_K0 * (1.0 + 3.0 * _TANH_K1 * x * x)
    return 0.5 * (1.0 + th) + 0.5 * x * (1.0 - th * th) * du


def _frames(xm, xh, bg: int, bt: int, cin: int):
    """2D frame views of a [bg, 2bt, C] block (+8-row halo): f [bg*bt, 2C], f2 [bg*bt, C]."""
    f = xm.reshape(bg * bt, 2 * cin)
    shifted = jnp.concatenate([xm[:, 2:, :], xh[:, :2, :]], axis=1)
    f2 = shifted.reshape(bg, bt, 2 * cin)[:, :, :cin].reshape(bg * bt, cin)
    return f, f2


def _fwd_kernel(xm_ref, xh_ref, w01_ref, w2_ref, o_ref, pre_ref, *, bt: int, cin: int):
    bg = xm_ref.shape[0]
    cout = o_ref.shape[-1]
    f, f2 = _frames(xm_ref[...], xh_ref[...], bg, bt, cin)
    nn_dims = (((1,), (0,)), ((), ()))
    y = jax.lax.dot_general(f, w01_ref[...], nn_dims,
                            preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(f2, w2_ref[...], nn_dims,
                                preferred_element_type=jnp.float32)
    y = y.reshape(bg, bt, cout)
    pre_ref[...] = y.astype(pre_ref.dtype)
    o_ref[...] = _gelu_exact(y).astype(o_ref.dtype)


def pick_bt(out_len: int) -> int:
    """Time block: a divisor of ``out_len`` that is a multiple of 16 (bf16 sublane tile),
    in [64, 512], nearest 128. 0 if none exists (caller falls back to XLA or pads more)."""
    best = 0
    for bt in range(64, 513, 16):
        if out_len % bt == 0 and (best == 0 or abs(bt - 128) < abs(best - 128)):
            best = bt
    return best


def _pick_block(total_b: int, total_t: int) -> tuple[int, int]:
    """(batch group, time block): ~1 GFLOP per grid step, VMEM blocks of a few MB."""
    bt = pick_bt(total_t)
    if not bt:
        return 0, 0
    bg = 1
    for cand in (8, 6, 4, 3, 2):
        if total_b % cand == 0 and cand * bt <= 1024:
            bg = cand
            break
    return bg, bt


def conv_gelu_supported(x_shape, kernel: int, stride: int, cin: int, cout: int,
                        out_len: int) -> bool:
    b, t, c = x_shape
    bg, bt = _pick_block(b, out_len)
    return (kernel == 3 and stride == 2 and c == cin and cin % 128 == 0
            and cout % 128 == 0 and bg > 0 and t % 2 == 0
            and t >= 2 * out_len + 8 and jax.default_backend() != "cpu")


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_gelu(x: jnp.ndarray, w: jnp.ndarray, out_len: int,
              interpret: bool = False) -> jnp.ndarray:
    """``gelu(strided_conv(x, w))`` for kernel 3 / stride 2: [B, T, C] -> [B, out_len, Co].

    ``w`` is the flax conv kernel [3, C, Co]. Check :func:`conv_gelu_supported` first.
    """
    return _conv_gelu_fwd(x, w, out_len, interpret)[0]


def _specs(bg, bt, cin):
    xm = pl.BlockSpec((bg, 2 * bt, cin), lambda b, i: (b, i, 0),
                      memory_space=pltpu.VMEM)
    # halo: the 8 rows right after this block's 2*bt rows, expressed in 8-row block units
    xh = pl.BlockSpec((bg, 8, cin), lambda b, i: (b, (i + 1) * (2 * bt // 8), 0),
                      memory_space=pltpu.VMEM)
    return xm, xh


def _conv_gelu_fwd(x, w, out_len, interpret=False):
    b, t, cin = x.shape
    cout = w.shape[-1]
    bg, bt = _pick_block(b, out_len)
    grid = (b // bg, out_len // bt)
    w = w.astype(x.dtype)
    w01 = w[:2].reshape(2 * cin, cout)
    w2 = w[2]
    xm, xh = _specs(bg, bt, cin)
    wspec = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, out_len, cout), x.dtype)
    out, pre = pl.pallas_call(
        partial(_fwd_kernel, bt=bt, cin=cin),
        grid=grid,
        in_specs=[xm, xh, wspec((2 * cin, cout)), wspec((cin, cout))],
        out_specs=(pl.BlockSpec((bg, bt, cout), lambda bb, ii: (bb, ii, 0),
                                memory_space=pltpu.VMEM),) * 2,
        out_shape=(out_shape, out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, _pad_front(x, t), w01, w2)
    return out, (x, w, pre)


def _pad_front(x, t):
    # The halo ref indexes past the main block; it reads the same array. (Separate name
    # kept for clarity — pallas allows passing the same array to two refs.)
    return x


def _bwd_kernel(xm_ref, xh_ref, pre_ref, g_ref, preh_ref, gh_ref, w01t_ref, w2t_ref,
                dx_ref, dwp_ref, *, bt: int, cin: int):
    """One pass over an output block: dpre in-register, dx frames, dW partial sums.

    dx frame u = dpre[u] @ W01^T  (+ dpre[u-1] @ W2^T into its first C columns) — the
    stride-2 overlap is folded into a *shifted read* of dpre (one-row halo from the
    previous block), so dx writes never overlap. dW accumulates per batch-group into
    ``dwp_ref`` across the (inner, sequential) time grid dimension; the caller reduces
    the [B/bg, 3C, Co] partials — revisiting one VMEM block along the innermost
    dimension pipelines, unlike a single globally-revisited block (measured ~2x slower).
    """
    bg = xm_ref.shape[0]
    cout = pre_ref.shape[-1]
    i = pl.program_id(1)

    dpre = (g_ref[...].astype(jnp.float32) * _gelu_grad_kernel(pre_ref[...]))
    dpre_c = dpre.astype(xm_ref.dtype)

    # Previous output row's dpre (for the x[2t+2] tap): last halo row, zero at t == 0.
    ph = gh_ref[:, 7:8, :].astype(jnp.float32) * _gelu_grad_kernel(preh_ref[:, 7:8, :])
    ph = jnp.where(i == 0, 0.0, ph)
    prev = jnp.concatenate([ph.astype(dpre_c.dtype), dpre_c[:, :-1, :]], axis=1)

    nn_dims = (((1,), (0,)), ((), ()))
    dxf = jax.lax.dot_general(dpre_c.reshape(bg * bt, cout), w01t_ref[...], nn_dims,
                              preferred_element_type=jnp.float32)       # [bg*bt, 2C]
    dx2 = jax.lax.dot_general(prev.reshape(bg * bt, cout), w2t_ref[...], nn_dims,
                              preferred_element_type=jnp.float32)       # [bg*bt, C]
    # static-slice concat, not .at[].add (Mosaic has no scatter-add)
    dxf = jnp.concatenate([dxf[:, :cin] + dx2, dxf[:, cin:]], axis=1)
    dx_ref[...] = dxf.reshape(bg, 2 * bt, cin).astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dwp_ref[...] = jnp.zeros_like(dwp_ref)

    f, f2 = _frames(xm_ref[...], xh_ref[...], bg, bt, cin)
    tn_dims = (((0,), (0,)), ((), ()))                                  # f^T @ dpre
    dw01 = jax.lax.dot_general(f, dpre_c.reshape(bg * bt, cout), tn_dims,
                               preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(f2, dpre_c.reshape(bg * bt, cout), tn_dims,
                              preferred_element_type=jnp.float32)
    dwp_ref[0] += jnp.concatenate([dw01, dw2], axis=0)                  # [3C, Co]


def _conv_gelu_bwd(out_len, interpret, residuals, grad_out):
    x, w, pre = residuals
    b, t, cin = x.shape
    cout = w.shape[-1]
    bg, bt = _pick_block(b, out_len)
    grid = (b // bg, out_len // bt)
    wd = w.astype(x.dtype)
    w01t = wd[:2].reshape(2 * cin, cout).T                # [Co, 2C]
    w2t = wd[2].T                                          # [Co, C]
    g = grad_out

    xm, xh = _specs(bg, bt, cin)
    oblk = lambda c: pl.BlockSpec((bg, bt, c), lambda bb, ii: (bb, ii, 0),
                                  memory_space=pltpu.VMEM)
    # dpre halo: the 8 rows just before this block (clamped at the start; masked in-kernel)
    hblk = pl.BlockSpec((bg, 8, cout),
                        lambda bb, ii: (bb, jnp.maximum(ii * (bt // 8) - 1, 0), 0),
                        memory_space=pltpu.VMEM)
    wspec = lambda shape: pl.BlockSpec(shape, lambda bb, ii: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    dx_main, dwp = pl.pallas_call(
        partial(_bwd_kernel, bt=bt, cin=cin),
        grid=grid,
        in_specs=[xm, xh, oblk(cout), oblk(cout), hblk, hblk,
                  wspec((cout, 2 * cin)), wspec((cout, cin))],
        out_specs=(pl.BlockSpec((bg, 2 * bt, cin), lambda bb, ii: (bb, ii, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 3 * cin, cout), lambda bb, ii: (bb, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, 2 * out_len, cin), x.dtype),
                   jax.ShapeDtypeStruct((b // bg, 3 * cin, cout), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, x, pre, g, pre, g, w01t, w2t)

    # Tail: the one input row past 2*out_len read by the last frame's x[2t+2] tap.
    dpre_last = (g[:, -1, :].astype(jnp.float32)
                 * gelu_grad(pre[:, -1, :])).astype(x.dtype)
    tail = (dpre_last @ w2t)[:, None, :]                   # [B, 1, C] at row 2*out_len
    dx = jnp.concatenate(
        [dx_main, tail.astype(x.dtype),
         jnp.zeros((b, t - 2 * out_len - 1, cin), x.dtype)], axis=1)
    dw = dwp.sum(axis=0).reshape(3, cin, cout).astype(w.dtype)
    return dx, dw


conv_gelu.defvjp(_conv_gelu_fwd, _conv_gelu_bwd)


def reference_conv_gelu(x, w, out_len):
    """XLA reference: gelu(VALID strided conv), for tests and CPU fallback."""
    y = jax.lax.conv_general_dilated(x, w.astype(x.dtype), window_strides=(2,),
                                     padding="VALID",
                                     dimension_numbers=("NWC", "WIO", "NWC"))
    return jax.nn.gelu(y[:, :out_len], approximate=False)
