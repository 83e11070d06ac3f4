"""Fused FFN activation: bias + GELU (tanh default in bf16) + hardware-PRNG dropout.

Why: in the B=96 trace the `intermediate_dense` forward dot runs at ~86 TF/s while its
backward dots run at 162-190 — the erf-GELU epilogue XLA fuses into the forward matmul
stalls the MXU pipeline with VPU transcendental work. And the bias gradient is a separate
XLA reduce over the [B*T, 3072] cotangent (profiled 8.3 ms/step across 12 layers). This op
keeps the matmul clean (bias folds into the dot epilogue via XLA; fine) and runs
GELU+dropout as a row-blocked Pallas pass; the backward regenerates the dropout mask from
the same per-program seed (no stored mask), computes ``dpre = mask . dy . gelu'(pre)`` and
accumulates per-block bias-grad partials in the same pass — so the standalone reduce and
the dropout-backward pass disappear. dx/dW remain plain XLA dots (their lowerings are
already near peak).

Numerics: when the compute dtype is bfloat16 the in-kernel GELU defaults to the tanh
approximation (|err| vs erf < 1e-3, below one bf16 ulp at unit magnitude; measured
+5.7 w/s on the full B=96 train step — W2VHS_FFN_TANH=0 restores the Abramowitz-Stegun
rational erf, max err 1.5e-7). Float32 compute always uses the rational erf: at f32
resolution the tanh form's ~1e-3 error is 4 decades above the 1.5e-7 rational, so the
dtype gate (same rule as models.wav2vec2._cascade_gelu) preserves f32 parity paths.
The non-kernel paths (CPU, eval) use XLA's exact erf.
Parameter layout matches ``nn.Dense`` ("kernel" [in, out], "bias" [out]) so checkpoint
trees are unchanged (see models.wav2vec2.FusedDenseGeluDropout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .conv import _gelu_exact, _gelu_grad_kernel, _gelu_tanh, _gelu_tanh_grad


def _tanh_act(dtype) -> bool:
    """Use the tanh-approximate GELU inside the FFN kernel (bf16 default; W2VHS_FFN_TANH=0 restores erf).

    The 12 layers evaluate ~708M FFN GELUs per B=96 step (plus gradients); the same
    erf->tanh switch was the round's biggest win on the conv cascade (~45 w/s for
    ~1.26B GELUs). |err| vs erf < 1e-3 — below one bf16 ulp at unit magnitude, which is
    why the default is gated on the compute dtype: f32 runs keep the 1.5e-7 rational erf
    (the tanh error would be 4 decades above f32 resolution), same rule as
    models.wav2vec2._cascade_gelu. Full-step A/B on hardware: erf 560.6 w/s -> tanh
    566.2 w/s (B=96 bf16 headline config); eval and CPU paths keep XLA's exact erf."""
    import os

    return dtype == jnp.bfloat16 and os.environ.get("W2VHS_FFN_TANH", "1") == "1"


def _block_rows(n: int, c: int) -> int:
    """Row block under a ~6 MB VMEM budget (~20 bytes/element live across in/out/f32).

    A 12 MB budget (2x blocks) measured neutral-to-slightly-worse in-model (514.9 vs
    516.5 w/s), so the smaller block stays; the calls carry a 64 MB scoped-vmem limit
    for headroom. W2VHS_FFN_VMEM_MB overrides for block-size A/B sweeps."""
    import os

    budget = int(os.environ.get("W2VHS_FFN_VMEM_MB", "6")) * 1024 * 1024
    rows = max(8, min(n, budget // max(1, c * 20)))
    return max(8, (rows // 8) * 8)


def _keep(shape, rate: float):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = np.uint32(min(1.0, rate) * np.iinfo(np.uint32).max)
    return bits >= threshold


def _fwd_kernel(seed_ref, pre_ref, y_ref, *, rate: float, tanh: bool = False):
    if rate > 0.0:  # prng_seed is TPU-only; rate==0 paths must stay interpret-runnable
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    act = _gelu_tanh if tanh else _gelu_exact
    h = act(pre_ref[...].astype(jnp.float32))
    if rate > 0.0:
        h = jnp.where(_keep(h.shape, rate), h / (1.0 - rate), 0.0)
    y_ref[...] = h.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, g_ref, pre_ref, dpre_ref, dbp_ref, *, rate: float, n: int,
                tanh: bool = False):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    g = g_ref[...].astype(jnp.float32)
    if rate > 0.0:
        g = jnp.where(_keep(g.shape, rate), g / (1.0 - rate), 0.0)
    grad_fn = _gelu_tanh_grad if tanh else _gelu_grad_kernel
    dpre = g * grad_fn(pre_ref[...])
    dpre_ref[...] = dpre.astype(dpre_ref.dtype)
    # Partial bias grad. Mask rows past n: the final block's tail rows read undefined
    # padding (OOB *writes* are dropped by Pallas, but this *reduction* would sum them).
    rows = dpre.shape[0]
    rid = pl.program_id(0) * rows + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    dpre = jnp.where(rid < n, dpre, 0.0)
    # broadcast over the 8-row block (Pallas requires 8-sublane output blocks; the
    # caller reads row 0 of each partial)
    dbp_ref[...] = jnp.broadcast_to(jnp.sum(dpre, axis=0, keepdims=True),
                                    dbp_ref.shape)


def _row_specs(rows, c):
    return pl.BlockSpec((rows, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)


def gelu_dropout_supported() -> bool:
    return jax.default_backend() != "cpu"


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def dense_gelu_dropout(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                       seed: jnp.ndarray, rate: float,
                       interpret: bool = False) -> jnp.ndarray:
    """``dropout(gelu(x @ w + b))`` over ``[N, C_in]`` rows with the fused Pallas pass."""
    return _fwd(x, w, b, seed, rate, interpret)[0]


def _fwd(x, w, b, seed, rate, interpret):
    pre = jnp.dot(x, w.astype(x.dtype)) + b.astype(x.dtype)
    n, c = pre.shape
    rows = _block_rows(n, c)
    tanh = _tanh_act(pre.dtype)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    y = pl.pallas_call(
        partial(_fwd_kernel, rate=rate, tanh=tanh),
        # rate lives only in the kernel closure — the name pins it for the AOT cache key
        # (utils/aot.py strips backend_config payloads).
        name=f"ffn_act_fwd_r{rate}_rows{rows}_tanh{int(tanh)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(-(-n // rows),),
            in_specs=[_row_specs(rows, c)],
            out_specs=_row_specs(rows, c),
        ),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, pre)
    return y, (x, w, pre, seed)


def _bwd(rate, interpret, residuals, g):
    x, w, pre, seed = residuals
    n, c = pre.shape
    rows = _block_rows(n, c)
    grid = -(-n // rows)
    tanh = _tanh_act(pre.dtype)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    dpre, dbp = pl.pallas_call(
        partial(_bwd_kernel, rate=rate, n=n, tanh=tanh),
        name=f"ffn_act_bwd_r{rate}_rows{rows}_tanh{int(tanh)}",
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[_row_specs(rows, c)] * 2,
            out_specs=(_row_specs(rows, c),
                       pl.BlockSpec((1, 8, c), lambda i, *_: (i, 0, 0),
                                    memory_space=pltpu.VMEM)),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, c), x.dtype),
                   jax.ShapeDtypeStruct((grid, 8, c), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, g, pre)
    db = dbp[:, 0, :].sum(axis=0).astype(w.dtype)
    dx = jnp.dot(dpre, w.astype(dpre.dtype).T)
    dw = jnp.dot(x.T, dpre).astype(w.dtype)
    return dx, dw, db, jnp.zeros_like(seed)


dense_gelu_dropout.defvjp(_fwd, _bwd)


def reference_dense_gelu_dropout(x, w, b, key, rate):
    """XLA reference for tests: same mask semantics via bernoulli (different RNG)."""
    pre = jnp.dot(x, w.astype(x.dtype)) + b.astype(x.dtype)
    h = jax.nn.gelu(pre, approximate=False)
    if rate > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - rate, h.shape)
        h = jnp.where(keep, h / (1.0 - rate), 0.0)
    return h
