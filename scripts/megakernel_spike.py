"""Megakernel spike (round-5 verdict follow-through): measure whether fusing a WHOLE
encoder FFN sublayer into one Pallas pass beats the production decomposed path.

Production FFN sublayer = XLA W1 dot -> Pallas GELU+dropout (ops/pallas/ffn.py) ->
XLA W2 dot -> Pallas dropout+add+LN (ops/pallas/resid.py): five HBM round trips of the
[N, 3072] intermediate per layer forward. The megakernel (ops/pallas/megakernel.py)
keeps both weight matrices VMEM-resident and streams rows: x in once, y + s out once.

Usage:
    python scripts/megakernel_spike.py            # correctness + timing on the default backend
    python scripts/megakernel_spike.py --layers=12 --steps=30
    python scripts/megakernel_spike.py --verify   # exact-mask gradient pin (TPU)

``--verify`` dumps the kernel's actual dropout masks with a replica draw kernel (the
(seed, program id, draw order, shape) discipline reproduces bit-exactly across
programs — probed directly on hardware), rebuilds the sublayer in plain XLA with those
masks, and pins every ffn_block gradient against XLA autodiff. This is the rigorous
form of the finite-difference check (whose f32 numerator noise at these loss
magnitudes is several percent).

Prints one JSON line per arm; the A/B of record goes to PERF.md "Megakernel spike".
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # The axon sitecustomize force-selects jax_platforms="axon,cpu"; undo it so
        # --rows-limited CPU correctness runs stay off the tunnel (tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from wav2vec_heart_sounds_tpu.ops.pallas.ffn import dense_gelu_dropout
    from wav2vec_heart_sounds_tpu.ops.pallas.megakernel import (ffn_block_fwd,
                                                                reference_ffn_block)
    from wav2vec_heart_sounds_tpu.ops.pallas.resid import dropout_add_layernorm

    layers, steps, n_rows, verify = 12, 30, 96 * 200, False
    for arg in sys.argv[1:]:
        if arg.startswith("--layers="):
            layers = int(arg.split("=", 1)[1])
        elif arg.startswith("--steps="):
            steps = int(arg.split("=", 1)[1])
        elif arg.startswith("--rows="):
            n_rows = int(arg.split("=", 1)[1])
        elif arg == "--verify":
            verify = True

    if verify:
        return _verify_grads()

    d, f = 768, 3072
    on_tpu = jax.default_backend() != "cpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(n_rows, d)) * 0.5, dt)
    w1 = jnp.asarray(rng.normal(size=(d, f)) * (1.0 / np.sqrt(d)), dt)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, d)) * (1.0 / np.sqrt(f)), dt)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    bias = jnp.asarray(0.01 * rng.normal(size=(d,)), jnp.float32)

    # --- correctness (dropout off; same-math reference) -------------------------------
    interp = not on_tpu
    y_mega, s_mega, _pre = jax.jit(lambda x: ffn_block_fwd(
        x, w1, b1, w2, b2, scale, bias, jnp.zeros((), jnp.int32), 0.0, 0.0,
        interpret=interp))(x0)
    y_ref, s_ref = jax.jit(lambda x: reference_ffn_block(
        x, w1, b1, w2, b2, scale, bias))(x0)
    ey = jnp.abs(y_mega.astype(jnp.float32) - y_ref.astype(jnp.float32))
    err = float(jnp.max(ey))
    # bf16: Mosaic and XLA dots tile the k-dimension differently, so f32 accumulation
    # order differs and the bf16-rounded products disagree in the last bit (measured on
    # hardware: s max-err exactly 1 ulp at |s|~2, y mean-err 1.6e-3, 0.01% of elements
    # >0.02 after LN amplification; tanh-vs-erf GELU changes nothing). The bar bounds
    # that ulp noise, not algorithmic error; f32 interpret mode must be ~exact.
    bar = 0.1 if dt == jnp.bfloat16 else 1e-4
    err_mean = float(jnp.mean(ey))
    print(json.dumps({"check": "ffn_mega_vs_reference", "max_abs_err": err,
                      "mean_abs_err": err_mean,
                      "dtype": str(dt.__name__ if hasattr(dt, '__name__') else dt),
                      "pass": err < bar}), flush=True)
    if err >= bar or not on_tpu:
        return

    rate_a, rate_h = 0.1, 0.1

    def decomposed_stack(x, seed0):
        for i in range(layers):
            h = dense_gelu_dropout(x, w1, b1, seed0 + 2 * i, rate_a)
            y2 = (jnp.dot(h, w2) + b2.astype(dt))
            x = dropout_add_layernorm(y2, x, scale, bias, seed0 + 2 * i + 1, rate_h)
        return x

    def mega_stack(x, seed0):
        for i in range(layers):
            x, _, _ = ffn_block_fwd(x, w1, b1, w2, b2, scale, bias, seed0 + i,
                                    rate_a, rate_h)
        return x

    def time_arm(name, fn):
        jitted = jax.jit(fn)
        seed = jnp.asarray(1, jnp.int32)
        out = jitted(x0, seed)                       # compile
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(steps):
            out = jitted(x0 * (1.0 + 1e-6 * i), seed + i)
        float(np.asarray(jax.device_get(out)).ravel()[0])
        dtms = (time.perf_counter() - t0) / steps * 1e3
        print(json.dumps({"arm": name, "layers": layers, "rows": n_rows,
                          "ms_per_step": round(dtms, 3),
                          "ms_per_layer": round(dtms / layers, 4),
                          "backend": jax.default_backend()}), flush=True)
        return dtms

    t_dec = time_arm("decomposed", decomposed_stack)
    t_meg = time_arm("megakernel", mega_stack)
    print(json.dumps({"speedup_fwd": round(t_dec / t_meg, 3),
                      "saved_ms_per_step_12layer": round((t_dec - t_meg) * 12 / layers, 3)}),
          flush=True)


def _verify_grads():
    """Pin every ffn_block gradient against masked-XLA autodiff on hardware."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from wav2vec_heart_sounds_tpu.ops.pallas.megakernel import _block_rows, ffn_block

    rng = np.random.default_rng(4)
    n, d, f = 512, 768, 3072
    ra, rh = 0.3, 0.2
    x = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, f)) / np.sqrt(d), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, d)) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    bias = jnp.asarray(0.01 * rng.normal(size=(d,)), jnp.float32)
    seed = jnp.asarray(7, jnp.int32)

    rows = _block_rows(n)
    thr_a = np.uint32(ra * np.iinfo(np.uint32).max)
    thr_h = np.uint32(rh * np.iinfo(np.uint32).max)

    def kdump(seed_ref, ma_ref, mh_ref):
        # exact replica of megakernel._masks: one reseed, act draw then hid draw
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        ka = pltpu.bitcast(pltpu.prng_random_bits((ma_ref.shape[0], f)),
                           jnp.uint32) >= thr_a
        kh = pltpu.bitcast(pltpu.prng_random_bits((mh_ref.shape[0], d)),
                           jnp.uint32) >= thr_h
        ma_ref[...] = jnp.where(ka, 1.0, 0.0)
        mh_ref[...] = jnp.where(kh, 1.0, 0.0)

    sp = lambda c: pl.BlockSpec((rows, c), lambda i, *_: (i, 0),
                                memory_space=pltpu.VMEM)
    ma, mh = pl.pallas_call(
        kdump,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(-(-n // rows),), in_specs=[],
            out_specs=(sp(f), sp(d))),
        out_shape=(jax.ShapeDtypeStruct((n, f), jnp.float32),
                   jax.ShapeDtypeStruct((n, d), jnp.float32)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(seed.reshape(1))

    def ref_loss(x, w1, b1, w2, b2, scale, bias):
        pre = x @ w1 + b1
        h = jax.nn.gelu(pre.astype(jnp.float32), approximate=False) * ma / (1 - ra)
        y2 = h @ w2 + b2
        s = x + y2 * mh / (1 - rh)
        mean = jnp.mean(s, -1, keepdims=True)
        var = jnp.maximum(jnp.mean(s ** 2, -1, keepdims=True) - mean ** 2, 0.0)
        out = (s - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return jnp.sum(out ** 2)

    def mega_loss(x, w1, b1, w2, b2, scale, bias):
        return jnp.sum(ffn_block(x, w1, b1, w2, b2, scale, bias, seed, ra, rh) ** 2)

    args = (x, w1, b1, w2, b2, scale, bias)
    gm = jax.jit(jax.grad(mega_loss, argnums=tuple(range(7))))(*args)
    gr = jax.jit(jax.grad(ref_loss, argnums=tuple(range(7))))(*args)
    ok = True
    for nm, a, b in zip(["x", "w1", "b1", "w2", "b2", "scale", "bias"], gm, gr):
        a, b = np.asarray(a), np.asarray(b)
        rel = float(np.abs(a - b).max() / max(1e-9, np.abs(b).max()))
        ok = ok and rel < 5e-3
        print(json.dumps({"grad": nm, "max_rel_vs_masked_autodiff": rel,
                          "pass": rel < 5e-3}), flush=True)
    print(json.dumps({"verify": "ffn_block_grads", "pass": ok}), flush=True)


if __name__ == "__main__":
    main()
