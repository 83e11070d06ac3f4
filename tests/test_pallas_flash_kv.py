"""KV-blocked flash attention (ops/pallas/flash_kv.py) vs flax's exact softmax.

Interpreter-mode parity for forward and all three input gradients, across ragged tails
(t not a multiple of either block) and multi-block grids. The kernel backs the
beamformer's delay predictor (reference src/mpcg_wav2vec/classify/beamformer.py:19-27
semantics via torch SDPA).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax.linen.attention import dot_product_attention

from wav2vec_heart_sounds_tpu.ops.pallas.flash_kv import flash_attention_kv

@pytest.mark.parametrize("split_bwd", ["0", "1"])
@pytest.mark.parametrize("b,t,h,d,qb,kvb", [
    # The ragged-tail case is the smoke gate; the exact-fit/multi-block cases stay in
    # the full suite (each costs ~6 s of interpreter time on this 1-CPU host).
    pytest.param(2, 300, 4, 8, 256, 128, marks=pytest.mark.fast),
    (1, 700, 2, 8, 256, 256),
    (2, 512, 4, 8, 512, 512),    # single q block, exact fit
])
def test_flash_kv_matches_exact_softmax(b, t, h, d, qb, kvb, split_bwd, monkeypatch):
    monkeypatch.setenv("W2VHS_FLASHKV_SPLIT_BWD", split_bwd)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
               for _ in range(3))
    ref = dot_product_attention(q, k, v)
    out = flash_attention_kv(q, k, v, qb, kvb, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    grads = jax.grad(lambda *a: jnp.sum(jnp.cos(flash_attention_kv(*a, qb, kvb, True))),
                     argnums=(0, 1, 2))(q, k, v)
    refs = jax.grad(lambda *a: jnp.sum(jnp.cos(dot_product_attention(*a))),
                    argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(grads, refs):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.fast
@pytest.mark.parametrize("bf16_dots", ["1", "0"])
def test_flash_kv_bf16_boundary_cast(bf16_dots, monkeypatch):
    """bf16 inputs run through the f32 boundary cast and return bf16 (the vest train
    step feeds the kernel under the bf16 compute dtype). Covers both in-kernel dot
    modes: bf16 operands (gated A/B) and the exact-f32 default."""
    monkeypatch.setenv("W2VHS_FLASHKV_BF16", bf16_dots)
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 260, 2, 8)), jnp.bfloat16)
               for _ in range(3))
    out = flash_attention_kv(q, k, v, 128, 128, True)
    assert out.dtype == jnp.bfloat16
    ref = dot_product_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                                v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), np.asarray(ref),
                               atol=2e-2)
    g = jax.grad(lambda a: jnp.sum(flash_attention_kv(a, k, v, 128, 128, True)
                                   .astype(jnp.float32)))(q)
    assert g.dtype == jnp.bfloat16 and bool(jnp.isfinite(g.astype(jnp.float32)).all())


@pytest.mark.fast
def test_flash_kv_large_scale_values():
    """Online softmax is stable for scores far above exp range."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(30.0 * rng.normal(size=(1, 260, 2, 8)), jnp.float32)
    k = jnp.asarray(30.0 * rng.normal(size=(1, 260, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 260, 2, 8)), jnp.float32)
    ref = dot_product_attention(q, k, v)
    out = flash_attention_kv(q, k, v, 128, 128, True)
    assert bool(jnp.isfinite(out).all())
    # scores ~±1900: one-ULP differences in the running-max subtraction shift which
    # near-ties survive exp(); 5e-4 absorbs that without hiding real algebra bugs.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)
