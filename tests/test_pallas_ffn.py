"""Fused dense+GELU+dropout op vs the XLA reference: forward, VJP, bias grad."""

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_heart_sounds_tpu.ops.pallas.ffn import (
    dense_gelu_dropout,
    reference_dense_gelu_dropout,
)

SEED = jnp.asarray(0, jnp.int32)


def _case(n=48, cin=32, cout=64, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, cin)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(cin, cout)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32) * 0.1)
    return x, w, b


def test_forward_matches_reference_no_dropout(monkeypatch):
    monkeypatch.setenv("W2VHS_FFN_TANH", "0")  # pin the erf path (tanh is the default)
    x, w, b = _case()
    out = dense_gelu_dropout(x, w, b, SEED, 0.0, True)
    ref = reference_dense_gelu_dropout(x, w, b, None, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_vjp_matches_autodiff_incl_bias(monkeypatch):
    monkeypatch.setenv("W2VHS_FFN_TANH", "0")
    x, w, b = _case(seed=1)

    def loss_fused(x, w, b):
        return jnp.sum(jnp.sin(dense_gelu_dropout(x, w, b, SEED, 0.0, True)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.sin(reference_dense_gelu_dropout(x, w, b, None, 0.0)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=2e-5, rtol=1e-4)


def test_uneven_row_blocks(monkeypatch):
    monkeypatch.setenv("W2VHS_FFN_TANH", "0")
    # n not a multiple of the 8-row block granularity exercises the masked tail block
    x, w, b = _case(n=43, seed=2)
    out = dense_gelu_dropout(x, w, b, SEED, 0.0, True)
    ref = reference_dense_gelu_dropout(x, w, b, None, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6, rtol=1e-5)


def test_tanh_act_matches_tanh_reference(monkeypatch):
    """In bf16 compute the kernel defaults to the tanh GELU approximation."""
    monkeypatch.setenv("W2VHS_FFN_TANH", "1")
    x, w, b = _case(seed=3)
    x, w, b = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    out = dense_gelu_dropout(x, w, b, SEED, 0.0, True)
    pre = jnp.dot(x, w) + b
    ref = jax.nn.gelu(pre.astype(jnp.float32), approximate=True).astype(jnp.bfloat16)
    # bf16 resolution: one ulp at unit magnitude is ~8e-3
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_f32_compute_keeps_erf_even_with_tanh_default(monkeypatch):
    """The tanh default is gated on bf16 compute: f32 stays on the 1.5e-7 rational erf
    (advisor round-3 medium: f32 training must not silently drop GELU accuracy)."""
    monkeypatch.setenv("W2VHS_FFN_TANH", "1")
    x, w, b = _case(seed=3)
    out = dense_gelu_dropout(x, w, b, SEED, 0.0, True)
    pre = jnp.dot(x, w) + b
    erf_ref = jax.nn.gelu(pre, approximate=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(erf_ref), atol=2e-6, rtol=1e-5)
    # sanity: the tanh form differs from erf by more than the erf-path tolerance
    tanh_ref = jax.nn.gelu(pre, approximate=True)
    assert float(jnp.max(jnp.abs(tanh_ref - erf_ref))) > 1e-5


def test_tanh_act_vjp_matches_autodiff(monkeypatch):
    monkeypatch.setenv("W2VHS_FFN_TANH", "1")
    x, w, b = _case(seed=4)
    xb, wb, bb = (a.astype(jnp.bfloat16) for a in (x, w, b))

    def loss_fused(x, w, b):
        return jnp.sum(jnp.sin(dense_gelu_dropout(x, w, b, SEED, 0.0, True)
                               .astype(jnp.float32)))

    def loss_ref(x, w, b):
        pre = jnp.dot(x, w) + b
        return jnp.sum(jnp.sin(jax.nn.gelu(pre.astype(jnp.float32), approximate=True)
                               .astype(jnp.bfloat16).astype(jnp.float32)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(xb, wb, bb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(xb, wb, bb)
    for a, r in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(r, np.float32),
                                   atol=5e-2, rtol=5e-2)
