"""Fused dropout+add+LayerNorm kernel vs the XLA reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu.ops.pallas.resid import (
    dropout_add_layernorm,
    reference_dropout_add_layernorm,
)

pytestmark = pytest.mark.fast

SEED = jnp.asarray(0, jnp.int32)


def _inputs(n=37, c=64, seed=0):
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(n, c)), jnp.float32)
    scale = jnp.asarray(rng.normal(loc=1.0, scale=0.1, size=(c,)), jnp.float32)
    bias = jnp.asarray(rng.normal(scale=0.1, size=(c,)), jnp.float32)
    return h, x, scale, bias


def test_forward_matches_reference_rate0():
    h, x, scale, bias = _inputs()
    out = dropout_add_layernorm(h, x, scale, bias, SEED, 0.0, 1e-5, True)
    ref = reference_dropout_add_layernorm(h, x, scale, bias, None, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_ranked_input():
    h, x, scale, bias = _inputs(n=24)
    h3 = h.reshape(2, 12, -1)
    x3 = x.reshape(2, 12, -1)
    out = dropout_add_layernorm(h3, x3, scale, bias, SEED, 0.0, 1e-5, True)
    ref = reference_dropout_add_layernorm(h3, x3, scale, bias, None, 0.0)
    assert out.shape == h3.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vjp_matches_autodiff():
    h, x, scale, bias = _inputs(seed=1)

    def loss_fused(h, x, scale, bias):
        return jnp.sum(jnp.sin(dropout_add_layernorm(h, x, scale, bias, SEED,
                                                     0.0, 1e-5, True)))

    def loss_ref(h, x, scale, bias):
        return jnp.sum(jnp.sin(reference_dropout_add_layernorm(h, x, scale, bias,
                                                               None, 0.0)))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(h, x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(h, x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)


def test_dropout_statistics_and_determinism():
    h, x, scale, bias = _inputs(n=512, c=128, seed=2)
    rate = 0.3
    try:
        o1 = dropout_add_layernorm(h, x, scale, bias, jnp.asarray(7, jnp.int32),
                                   rate, 1e-5, True)
    except Exception as e:  # pltpu PRNG may be unsupported in interpreter mode
        pytest.skip(f"in-kernel PRNG unavailable in interpret mode: {type(e).__name__}")
    o2 = dropout_add_layernorm(h, x, scale, bias, jnp.asarray(7, jnp.int32),
                               rate, 1e-5, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = dropout_add_layernorm(h, x, scale, bias, jnp.asarray(8, jnp.int32),
                               rate, 1e-5, True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
