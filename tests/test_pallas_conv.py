"""Fused conv+GELU kernel vs the XLA reference: forward, VJP, plan-length contract."""

import numpy as np
import jax
import jax.numpy as jnp

from wav2vec_heart_sounds_tpu.ops.pallas.conv import (
    conv_gelu,
    conv_gelu_supported,
    reference_conv_gelu,
)


def _case(b=2, t=264, cin=128, cout=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, cin)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, cin, cout)) * 0.05).astype(np.float32))
    return x, w


def test_forward_matches_reference():
    x, w = _case()
    out = conv_gelu(x, w, 128, True)
    ref = reference_conv_gelu(x, w, 128)
    assert out.shape == (2, 128, 128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_forward_multi_block_grid():
    # out_len 256 -> two time blocks; b=3 -> bg=3, one batch group
    x, w = _case(b=3, t=2 * 256 + 8, seed=1)
    out = conv_gelu(x, w, 256, True)
    ref = reference_conv_gelu(x, w, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5)


def test_vjp_matches_autodiff():
    x, w = _case(seed=2)

    def loss_fused(x, w):
        return jnp.sum(jnp.sin(conv_gelu(x, w, 128, True)))

    def loss_ref(x, w):
        return jnp.sum(jnp.sin(reference_conv_gelu(x, w, 128)))

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-4)


def test_supported_gate():
    # CPU backend in tests -> the runtime gate must refuse (the model falls back to XLA)
    assert not conv_gelu_supported((2, 264, 128), 3, 2, 128, 128, 128)
    # shape-only constraints, checked independently of backend
    x, w = _case()
    assert x.shape[1] >= 2 * 128 + 8  # plan halo contract used by the kernel


def test_plan_reserves_halo_for_fused_layers():
    from wav2vec_heart_sounds_tpu.models.wav2vec2 import conv_time_plan
    from wav2vec_heart_sounds_tpu.ops.pallas.conv import pick_bt

    kernels, strides = (10, 3, 3, 3, 3, 2, 2), (5, 2, 2, 2, 2, 2, 2)
    fused = [False, True, True, True, False, False, False]
    pad_in, padded, real = conv_time_plan(64000, kernels, strides, 8, fused=fused)
    for i in range(1, len(padded)):
        k, s = kernels[i], strides[i]
        assert padded[i] >= real[i]
        if fused[i]:
            # halo reserved, a usable time block exists, input divisible by the stride
            assert padded[i - 1] >= s * padded[i] + 8, (i, padded[i - 1], padded[i])
            assert pick_bt(padded[i]) >= 64
            assert padded[i - 1] % s == 0
        else:
            groups = -(-k // s)
            assert padded[i - 1] >= s * (padded[i] + groups - 1)
    # padding stays tight: < 4% over the real length at every fused layer
    for i, f in enumerate(fused):
        if f:
            assert padded[i] < real[i] * 1.04, (i, padded[i], real[i])
    assert pad_in < 64000 * 1.04
