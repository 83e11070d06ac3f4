"""Pallas sinc-delay kernel vs XLA reference: forward values and analytic VJP.

Runs the kernel in interpreter mode on CPU; on TPU the same code path compiles via Mosaic.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu.ops.pallas.beamformer import (
    delay_channel_reference,
    sinc_delay,
)

K = 41
WINDOW = tuple(float(w) for w in np.hamming(K))


def _inputs(B=2, T=300, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, T)), jnp.float32)
    delays = jnp.asarray(rng.uniform(0, 10, size=(B, T)), jnp.float32)
    return x, delays


def test_forward_matches_reference():
    x, delays = _inputs()
    ref = delay_channel_reference(x, delays, K, jnp.asarray(WINDOW, jnp.float32))
    out = sinc_delay(x, delays, K, WINDOW, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_vjp_matches_autodiff():
    x, delays = _inputs(T=200, seed=1)

    def loss_pallas(x, d):
        return jnp.sum(jnp.cos(sinc_delay(x, d, K, WINDOW, True)) ** 2)

    def loss_ref(x, d):
        return jnp.sum(jnp.cos(delay_channel_reference(
            x, d, K, jnp.asarray(WINDOW, jnp.float32))) ** 2)

    gx_p, gd_p = jax.grad(loss_pallas, argnums=(0, 1))(x, delays)
    gx_r, gd_r = jax.grad(loss_ref, argnums=(0, 1))(x, delays)
    np.testing.assert_allclose(np.asarray(gd_p), np.asarray(gd_r), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=2e-4, rtol=1e-3)


def test_zero_delay_recovers_input_region():
    """With delay 0 the normalised sinc kernel is a unit impulse -> identity."""
    x, _ = _inputs(T=256, seed=2)
    out = sinc_delay(x, jnp.zeros_like(x), K, WINDOW, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_integer_delay_shifts():
    """An integer delay d reads d samples ahead: y[t] = x[t + d] (reference semantics)."""
    B, T = 1, 300
    x = jnp.asarray(np.random.default_rng(3).normal(size=(B, T)), jnp.float32)
    d = 5.0
    out = sinc_delay(x, jnp.full((B, T), d, jnp.float32), K, WINDOW, True)
    np.testing.assert_allclose(np.asarray(out[0, 50:250]),
                               np.asarray(x[0, 55:255]), atol=1e-4)
