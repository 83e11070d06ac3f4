"""FFN-sublayer megakernel vs the XLA reference (interpret mode).

Covers the round-5 megakernel spike (ops/pallas/megakernel.py): forward exactness at
rate=0, full VJP exactness against autodiff of the same-math reference, dropout
determinism, and — the property the two-reseed design must guarantee — forward/backward
dropout-mask agreement, checked by directional finite differences at a fixed seed
(a mask mismatch between the forward and the regenerating backward would break the
finite-difference identity immediately).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu.ops.pallas.megakernel import (
    ffn_block,
    ffn_block_fwd,
    reference_ffn_block,
)

pytestmark = pytest.mark.fast

SEED = jnp.asarray(0, jnp.int32)


def _inputs(n=40, d=64, f=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)) * 0.5, jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(d, f)) / np.sqrt(d), jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, d)) / np.sqrt(f), jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(d,)) * 0.01, jnp.float32)
    scale = jnp.asarray(1.0 + 0.1 * rng.normal(size=(d,)), jnp.float32)
    bias = jnp.asarray(0.01 * rng.normal(size=(d,)), jnp.float32)
    return x, w1, b1, w2, b2, scale, bias


def test_forward_matches_reference_rate0():
    args = _inputs()
    y, s, pre = ffn_block_fwd(*args, SEED, 0.0, 0.0, 1e-5, True)
    y_ref, s_ref = reference_ffn_block(*args)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), atol=2e-5)
    # pre is the W1 pre-activation residual
    x, w1, b1 = args[0], args[1], args[2]
    np.testing.assert_allclose(np.asarray(pre), np.asarray(x @ w1 + b1), atol=2e-5)


def test_vjp_matches_autodiff_rate0():
    args = _inputs(seed=1)

    def loss_fused(*a):
        return jnp.sum(jnp.sin(ffn_block(*a, SEED, 0.0, 0.0, 1e-5, True)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(reference_ffn_block(*a)[0]))

    gf = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "w1", "b1", "w2", "b2", "scale", "bias"]
    for nm, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3,
                                   err_msg=nm)


def test_multiblock_grid_tail_rows():
    # n=40 with rows=32 exercises a 2-block grid with 24 tail pad rows; the partials
    # must mask them out of every vector grad.
    args = _inputs(n=40, seed=2)

    def loss_fused(*a):
        return jnp.sum(ffn_block(*a, SEED, 0.0, 0.0, 1e-5, True) ** 2)

    def loss_ref(*a):
        return jnp.sum(reference_ffn_block(*a)[0] ** 2)

    gf = jax.grad(loss_fused, argnums=(2, 4, 5, 6))(*args)
    gr = jax.grad(loss_ref, argnums=(2, 4, 5, 6))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-3)


def _try_dropout_forward(args, seed, ra, rh):
    try:
        return ffn_block_fwd(*args, seed, ra, rh, 1e-5, True)
    except Exception as e:  # pltpu PRNG may be unsupported in interpreter mode
        pytest.skip(f"in-kernel PRNG unavailable in interpret mode: {type(e).__name__}")


def test_dropout_determinism_and_seed_sensitivity():
    args = _inputs(n=64, seed=3)
    s7 = jnp.asarray(7, jnp.int32)
    y1, _, _ = _try_dropout_forward(args, s7, 0.3, 0.2)
    y2, _, _ = _try_dropout_forward(args, s7, 0.3, 0.2)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3, _, _ = _try_dropout_forward(args, jnp.asarray(8, jnp.int32), 0.3, 0.2)
    assert not np.allclose(np.asarray(y1), np.asarray(y3))


def test_finite_difference_with_dropout_masks():
    """Directional finite difference at rate>0, fixed seed.

    Passing requires the backward's regenerated act/hid masks to equal the forward's
    draws exactly (same seed derivation, program id and block shape); any divergence in
    the two-reseed discipline shows up as a gradient mismatch far above the tolerance.
    """
    args = _inputs(n=48, seed=4)
    s7 = jnp.asarray(7, jnp.int32)
    _try_dropout_forward(args, s7, 0.3, 0.2)     # skip early if PRNG unsupported

    def loss(x):
        return jnp.sum(ffn_block(x, *args[1:], s7, 0.3, 0.2, 1e-5, True) ** 2)

    x = args[0]
    g = jax.grad(loss)(x)
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(size=x.shape), jnp.float32)
    eps = 1e-3
    fd = (loss(x + eps * v) - loss(x - eps * v)) / (2 * eps)
    analytic = jnp.vdot(g, v)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=5e-3)
