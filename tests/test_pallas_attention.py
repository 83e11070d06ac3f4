"""Flash-attention kernel vs the XLA reference: forward, VJP, dropout determinism."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu.ops.pallas.attention import (
    flash_attention,
    reference_attention,
)


def _qkv(b=2, h=3, t=57, d=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    return mk(), mk(), mk()


SEED = jnp.asarray(0, jnp.int32)


def test_forward_matches_reference():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, SEED, 0.0, None, True)
    ref = reference_attention(q, k, v)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_padded_seq_matches_reference():
    q, k, v = _qkv(t=199)
    out = flash_attention(q, k, v, SEED, 0.0, None, True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_vjp_matches_autodiff():
    q, k, v = _qkv(t=40, seed=1)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, SEED, 0.0, None, True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(reference_attention(q, k, v)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


def test_dropout_deterministic_and_mean_preserving():
    q, k, v = _qkv(t=64, seed=2)
    rate = 0.3
    try:
        o1 = flash_attention(q, k, v, jnp.asarray(7, jnp.int32), rate, None, True)
    except Exception as e:  # pltpu PRNG may be unsupported in interpreter mode
        pytest.skip(f"in-kernel PRNG unavailable in interpret mode: {type(e).__name__}")
    o2 = flash_attention(q, k, v, jnp.asarray(7, jnp.int32), rate, None, True)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    o3 = flash_attention(q, k, v, jnp.asarray(8, jnp.int32), rate, None, True)
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # scaled-keep dropout preserves the expected output scale
    ref = reference_attention(q, k, v)
    assert abs(float(jnp.mean(o1)) - float(jnp.mean(ref))) < 0.1 * float(
        jnp.std(ref)) + 0.05


def test_dropout_bwd_uses_same_mask():
    q, k, v = _qkv(t=32, seed=3)
    rate = 0.25
    seed = jnp.asarray(11, jnp.int32)
    try:
        out, vjp_fn = jax.vjp(
            lambda q, k, v: flash_attention(q, k, v, seed, rate, None, True), q, k, v)
    except Exception as e:
        pytest.skip(f"in-kernel PRNG unavailable in interpret mode: {type(e).__name__}")
    g = jnp.ones_like(out)
    dq, dk, dv = vjp_fn(g)
    # finite-difference check on one coordinate of v: with the same seed/mask the kernel's
    # fwd is a deterministic function, so its analytic grad must match numerics.
    eps = 1e-3
    v_plus = v.at[0, 0, 5, 3].add(eps)
    v_minus = v.at[0, 0, 5, 3].add(-eps)
    f = lambda vv: float(jnp.sum(flash_attention(q, k, vv, seed, rate, None, True)))
    fd = (f(v_plus) - f(v_minus)) / (2 * eps)
    np.testing.assert_allclose(float(dv[0, 0, 5, 3]), fd, rtol=5e-2, atol=1e-3)


def test_bthd_layout_matches_bhtd():
    q, k, v = _qkv(t=56)
    to_bthd = lambda x: jnp.swapaxes(x, 1, 2)
    a = flash_attention(q, k, v, SEED, 0.0, None, True)
    b = flash_attention(to_bthd(q), to_bthd(k), to_bthd(v), SEED, 0.0, None, True, "bthd")
    np.testing.assert_allclose(np.asarray(to_bthd(b)), np.asarray(a), atol=2e-5)


def test_bthd_vjp_matches_autodiff():
    q, k, v = _qkv(t=40, seed=4)
    to_bthd = lambda x: jnp.swapaxes(x, 1, 2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(to_bthd(q), to_bthd(k), to_bthd(v),
                                               SEED, 0.0, None, True, "bthd")))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(to_bthd(reference_attention(q, k, v))))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


def test_packed_qkv_matches_unpacked():
    from wav2vec_heart_sounds_tpu.ops.pallas.attention import flash_attention_qkv

    q, k, v = _qkv(t=57, seed=3)
    packed = jnp.concatenate([q, k, v], axis=1)          # [B, 3H, T, d]
    out = flash_attention_qkv(packed, SEED, 0.0, None, True)
    ref = reference_attention(q, k, v)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_qkv_vjp_matches_autodiff():
    from wav2vec_heart_sounds_tpu.ops.pallas.attention import flash_attention_qkv

    q, k, v = _qkv(t=40, seed=4)
    packed = jnp.concatenate([q, k, v], axis=1)

    def loss_packed(p):
        return jnp.sum(jnp.sin(flash_attention_qkv(p, SEED, 0.0, None, True)))

    def loss_ref(p):
        h = p.shape[1] // 3
        return jnp.sum(jnp.sin(reference_attention(p[:, :h], p[:, h:2 * h], p[:, 2 * h:])))

    gp = jax.grad(loss_packed)(packed)
    gr = jax.grad(loss_ref)(packed)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=3e-5, rtol=1e-4)


def test_packed_qkv_out_bthd_matches_unpacked():
    """out_layout='bthd' emits [B, T, H, d] with identical numerics (round-4 layout work)."""
    from wav2vec_heart_sounds_tpu.ops.pallas.attention import flash_attention_qkv

    q, k, v = _qkv(t=57, seed=3)
    packed = jnp.concatenate([q, k, v], axis=1)          # [B, 3H, T, d]
    out = flash_attention_qkv(packed, SEED, 0.0, None, True, "bthd")
    ref = jnp.swapaxes(reference_attention(q, k, v), 1, 2)   # [B, T, H, d]
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_qkv_out_bthd_vjp_matches_autodiff():
    from wav2vec_heart_sounds_tpu.ops.pallas.attention import flash_attention_qkv

    q, k, v = _qkv(t=40, seed=4)
    packed = jnp.concatenate([q, k, v], axis=1)

    def loss_packed(p):
        return jnp.sum(jnp.sin(flash_attention_qkv(p, SEED, 0.0, None, True, "bthd")))

    def loss_ref(p):
        h = p.shape[1] // 3
        return jnp.sum(jnp.sin(jnp.swapaxes(
            reference_attention(p[:, :h], p[:, h:2 * h], p[:, 2 * h:]), 1, 2)))

    gp = jax.grad(loss_packed)(packed)
    gr = jax.grad(loss_ref)(packed)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=3e-5, rtol=1e-4)


def test_model_out_bthd_gate_matches_default(monkeypatch):
    """The W2VHS_ATTN_OUT=bthd model path is numerically identical to the default.

    CPU falls back to the reference einsum, so exercise the packed kernel explicitly
    via interpret mode at the model's real head geometry (12 heads x 64)."""
    from wav2vec_heart_sounds_tpu.ops.pallas.attention import flash_attention_qkv

    rng = np.random.default_rng(7)
    packed = jnp.asarray(rng.normal(size=(2, 36, 24, 64)), jnp.float32)
    a = flash_attention_qkv(packed, SEED, 0.0, None, True, "bhtd")
    b = flash_attention_qkv(packed, SEED, 0.0, None, True, "bthd")
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(a, 1, 2)), np.asarray(b),
                               atol=1e-6)


def test_head_block_budget_env(monkeypatch):
    """The W2VHS_ATTN_VMEM_MB sweep knob must actually change the head block."""
    from wav2vec_heart_sounds_tpu.ops.pallas.attention import _head_block, _pad_len

    tp = _pad_len(200)          # wav2vec2 CinC frame count
    monkeypatch.delenv("W2VHS_ATTN_VMEM_MB", raising=False)
    default_hb = _head_block(12, tp)
    assert 12 % default_hb == 0
    assert default_hb * 7 * tp * tp * 4 <= 10 * 1024 * 1024
    monkeypatch.setenv("W2VHS_ATTN_VMEM_MB", "16")
    assert _head_block(12, tp) == 12    # all heads in one program
    assert _head_block(12, tp) != default_hb


def test_defer_norm_matches_reference(monkeypatch):
    """W2VHS_ATTN_DN=1 (normalisation deferred to the [H,T,d] output) is numerics-neutral."""
    monkeypatch.setenv("W2VHS_ATTN_DN", "1")
    q, k, v = _qkv(t=57, seed=5)
    out = flash_attention(q, k, v, SEED, 0.0, None, True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_defer_norm_vjp_matches_autodiff(monkeypatch):
    monkeypatch.setenv("W2VHS_ATTN_DN", "1")
    q, k, v = _qkv(t=40, seed=6)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, SEED, 0.0, None, True)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(reference_attention(q, k, v)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


def test_defer_norm_packed_qkv(monkeypatch):
    from wav2vec_heart_sounds_tpu.ops.pallas.attention import flash_attention_qkv

    monkeypatch.setenv("W2VHS_ATTN_DN", "1")
    q, k, v = _qkv(t=57, seed=7)
    packed = jnp.concatenate([q, k, v], axis=1)
    out = flash_attention_qkv(packed, SEED, 0.0, None, True)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def loss_packed(p):
        return jnp.sum(jnp.sin(flash_attention_qkv(p, SEED, 0.0, None, True)))

    def loss_ref(p):
        h = p.shape[1] // 3
        return jnp.sum(jnp.sin(reference_attention(p[:, :h], p[:, h:2 * h], p[:, 2 * h:])))

    gp = jax.grad(loss_packed)(packed)
    gr = jax.grad(loss_ref)(packed)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), atol=3e-5, rtol=1e-4)


def test_defer_norm_dropout_bwd_uses_same_mask(monkeypatch):
    """Deferred-norm dropout: same per-program mask fwd/bwd (finite-difference on v)."""
    monkeypatch.setenv("W2VHS_ATTN_DN", "1")
    q, k, v = _qkv(t=32, seed=8)
    rate = 0.25
    seed = jnp.asarray(11, jnp.int32)
    try:
        out, vjp_fn = jax.vjp(
            lambda q, k, v: flash_attention(q, k, v, seed, rate, None, True), q, k, v)
    except Exception as e:
        pytest.skip(f"in-kernel PRNG unavailable in interpret mode: {type(e).__name__}")
    g = jnp.ones_like(out)
    dq, dk, dv = vjp_fn(g)
    eps = 1e-3
    f = lambda vv: float(jnp.sum(flash_attention(q, k, vv, seed, rate, None, True)))
    fd = (f(v.at[0, 0, 5, 3].add(eps)) - f(v.at[0, 0, 5, 3].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(float(dv[0, 0, 5, 3]), fd, rtol=5e-2, atol=1e-3)
