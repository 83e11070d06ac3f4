"""AOT executable cache: compile-once / load-later contract on the CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2vec_heart_sounds_tpu.utils.aot import cached_compile, _key

pytestmark = pytest.mark.fast


def test_cached_compile_roundtrip(tmp_path):
    f = jax.jit(lambda x: jnp.sin(x).sum())
    x = jnp.arange(8.0)
    c1 = cached_compile(f, x, cache_dir=tmp_path)
    v1 = float(c1(x))
    files = list(tmp_path.glob("*.pjrt"))
    if not files:
        pytest.skip("executable serialization unsupported on this backend")
    # second call must hit the cache (same key) and agree numerically; if the host can't
    # execute the blob (XLA:CPU embeds compile-machine ISA features) the self-healing
    # path recompiles and removes the entry — both outcomes must agree numerically
    c2 = cached_compile(f, x, cache_dir=tmp_path)
    v2 = float(c2(x))
    np.testing.assert_allclose(v1, v2, rtol=1e-6)
    assert len(list(tmp_path.glob("*.pjrt"))) <= 1


def test_key_tracks_program_and_shapes():
    f = jax.jit(lambda x: x * 2)
    g = jax.jit(lambda x: x * 3)
    x8 = jnp.arange(8.0)
    x16 = jnp.arange(16.0)
    kind = getattr(jax.devices()[0], "device_kind", "cpu")
    kf = _key(f.lower(x8).as_text(), "cpu", kind)
    assert kf != _key(g.lower(x8).as_text(), "cpu", kind)      # different program
    assert kf != _key(f.lower(x16).as_text(), "cpu", kind)     # different shape
    assert kf == _key(jax.jit(lambda x: x * 2).lower(x8).as_text(), "cpu", kind)  # stable


def test_fallback_on_unlowerable():
    def plain(x):
        return x + 1
    # not a jit-wrapped function: .lower is missing -> falls back to the callable itself
    out = cached_compile(plain, jnp.ones(3))
    assert out is plain


def test_aot_jit_passthrough_and_statics():
    from wav2vec_heart_sounds_tpu.utils.aot import aot_jit

    calls = []

    def f(x, scale=2):
        calls.append(scale)
        return x * scale

    g = aot_jit(f, static_argnames=("scale",))
    x = jnp.arange(4.0)
    np.testing.assert_allclose(np.asarray(g(x)), np.asarray(x) * 2)
    np.testing.assert_allclose(np.asarray(g(x, scale=3)), np.asarray(x) * 3)
    np.testing.assert_allclose(np.asarray(g(x, 3)), np.asarray(x) * 3)  # positional static
    # CPU backend: plain jit passthrough retraces per static value, result correctness only
    assert g.__wrapped__ is not None


def test_prune_lru(tmp_path, monkeypatch):
    from wav2vec_heart_sounds_tpu.utils.aot import _prune
    import os as _os
    import time as _time

    monkeypatch.setenv("W2VHS_AOT_LIMIT_GB", str(3 / (1 << 30)))  # 3-byte cap
    old = tmp_path / "old.pjrt"
    new = tmp_path / "new.pjrt"
    old.write_bytes(b"xx")
    _time.sleep(0.01)
    new.write_bytes(b"yy")
    _os.utime(old, (0, 0))                 # force old mtime
    _prune(tmp_path, keep=new)
    assert not old.exists() and new.exists()


def test_cached_compile_signature_fallback(tmp_path):
    """A cached executable pinned to one signature must route other shapes/dtypes back
    to the jit instead of raising (regression: eval step warmed from an int16-wire
    train batch, then fed float32 eval batches)."""
    f = jax.jit(lambda x: (x * 2).sum())
    xi = jnp.arange(6, dtype=jnp.int32)
    xf = jnp.arange(8, dtype=jnp.float32)
    c = cached_compile(f, xi, cache_dir=tmp_path)
    np.testing.assert_allclose(float(c(xi)), 30.0)
    np.testing.assert_allclose(float(c(xf)), 56.0)   # different shape AND dtype


def test_compiler_options_parse_and_key(monkeypatch):
    """W2VHS_COMPILER_OPTIONS parses k=v lists (whitespace-tolerant, non-pairs dropped)
    and participates in the cache key, so an option change never reuses a stale blob."""
    from wav2vec_heart_sounds_tpu.utils import aot

    monkeypatch.delenv("W2VHS_COMPILER_OPTIONS", raising=False)
    assert aot._compiler_options() is None
    f = jax.jit(lambda x: x * 2)
    hlo = f.lower(jnp.arange(8.0)).as_text()
    kind = getattr(jax.devices()[0], "device_kind", "cpu")
    k_plain = _key(hlo, "cpu", kind)
    monkeypatch.setenv("W2VHS_COMPILER_OPTIONS",
                       "xla_tpu_scoped_vmem_limit_kib=65536, noise")
    assert aot._compiler_options() == {"xla_tpu_scoped_vmem_limit_kib": "65536"}
    assert _key(hlo, "cpu", kind) != k_plain
