"""Ahead-of-time executable cache: persist compiled TPU programs across processes.

Why this exists: on relay-attached TPUs (the axon tunnel) XLA compilation happens on a
remote server and **bypasses jax's persistent compilation cache** — no entries are ever
written under ``JAX_COMPILATION_CACHE_DIR``, so every fresh process pays the full remote
compile (~minutes for the train step; measured 114 s for a trivial matmul with a cold
tunnel). PJRT executable serialization does work here, so we cache at that layer instead:
``jit(f).lower(args).compile()`` once, ``serialize_executable.serialize`` the result, and
reload the binary in later processes (measured: fresh-process deserialize+run < 10 s).

The cache key hashes the *lowered StableHLO text* (plus jax version / backend / device
kind), so any change to the model, shapes, dtypes, shardings, or donation invalidates the
entry automatically — lowering is pure host-side tracing and costs milliseconds, which is
what makes the scheme sound. Entries are written atomically (tmp + rename).

The reference has no analogue (torch eager pays no compile); this is TPU-framework
infrastructure. Use :func:`cached_compile` for hot entry points (bench, experiment
runners); plain ``jax.jit`` remains the default everywhere else.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from pathlib import Path
from typing import Any, Callable


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)

DEFAULT_DIR = Path(os.environ.get("W2VHS_AOT_DIR", "")) if os.environ.get(
    "W2VHS_AOT_DIR") else Path(__file__).resolve().parents[2] / ".aot_cache"


_PAYLOAD_RE = None


def _canonical_text(text: str) -> str:
    """Strip Mosaic kernel payloads: their MLIR bytecode serializes nondeterministically
    (two lowerings of the same program in one process differ inside every
    ``tpu_custom_call`` backend_config), which would defeat content-addressed caching.
    Kernel *bodies* are covered by :func:`_kernel_source_digest` instead; call-site
    shapes/grids stay in the surrounding StableHLO.

    The stripping is scoped to long base64 runs *inside backend_config strings* — a bare
    long-alphanumeric regex would also erase large dense constants (hex-printed arrays),
    making two genuinely different programs collide on one cache key."""
    global _PAYLOAD_RE
    if _PAYLOAD_RE is None:
        import re

        _PAYLOAD_RE = (
            re.compile(r'backend_config\s*=\s*"(?:[^"\\]|\\.)*"'),
            re.compile(r"[A-Za-z0-9+/]{100,}={0,2}"),
        )
    cfg_re, b64_re = _PAYLOAD_RE
    return cfg_re.sub(
        lambda m: b64_re.sub("<payload>", m.group(0)), text)


def _kernel_source_digest() -> bytes:
    """Digest of the in-repo Pallas kernel sources — the part of the program that the
    payload-stripped StableHLO no longer pins.

    Hashes the AST with docstrings removed, so comment/doc edits don't invalidate every
    cached executable (only code changes do)."""
    import ast

    h = hashlib.sha256()
    pallas_dir = Path(__file__).resolve().parents[1] / "ops" / "pallas"
    for p in sorted(pallas_dir.glob("*.py")):
        h.update(p.name.encode())
        try:
            tree = ast.parse(p.read_text())
            for node in ast.walk(tree):
                body = getattr(node, "body", None)
                if (isinstance(body, list) and body
                        and isinstance(body[0], ast.Expr)
                        and isinstance(body[0].value, ast.Constant)
                        and isinstance(body[0].value.value, str)):
                    body[0] = ast.Pass()
            h.update(ast.dump(tree).encode())
        except SyntaxError:
            h.update(p.read_bytes())
    return h.digest()


def _compiler_options() -> dict[str, str] | None:
    """XLA compiler-option overrides from ``W2VHS_COMPILER_OPTIONS`` (``k=v,k=v``).

    TPU-backend flags (e.g. ``xla_tpu_scoped_vmem_limit_kib``) cannot be passed via
    ``XLA_FLAGS`` here: the client-side parser rejects them (compilation happens in the
    remote TPU compile service), but per-compile ``compiler_options`` ride the PJRT
    compile request — probe-verified: an absurd scoped-vmem value fails the *remote*
    compile. Used for measured A/Bs of compiler scheduling knobs."""
    raw = os.environ.get("W2VHS_COMPILER_OPTIONS", "").strip()
    if not raw:
        return None
    return dict(kv.strip().split("=", 1) for kv in raw.split(",") if "=" in kv)


def _key(hlo_text: str, backend: str, device_kind: str) -> str:
    import jax

    h = hashlib.sha256()
    h.update(jax.__version__.encode())
    h.update(backend.encode())
    h.update(device_kind.encode())
    h.update(repr(sorted((_compiler_options() or {}).items())).encode())
    h.update(_kernel_source_digest())
    h.update(_canonical_text(hlo_text).encode())
    return h.hexdigest()[:32]


def aot_jit(fn: Callable, static_argnames=()) -> Callable:
    """``jax.jit`` with transparent AOT executable caching per call signature.

    On TPU (where remote compiles cost minutes and the persistent HLO cache is bypassed)
    the first call per (shapes, dtypes, statics) signature compiles through
    :func:`cached_compile` — statics are closed over so the serialized executable has a
    plain array-only calling convention — and later processes reload the binary. On CPU
    (the test backend) it degrades to plain ``jax.jit``. ``W2VHS_AOT=0`` disables it.
    """
    import inspect

    import jax

    jitted = jax.jit(fn, static_argnames=static_argnames)
    statics = set(static_argnames)
    sig = inspect.signature(fn)
    compiled: dict = {}

    def call(*args, **kwargs):
        if os.environ.get("W2VHS_AOT") == "0" or jax.default_backend() == "cpu":
            return jitted(*args, **kwargs)
        bound = sig.bind(*args, **kwargs)
        sta = {k: v for k, v in bound.arguments.items() if k in statics}
        arr = {k: v for k, v in bound.arguments.items() if k not in statics}
        key = (tuple(sorted(sta.items())),
               tuple((k, tuple(v.shape), str(v.dtype)) if hasattr(v, "shape")
                     else (k, repr(v)) for k, v in sorted(arr.items())))
        entry = compiled.get(key)
        if entry is None:
            closed = jax.jit(lambda **arrs: fn(**arrs, **sta))
            entry = compiled[key] = cached_compile(closed, **arr)
        return entry(**arr)

    call.__wrapped__ = jitted
    return call


def cached_compile(jitted: Callable, *args: Any, cache_dir: Path | None = None,
                   verbose: bool = False, **kwargs: Any) -> Callable:
    """Compile ``jitted`` (a ``jax.jit`` wrapped function) for ``args``, reusing a
    serialized executable when one matches the lowered program.

    Returns a callable with the same (pytree) calling convention. Falls back to the plain
    compiled object if serialization is unsupported on the backend, and to ``jitted``
    itself if even lowering fails (e.g. interpret-mode-only paths).
    """
    import jax

    try:
        lowered = jitted.lower(*args, **kwargs)
    except Exception:
        return jitted

    backend = jax.default_backend()
    dev = jax.devices()[0]
    hlo_text = lowered.as_text()   # printed once; reused for the donation check below
    key = _key(hlo_text, backend, getattr(dev, "device_kind", str(dev)))
    cdir = Path(cache_dir) if cache_dir is not None else DEFAULT_DIR
    path = cdir / f"{key}.pjrt"

    def _sig(tree) -> tuple:
        return tuple(
            (getattr(l, "shape", None), getattr(l, "dtype", None),
             getattr(l, "sharding", None))
            for l in _tree_leaves(tree))

    expected_sig = _sig((args, kwargs))

    def with_sig_fallback(fast):
        """Compiled executables are pinned to one signature (shapes, dtypes, shardings);
        route calls that differ back to the jit (which compiles for them) instead of
        letting the executable raise — e.g. an eval step warmed from an int16-wire train
        batch later fed float32, or a differently-sharded batch. Checked *before*
        execution: donated buffers must not be consumed by a doomed attempt."""

        def call(*a, **k):
            if _sig((a, k)) != expected_sig:
                return jitted(*a, **k)
            return fast(*a, **k)

        return call

    if path.exists():
        try:
            from jax.experimental import serialize_executable as se

            payload = pickle.loads(path.read_bytes())
            loaded = se.deserialize_and_load(*payload) if isinstance(payload, tuple) \
                else se.deserialize_and_load(payload)
            try:
                os.utime(path)   # LRU touch for _prune
            except OSError:
                pass   # read-only/shared cache dir: a failed touch must not discard
                       # a successfully-deserialized executable
            if verbose:
                print(f"[aot] loaded {path.name}")
            # Self-healing: a blob can deserialize yet fail at execution (e.g. XLA:CPU
            # AOT embeds compile-machine ISA features; a host mismatch raises at call
            # time). First failure drops the entry and recompiles transparently — but
            # only when the program donates no inputs: a failed dispatch may already
            # have consumed donated buffers, so retrying with the same (now-deleted)
            # arrays would crash confusingly instead of recovering.
            # Either marker means a donated input: tf.aliasing_output when the donation
            # aliased an output buffer, jax.buffer_donor when it could not be aliased
            # but the buffer is still surrendered to the runtime.
            donated = ("tf.aliasing_output" in hlo_text
                       or "jax.buffer_donor" in hlo_text)
            state = {"fn": loaded}

            def call(*a, **k):
                try:
                    return state["fn"](*a, **k)
                except TypeError:
                    raise   # signature mismatch, not a bad blob — outer fallback handles
                except Exception as exc:
                    if state["fn"] is not loaded:
                        raise
                    try:
                        path.unlink(missing_ok=True)
                    except OSError:
                        pass
                    if donated:
                        raise RuntimeError(
                            f"cached executable {path.name} failed mid-execution and its "
                            "inputs are donated (buffers may already be consumed); the "
                            "cache entry has been dropped — rerun to recompile"
                        ) from exc
                    if verbose:
                        print("[aot] cached executable failed; recompiling")
                    state["fn"] = lowered.compile(compiler_options=_compiler_options())
                    return state["fn"](*a, **k)

            return with_sig_fallback(call)
        except Exception as exc:  # stale/incompatible blob: recompile below
            if verbose:
                print(f"[aot] reload failed ({type(exc).__name__}); recompiling")

    compiled = lowered.compile(compiler_options=_compiler_options())
    try:
        from jax.experimental import serialize_executable as se

        blob = pickle.dumps(se.serialize(compiled))
        cdir.mkdir(parents=True, exist_ok=True)
        tmp = path.with_suffix(f".tmp{os.getpid()}")   # per-process: concurrent writers
        tmp.write_bytes(blob)
        os.replace(tmp, path)
        _prune(cdir, keep=path)
        if verbose:
            print(f"[aot] saved {path.name} ({len(blob) >> 20} MiB)")
    except Exception as exc:
        if verbose:
            print(f"[aot] serialize unsupported ({type(exc).__name__}); in-memory only")
    return with_sig_fallback(compiled)


def _prune(cdir: Path, keep: Path | None = None) -> None:
    """LRU-bound the cache (experiment variants accumulate ~100 MB train-step blobs fast;
    an unbounded cache measured 7.4 GB after one optimization session). Loads bump mtime,
    so eviction order is least-recently-used. Cap via W2VHS_AOT_LIMIT_GB (default 4)."""
    limit = float(os.environ.get("W2VHS_AOT_LIMIT_GB", "4")) * (1 << 30)
    entries = sorted(cdir.glob("*.pjrt"), key=lambda p: p.stat().st_mtime)
    total = sum(p.stat().st_size for p in entries)
    for p in entries:
        if total <= limit:
            break
        if keep is not None and p.samefile(keep):
            continue
        total -= p.stat().st_size
        p.unlink(missing_ok=True)
