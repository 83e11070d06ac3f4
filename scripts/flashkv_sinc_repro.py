"""Minimal repro stages for the vest TPU worker crash (round-4 bisect follow-up).

The scripts/vest_bisect.sh matrix proved: flash_kv alone clean, sinc kernel alone
clean, both in one program -> TPU worker "kernel fault" (any batch size, fresh
compiles). Each stage here is one candidate composition, run in a fresh process:

  python scripts/flashkv_sinc_repro.py <stage> [B] [T]

Stages:
  beamformer   grad through the real TimeVaryingSincBeamformer (tightest faithful repro)
  independent  flash_kv and sinc_delay on UNRELATED inputs summed into one loss —
               tests mere coexistence vs the delays dataflow
  stopgrad     beamformer but with stop_gradient on the predicted delays — cuts the
               dd gradient path through the sinc kernel
  fwdonly      beamformer forward only (no grad)
  sinc_from_attn  sinc kernel whose delays come from flash_kv output directly (no
               transformer plumbing in between)

Prints one line: STAGE=<name> RC=OK LOSS=<val> or raises (worker crash -> nonzero rc).
"""

import sys

import numpy as np


def main() -> None:
    stage = sys.argv[1]
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 8250
    m = 6

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    if stage in ("beamformer", "stopgrad", "fwdonly"):
        from wav2vec_heart_sounds_tpu.models.beamformer import TimeVaryingSincBeamformer

        model = TimeVaryingSincBeamformer(num_mics=m, fs=4125.0)
        x = jnp.asarray(rng.normal(size=(b, m, t)), jnp.float32)
        params = model.init(jax.random.key(0), x)

        if stage == "stopgrad":
            import wav2vec_heart_sounds_tpu.models.beamformer as bf

            orig = bf._delay_channel

            def patched(xc, delays, kernel_size, window):
                return orig(xc, jax.lax.stop_gradient(delays), kernel_size, window)

            bf._delay_channel = patched

        def loss_fn(p, x):
            return jnp.sum(model.apply(p, x) ** 2) * 1e-6

        if stage == "fwdonly":
            fn = jax.jit(loss_fn)
            out = fn(params, x)
        else:
            fn = jax.jit(jax.grad(loss_fn))
            out = jnp.sum(fn(params, x)["params"]["delay_predictor"]["input_proj"]["kernel"])
        print(f"STAGE={stage} RC=OK LOSS={float(out):.6f}")
        return

    from wav2vec_heart_sounds_tpu.ops.pallas.beamformer import sinc_delay
    from wav2vec_heart_sounds_tpu.ops.pallas.flash_kv import flash_attention_kv

    window = tuple(float(w) for w in np.hamming(41).astype(np.float32))
    h, d = 4, 8
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, t)), jnp.float32)
    delays = jnp.asarray(rng.uniform(0, 40, size=(b, t)), jnp.float32)

    if stage == "independent":
        def loss_fn(q, x, delays):
            a = flash_attention_kv(q, k, v)
            y = sinc_delay(x, delays, 41, window)
            return jnp.sum(a) * 1e-6 + jnp.sum(y ** 2) * 1e-6

        g = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2)))(q, x, delays)
        print(f"STAGE={stage} RC=OK LOSS={float(jnp.sum(g[1])):.6f}")
        return

    if stage == "sinc_from_attn":
        def loss_fn(q, x):
            a = flash_attention_kv(q, k, v)                      # [B, T, H, d]
            dl = jnp.clip(a.reshape(b, t, h * d).mean(-1) * 10 + 20, 0.0, 41.0)
            y = sinc_delay(x, dl, 41, window)
            return jnp.sum(y ** 2) * 1e-6

        g = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))(q, x)
        print(f"STAGE={stage} RC=OK LOSS={float(jnp.sum(g[1])):.6f}")
        return

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
