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
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    stage = sys.argv[1]
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 8250
    m = 6

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    if stage in ("classifier", "classifier_f32", "classifier_nodrop"):
        # Full vest classifier grad (bf16 like build_classifier on TPU) — the layer
        # between the clean small compositions and the crashing train step.
        from wav2vec_heart_sounds_tpu.models.build import build_classifier
        from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
        from wav2vec_heart_sounds_tpu.train.losses import cross_entropy

        ccfg = ClassifierConfig(num_classes=2, num_channels=m, random_init=True,
                                lora=True, fs=4125, head_hidden=(256,))
        dtype = jnp.float32 if stage == "classifier_f32" else None
        model, variables = build_classifier(ccfg, jax.random.key(0), t, dtype)
        x = jnp.asarray(rng.normal(size=(b, t, m)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, b), jnp.int32)
        train = stage != "classifier_nodrop"

        def loss_fn(params, x, y, key):
            kwargs = dict(train=train)
            if train:
                kwargs["rngs"] = {"dropout": key}
                kwargs["mask_key"] = key
            logits = model.apply({"params": params}, x, **kwargs)
            return cross_entropy(logits, y, None)

        g = jax.jit(jax.grad(loss_fn))(variables["params"], x, y, jax.random.key(1))
        leaf = jax.tree_util.tree_leaves(g)[0]
        print(f"STAGE={stage} RC=OK LOSS={float(jnp.sum(leaf)):.6f}")
        return

    if stage == "trainer":
        # The REAL SupervisedTrainer fed synthetic in-memory batches (no dataset /
        # augment / Batcher): isolates trainer machinery from the loader path.
        # Honors W2VHS_AOT like the real epoch loop.
        from wav2vec_heart_sounds_tpu.models.build import build_classifier
        from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig
        from wav2vec_heart_sounds_tpu.train.classifier import SupervisedTrainer

        ccfg = ClassifierConfig(num_classes=2, num_channels=m, random_init=True,
                                lora=True, fs=4125, head_hidden=(256,))
        model, variables = build_classifier(ccfg, jax.random.key(0), t)
        trainer = SupervisedTrainer(model, variables, optimizer_name="adamw", lr=1e-4,
                                    classifier_config=ccfg, log=lambda s: None)

        def batches():
            for _ in range(3):
                wave = (rng.normal(size=(b, t, m)) * 3000).astype(np.int16)
                yield {"waveform": wave,
                       "label": rng.integers(0, 2, b).astype(np.int32),
                       "valid": np.ones(b, np.float32)}

        _, loss = trainer._run_epoch(batches(), True, max_batches=3)
        print(f"STAGE={stage} RC=OK LOSS={loss:.6f}")
        return

    if stage.startswith("trainstep"):
        # The trainer's jitted step minus the loader: value_and_grad + optax update
        # (flattened-2d adamw) + donation + N sequential invocations. Variants:
        #   trainstep            donated, adamw, 3 steps  (the crashing bench's shape)
        #   trainstep_nodonate   no donate_argnums
        #   trainstep_sgd        sgd instead of adamw
        #   trainstep_1          single invocation
        #   trainstep_int16      int16 wire input, dequant inside the step (loader policy)
        #   trainstep_mask       full _step_tail semantics: trainable-masked adamw with
        #                        weight decay, loss_params tree, preds output
        import optax

        from wav2vec_heart_sounds_tpu.models.build import build_classifier
        from wav2vec_heart_sounds_tpu.models.classifier import ClassifierConfig, trainable_mask
        from wav2vec_heart_sounds_tpu.train.losses import cross_entropy
        from wav2vec_heart_sounds_tpu.train.optim import build_optimizer

        ccfg = ClassifierConfig(num_classes=2, num_channels=m, random_init=True,
                                lora=True, fs=4125, head_hidden=(256,))
        model, variables = build_classifier(ccfg, jax.random.key(0), t)
        params = variables["params"]
        opt_name = "sgd" if stage == "trainstep_sgd" else "adamw"
        if stage == "trainstep_mask":
            enc_mask = trainable_mask(params, ccfg)
            mask = {"model": enc_mask, "loss": {}}
            tx, schedule = build_optimizer(opt_name, 1e-4, 1e-5, trainable=mask,
                                           max_grad_norm=5.0)
            train_tree = {"model": params, "loss": {}}
            opt_state = tx.init(train_tree)
        else:
            tx, schedule = build_optimizer(opt_name, 1e-4, max_grad_norm=5.0)
            opt_state = tx.init(params)
        y = jnp.asarray(rng.integers(0, 2, b), jnp.int32)
        valid = jnp.ones((b,), jnp.float32)

        def step(params, opt_state, x, y, valid, lr, key):
            k_drop, k_mask = jax.random.split(key)
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = x.astype(jnp.float32) * (1.0 / 32767.0)

            if stage == "trainstep_mask":
                def loss_fn(tree):
                    logits = model.apply({"params": tree["model"]}, x, train=True,
                                         rngs={"dropout": k_drop}, mask_key=k_mask)
                    return cross_entropy(logits, y, valid), logits

                tree = {"model": params, "loss": {}}
                (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(tree)
                updates, opt_state = tx.update(grads, opt_state, tree)
                updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
                tree = optax.apply_updates(tree, updates)
                preds = jnp.argmax(logits, axis=1)
                return tree["model"], opt_state, loss + preds.sum() * 0.0

            def loss_fn(p):
                logits = model.apply({"params": p}, x, train=True,
                                     rngs={"dropout": k_drop}, mask_key=k_mask)
                return cross_entropy(logits, y, valid)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: lr * u, updates)
            return optax.apply_updates(params, updates), opt_state, loss

        donate = () if stage == "trainstep_nodonate" else (0, 1)
        jstep = jax.jit(step, donate_argnums=donate)
        n_steps = 1 if stage == "trainstep_1" else 3
        key = jax.random.key(1)
        lr = jnp.asarray(schedule(0), jnp.float32)
        loss = None
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            if stage == "trainstep_int16":
                x = jnp.asarray((rng.normal(size=(b, t, m)) * 3000).astype(np.int16))
            else:
                x = jnp.asarray(rng.normal(size=(b, t, m)), jnp.float32)
            params, opt_state, loss = jstep(params, opt_state, x, y, valid, lr, sub)
        print(f"STAGE={stage} RC=OK LOSS={float(loss):.6f}")
        return

    if stage in ("beamformer", "beamformer_bf16", "stopgrad", "fwdonly"):
        from wav2vec_heart_sounds_tpu.models.beamformer import TimeVaryingSincBeamformer

        dtype = jnp.bfloat16 if stage == "beamformer_bf16" else jnp.float32
        model = TimeVaryingSincBeamformer(num_mics=m, fs=4125.0, dtype=dtype)
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
