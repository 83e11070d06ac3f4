"""Multichannel vest PCG ablation runner (single Wav2Vec + sinc beamformer).

Contract from reference src/mpcg_wav2vec/experiments/multichannel.py:20-81: one classifier
with the beamformer engaged (num_channels = len(channels)), LoRA unless random-init, optional
frozen encoder, AdamW lr 1e-4 batch 16, CE or contrastive-focal loss, MLP evaluation plus an
optional SVM probe — results nested under ``mlp`` / ``svm``.
"""

from __future__ import annotations

import jax

from ..augment import AugmentConfig
from ..data.vest import vest_dataset
from ..models.build import build_classifier
from ..models.classifier import ClassifierConfig, Wav2VecClassifier
from ..signal import WindowSpec
from ..train.classifier import SupervisedTrainer
from ..train.evaluate import evaluate, make_apply_fn
from ..train.losses import ContrastiveFocalConfig
from ..train.svm import NeuralSVM
from .common import append_result, make_loader


def run(
    data_dir: str,
    csv_path: str,
    *,
    channels: list[int] | None = None,
    fs: int = 4125,
    window_s: float = 2.0,
    epochs: int = 20,
    augment: bool = True,
    random_init: bool = False,
    lora: bool = True,
    freeze_encoder: bool = False,
    fit_svm: bool = True,
    loss: str = "ce",
    augment_config: AugmentConfig | None = None,
    batch_size: int = 16,
    fold: int = 1,
    optimizer: str = "adamw",
    lr: float = 1e-4,
    max_batches: int | None = None,
    results_json: str | None = None,
    log_dir: str | None = None,
    run_label: str = "",
    mesh=None,
    seed: int = 0,
    device_augment: bool = False,
    encoder_config=None,   # test/CI hook: substitute a small Wav2Vec2Config
) -> dict:
    channels = channels or [1, 2, 3, 4, 5, 6]
    cfg = augment_config or AugmentConfig()
    window = WindowSpec(window_s=window_s)
    win_len = window.window_len(fs)
    aug_num = 15 if augment else 0

    enc_kw = {"encoder": encoder_config} if encoder_config is not None else {}
    ccfg = ClassifierConfig(num_classes=2, num_channels=len(channels),
                            random_init=random_init, lora=lora and not random_init,
                            freeze_encoder=freeze_encoder, fs=fs, head_hidden=(256,),
                            **enc_kw)
    model, variables = build_classifier(ccfg, jax.random.key(seed), win_len)

    # Recorded-noise mixing runs on device in reference order (after wander/noise) when
    # a bank can be cut from the configured noise directory; the host residual then
    # skips its out-of-order fallback (recorded_on_device).
    bank = None
    if device_augment and augment and cfg.ephnogram_dir:
        import numpy as _np

        from ..augment.noise_sources import pcg_noise_bank

        bank_np = pcg_noise_bank(fs, win_len, cfg.ephnogram_dir,
                                 rng=_np.random.default_rng(seed))
        if bank_np is not None:
            import jax.numpy as jnp

            bank = jnp.asarray(bank_np)

    def dataset(subset, augment_num):
        return vest_dataset(data_dir, csv_path, subset, fs_out=fs, window=window,
                            channels=channels, fold=fold, augment_num=augment_num,
                            augment_config=cfg, device_augment=device_augment,
                            recorded_on_device=bank is not None)

    train_ds = dataset("train", aug_num)
    valid_ds = dataset("valid", 0)
    test_ds = dataset("test", 0)

    criterion = (ContrastiveFocalConfig(num_classes=2,
                                        feature_dim=ccfg.encoder.hidden_size)
                 if loss == "contrastive-focal" else None)
    batch_transform = None
    if device_augment and augment:
        from functools import partial as _partial

        from ..augment.jaxaug import augment_multi_pcg_batch

        batch_transform = _partial(augment_multi_pcg_batch, fs=fs, cfg=cfg,
                                   noise_bank=bank)
    trainer = SupervisedTrainer(model, variables, optimizer_name=optimizer, lr=lr,
                                criterion=criterion, classifier_config=ccfg,
                                batch_transform=batch_transform,
                                mesh=mesh, seed=seed, log_dir=log_dir)
    trainer.fit(make_loader(train_ds, batch_size, True, seed, win_len),
                make_loader(valid_ds, batch_size, False, seed, win_len),
                epochs, max_batches)

    metrics = {"mlp": evaluate(make_apply_fn(model, trainer.variables),
                               make_loader(test_ds, batch_size, False, seed, win_len),
                               max_batches)}
    if fit_svm:
        from ..train.evaluate import make_encode_fn

        encode = make_encode_fn(model, trainer.variables)
        svm = NeuralSVM(encode).fit(make_loader(train_ds, batch_size, False, seed, win_len))
        metrics["svm"] = svm.evaluate(make_loader(test_ds, batch_size, False, seed, win_len))

    record = {
        "channels": channels, "fs": fs, "epochs": epochs, "augment": augment,
        "random_init": random_init, "lora": lora, "freeze_encoder": freeze_encoder,
        "loss": loss, "fold": fold, "run_label": run_label, **metrics,
    }
    append_result(results_json, record)
    return record
