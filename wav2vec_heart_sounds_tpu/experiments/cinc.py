"""CinC single-channel PCG / Training-A PCG+ECG classifier runner.

Contract from reference src/mpcg_wav2vec/experiments/cinc.py:36-184: modes ``pcg`` / ``ecg``
(single branch) and ``pcg_ecg`` (two-branch fusion: train PCG and ECG encoders separately,
then fit the fusion head — the paper's ``big_rnn:2:wav2vec`` topology); the legacy
``reference_train_rnn`` regime halves the epochs and augments the validation set with half as
many copies; :func:`run_leave_out_db` trains on all-but-one CinC database and tests on the
held-out one.
"""

from __future__ import annotations

import jax

from ..augment import AugmentConfig
from ..data.cinc import build_fragments
from ..data.fragments import FragmentDataset
from ..models.build import build_classifier
from ..models.classifier import ClassifierConfig
from ..models.fusion import two_branch_pcg_ecg
from ..signal import WindowSpec
from ..train.classifier import SupervisedTrainer
from ..train.evaluate import evaluate, make_apply_fn
from .common import append_result, make_loader


def _device_prep(fs_wire: int, fs: int, win_len: int):
    """Dequant + on-device PCG preprocessing for the raw wire (stage-jitted chain)."""
    import jax.numpy as jnp

    from ..signal import jaxproc

    def prep(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(jnp.float32) * (1.0 / 32767.0)
        return jaxproc.preprocess_pcg(x, fs_wire, fs)[:, :win_len]

    return prep


def _branch_config(fs: int, random_init: bool, encoder=None) -> ClassifierConfig:
    kw = {"encoder": encoder} if encoder is not None else {}
    return ClassifierConfig(num_classes=2, num_channels=1, random_init=random_init,
                            fs=fs, **kw)


def run(
    data_dir: str,
    csv_path: str,
    *,
    mode: str = "pcg",
    dataset: str = "training-a",
    fs: int = 4125,
    window_s: float = 4.0,
    epochs: int = 20,
    augment: bool = True,
    augment_num: int = 15,
    random_init: bool = False,
    reference_train_rnn: bool = False,
    augment_config: AugmentConfig | None = None,
    batch_size: int = 64,
    fold: int = 1,
    optimizer: str = "sgd",
    lr: float = 1e-3,
    max_batches: int | None = None,
    results_json: str | None = None,
    log_dir: str | None = None,
    run_label: str = "",
    mesh=None,
    seed: int = 0,
    device_augment: bool = False,
    wire: str = "preproc",  # "preproc" (reference parity) | "raw" (low-rate raw wire)
    fs_wire: int = 2000,
    encoder_config=None,   # test/CI hook: substitute a small Wav2Vec2Config
) -> dict:
    cfg = augment_config or AugmentConfig()
    aug_num = augment_num if augment else 0
    # Legacy "reference RNN" regime: half the epochs, augmented validation set.
    train_epochs = max(1, epochs // 2) if reference_train_rnn else epochs
    valid_aug = (aug_num // 2) if (reference_train_rnn and augment) else 0
    window = WindowSpec(window_s=window_s)
    win_len = window.window_len(fs)
    two_branch = mode == "pcg_ecg"
    load_ecg = mode in ("ecg", "pcg_ecg")

    raw_wire = wire == "raw"
    if raw_wire and load_ecg:
        raise ValueError("wire='raw' supports the mono 'pcg' mode only")
    if raw_wire:
        # Raw wire: un-preprocessed low-rate windows over the host->device link; the
        # preprocessing chain runs on device per batch and host augment copies are
        # replaced by per-epoch on-device augmentation (see data.cinc.build_raw_fragments).
        from ..data.cinc import build_raw_fragments

        frags = {s: build_raw_fragments(data_dir, csv_path, s, fs_wire=fs_wire,
                                        window=window, fold=fold)
                 for s in ("train", "valid", "test")}
        if augment and not device_augment:
            device_augment = True   # raw mode's only augmentation path
    else:
        # Under device augmentation the frozen host copies are *replaced*, not stacked
        # on: expanding augmented copies AND re-augmenting every row on device would
        # double-augment. Per-epoch device augmentation + the Batcher's balanced
        # bootstrap covers both roles; the 1/(aug_num+1) pristine fraction of the host
        # expansion is mirrored by the transform's pristine_prob draw below.
        host_aug_num = 0 if (device_augment and not load_ecg) else aug_num
        frags = {
            "train": build_fragments(data_dir, csv_path, "train", fs_out=fs, window=window,
                                     ecg=load_ecg, fold=fold, augment_num=host_aug_num,
                                     augment_config=cfg),
            "valid": build_fragments(data_dir, csv_path, "valid", fs_out=fs, window=window,
                                     ecg=load_ecg, fold=fold, augment_num=valid_aug,
                                     augment_config=cfg),
            "test": build_fragments(data_dir, csv_path, "test", fs_out=fs, window=window,
                                    ecg=load_ecg, fold=fold),
        }

    # On-device batch augmentation fused into the jitted train step — the hook the
    # reference exposes but never wires (reference classify/trainer.py:44,67-68); mono
    # branches only (the jax twin covers the [B, T] PCG subset, augment/jaxaug.py).
    batch_transform = None
    if device_augment:
        from functools import partial

        from ..augment.jaxaug import augment_pcg_batch

        # pristine_prob mirrors the host expansion's untouched-original fraction
        # (1 original per aug_num copies); it overrides the loader row mask since
        # these datasets carry no expansion plan.
        pristine = 1.0 / (aug_num + 1) if aug_num > 0 else None
        batch_transform = partial(augment_pcg_batch, fs=fs, cfg=cfg,
                                  pristine_prob=pristine)

    frag_fs = fs_wire if raw_wire else fs
    loader_len = window.window_len(frag_fs)
    device_prep = _device_prep(fs_wire, fs, win_len) if raw_wire else None

    def branch(channel: int, label: str):
        bcfg = _branch_config(fs, random_init, encoder_config)
        model, variables = build_classifier(bcfg, jax.random.key(seed), win_len)
        valid_channel = 0 if not load_ecg else channel
        train_ds = FragmentDataset(frags["train"], fs=frag_fs, channel=channel)
        valid_ds = FragmentDataset(frags["valid"], fs=frag_fs, channel=valid_channel)
        trainer = SupervisedTrainer(model, variables, optimizer_name=optimizer, lr=lr,
                                    classifier_config=bcfg, mesh=mesh, seed=seed, log_dir=log_dir,
                                    batch_transform=None if load_ecg else batch_transform,
                                    device_preprocess=device_prep)
        trainer.fit(make_loader(train_ds, batch_size, True, seed, loader_len),
                    make_loader(valid_ds, batch_size, False, seed, loader_len),
                    train_epochs, max_batches, label=label)
        return model, trainer.variables

    if two_branch:
        pcg_model, pcg_vars = branch(0, "[1/3 PCG branch]")
        ecg_model, ecg_vars = branch(1, "[2/3 ECG branch]")
        fusion, fusion_vars = two_branch_pcg_ecg((pcg_model, pcg_vars),
                                                 (ecg_model, ecg_vars),
                                                 key=jax.random.key(seed + 1))
        trainer = SupervisedTrainer(fusion, fusion_vars, optimizer_name=optimizer, lr=lr,
                                    mesh=mesh, seed=seed, log_dir=log_dir)
        train_ds = FragmentDataset(frags["train"], fs=fs, channel=-1)
        valid_ds = FragmentDataset(frags["valid"], fs=fs, channel=-1)
        trainer.fit(make_loader(train_ds, batch_size, True, seed, win_len),
                    make_loader(valid_ds, batch_size, False, seed, win_len),
                    train_epochs, max_batches, label="[3/3 fusion]")
        test_ds = FragmentDataset(frags["test"], fs=fs, channel=-1)
        apply_fn = make_apply_fn(fusion, trainer.variables)
        topology = "big_rnn:2:wav2vec"
    else:
        channel = 1 if mode == "ecg" else 0
        model, variables = branch(channel, f"[{mode}]")
        test_ds = FragmentDataset(frags["test"], fs=frag_fs,
                                  channel=channel if load_ecg else 0)
        apply_fn = make_apply_fn(model, variables)
        topology = "wav2vec"

    if device_prep is not None:
        inner_apply = apply_fn
        apply_fn = lambda x: inner_apply(device_prep(x))   # noqa: E731 — test set is raw too
    metrics = evaluate(apply_fn, make_loader(test_ds, batch_size, False, seed, loader_len),
                       max_batches)
    record = {
        "mode": mode, "dataset": dataset, "fs": fs, "epochs": epochs,
        "train_epochs": train_epochs, "augment": augment, "augment_num": aug_num,
        "random_init": random_init, "reference_train_rnn": reference_train_rnn,
        "topology": topology, "fold": fold, "run_label": run_label, "wire": wire,
        **metrics,
    }
    append_result(results_json, record)
    return record


def run_leave_out_db(
    databases: dict[str, tuple[str, str]],
    holdout: str,
    *,
    fs: int = 4125,
    window_s: float = 4.0,
    epochs: int = 20,
    augment: bool = True,
    random_init: bool = False,
    reference_train_rnn: bool = False,
    augment_config: AugmentConfig | None = None,
    batch_size: int = 64,
    optimizer: str = "sgd",
    lr: float = 1e-3,
    max_batches: int | None = None,
    results_json: str | None = None,
    log_dir: str | None = None,
    mesh=None,
    seed: int = 0,
    encoder_config=None,
) -> dict:
    """Train single-channel PCG on every database except ``holdout``; test on ``holdout``."""
    cfg = augment_config or AugmentConfig()
    window = WindowSpec(window_s=window_s)
    win_len = window.window_len(fs)
    aug_num = 15 if augment else 0
    train_epochs = max(1, epochs // 2) if reference_train_rnn else epochs
    valid_aug = (aug_num // 2) if (reference_train_rnn and augment) else 0

    train_frags, valid_frags = [], []
    for name, (data_dir, csv_path) in databases.items():
        if name == holdout:
            continue
        train_frags += build_fragments(data_dir, csv_path, "train", fs_out=fs, window=window,
                                       augment_num=aug_num, augment_config=cfg)
        valid_frags += build_fragments(data_dir, csv_path, "valid", fs_out=fs, window=window,
                                       augment_num=valid_aug, augment_config=cfg)

    holdout_dir, holdout_csv = databases[holdout]
    test_frags = build_fragments(holdout_dir, holdout_csv, "all", fs_out=fs, window=window)

    bcfg = _branch_config(fs, random_init, encoder_config)
    model, variables = build_classifier(bcfg, jax.random.key(seed), win_len)
    trainer = SupervisedTrainer(model, variables, optimizer_name=optimizer, lr=lr,
                                classifier_config=bcfg, mesh=mesh, seed=seed, log_dir=log_dir)
    trainer.fit(make_loader(FragmentDataset(train_frags, fs=fs, channel=0),
                            batch_size, True, seed, win_len),
                make_loader(FragmentDataset(valid_frags, fs=fs, channel=0),
                            batch_size, False, seed, win_len),
                train_epochs, max_batches)

    metrics = evaluate(make_apply_fn(model, trainer.variables),
                       make_loader(FragmentDataset(test_frags, fs=fs, channel=0),
                                   batch_size, False, seed, win_len), max_batches)
    record = {"mode": "pcg", "leave_out_db": holdout, "fs": fs, "epochs": epochs,
              "train_epochs": train_epochs, "augment": augment, "random_init": random_init,
              "reference_train_rnn": reference_train_rnn, **metrics}
    append_result(results_json, record)
    return record
