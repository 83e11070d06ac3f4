"""Synthetic-augmentation schedule runner (single-channel PCG).

Contract from reference src/mpcg_wav2vec/experiments/synthetic.py:26-74: one classifier and
one trainer persist across an ordered stage schedule interleaving real CinC data and generated
(DiffWave/WaveGrad) data; each stage builds its fragments, wraps them with the stage's
``augment_num`` + lazy PCG augmentation, and fits against a fixed validation set (best-MCC
restore happens inside each fit); final evaluation on the schedule's test set.

Note: like the reference, ``letskip`` is parsed but not acted on, and stage ``proportion``
applies to generated datasets only (reference synthetic.py:27-29,64).
"""

from __future__ import annotations

from functools import partial

import jax

from ..augment import AugmentConfig
from ..data.cinc import build_fragments, pcg_augment
from ..data.fragments import FragmentDataset
from ..data.generated import generated_fragments
from ..data.schedule import Schedule, load_schedule
from ..models.build import build_classifier
from ..models.classifier import ClassifierConfig
from ..signal import WindowSpec
from ..train.classifier import SupervisedTrainer
from ..train.evaluate import evaluate, make_apply_fn
from .common import append_result, make_loader


def _stage_fragments(spec, fs, window, proportion):
    if spec.combined:
        # Combined datasets concatenate their base sets (paired proportions apply to the
        # generated members) — an extension over the reference, whose runner only resolved
        # non-combined stages (reference experiments/synthetic.py:26-29).
        props = (spec.proportion if isinstance(spec.proportion, list)
                 else [spec.proportion] * len(spec.path))
        frags = []
        for path, split, gen, prop in zip(spec.path, spec.split, spec.gen_data, props):
            if gen:
                frags += generated_fragments(path, fs_out=fs, window=window,
                                             proportion=float(prop))
            else:
                frags += build_fragments(path, split, "train", fs_out=fs, window=window,
                                         ecg=False)
        return frags
    if isinstance(spec.gen_data, bool) and spec.gen_data:
        return generated_fragments(spec.path, fs_out=fs, window=window,
                                   proportion=proportion)
    return build_fragments(spec.path, spec.split, "train", fs_out=fs, window=window,
                           ecg=False)


def run(
    schedule_path: str,
    *,
    fs: int = 4125,
    window_s: float = 4.0,
    random_init: bool = False,
    augment_config: AugmentConfig | None = None,
    batch_size: int = 64,
    optimizer: str = "sgd",
    lr: float = 1e-3,
    max_batches: int | None = None,
    results_json: str | None = None,
    log_dir: str | None = None,
    run_label: str = "",
    mesh=None,
    seed: int = 0,
    encoder_config=None,   # test/CI hook: substitute a small Wav2Vec2Config
) -> dict:
    schedule: Schedule = load_schedule(schedule_path)
    cfg = augment_config or AugmentConfig()
    window = WindowSpec(window_s=window_s)
    win_len = window.window_len(fs)
    augment_fn = partial(pcg_augment, cfg=cfg)

    valid_frags = build_fragments(schedule.valid_set.data, schedule.valid_set.split,
                                  "valid", fs_out=fs, window=window, ecg=False)
    test_frags = build_fragments(schedule.test_set.data, schedule.test_set.split,
                                 "test", fs_out=fs, window=window, ecg=False)
    valid_loader = make_loader(FragmentDataset(valid_frags, fs=fs), batch_size, False,
                               seed, win_len)
    test_loader = make_loader(FragmentDataset(test_frags, fs=fs), batch_size, False,
                              seed, win_len)

    enc_kw = {"encoder": encoder_config} if encoder_config is not None else {}
    ccfg = ClassifierConfig(num_classes=2, num_channels=1, random_init=random_init, fs=fs,
                            **enc_kw)
    model, variables = build_classifier(ccfg, jax.random.key(seed), win_len)
    trainer = SupervisedTrainer(model, variables, optimizer_name=optimizer, lr=lr,
                                classifier_config=ccfg, mesh=mesh, seed=seed, log_dir=log_dir)

    for spec, epochs, _letskip in schedule.resolved_stages():
        frags = _stage_fragments(spec, fs, window, float(spec.proportion)
                                 if not isinstance(spec.proportion, list) else 1.0)
        stage_ds = FragmentDataset(frags, fs=fs, augment_num=spec.augment_num,
                                   augment_fn=augment_fn)
        trainer.fit(make_loader(stage_ds, batch_size, True, seed, win_len),
                    valid_loader, epochs, max_batches, label=f"[{spec.name}]")

    metrics = evaluate(make_apply_fn(model, trainer.variables), test_loader, max_batches)
    record = {"schedule": schedule_path, "fs": fs, "random_init": random_init,
              "run_label": run_label, **metrics}
    append_result(results_json, record)
    return record
