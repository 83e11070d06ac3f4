"""Command-line entry point (click), mirroring the reference CLI surface.

Commands (reference src/mpcg_wav2vec/cli.py:18-232): ``make-splits``, ``summarize``,
``gen-train``, ``gen-sample``, ``classify-cinc``, ``classify-vest``, ``classify-synthetic``,
``classify-lsdo`` — plus ``bench`` (the throughput harness the reference lacks). Imports are
lazy per command so the CLI starts fast.
"""

from __future__ import annotations

import json
from pathlib import Path

import click


@click.group(context_settings={"show_default": True})
def cli() -> None:
    """TPU-native mPCG Wav2Vec: synthetic augmentation + heart-sound classification."""


# --- data preparation -------------------------------------------------------

@cli.command("make-splits")
@click.option("--data-dir", "data_dirs", multiple=True, required=True,
              help="directory containing a CinC-style REFERENCE.csv (repeatable)")
@click.option("--out", "out_path", required=True, help="output reference/split CSV path")
@click.option("--folds", type=int, default=5)
@click.option("--train", type=float, default=0.6)
@click.option("--valid", type=float, default=0.2)
@click.option("--test", type=float, default=0.2)
@click.option("--seed", type=int, default=42)
def make_splits_cmd(data_dirs, out_path, folds, train, valid, test, seed):
    """Generate a patient-level, label-stratified train/valid/test split CSV."""
    from .data.splits import SplitRatios, make_splits_from_dirs, write_splits

    df = make_splits_from_dirs(list(data_dirs), folds=folds,
                               ratios=SplitRatios(train, valid, test), seed=seed)
    path = write_splits(df, out_path)
    counts = {c: df[c].value_counts().to_dict() for c in df.columns if c.startswith("split")}
    click.echo(f"Wrote {len(df)} records x {folds} fold(s) to {path}")
    click.echo(json.dumps(counts, indent=2, default=str))


@cli.command("summarize")
@click.argument("results_json")
@click.option("--group-by", default="run_label", help="comma-separated config fields")
@click.option("--metrics", default="accuracy,uar,sensitivity,specificity,mcc",
              help="comma-separated metric names to show")
@click.option("--out", "out_path", default=None, help="write the Markdown table here")
def summarize_cmd(results_json, group_by, metrics, out_path):
    """Aggregate an ablation results JSON into a mean/std Markdown table."""
    from .reporting import load_results, summarize, to_markdown

    summary = summarize(load_results(results_json),
                        group_by=[g.strip() for g in group_by.split(",")])
    table = to_markdown(summary, metrics=[m.strip() for m in metrics.split(",")])
    if out_path:
        Path(out_path).write_text(table + "\n")
        click.echo(f"Wrote summary table to {out_path}")
    click.echo(table)


# --- generative --------------------------------------------------------------

@cli.command("gen-train")
@click.option("--model", "model_name", type=click.Choice(["diffwave", "wavegrad"]),
              required=True)
@click.option("--data-dir", required=True)
@click.option("--csv", "csv_path", required=True)
@click.option("--output-dir", required=True)
@click.option("--epochs", type=int, default=100)
@click.option("--num-classes", type=int, default=2)
@click.option("--batch-size", type=int, default=8)
@click.option("--lr", type=float, default=2e-4)
@click.option("--condition-on-ecg", is_flag=True, default=False)
@click.option("--segment-dir", default=None,
              help="cardiac-cycle segmentation dir (enables heart-cycle rearranging)")
@click.option("--rearrange/--no-rearrange", "rearrange_cycles", default=True)
@click.option("--prob-contiguous", type=float, default=0.0)
@click.option("--bf16/--no-bf16", default=True,
              help="bfloat16 compute (TPU equivalent of the reference's --fp16 AMP)")
@click.option("--crop-frames", type=int, default=None,
              help="override the conditioning crop (default: generator spec, 96)")
@click.option("--weights", default="", help="checkpoint to resume from")
@click.option("--logdir", default=None, help="scalar/sample log directory")
@click.option("--max-train-batches", type=int, default=None)
@click.option("--seed", type=int, default=0)
def gen_train(model_name, data_dir, csv_path, output_dir, epochs, num_classes, batch_size,
              lr, condition_on_ecg, segment_dir, rearrange_cycles, prob_contiguous, bf16,
              crop_frames, weights, logdir, max_train_batches, seed):
    """Train a diffusion generator on CinC records."""
    import jax
    import jax.numpy as jnp

    from .data.generative import cinc_generative_dataset
    from .models.build import default_compute_dtype
    from .models.registry import get_spec
    from .train.generative import GenBatcher, GenerativeTrainer

    spec = get_spec(model_name)
    dtype = default_compute_dtype() if bf16 else jnp.float32
    model = spec.build_model(num_classes, dtype=dtype)
    signal = "ecg" if condition_on_ecg else "pcg"
    dataset = cinc_generative_dataset(
        data_dir, csv_path, "train", fs=spec.sample_rate, mel=spec.mel(signal),
        crop_frames=crop_frames or spec.crop_frames, hop_length=spec.hop_length,
        condition_on_ecg=condition_on_ecg, segment_dir=segment_dir,
        rearrange_cycles=rearrange_cycles, prob_contiguous=prob_contiguous,
    )
    item = dataset[0]
    variables = _init_generator(model, model_name, item, jax.random.key(seed))
    trainer = GenerativeTrainer(model, variables, spec.loss, output_dir, lr=lr,
                                sampler=spec.sample, log_dir=logdir, seed=seed)
    if weights:
        trainer.restore(weights)
    trainer.train(GenBatcher(dataset, batch_size, shuffle=True, seed=seed), epochs,
                  max_train_batches=max_train_batches)
    click.echo(f"Saved generator to {output_dir}/weights.msgpack")


def _init_generator(model, model_name, item, key):
    import jax.numpy as jnp

    ref = jnp.asarray(item["ref_audio"])[None]
    con = jnp.asarray(item["con_spec"])[None]
    label = jnp.zeros((1,), jnp.int32)
    if model_name == "diffwave":
        return model.init(key, ref, jnp.zeros((1,), jnp.int32), con, label)
    return model.init(key, ref, con, jnp.ones((1,)), label)


@cli.command("gen-sample")
@click.option("--model", "model_name", type=click.Choice(["diffwave", "wavegrad"]),
              required=True)
@click.option("--weights", required=True)
@click.option("--data-dir", required=True)
@click.option("--csv", "csv_path", required=True)
@click.option("--output-dir", required=True)
@click.option("--num-classes", type=int, default=2)
@click.option("--per-item", type=int, default=1)
@click.option("--fast/--no-fast", default=True, help="fast sampling (DiffWave)")
@click.option("--num-steps", type=int, default=None, help="sub-sampled steps (WaveGrad)")
@click.option("--crop-frames", type=int, default=None)
@click.option("--seed", type=int, default=0)
@click.option("--sample-batch", type=int, default=16,
              help="(item, copy) tasks per batched reverse-diffusion run "
                   "(16 = measured TPU optimum; 32 halves throughput — see PERF.md)")
def gen_sample(model_name, weights, data_dir, csv_path, output_dir, num_classes, per_item,
               fast, num_steps, crop_frames, seed, sample_batch):
    """Generate a synthetic dataset from a trained generator."""
    import jax

    from .data.generative import cinc_generative_dataset
    from .models.registry import get_spec
    from .train.generate import generate_dataset
    from .train.generative import GenerativeTrainer

    spec = get_spec(model_name)
    model = spec.build_model(num_classes)
    dataset = cinc_generative_dataset(
        data_dir, csv_path, "all", fs=spec.sample_rate, mel=spec.mel("pcg"),
        crop_frames=crop_frames or spec.crop_frames, hop_length=spec.hop_length,
    )
    variables = _init_generator(model, model_name, dataset[0], jax.random.key(seed))
    trainer = GenerativeTrainer(model, variables, spec.loss, output_dir,
                                log=lambda s: None)
    trainer.restore(weights)
    kwargs = ({"fast": fast} if model_name == "diffwave"
              else ({"num_steps": num_steps} if num_steps else {}))
    path = generate_dataset(model, {"params": trainer.params}, spec, dataset, output_dir,
                            per_item=per_item, seed=seed, sampler_kwargs=kwargs,
                            batch_size=sample_batch)
    click.echo(f"Wrote manifest {path}")


# --- classification ------------------------------------------------------------

@cli.command("classify-cinc")
@click.option("--data-dir", required=True)
@click.option("--csv", "csv_path", required=True)
@click.option("--mode", type=click.Choice(["pcg", "ecg", "pcg_ecg"]), default="pcg")
@click.option("--dataset", default="training-a")
@click.option("--fs", type=int, default=4125)
@click.option("--window-s", type=float, default=4.0)
@click.option("--epochs", type=int, default=20)
@click.option("--augment/--no-augment", default=True)
@click.option("--augment-num", type=int, default=15,
              help="augmented full-record copies per subject (balanced)")
@click.option("--random-init", is_flag=True, default=False)
@click.option("--reference-train-rnn", is_flag=True, default=False,
              help="legacy regime: half epochs + augmented validation set")
@click.option("--device-augment", is_flag=True, default=False,
              help="fuse batched PCG augmentation into the jitted train step (mono modes)")
@click.option("--wire", type=click.Choice(["preproc", "raw"]), default="preproc",
              help="raw: ship low-rate raw windows and preprocess on device "
                   "(8x less transfer; mono pcg mode only)")
@click.option("--fs-wire", type=int, default=2000,
              help="wire sample rate for --wire raw")
@click.option("--fold", type=int, default=1)
@click.option("--max-batches", type=int, default=None)
@click.option("--results-json", default=None)
@click.option("--logdir", "log_dir", default=None)
def classify_cinc(**kwargs):
    """Run a single-PCG / PCG+ECG classification ablation."""
    from .experiments import cinc

    record = cinc.run(kwargs.pop("data_dir"), kwargs.pop("csv_path"), **kwargs)
    click.echo(json.dumps(record, indent=2, default=str))


@cli.command("classify-vest")
@click.option("--data-dir", required=True)
@click.option("--csv", "csv_path", required=True)
@click.option("--channels", default="1,2,3,4,5,6")
@click.option("--fs", type=int, default=4125)
@click.option("--window-s", type=float, default=2.0)
@click.option("--epochs", type=int, default=20)
@click.option("--augment/--no-augment", default=True)
@click.option("--random-init", is_flag=True, default=False)
@click.option("--lora/--no-lora", default=True)
@click.option("--freeze-encoder", is_flag=True, default=False)
@click.option("--fit-svm/--no-svm", default=True)
@click.option("--loss", type=click.Choice(["ce", "contrastive-focal"]), default="ce")
@click.option("--device-augment", is_flag=True, default=False,
              help="run the channel-shared augmentations (noise, wander envelope) "
                   "batched on device; host keeps only time-stretch/recorded noise")
@click.option("--fold", type=int, default=1)
@click.option("--max-batches", type=int, default=None)
@click.option("--results-json", default=None)
@click.option("--logdir", "log_dir", default=None)
def classify_vest(data_dir, csv_path, channels, **kwargs):
    """Run a multichannel vest classification ablation."""
    from .experiments import multichannel

    chan_list = [int(c) for c in channels.split(",")]
    record = multichannel.run(data_dir, csv_path, channels=chan_list, **kwargs)
    click.echo(json.dumps(record, indent=2, default=str))


@cli.command("classify-synthetic")
@click.option("--schedule", "schedule_path", required=True,
              help="schedule JSON mixing real + generated data")
@click.option("--fs", type=int, default=4125)
@click.option("--window-s", type=float, default=4.0)
@click.option("--random-init", is_flag=True, default=False)
@click.option("--max-batches", type=int, default=None)
@click.option("--results-json", default=None)
@click.option("--logdir", "log_dir", default=None)
def classify_synthetic(schedule_path, **kwargs):
    """Train single-channel PCG through a synthetic-augmentation schedule."""
    from .experiments import synthetic

    record = synthetic.run(schedule_path, **kwargs)
    click.echo(json.dumps(record, indent=2, default=str))


@cli.command("classify-lsdo")
@click.option("--db", "dbs", multiple=True, required=True,
              help="repeatable NAME:DATA_DIR:CSV entry, one per CinC database")
@click.option("--holdout", required=True, help="database name held out for testing")
@click.option("--fs", type=int, default=4125)
@click.option("--epochs", type=int, default=20)
@click.option("--augment/--no-augment", default=True)
@click.option("--random-init", is_flag=True, default=False)
@click.option("--reference-train-rnn", is_flag=True, default=False)
@click.option("--max-batches", type=int, default=None)
@click.option("--results-json", default=None)
def classify_lsdo(dbs, holdout, **kwargs):
    """Leave-source-database-out: train on all but one CinC database, test on it."""
    from .experiments import cinc

    databases = {}
    for entry in dbs:
        name, data_dir, csv_path = entry.split(":", 2)
        databases[name] = (data_dir, csv_path)
    record = cinc.run_leave_out_db(databases, holdout, **kwargs)
    click.echo(json.dumps(record, indent=2, default=str))


# --- performance -----------------------------------------------------------------

@cli.command("bench")
@click.option("--batch-size", type=int, default=96)
@click.option("--fs", type=int, default=16000)
@click.option("--window-s", type=float, default=4.0)
@click.option("--steps", type=int, default=20)
@click.option("--mode", type=click.Choice(["train", "infer", "preproc"]), default="train")
def bench_cmd(batch_size, fs, window_s, steps, mode):
    """End-to-end throughput benchmark (windows/sec/chip) — see bench.py."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench as bench_mod

    result = bench_mod.run_bench(batch_size=batch_size, fs=fs, window_s=window_s,
                                 steps=steps, mode=mode)
    click.echo(json.dumps(result))


if __name__ == "__main__":
    cli()
