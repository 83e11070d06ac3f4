"""Training-layer tests: metrics math, losses, a real fit on a tiny model, SVM, DP mesh.

Mirrors reference tests/test_classify.py + test_losses.py and adds an end-to-end fit check
(loss decreases, best-MCC restore) plus a multi-device data-parallel smoke on the virtual
8-CPU mesh.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wav2vec_heart_sounds_tpu.data import Batcher, Fragment, FragmentDataset
from wav2vec_heart_sounds_tpu.models import (
    ClassifierConfig,
    Wav2Vec2Config,
    Wav2VecClassifier,
)
from wav2vec_heart_sounds_tpu.train import (
    ConfusionMatrix,
    ContrastiveFocalConfig,
    NeuralSVM,
    SupervisedTrainer,
    contrastive_focal_loss,
    center_loss,
    evaluate,
    init_contrastive_focal,
    make_apply_fn,
    supervised_contrastive,
)


def test_confusion_matrix_math():
    cm = ConfusionMatrix()
    cm.update([1, 1, 0, 0, 1], [1, 0, 0, 1, 1])
    assert (cm.tp, cm.fn, cm.tn, cm.fp) == (2, 1, 1, 1)
    s = cm.stats()
    assert s["accuracy"] == pytest.approx(3 / 5)
    assert s["sensitivity"] == pytest.approx(2 / 3)
    assert s["specificity"] == pytest.approx(1 / 2)
    assert s["uar"] == pytest.approx(0.5 * (2 / 3 + 1 / 2))
    assert -1 <= s["mcc"] <= 1
    # valid mask drops padded rows
    cm2 = ConfusionMatrix()
    cm2.update([1, 0], [1, 1], valid=[True, False])
    assert cm2.total == 1 and cm2.tp == 1


def test_losses_properties():
    key = jax.random.key(0)
    feats_sep = jnp.concatenate([jnp.ones((4, 8)), -jnp.ones((4, 8))])
    feats_mix = jax.random.normal(key, (8, 8))
    labels = jnp.asarray([0] * 4 + [1] * 4)
    sep = float(supervised_contrastive(feats_sep, labels))
    mix = float(supervised_contrastive(feats_mix, labels))
    assert sep < mix

    cfg = ContrastiveFocalConfig(num_classes=2, feature_dim=8)
    lp = init_contrastive_focal(key, cfg)
    assert float(center_loss(lp["centers"], feats_sep, labels)) >= 0
    logits = jax.random.normal(key, (8, 2))
    total = contrastive_focal_loss(lp, cfg, feats_sep, logits, labels)
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: contrastive_focal_loss(p, cfg, feats_sep, logits, labels))(lp)
    assert np.isfinite(np.asarray(grads["centers"])).all()


def _toy_dataset(n=24, t=800, fs=1000, seed=0):
    """Separable toy task: class 1 has a strong 120 Hz tone, class 0 is noise."""
    rng = np.random.default_rng(seed)
    frags = []
    tt = np.arange(t) / fs
    for i in range(n):
        label = i % 2
        x = rng.normal(0, 0.3, t).astype(np.float32)
        if label:
            x += np.sin(2 * np.pi * 120 * tt).astype(np.float32)
        frags.append(Fragment(x, label, f"p{i % 6}"))
    return FragmentDataset(frags, fs=fs)


def _tiny_classifier(num_channels=1, **cfg_kw):
    cfg = ClassifierConfig(num_classes=2, num_channels=num_channels, head_hidden=(16,),
                           fs=1000, encoder=Wav2Vec2Config.tiny(), **cfg_kw)
    model = Wav2VecClassifier(cfg)
    x = jnp.zeros((2, 800) if num_channels == 1 else (2, 800, num_channels))
    params = model.init(jax.random.key(0), x)
    return model, params, cfg


def test_trainer_fits_toy_task():
    model, params, cfg = _tiny_classifier()
    ds = _toy_dataset()
    logs = []
    trainer = SupervisedTrainer(model, params, optimizer_name="adam", lr=3e-3,
                                classifier_config=cfg, log=logs.append)
    train_b = Batcher(ds, 8, True, seed=0)
    valid_b = Batcher(ds, 8, False)
    best = trainer.fit(train_b, valid_b, epochs=4)
    assert best > 0.5, f"model failed to fit separable toy task (best MCC {best}); {logs}"

    metrics = evaluate(make_apply_fn(model, trainer.variables), Batcher(ds, 8, False))
    assert metrics["fragment"]["accuracy"] > 0.7
    assert set(metrics["patient"]) == {"accuracy", "uar", "sensitivity", "specificity",
                                       "npv", "precision", "f1", "mcc"}


def test_trainer_bf16_params_tracks_f32_trajectory(monkeypatch):
    """W2VHS_BF16_PARAMS=1 (bf16 live params under the packed f32 master) must keep the
    parameter dtype bf16 end-to-end and track the f32-param trajectory to bf16 rounding:
    the master accumulates in f32, so the paths diverge only by the bf16 rounding of the
    emitted tree and of the gradients, not by lost small updates."""
    import jax.numpy as jnp

    def run(gate: bool):
        monkeypatch.setenv("W2VHS_BF16_PARAMS", "1" if gate else "0")
        monkeypatch.setenv("W2VHS_PACKED_MASTER", "1")
        model, params, cfg = _tiny_classifier()
        model = type(model)(cfg, dtype=jnp.bfloat16)
        trainer = SupervisedTrainer(model, params, optimizer_name="sgd", lr=1e-2,
                                    log=lambda s: None)
        x = np.random.RandomState(0).randn(8, 800).astype(np.float32)
        y = np.arange(8) % 2
        v = np.ones(8, np.float32)
        lr = jnp.float32(1e-2)
        p0 = jax.device_get(trainer.state.params)   # before donation invalidates it
        p, lp, st = trainer.state.params, trainer.state.loss_params, trainer.state.opt_state
        for i in range(5):
            p, lp, st, loss, _ = trainer._train_step(p, lp, st, x, y, v, lr,
                                                     jax.random.key(42 + i))
        return trainer, p0, p, float(loss)

    tr_b, p0_b, p_b, loss_b = run(True)
    tr_f, _, p_f, loss_f = run(False)
    assert tr_b._bf16_params and not tr_f._bf16_params
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree_util.tree_leaves(p_b)
               if jnp.issubdtype(l.dtype, jnp.floating))
    # Same model/data/keys, bf16 compute both sides: trajectories agree to bf16 rounding.
    assert abs(loss_b - loss_f) < 5e-2, (loss_b, loss_f)
    # The master must keep accumulating below bf16 resolution: params still move.
    moved = sum(float(jnp.abs(a.astype(jnp.float32) - jnp.asarray(b, jnp.float32)).max())
                for a, b in zip(jax.tree_util.tree_leaves(p_b),
                                jax.tree_util.tree_leaves(p0_b)))
    assert np.isfinite(loss_b) and moved > 0.0


def test_trainer_feature_loss_path():
    model, params, cfg = _tiny_classifier()
    ds = _toy_dataset(n=16)
    crit = ContrastiveFocalConfig(num_classes=2, feature_dim=cfg.encoder.hidden_size)
    trainer = SupervisedTrainer(model, params, optimizer_name="adamw", lr=1e-3,
                                criterion=crit, classifier_config=cfg, log=lambda s: None)
    best = trainer.fit(Batcher(ds, 8, True), Batcher(ds, 8, False), epochs=1)
    assert np.isfinite(best)


def test_trainer_on_device_batch_transform():
    from wav2vec_heart_sounds_tpu.augment import AugmentConfig, augment_pcg_batch
    model, params, cfg = _tiny_classifier()
    ds = _toy_dataset(n=16)
    aug = AugmentConfig(prob_banding=0.0)  # EQ needs fs headroom; keep the cheap subset
    # Ignore the loader's replica mask here (toy dataset has no expansion plan):
    # the test exercises the on-device transform on every row.
    transform = lambda key, x, row_mask=None: augment_pcg_batch(key, x, 1000, aug)
    trainer = SupervisedTrainer(model, params, optimizer_name="adam", lr=1e-3,
                                batch_transform=transform, classifier_config=cfg,
                                log=lambda s: None)
    best = trainer.fit(Batcher(ds, 8, True), Batcher(ds, 8, False), epochs=1)
    assert np.isfinite(best)


def test_trainer_freeze_encoder_only_updates_head():
    model, params, cfg = _tiny_classifier(freeze_encoder=True)
    ds = _toy_dataset(n=16)
    before = jax.device_get(params["params"])
    trainer = SupervisedTrainer(model, params, optimizer_name="adam", lr=1e-2,
                                classifier_config=cfg, log=lambda s: None)
    trainer.fit(Batcher(ds, 8, True), None, epochs=1)
    after = jax.device_get(trainer.state.params)
    enc_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)), before["encoder"], after["encoder"]))
    head_same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)), before["head"], after["head"]))
    assert enc_same and not head_same


def test_data_parallel_training_on_mesh():
    from wav2vec_heart_sounds_tpu.parallel import data_parallel_mesh
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual CPU devices"
    mesh = data_parallel_mesh(8)
    model, params, cfg = _tiny_classifier()
    ds = _toy_dataset(n=32)
    trainer = SupervisedTrainer(model, params, optimizer_name="adam", lr=3e-3,
                                classifier_config=cfg, mesh=mesh, log=lambda s: None)
    best = trainer.fit(Batcher(ds, 16, True, seed=1), Batcher(ds, 16, False), epochs=2)
    assert np.isfinite(best)


def test_data_parallel_batch_actually_sharded():
    """A replicate-everything regression in maybe_shard_batch must fail loudly: the batch
    must land sharded over ``dp`` (one distinct shard per device, batch/8 rows each), and
    the compiled train step must contain a gradient all-reduce (SURVEY.md §2.7)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wav2vec_heart_sounds_tpu.parallel import data_parallel_mesh
    from wav2vec_heart_sounds_tpu.parallel.mesh import maybe_shard_batch

    mesh = data_parallel_mesh(8)
    x = maybe_shard_batch(np.ones((16, 800), np.float32), mesh)
    assert x.sharding == NamedSharding(mesh, P("dp"))
    assert not x.sharding.is_fully_replicated
    shards = x.addressable_shards
    assert len(shards) == 8 and all(s.data.shape == (2, 800) for s in shards)

    # batch not divisible by the mesh: a clear error, not silent replication
    with pytest.raises(ValueError, match="not divisible"):
        maybe_shard_batch(np.ones((10, 800), np.float32), mesh)

    model, params, cfg = _tiny_classifier()
    trainer = SupervisedTrainer(model, params, optimizer_name="sgd", lr=1e-3,
                                classifier_config=cfg, mesh=mesh, log=lambda s: None)
    y = maybe_shard_batch(np.zeros((16,), np.int64), mesh)
    valid = maybe_shard_batch(np.ones((16,), np.float32), mesh)
    lowered = trainer._train_step.lower(
        trainer.state.params, trainer.state.loss_params, trainer.state.opt_state,
        x, y, valid, jnp.asarray(1e-3, jnp.float32), jax.random.key(0))
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in the compiled dp train step"


def test_neural_svm_probe():
    model, params, cfg = _tiny_classifier()
    ds = _toy_dataset(n=24)

    @jax.jit
    def encode(x):
        return model.apply(params, x, method=Wav2VecClassifier.encode)

    svm = NeuralSVM(encode, k_best=8).fit(Batcher(ds, 8, False))
    stats = svm.evaluate(Batcher(ds, 8, False))
    assert 0.0 <= stats["accuracy"] <= 1.0


def test_fusion_training_end_to_end():
    from wav2vec_heart_sounds_tpu.models import two_branch_pcg_ecg
    from wav2vec_heart_sounds_tpu.train import evaluate, make_apply_fn

    m1, p1, _ = _tiny_classifier()
    m2, p2, _ = _tiny_classifier()
    fusion, fusion_vars = two_branch_pcg_ecg((m1, p1), (m2, p2), key=jax.random.key(0))
    assert set(fusion_vars["params"]) == {"head", "branch_0", "branch_1"}
    # snapshot before fitting: the donated train step consumes the original buffers
    before = np.asarray(jax.tree_util.tree_leaves(p1["params"])[0]).copy()

    rng = np.random.default_rng(0)
    frags = [Fragment(rng.normal(size=(800, 2)).astype(np.float32), i % 2, f"p{i}")
             for i in range(8)]
    ds = FragmentDataset(frags, fs=1000)
    trainer = SupervisedTrainer(fusion, fusion_vars, optimizer_name="adam", lr=1e-3,
                                log=lambda s: None)
    best = trainer.fit(Batcher(ds, 4, True), Batcher(ds, 4, False), epochs=1)
    assert np.isfinite(best)
    # branch encoders fine-tune during fusion fitting (reference semantics)
    after = jax.tree_util.tree_leaves(trainer.state.params["branch_0"])[0]
    assert not np.array_equal(before, np.asarray(after))
    metrics = evaluate(make_apply_fn(fusion, trainer.variables), Batcher(ds, 4, False))
    assert "patient" in metrics


def test_trainer_raw_wire_device_preprocess():
    """Raw-wire loop: int16 low-rate windows over the wire, preprocessing on device.

    Mirrors bench.py --mode=real default: the Batcher ships half-rate raw windows and
    ``device_preprocess`` dequantises + resamples them to the model's input length
    between transfer and train step (reference ships full preprocessed windows,
    src/mpcg_wav2vec/experiments/common.py:14-23)."""
    import jax.numpy as jnp

    model, params, cfg = _tiny_classifier()
    rng = np.random.default_rng(3)
    frags = []
    tt = np.arange(400) / 500.0
    for i in range(16):
        label = i % 2
        x = rng.normal(0, 0.2, 400).astype(np.float32)
        if label:
            x += 0.8 * np.sin(2 * np.pi * 120 * tt).astype(np.float32)
        frags.append(Fragment(x / 2.0, label, f"p{i % 4}"))
    ds = FragmentDataset(frags, fs=500)

    def dev_prep(x):
        assert jnp.issubdtype(x.dtype, jnp.integer)   # wire really was int16
        x = x.astype(jnp.float32) * (1.0 / 32767.0)
        return jnp.repeat(x, 2, axis=1)               # toy device "resample" 500->1000 Hz

    trainer = SupervisedTrainer(model, params, optimizer_name="adam", lr=3e-3,
                                device_preprocess=dev_prep, classifier_config=cfg,
                                log=lambda s: None)
    train_b = Batcher(ds, 8, True, seed=0, target_len=400, wire_int16=True)
    valid_b = Batcher(ds, 8, False, target_len=400, wire_int16=True)
    best = trainer.fit(train_b, valid_b, epochs=2)
    assert np.isfinite(best)
