"""The flattened (lane-aligned 2-D packed) optimizer must match the per-leaf chain exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from wav2vec_heart_sounds_tpu.train.optim import _flatten_2d, build_optimizer, lr_schedule


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "a": {"kernel": jnp.asarray(rng.normal(size=(7, 13)), jnp.float32),
              "bias": jnp.asarray(rng.normal(size=(13,)), jnp.float32)},
        "b": jnp.asarray(rng.normal(size=(130,)), jnp.float32),
    }


@pytest.mark.parametrize("name", ["sgd", "adam", "adamw"])
def test_flattened_matches_per_leaf(name):
    params = _tree(0)
    grads = _tree(1)

    def inner():
        from wav2vec_heart_sounds_tpu.train.optim import _inner
        return optax.chain(optax.clip_by_global_norm(5.0), _inner(name, 1e-5, 0.9),
                           optax.scale(-1.0))

    flat_tx = _flatten_2d(inner(), cols=32)
    leaf_tx = inner()

    fs, ls = flat_tx.init(params), leaf_tx.init(params)
    p_f, p_l = params, params
    for step in range(3):
        uf, fs = flat_tx.update(grads, fs, p_f)
        ul, ls = leaf_tx.update(grads, ls, p_l)
        p_f = optax.apply_updates(p_f, uf)
        p_l = optax.apply_updates(p_l, ul)
    for a, b in zip(jax.tree_util.tree_leaves(p_f), jax.tree_util.tree_leaves(p_l)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_build_optimizer_freeze_path_still_masks():
    params = _tree(0)
    grads = _tree(1)
    mask = {"a": {"kernel": False, "bias": False}, "b": True}
    tx, _ = build_optimizer("adam", trainable=mask, max_grad_norm=None)
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["a"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["b"]).max()) > 0.0


@pytest.mark.fast
@pytest.mark.parametrize("name", ["sgd", "adam", "adamw"])
def test_flattened_masked_matches_per_leaf_masked(name, monkeypatch):
    """The packed-domain freeze (vest-crash fix) must emit the exact per-leaf
    optax.masked-chain updates: same clip norm (trainable-only), same decay, same
    moments — over several steps so momentum/adam state divergence would surface."""
    params = _tree(0)
    mask = {"a": {"kernel": False, "bias": True}, "b": True}

    def run(flat: bool):
        monkeypatch.setenv("W2VHS_FLAT_OPT", "1" if flat else "0")
        tx, _ = build_optimizer(name, 1e-2, weight_decay=1e-3, trainable=mask,
                                max_grad_norm=5.0)
        state = tx.init(params)
        p = params
        for step in range(4):
            grads = _tree(10 + step)
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p

    p_flat, p_leaf = run(True), run(False)
    # Frozen leaf never moves under either path.
    np.testing.assert_array_equal(np.asarray(p_flat["a"]["kernel"]),
                                  np.asarray(params["a"]["kernel"]))
    for a, b in zip(jax.tree_util.tree_leaves(p_flat), jax.tree_util.tree_leaves(p_leaf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.fast
@pytest.mark.parametrize("name", ["sgd", "adam", "adamw"])
@pytest.mark.parametrize("masked", [False, True])
def test_packed_master_matches_per_leaf(name, masked, monkeypatch):
    """The packed-master form (master params resident in opt state, lr folded into the
    packed domain — the round-5 trainer default) must reproduce the per-leaf optax.masked
    oracle trajectories exactly, including across a refresh() (best-MCC restore path)."""
    from wav2vec_heart_sounds_tpu.train.optim import build_master_optimizer

    params = _tree(0)
    mask = {"a": {"kernel": False, "bias": True}, "b": True} if masked else None
    lr = 1e-2

    mtx, _ = build_master_optimizer(name, lr, weight_decay=1e-3, trainable=mask,
                                    max_grad_norm=5.0)
    monkeypatch.setenv("W2VHS_FLAT_OPT", "0")
    ltx, _ = build_optimizer(name, lr, weight_decay=1e-3,
                             trainable=mask if masked else None, max_grad_norm=5.0)

    ms, ls = mtx.init(params), ltx.init(params)
    p_m, p_l = params, params
    for step in range(4):
        grads = _tree(10 + step)
        p_m, ms = mtx.step(grads, ms, lr, p_m)
        ul, ls = ltx.update(grads, ls, p_l)
        p_l = optax.apply_updates(p_l, jax.tree_util.tree_map(lambda u: lr * u, ul))
        if step == 1:
            # Simulate the trainer's best-MCC restore: overwrite params out-of-band on
            # both sides and re-pack the master copy.
            p_m = p_l = _tree(99)
            ms = mtx.refresh(ms, p_m)
        for a, b in zip(jax.tree_util.tree_leaves(p_m), jax.tree_util.tree_leaves(p_l)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    if masked:
        np.testing.assert_array_equal(np.asarray(p_m["a"]["kernel"]),
                                      np.asarray(_tree(99)["a"]["kernel"]))


@pytest.mark.fast
def test_row_mask_treedef_mismatch_raises():
    """A freeze mask whose treedef differs from the params must raise, not silently
    freeze the wrong rows (advisor r4 finding)."""
    from wav2vec_heart_sounds_tpu.train.optim import _row_mask

    params = _tree(0)
    bad_mask = {"a": {"kernel": False, "bias": True}, "c": True}   # wrong key
    with pytest.raises(Exception):
        _row_mask(bad_mask, params, 32)


@pytest.mark.fast
@pytest.mark.parametrize("name", ["sgd", "adam"])
def test_frozen_rows_accumulate_no_decay_state(name):
    """Coupled-decay optimizers must not inject wd*param into frozen rows' stored
    momentum/adam moments (advisor r4 finding: packed state must match the per-leaf
    oracle, not only the emitted updates)."""
    from wav2vec_heart_sounds_tpu.train.optim import _pack_tree, build_master_optimizer

    params = _tree(0)
    mask = {"a": {"kernel": False, "bias": True}, "b": True}
    mtx, _ = build_master_optimizer(name, 1e-2, weight_decay=1e-1, trainable=mask,
                                    max_grad_norm=None)
    state = mtx.init(params)
    p = params
    for step in range(3):
        p, state = mtx.step(_tree(10 + step), state, 1e-2, p)
    inner_state = state[0]
    moments = [l for l in jax.tree_util.tree_leaves(inner_state)
               if hasattr(l, "shape") and l.ndim == 2]
    assert moments, "expected packed momentum/adam state"
    # Row ranges follow tree_leaves order (dict keys sorted: a/bias, a/kernel, b).
    row = 0
    frozen_rows = []
    for flag, leaf in zip(jax.tree_util.tree_leaves(mask),
                          jax.tree_util.tree_leaves(params)):
        rows = -(-leaf.size // 1024)
        if not flag:
            frozen_rows.extend(range(row, row + rows))
        row += rows
    assert frozen_rows
    for m in moments:
        for r in frozen_rows:
            assert float(jnp.abs(m[r]).max()) == 0.0


def test_step_lr_schedule():
    sched = lr_schedule("sgd", 1e-3)
    assert sched(0) == pytest.approx(1e-3)
    assert sched(6) == pytest.approx(1e-3)
    assert sched(7) == pytest.approx(1e-4)
    assert sched(14) == pytest.approx(1e-5)
    assert lr_schedule("adam", 1e-3)(100) == pytest.approx(1e-3)
