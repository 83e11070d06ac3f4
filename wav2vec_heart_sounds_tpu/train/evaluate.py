"""Fragment-level and patient-level evaluation.

Contract from reference src/mpcg_wav2vec/classify/evaluate.py:21-45: every window scored
independently (fragment level), and each patient's fragment logits aggregated by mean softmax
into one prediction (patient level — the paper's reporting granularity). Logit collection is a
jitted forward; the patient aggregation is a cheap host pass.
"""

from __future__ import annotations

from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import ConfusionMatrix


def evaluate(apply_fn, batcher, max_batches: int | None = None) -> dict:
    """``apply_fn(x) -> logits`` (already closed over params and jitted by the caller)."""
    fragment_cm = ConfusionMatrix()
    patient_logits: dict[str, list[np.ndarray]] = defaultdict(list)
    patient_true: dict[str, int] = {}

    for i, batch in enumerate(batcher):
        if max_batches is not None and i >= max_batches:
            break
        logits = np.asarray(apply_fn(batch["waveform"]))
        preds = logits.argmax(axis=1)
        fragment_cm.update(batch["label"], preds, batch["valid"])
        for j, patient in enumerate(batch["patient"]):
            if not batch["valid"][j]:
                continue
            patient_logits[patient].append(logits[j])
            patient_true[patient] = int(batch["label"][j])

    patient_cm = ConfusionMatrix()
    for patient, logit_list in patient_logits.items():
        mean_prob = jax.nn.softmax(jnp.asarray(np.stack(logit_list).mean(axis=0)), axis=0)
        patient_cm.update([patient_true[patient]], [int(np.argmax(np.asarray(mean_prob)))])

    return {"fragment": fragment_cm.stats(), "patient": patient_cm.stats()}


def _dequant(x):
    if jnp.issubdtype(x.dtype, jnp.integer):   # int16 wire format
        return x.astype(jnp.float32) * (1.0 / 32767.0)
    return x


def make_apply_fn(model, variables):
    """Jitted logits function. Params are a jit *argument*, never a closure constant —
    closed-over weights get embedded into the HLO and blow up remote compilation."""
    jitted = jax.jit(lambda v, x: model.apply(v, _dequant(x)))

    def apply_fn(x):
        return jitted(variables, x)

    return apply_fn


def make_encode_fn(model, variables, method=None):
    """Jitted pooled-feature function with params as an argument (for the SVM probe)."""
    from ..models.classifier import Wav2VecClassifier

    method = method or Wav2VecClassifier.encode
    jitted = jax.jit(lambda v, x: model.apply(v, _dequant(x), method=method))

    def encode_fn(x):
        return jitted(variables, x)

    return encode_fn
