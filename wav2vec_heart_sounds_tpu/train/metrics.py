"""Binary classification metrics: one confusion-matrix accumulator.

Contract from reference src/mpcg_wav2vec/classify/metrics.py:14-63 — the paper's exact metric
set: accuracy, UAR, sensitivity, specificity, NPV, precision, F1, MCC.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass
class ConfusionMatrix:
    tp: int = 0
    tn: int = 0
    fp: int = 0
    fn: int = 0

    def update(self, y_true, y_pred, valid=None) -> None:
        y_true = np.asarray(y_true).astype(np.int64).ravel()
        y_pred = np.asarray(y_pred).astype(np.int64).ravel()
        if valid is None:
            valid = np.ones_like(y_true, dtype=bool)
        else:
            valid = np.asarray(valid, dtype=bool).ravel()
        t, p = y_true[valid], y_pred[valid]
        self.tp += int(np.sum((t == 1) & (p == 1)))
        self.tn += int(np.sum((t == 0) & (p == 0)))
        self.fp += int(np.sum((t == 0) & (p == 1)))
        self.fn += int(np.sum((t == 1) & (p == 0)))

    @property
    def total(self) -> int:
        return self.tp + self.tn + self.fp + self.fn

    @staticmethod
    def _safe(num, den) -> float:
        return num / den if den else 0.0

    def stats(self) -> dict[str, float]:
        sens = self._safe(self.tp, self.tp + self.fn)
        spec = self._safe(self.tn, self.tn + self.fp)
        ppv = self._safe(self.tp, self.tp + self.fp)
        npv = self._safe(self.tn, self.tn + self.fn)
        f1 = self._safe(2 * ppv * sens, ppv + sens)
        denom = math.sqrt((self.tp + self.fp) * (self.tp + self.fn)
                          * (self.tn + self.fp) * (self.tn + self.fn))
        mcc = (self.tp * self.tn - self.fp * self.fn) / denom if denom else 0.0
        return {
            "accuracy": self._safe(self.tp + self.tn, self.total),
            "uar": 0.5 * (sens + spec),
            "sensitivity": sens,
            "specificity": spec,
            "npv": npv,
            "precision": ppv,
            "f1": f1,
            "mcc": mcc,
        }

    def __str__(self) -> str:
        s = self.stats()
        return (f"acc={s['accuracy']:.4f} uar={s['uar']:.4f} sens={s['sensitivity']:.4f} "
                f"spec={s['specificity']:.4f} mcc={s['mcc']:.4f}")
