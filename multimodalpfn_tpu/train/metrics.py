"""Validation metric registry (score <-> error convention).

Compact re-design of the reference's AutoGluon-derived Scorer hierarchy
(`scripts_finetune_mm/metric_utils/ag_metrics.py:34-886`): a Scorer wraps a
sklearn metric plus its optimum and whether it consumes probabilities; `error =
optimum - score` for greater-is-better metrics, `error = score` otherwise, so the
fine-tuning loop can always minimize.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np


@dataclass(frozen=True)
class Scorer:
    name: str
    fn: Callable[..., float]
    optimum: float
    greater_is_better: bool
    needs_proba: bool = False
    needs_threshold: bool = False

    def __call__(self, y_true, y_pred) -> float:
        return float(self.fn(y_true, y_pred))

    def convert_score_to_error(self, score: float) -> float:
        return self.optimum - score if self.greater_is_better else score

    def convert_error_to_score(self, error: float) -> float:
        return self.optimum - error if self.greater_is_better else error


def _proba_to_labels(y_pred):
    y_pred = np.asarray(y_pred)
    return y_pred.argmax(axis=-1) if y_pred.ndim > 1 else (y_pred > 0.5).astype(int)


def _make_registry() -> dict[str, Scorer]:
    from sklearn import metrics as M

    def acc(y, p):
        return M.accuracy_score(y, _proba_to_labels(p))

    def bal_acc(y, p):
        return M.balanced_accuracy_score(y, _proba_to_labels(p))

    def f1(y, p):
        return M.f1_score(y, _proba_to_labels(p), average="macro")

    def mcc(y, p):
        return M.matthews_corrcoef(y, _proba_to_labels(p))

    def roc_auc(y, p):
        p = np.asarray(p)
        if p.ndim > 1 and p.shape[-1] == 2:
            p = p[:, 1]
        if p.ndim > 1:
            # multiclass: one-vs-one macro (reference registry default)
            return M.roc_auc_score(y, p, multi_class="ovo", average="macro")
        return M.roc_auc_score(y, p)

    def log_loss(y, p):
        return M.log_loss(y, p)

    def rmse(y, p):
        return float(np.sqrt(M.mean_squared_error(y, p)))

    def precision(y, p):
        return M.precision_score(y, _proba_to_labels(p), average="macro", zero_division=0)

    def recall(y, p):
        return M.recall_score(y, _proba_to_labels(p), average="macro", zero_division=0)

    def quadratic_kappa(y, p):
        return M.cohen_kappa_score(y, _proba_to_labels(p), weights="quadratic")

    def pac(y, p):
        # AutoGluon's pac_score analogue: 1 - normalized log loss vs the prior
        import numpy as _np

        p = _np.clip(_np.asarray(p, float), 1e-15, 1.0)
        n_classes = p.shape[-1] if p.ndim > 1 else 2
        ll = M.log_loss(y, p, labels=list(range(n_classes)))
        return float(_np.exp(-ll))

    def smape(y, p):
        # reference `ag_metrics.py:593-597` (smape_func): symmetric MAPE with
        # an eps-guarded denominator, averaged over rows
        y = np.asarray(y, float)
        p = np.asarray(p, float)
        eps = np.finfo(np.float64).eps
        return float(
            np.average(np.abs(p - y) / np.maximum(np.abs(y) + np.abs(p), eps))
        )

    def spearman(y, p):
        from scipy import stats

        return float(stats.spearmanr(y, p)[0])

    def pearson(y, p):
        from scipy import stats

        return float(stats.pearsonr(y, p)[0])

    def average_precision(y, p):
        # threshold metric (reference `ag_metrics.py:668-672`): binary only;
        # (n, 2) probabilities reduce to the positive-class score column
        p = np.asarray(p)
        if p.ndim > 1 and p.shape[-1] == 2:
            p = p[:, 1]
        return M.average_precision_score(y, p)

    return {
        "accuracy": Scorer("accuracy", acc, 1.0, True, needs_proba=True),
        "precision": Scorer("precision", precision, 1.0, True, needs_proba=True),
        "recall": Scorer("recall", recall, 1.0, True, needs_proba=True),
        "quadratic_kappa": Scorer("quadratic_kappa", quadratic_kappa, 1.0, True, needs_proba=True),
        "pac": Scorer("pac", pac, 1.0, True, needs_proba=True),
        "mse": Scorer(
            "mse", lambda y, p: M.mean_squared_error(y, p), 0.0, False
        ),
        "medae": Scorer(
            "medae", lambda y, p: M.median_absolute_error(y, p), 0.0, False
        ),
        "balanced_accuracy": Scorer("balanced_accuracy", bal_acc, 1.0, True, needs_proba=True),
        "f1": Scorer("f1", f1, 1.0, True, needs_proba=True),
        "mcc": Scorer("mcc", mcc, 1.0, True, needs_proba=True),
        "roc_auc": Scorer("roc_auc", roc_auc, 1.0, True, needs_proba=True),
        "log_loss": Scorer("log_loss", log_loss, 0.0, False, needs_proba=True),
        "rmse": Scorer("rmse", rmse, 0.0, False),
        "mape": Scorer(
            "mape",
            lambda y, p: M.mean_absolute_percentage_error(y, p),
            0.0,
            False,
        ),
        "smape": Scorer("smape", smape, 0.0, False),
        "spearmanr": Scorer("spearmanr", spearman, 1.0, True),
        "pearsonr": Scorer("pearsonr", pearson, 1.0, True),
        "average_precision": Scorer(
            "average_precision",
            average_precision,
            1.0,
            True,
            needs_proba=True,
            needs_threshold=True,
        ),
        "mae": Scorer(
            "mae",
            lambda y, p: __import__("sklearn.metrics", fromlist=["m"]).mean_absolute_error(y, p),
            0.0,
            False,
        ),
        "r2": Scorer(
            "r2",
            lambda y, p: __import__("sklearn.metrics", fromlist=["m"]).r2_score(y, p),
            1.0,
            True,
        ),
    }


METRICS: dict[str, Scorer] = _make_registry()


def get_scorer(name: str) -> Scorer:
    if name not in METRICS:
        raise ValueError(f"Unknown metric {name}; available: {sorted(METRICS)}")
    return METRICS[name]
