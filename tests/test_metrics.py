"""Metric registry: score/error conversion and registry coverage
(reference `metric_utils/ag_metrics.py` scorer semantics)."""

import numpy as np
import pytest

from multimodalpfn_tpu.train.metrics import METRICS, get_scorer


def test_registry_contents():
    expected = {
        "accuracy", "balanced_accuracy", "f1", "mcc", "roc_auc", "log_loss",
        "rmse", "mae", "r2", "precision", "recall", "quadratic_kappa", "pac",
        "mse", "medae",
    }
    assert expected <= set(METRICS)


def test_classification_scorers():
    y = np.array([0, 1, 2, 1, 0, 2])
    proba = np.eye(3)[y] * 0.8 + 0.1
    proba = proba / proba.sum(axis=1, keepdims=True)
    for name in ("accuracy", "balanced_accuracy", "f1", "precision", "recall",
                 "quadratic_kappa", "mcc"):
        s = get_scorer(name)
        score = s(y, proba)
        assert score == pytest.approx(1.0), name
        assert s.convert_score_to_error(score) == pytest.approx(0.0), name
    ll = get_scorer("log_loss")
    err = ll.convert_score_to_error(ll(y, proba))
    assert err > 0  # lower-is-better: error == score
    auc = get_scorer("roc_auc")
    assert auc(y, proba) == pytest.approx(1.0)


def test_regression_scorers_and_error_roundtrip():
    y = np.array([1.0, 2.0, 3.0])
    pred = np.array([1.1, 2.0, 2.9])
    for name in ("rmse", "mae", "mse", "medae"):
        s = get_scorer(name)
        err = s.convert_score_to_error(s(y, pred))
        assert err >= 0
        assert s.convert_error_to_score(err) == pytest.approx(s(y, pred))
    r2 = get_scorer("r2")
    assert r2(y, pred) == pytest.approx(1.0, abs=0.05)


def test_unknown_metric_raises():
    with pytest.raises(ValueError, match="Unknown metric"):
        get_scorer("nope")
