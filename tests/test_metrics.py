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
        "mape", "smape", "spearmanr", "pearsonr", "average_precision",
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


def test_percentage_and_correlation_scorers():
    """mape/smape/spearmanr/pearsonr semantics per `ag_metrics.py:584-670`."""
    y = np.array([1.0, 2.0, 4.0, 8.0])
    pred = np.array([1.1, 1.9, 4.4, 7.2])

    mape = get_scorer("mape")
    want = float(np.mean(np.abs((pred - y) / y)))
    assert mape(y, pred) == pytest.approx(want)
    assert mape.convert_score_to_error(mape(y, pred)) == pytest.approx(want)

    smape = get_scorer("smape")
    want = float(np.mean(np.abs(pred - y) / (np.abs(y) + np.abs(pred))))
    assert smape(y, pred) == pytest.approx(want)
    # perfect prediction -> 0 error
    assert smape(y, y) == pytest.approx(0.0)

    for name in ("spearmanr", "pearsonr"):
        s = get_scorer(name)
        assert s(y, y) == pytest.approx(1.0), name
        assert s.convert_score_to_error(s(y, y)) == pytest.approx(0.0), name
        # anti-correlated predictions score -1 -> error 2
        assert s(y, -y) == pytest.approx(-1.0), name
        assert s.convert_score_to_error(s(y, -y)) == pytest.approx(2.0), name
    # spearman is rank-based: any monotone map preserves the perfect score
    assert get_scorer("spearmanr")(y, y**3) == pytest.approx(1.0)
    assert get_scorer("pearsonr")(y, 2 * y + 1) == pytest.approx(1.0)


def test_average_precision_scorer():
    """Binary threshold metric; (n, 2) probabilities use the positive column."""
    from sklearn.metrics import average_precision_score

    y = np.array([0, 1, 1, 0, 1, 0])
    p1 = np.array([0.1, 0.9, 0.7, 0.4, 0.8, 0.2])
    ap = get_scorer("average_precision")
    want = average_precision_score(y, p1)
    assert ap(y, p1) == pytest.approx(want)
    # two-column probability input reduces to the positive-class column
    assert ap(y, np.stack([1 - p1, p1], axis=1)) == pytest.approx(want)
    # perfectly-ranked scores -> AP 1.0 -> error 0
    assert ap.convert_score_to_error(ap(y, y.astype(float))) == pytest.approx(0.0)


def test_unknown_metric_raises():
    with pytest.raises(ValueError, match="Unknown metric"):
        get_scorer("nope")
