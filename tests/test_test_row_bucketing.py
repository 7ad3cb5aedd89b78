"""Test-row bucketing: padded predicts are bit-identical for real rows, and
different test sizes within a bucket reuse one compiled program."""

import numpy as np

from multimodalpfn_tpu import TabPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import toy_classification
from multimodalpfn_tpu.estimator.inference import _bucket_test_rows


def test_bucket_sizes():
    assert _bucket_test_rows(1) == 128
    assert _bucket_test_rows(128) == 128
    assert _bucket_test_rows(129) == 256
    assert _bucket_test_rows(460) == 512


def test_bucketed_predictions_consistent_across_test_sizes():
    """Predicting m rows must equal the first m rows of predicting m+k rows
    (test rows never interact; padding rows are existing-row copies)."""
    X, y = toy_classification(n=120, n_classes=3, seed=0)
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(X[:80], y[:80])
    p_all = clf.predict_proba(X[80:])
    p_some = clf.predict_proba(X[80:100])
    np.testing.assert_allclose(p_some, p_all[:20], atol=1e-6)
    p_one = clf.predict_proba(X[80:81])
    np.testing.assert_allclose(p_one, p_all[:1], atol=1e-6)


def test_bucketed_cachekv_consistent():
    X, y = toy_classification(n=120, n_classes=3, seed=1)
    clf = TabPFNClassifier(
        model_path="random:0", n_estimators=2, random_state=0, fit_mode="fit_with_cache"
    )
    clf.fit(X[:80], y[:80])
    p_all = clf.predict_proba(X[80:])
    p_some = clf.predict_proba(X[80:90])
    np.testing.assert_allclose(p_some, p_all[:10], atol=1e-6)
