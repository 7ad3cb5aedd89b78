"""sklearn estimator-contract essentials (the reference runs sklearn's
`parametrize_with_checks` on its vanilla tree, `test_classifier_interface.py:99-112`;
here the load-bearing contract points are tested directly with a small model)."""

import pickle

import numpy as np
from sklearn.base import clone

from multimodalpfn_tpu import MMPFNRegressor, TabPFNClassifier, TabPFNRegressor
from multimodalpfn_tpu.datasets.synthetic import toy_classification, toy_regression


def test_get_set_params_and_clone():
    clf = TabPFNClassifier(
        model_path="random:0", n_estimators=3, softmax_temperature=0.8, random_state=1
    )
    params = clf.get_params()
    assert params["n_estimators"] == 3
    assert params["softmax_temperature"] == 0.8
    c2 = clone(clf)
    assert c2.get_params()["n_estimators"] == 3
    c2.set_params(n_estimators=2)
    assert c2.n_estimators == 2 and clf.n_estimators == 3


def test_fitted_classifier_pickles():
    X, y = toy_classification(n=60, n_classes=3, seed=0)
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(X[:45], y[:45])
    p1 = clf.predict_proba(X[45:])
    blob = pickle.dumps(clf)
    clf2 = pickle.loads(blob)
    p2 = clf2.predict_proba(X[45:])
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_refit_resets_state():
    X, y = toy_classification(n=60, n_classes=3, seed=1)
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(X[:40], y[:40])
    p1 = clf.predict_proba(X[40:])
    clf.fit(X[:40], y[:40])  # refit with identical data reproduces
    p2 = clf.predict_proba(X[40:])
    np.testing.assert_array_equal(p1, p2)
    # refit on different labels changes classes_
    y2 = np.array(["a", "b", "c"])[y]
    clf.fit(X[:40], y2[:40])
    assert set(clf.classes_) == {"a", "b", "c"}


def test_predict_before_fit_raises():
    import pytest
    from sklearn.exceptions import NotFittedError

    X, _ = toy_classification(n=10, seed=2)
    clf = TabPFNClassifier(model_path="random:0")
    with pytest.raises(NotFittedError):
        clf.predict_proba(X)


def test_regressor_contract_basics():
    X, y = toy_regression(n=50, seed=0)
    reg = TabPFNRegressor(model_path="random:0", n_estimators=2, random_state=0)
    assert clone(reg).get_params()["n_estimators"] == 2
    reg.fit(X[:40], y[:40])
    blob = pickle.dumps(reg)
    reg2 = pickle.loads(blob)
    np.testing.assert_allclose(
        reg.predict(X[40:]), reg2.predict(X[40:]), atol=1e-6
    )


def test_feature_count_mismatch_raises():
    import pytest

    X, y = toy_classification(n=40, n_features=5, seed=3)
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2)
    clf.fit(X[:30], y[:30])
    with pytest.raises(ValueError, match="features"):
        clf.predict_proba(X[30:, :4])
