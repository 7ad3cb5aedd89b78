"""Order invariance: the in-context set structure means train-row order must not
change predictions (up to fp reduction order), and test-row predictions must
permute with the rows (the property the reference pins with float64 sklearn
checks, `test_classifier_interface.py:99-112`)."""

import numpy as np

from multimodalpfn_tpu import TabPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import toy_classification


def _fit_predict(order, seed=0):
    X, y = toy_classification(n=80, n_classes=3, nan_share=0.05, seed=4)
    Xtr, ytr = X[:60][order], y[:60][order]
    clf = TabPFNClassifier(
        model_path="random:0",
        n_estimators=2,
        random_state=seed,
        inference_precision="float32",
        inference_config={"FINGERPRINT_FEATURE": False},
    )
    clf.fit(Xtr, ytr)
    return clf.predict_proba(X[60:])


def test_train_row_order_invariance():
    base = _fit_predict(np.arange(60))
    shuffled = _fit_predict(np.random.default_rng(0).permutation(60))
    np.testing.assert_allclose(shuffled, base, rtol=2e-3, atol=2e-4)


def test_test_row_order_equivariance():
    X, y = toy_classification(n=80, n_classes=3, seed=5)
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(X[:60], y[:60])
    p = clf.predict_proba(X[60:])
    perm = np.random.default_rng(1).permutation(20)
    p_perm = clf.predict_proba(X[60:][perm])
    np.testing.assert_allclose(p_perm, p[perm], atol=1e-6)
