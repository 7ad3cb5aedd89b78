"""End-to-end estimator tests on synthetic data with random-init weights.

Models the reference's interface test grid (`models/tabpfn_v2/tests/
test_classifier_interface.py:29-96`) — fit modes × shift methods × precision —
plus working multimodal coverage the reference lacks (its mm tests are stale,
SURVEY.md §4)."""

import numpy as np
import pytest

from multimodalpfn_tpu import MMPFNClassifier, TabPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import (
    toy_classification,
    toy_multimodal_classification,
)


def _check_proba(clf, proba, n, n_classes):
    assert proba.shape == (n, n_classes)
    np.testing.assert_allclose(proba.sum(axis=1), np.ones(n), rtol=1e-6)
    assert (proba >= 0).all()


def test_tabular_fit_predict_learns():
    X, y = toy_classification(n=100, n_classes=3, seed=3)
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(X[:70], y[:70])
    proba = clf.predict_proba(X[70:])
    _check_proba(clf, proba, 30, 3)
    pred = clf.predict(X[70:])
    assert pred.shape == (30,)
    assert set(pred) <= set(np.unique(y))


@pytest.mark.parametrize("fit_mode", ["low_memory", "fit_preprocessors", "fit_with_cache"])
def test_fit_modes(fit_mode):
    X, y = toy_classification(n=60, n_classes=2, seed=1)
    clf = TabPFNClassifier(
        model_path="random:0", n_estimators=2, fit_mode=fit_mode, random_state=0
    )
    clf.fit(X[:40], y[:40])
    p1 = clf.predict_proba(X[40:])
    p2 = clf.predict_proba(X[40:])
    _check_proba(clf, p1, 20, 2)
    np.testing.assert_allclose(p1, p2, atol=1e-6)  # predicts are deterministic


def test_string_labels_roundtrip():
    X, y = toy_classification(n=60, n_classes=3, seed=2)
    labels = np.array(["cat", "dog", "fox"])[y]
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(X[:45], labels[:45])
    pred = clf.predict(X[45:])
    assert set(pred) <= {"cat", "dog", "fox"}


def test_multimodal_fit_predict():
    X, emb, y = toy_multimodal_classification(n=80, n_classes=3, emb_dim=768, seed=4)
    clf = MMPFNClassifier(
        model_path="random:0",
        mixer_type="MGM+CAP",
        mgm_heads=2,
        cap_heads=2,
        features_per_group=1,
        n_estimators=2,
        random_state=0,
    )
    clf.fit(X[:60], emb[:60], y[:60])
    proba = clf.predict_proba(X[60:], emb[60:])
    _check_proba(clf, proba, 20, 3)


def test_image_only_mode():
    _, emb, y = toy_multimodal_classification(n=60, n_classes=2, emb_dim=768, seed=5)
    clf = MMPFNClassifier(
        model_path="random:0",
        mixer_type="MGM",
        mgm_heads=2,
        cap_heads=2,
        n_estimators=2,
        random_state=0,
    )
    clf.fit(None, emb[:45], y[:45])
    proba = clf.predict_proba(None, emb[45:])
    _check_proba(clf, proba, 15, 2)


def test_balance_and_temperature_options():
    X, y = toy_classification(n=60, n_classes=2, seed=6)
    clf = TabPFNClassifier(
        model_path="random:0",
        n_estimators=2,
        softmax_temperature=1.0,
        balance_probabilities=True,
        average_before_softmax=True,
        random_state=0,
    )
    clf.fit(X[:40], y[:40])
    _check_proba(clf, clf.predict_proba(X[40:]), 20, 2)


def test_too_many_classes_raises():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(60, 4))
    y = np.arange(60) % 11
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2)
    with pytest.raises(ValueError, match="classes"):
        clf.fit(X, y)


def test_jax_array_image_input_matches_numpy():
    """A user-supplied device-resident (jax.Array) test embedding must behave
    exactly like the numpy one — regression pin for the round-5 bug where the
    'prepadded upload' sentinel was `isinstance(x, jax.Array)` and misfired on
    user device arrays (now an explicit `_PaddedImage` wrapper)."""
    import jax.numpy as jnp

    X, emb, y = toy_multimodal_classification(n=80, n_classes=3, emb_dim=768, seed=4)
    clf = MMPFNClassifier(
        model_path="random:0", mixer_type="MGM+CAP", mgm_heads=2, cap_heads=2,
        features_per_group=1, n_estimators=2, random_state=0,
    )
    clf.fit(X[:60], emb[:60], y[:60])
    p_np = clf.predict_proba(X[60:], emb[60:])
    p_jax = clf.predict_proba(X[60:], jnp.asarray(emb[60:]))
    np.testing.assert_allclose(p_jax, p_np, atol=1e-6)
