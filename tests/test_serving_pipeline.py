"""Pipelined request-stream serving: `predict_proba_many` / `predict_many`.

The reference serves repeated predicts strictly sequentially
(`mmpfn/models/mmpfn/inference.py:354-513`); the TPU-native replacement
splits each predict into an async dispatch half and a device-sync half so
host work of request N+1 overlaps device execution of request N.  The
contract under test: pipelined results are EXACTLY the sequential ones, for
every engine (KV-cache engines pipeline for real; the others degrade to
eager dispatch), at every in-flight depth, including degenerate streams.
"""

import numpy as np
import pytest

from multimodalpfn_tpu import MMPFNClassifier, MMPFNRegressor, TabPFNClassifier
from multimodalpfn_tpu.datasets.synthetic import (
    toy_classification,
    toy_multimodal_classification,
    toy_regression,
)


def _requests(X_pool, n_requests, rows, seed):
    rng = np.random.default_rng(seed)
    return [X_pool[rng.choice(len(X_pool), size=rows, replace=False)] for _ in range(n_requests)]


@pytest.mark.parametrize(
    "fit_mode,depth",
    [
        ("fit_with_cache", 1),
        ("fit_with_cache", 3),
        # the eager-fallback engine is depth-insensitive by construction
        ("fit_preprocessors", 3),
    ],
)
def test_pipelined_equals_sequential_classifier(fit_mode, depth):
    X, y = toy_classification(n=90, n_classes=3, seed=11)
    clf = TabPFNClassifier(
        model_path="random:0", n_estimators=2, fit_mode=fit_mode, random_state=0
    )
    clf.fit(X[:60], y[:60])
    reqs = _requests(X[60:], n_requests=4, rows=12, seed=0)
    sequential = [clf.predict_proba(r) for r in reqs]
    pipelined = clf.predict_proba_many(reqs, max_in_flight=depth)
    assert len(pipelined) == len(sequential)
    for p, s in zip(pipelined, sequential):
        np.testing.assert_array_equal(p, s)


def test_pipelined_multimodal_kv_cache():
    X, emb, y = toy_multimodal_classification(n=70, n_classes=2, emb_dim=768, seed=5)
    clf = MMPFNClassifier(
        model_path="random:0",
        mixer_type="MGM+CAP",
        mgm_heads=16,
        cap_heads=8,
        n_estimators=2,
        fit_mode="fit_with_cache",
        random_state=0,
    )
    clf.fit(X[:50], emb[:50], y[:50])
    reqs_X = [X[50:60], X[55:65], X[60:70]]
    reqs_img = [emb[50:60], emb[55:65], emb[60:70]]
    sequential = [clf.predict_proba(x, e) for x, e in zip(reqs_X, reqs_img)]
    pipelined = clf.predict_proba_many(reqs_X, reqs_img, max_in_flight=2)
    for p, s in zip(pipelined, sequential):
        np.testing.assert_array_equal(p, s)


@pytest.mark.slow  # ~15 s: quantile/icdf programs compile per output type
def test_pipelined_regressor_all_output_types():
    X, y = toy_regression(n=80, seed=7)
    reg = MMPFNRegressor(
        model_path="random:0", n_estimators=2, fit_mode="fit_with_cache", random_state=0
    )
    reg.fit(X[:55], None, y[:55])
    reqs = _requests(X[55:], n_requests=3, rows=10, seed=1)
    seq_mean = [reg.predict(r) for r in reqs]
    pipe_mean = reg.predict_many(reqs, max_in_flight=2)
    for p, s in zip(pipe_mean, seq_mean):
        np.testing.assert_array_equal(p, s)
    seq_q = [reg.predict(r, output_type="quantiles", quantiles=[0.25, 0.75]) for r in reqs]
    pipe_q = reg.predict_many(reqs, output_type="quantiles", quantiles=[0.25, 0.75])
    for p, s in zip(pipe_q, seq_q):
        for pq, sq in zip(p, s):
            np.testing.assert_array_equal(pq, sq)


def test_pipelined_edge_cases():
    X, y = toy_classification(n=60, n_classes=2, seed=3)
    clf = TabPFNClassifier(
        model_path="random:0", n_estimators=2, fit_mode="fit_with_cache", random_state=0
    )
    clf.fit(X[:40], y[:40])
    assert clf.predict_proba_many([]) == []
    single = clf.predict_proba_many([X[40:50]])
    np.testing.assert_array_equal(single[0], clf.predict_proba(X[40:50]))
    with pytest.raises(ValueError):
        clf.predict_proba_many([X[40:50]], max_in_flight=0)
    with pytest.raises(ValueError):
        clf.predict_proba_many([X[40:50], X[50:60]], [None])
