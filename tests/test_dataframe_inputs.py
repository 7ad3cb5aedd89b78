"""Pandas DataFrame inputs: category/string/object columns and NaNs flow through
the dtype-fixing + ordinal-encoding front end (reference `utils.py:379-470`)."""

import numpy as np
import pandas as pd

from multimodalpfn_tpu import TabPFNClassifier


def _frame(n=60, seed=0):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "num": rng.normal(size=n),
            "int_col": rng.integers(0, 5, size=n),
            "str_cat": rng.choice(["red", "green", "blue"], size=n),
            "with_nan": np.where(rng.random(n) < 0.15, np.nan, rng.normal(size=n)),
        }
    )
    y = (df["num"] + (df["str_cat"] == "red") + rng.normal(scale=0.3, size=n) > 0.4)
    return df, y.astype(int).values


def test_dataframe_with_string_categories():
    df, y = _frame()
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(df.iloc[:45], y[:45])
    proba = clf.predict_proba(df.iloc[45:])
    assert proba.shape == (15, 2)
    np.testing.assert_allclose(proba.sum(1), 1.0, rtol=1e-6)


def test_unseen_category_at_predict():
    df, y = _frame()
    clf = TabPFNClassifier(model_path="random:0", n_estimators=2, random_state=0)
    clf.fit(df.iloc[:45], y[:45])
    df_test = df.iloc[45:].copy()
    df_test.loc[df_test.index[0], "str_cat"] = "violet"  # unseen -> encoded -1
    proba = clf.predict_proba(df_test)
    assert np.isfinite(proba).all()


def test_explicit_categorical_indices():
    df, y = _frame(seed=1)
    clf = TabPFNClassifier(
        model_path="random:0",
        n_estimators=2,
        random_state=0,
        categorical_features_indices=[1, 2],
    )
    clf.fit(df.iloc[:45], y[:45])
    assert set(clf.inferred_categorical_indices_) <= {0, 1, 2, 3}
    proba = clf.predict_proba(df.iloc[45:])
    assert proba.shape == (15, 2)


def test_memory_estimator_splits():
    from multimodalpfn_tpu.models.config import ModelConfig
    from multimodalpfn_tpu.utils.memory import (
        estimate_forward_bytes,
        split_batch_for_memory,
    )

    cfg = ModelConfig()
    small = estimate_forward_bytes(cfg, batch=1, seq_len=100, n_feature_tokens=10)
    big = estimate_forward_bytes(cfg, batch=1, seq_len=2000, n_feature_tokens=50)
    assert big > small > 0
    chunks = list(
        split_batch_for_memory(
            8, cfg, seq_len=2000, n_feature_tokens=50, budget=2 * big
        )
    )
    assert sum(len(c) for c in chunks) == 8
    assert all(len(c) <= 2 for c in chunks)
