"""Probe: do threaded member pipeline fits/transforms beat the sequential loop?

The reference runs member preprocessing under joblib workers
(`/root/reference/mmpfn/models/mmpfn/inference.py:93-156`, n_workers); we fit
sequentially.  Member pipelines are sklearn/numpy-heavy (GIL released for the
big array ops), so a ThreadPoolExecutor may recover most of the wall without
process-spawn cost.  Measures fit_preprocessing and the predict-time member
transform at the bench shape, sequential vs 2/4 threads.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

from multimodalpfn_tpu.datasets.synthetic import pad_ufes_like
from multimodalpfn_tpu.estimator.data_utils import infer_categorical_features
from multimodalpfn_tpu.preprocess.ensemble import (
    ClassifierEnsembleConfig,
    default_classifier_preprocessor_configs,
    fit_preprocessing,
    fit_preprocessing_one,
)
from multimodalpfn_tpu.estimator.interface_config import ModelInterfaceConfig
from multimodalpfn_tpu.utils.rng import infer_random_state


def main():
    X, emb, y = pad_ufes_like(seed=0)
    ntr = int(0.7 * len(X))
    Xtr, ytr = X[:ntr], y[:ntr]
    Xte = X[ntr:]

    icfg = ModelInterfaceConfig()
    cat_ix = infer_categorical_features(
        Xtr,
        provided=None,
        min_samples_for_inference=icfg.MIN_NUMBER_SAMPLES_FOR_CATEGORICAL_INFERENCE,
        max_unique_for_category=icfg.MAX_UNIQUE_FOR_CATEGORICAL_FEATURES,
        min_unique_for_numerical=icfg.MIN_UNIQUE_FOR_NUMERICAL_FEATURES,
    )
    _, rng = infer_random_state(0)
    configs = ClassifierEnsembleConfig.generate_for_classification(
        n=4,
        subsample_size=None,
        max_index=ntr,
        add_fingerprint_feature=icfg.FINGERPRINT_FEATURE,
        polynomial_features=icfg.POLYNOMIAL_FEATURES,
        feature_shift_decoder=icfg.FEATURE_SHIFT_METHOD,
        preprocessor_configs=default_classifier_preprocessor_configs(),
        class_shift_method=icfg.CLASS_SHIFT_METHOD,
        n_classes=int(len(np.unique(ytr))),
        random_state=rng,
    )

    def fit_seq():
        return fit_preprocessing(
            configs, Xtr, ytr, random_state=42, cat_ix=cat_ix
        )

    def fit_threaded(workers):
        _, r = infer_random_state(42)
        seeds = r.integers(0, np.iinfo(np.int32).max, len(configs))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [
                ex.submit(
                    fit_preprocessing_one, c, Xtr, ytr, int(s), cat_ix=cat_ix
                )
                for c, s in zip(configs, seeds)
            ]
            return [f.result() for f in futs]

    # warm
    members = fit_seq()
    for name, fn in [
        ("fit_seq", fit_seq),
        ("fit_t2", lambda: fit_threaded(2)),
        ("fit_t4", lambda: fit_threaded(4)),
    ]:
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: median {1e3*np.median(ts):.1f} ms  runs {[f'{1e3*t:.0f}' for t in ts]}")

    # predict-time member transforms
    pres = [m[1] for m in members]

    def tr_seq():
        return [p.transform(Xte).X for p in pres]

    def tr_threaded(workers):
        with ThreadPoolExecutor(max_workers=workers) as ex:
            return list(ex.map(lambda p: p.transform(Xte).X, pres))

    a = tr_seq()
    b = tr_threaded(4)
    for u, v in zip(a, b):
        np.testing.assert_array_equal(u, v)
    for name, fn in [
        ("transform_seq", tr_seq),
        ("transform_t2", lambda: tr_threaded(2)),
        ("transform_t4", lambda: tr_threaded(4)),
    ]:
        ts = []
        for _ in range(10):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        print(f"{name}: median {1e3*np.median(ts):.1f} ms  runs {[f'{1e3*t:.0f}' for t in ts]}")

    # determinism check: threaded fit == sequential fit (same seeds per member)
    m2 = fit_threaded(4)
    t_seq = [m[1].transform(Xte).X for m in members]
    t_thr = [m[1].transform(Xte).X for m in m2]
    for u, v in zip(t_seq, t_thr):
        np.testing.assert_array_equal(u, v)
    print("threaded fit == sequential fit: exact")


if __name__ == "__main__":
    main()
