"""Preprocessing parity vs the reference pipelines (when /root/reference present).

Runs the reference's `EnsembleConfig.generate_for_classification` +
`to_pipeline().fit_transform` next to ours with identical seeds and data and
compares member-by-member outputs. This pins down the entire L2/L3 surface:
RNG protocol, transform registry numerics, categorical bookkeeping, column
ordering, shuffles — everything except the fingerprint hash (deliberately
different, see preprocess/steps.py docstring)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

ref_preproc = pytest.importorskip(
    "mmpfn.models.mmpfn.preprocessing", reason="reference tree unavailable"
)

from multimodalpfn_tpu.preprocess.ensemble import (  # noqa: E402
    EnsembleConfig,
    default_classifier_preprocessor_configs,
    default_regressor_preprocessor_configs,
    fit_preprocessing,
)


def _data(seed=0, n=120, f=8, classes=3, cats=(0, 1)):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f))
    for c in cats:
        X[:, c] = rng.integers(0, 4, size=n)
    y = rng.integers(0, classes, size=n)
    return X, y


def test_ensemble_config_rng_protocol_matches_reference():
    X, y = _data()
    ours = EnsembleConfig.generate_for_classification(
        n=8, subsample_size=None, max_index=len(X), add_fingerprint_feature=True,
        polynomial_features="no", feature_shift_decoder="shuffle",
        preprocessor_configs=default_classifier_preprocessor_configs(),
        class_shift_method="shuffle", n_classes=3, random_state=0,
    )
    theirs = ref_preproc.EnsembleConfig.generate_for_classification(
        n=8, subsample_size=None, max_index=len(X), add_fingerprint_feature=True,
        polynomial_features="no", feature_shift_decoder="shuffle",
        preprocessor_configs=ref_preproc.default_classifier_preprocessor_configs(),
        class_shift_method="shuffle", n_classes=3, random_state=0,
    )
    for a, b in zip(ours, theirs):
        assert a.feature_shift_count == b.feature_shift_count
        np.testing.assert_array_equal(a.class_permutation, b.class_permutation)
        assert a.preprocess_config.name == b.preprocess_config.name
        assert a.preprocess_config.categorical_name == b.preprocess_config.categorical_name


def _compare_members(ours, theirs, X_test, *, skip_fingerprint_col=True):
    for i, (mine, ref) in enumerate(zip(ours, theirs)):
        _cfg_a, pipe_a, Xa, ya, cat_a = mine
        _cfg_b, pipe_b, Xb, yb, cat_b = ref
        np.testing.assert_array_equal(ya, yb, err_msg=f"member {i} train y")
        assert Xa.shape == Xb.shape, f"member {i} width {Xa.shape} vs {Xb.shape}"
        assert list(cat_a) == list(cat_b), f"member {i} cat indices"
        # locate the fingerprint column (differs by design: stable hash) and
        # compare everything else exactly
        diff = ~np.isclose(np.asarray(Xa, float), np.asarray(Xb, float), equal_nan=True)
        diff_cols = set(np.where(diff.any(axis=0))[0])
        assert len(diff_cols) <= 1, f"member {i}: non-fingerprint mismatch {diff_cols}"
        # and the test-time transform agrees as well
        Ta = pipe_a.transform(X_test).X
        Tb = pipe_b.transform(X_test).X
        diff_t = ~np.isclose(np.asarray(Ta, float), np.asarray(Tb, float), equal_nan=True)
        assert len(set(np.where(diff_t.any(axis=0))[0]) | diff_cols) <= 1


def test_classifier_member_pipelines_match_reference():
    X, y = _data(seed=1)
    X_train, X_test = X[:90], X[90:]
    y_train = y[:90]
    cat_ix = [0, 1]

    ours_cfgs = EnsembleConfig.generate_for_classification(
        n=4, subsample_size=None, max_index=len(X_train),
        add_fingerprint_feature=True, polynomial_features="no",
        feature_shift_decoder="shuffle",
        preprocessor_configs=default_classifier_preprocessor_configs(),
        class_shift_method="shuffle", n_classes=3, random_state=42,
    )
    ref_cfgs = ref_preproc.EnsembleConfig.generate_for_classification(
        n=4, subsample_size=None, max_index=len(X_train),
        add_fingerprint_feature=True, polynomial_features="no",
        feature_shift_decoder="shuffle",
        preprocessor_configs=ref_preproc.default_classifier_preprocessor_configs(),
        class_shift_method="shuffle", n_classes=3, random_state=42,
    )
    ours = fit_preprocessing(
        ours_cfgs, X_train, y_train, random_state=42, cat_ix=cat_ix
    )
    theirs = list(
        ref_preproc.fit_preprocessing(
            ref_cfgs, X_train, y_train, random_state=42, cat_ix=cat_ix,
            n_workers=1, parallel_mode="block",
        )
    )
    _compare_members(ours, theirs, X_test)


def test_regressor_member_pipelines_match_reference():
    X, y = _data(seed=2)
    y = y + np.random.default_rng(3).normal(size=len(y))
    X_train, X_test = X[:90], X[90:]
    y_train = y[:90]

    from multimodalpfn_tpu.preprocess.steps import ReshapeFeatureDistributionsStep

    tts_ours = [None, ReshapeFeatureDistributionsStep.make_transformer("safepower", 90, 0)]
    tts_ref = [
        None,
        ref_preproc.ReshapeFeatureDistributionsStep.get_all_preprocessors(90, random_state=0)[
            "safepower"
        ],
    ]
    ours_cfgs = EnsembleConfig.generate_for_regression(
        n=4, subsample_size=None, max_index=len(X_train),
        add_fingerprint_feature=True, polynomial_features="no",
        feature_shift_decoder="shuffle",
        preprocessor_configs=default_regressor_preprocessor_configs(),
        target_transforms=tts_ours, random_state=7,
    )
    ref_cfgs = ref_preproc.EnsembleConfig.generate_for_regression(
        n=4, subsample_size=None, max_index=len(X_train),
        add_fingerprint_feature=True, polynomial_features="no",
        feature_shift_decoder="shuffle",
        preprocessor_configs=ref_preproc.default_regressor_preprocessor_configs(),
        target_transforms=tts_ref, random_state=7,
    )
    ours = fit_preprocessing(ours_cfgs, X_train, y_train, random_state=7, cat_ix=[0, 1])
    theirs = list(
        ref_preproc.fit_preprocessing(
            ref_cfgs, X_train, y_train, random_state=7, cat_ix=[0, 1],
            n_workers=1, parallel_mode="block",
        )
    )
    _compare_members(ours, theirs, X_test)


@pytest.mark.parametrize(
    "name,cat_name,append,subsample",
    [
        ("quantile_norm", "onehot", False, -1),
        ("quantile_uni_fine", "ordinal_shuffled", False, -1),
        ("robust", "none", False, -1),
        ("safepower", "numeric", True, -1),
        ("quantile_uni", "ordinal", False, 0.6),
        pytest.param(
            "per_feature", "none", False, -1,
            marks=pytest.mark.xfail(
                reason="per_feature draws transformers from the registry, whose "
                "contents depend on optional deps (the reference's kditransform is "
                "absent here, shrinking its pool); draw sequences cannot align "
                "across environments. Our pool is documented in preprocess/steps.py.",
                strict=False,
            ),
        ),
    ],
)
def test_exotic_preprocessor_configs_match_reference(name, cat_name, append, subsample):
    X, y = _data(seed=5, n=100, f=6, cats=(0, 1))
    X_train, X_test = X[:80], X[80:]
    y_train = y[:80]

    from multimodalpfn_tpu.preprocess.ensemble import PreprocessorConfig as OurPC

    ours_cfgs = EnsembleConfig.generate_for_classification(
        n=2, subsample_size=None, max_index=80, add_fingerprint_feature=False,
        polynomial_features="no", feature_shift_decoder="rotate",
        preprocessor_configs=[
            OurPC(name, categorical_name=cat_name, append_original=append,
                  subsample_features=subsample)
        ],
        class_shift_method="rotate", n_classes=3, random_state=11,
    )
    ref_cfgs = ref_preproc.EnsembleConfig.generate_for_classification(
        n=2, subsample_size=None, max_index=80, add_fingerprint_feature=False,
        polynomial_features="no", feature_shift_decoder="rotate",
        preprocessor_configs=[
            ref_preproc.PreprocessorConfig(
                name, categorical_name=cat_name, append_original=append,
                subsample_features=subsample)
        ],
        class_shift_method="rotate", n_classes=3, random_state=11,
    )
    ours = fit_preprocessing(ours_cfgs, X_train, y_train, random_state=11, cat_ix=[0, 1])
    theirs = list(
        ref_preproc.fit_preprocessing(
            ref_cfgs, X_train, y_train, random_state=11, cat_ix=[0, 1],
            n_workers=1, parallel_mode="block",
        )
    )
    _compare_members(ours, theirs, X_test)


def test_polynomial_and_row_subsample_match_reference():
    X, y = _data(seed=6, n=100, f=5, cats=())
    X_train, y_train = X[:80], y[:80]
    kw = dict(
        n=2, subsample_size=40, max_index=80, add_fingerprint_feature=False,
        polynomial_features=4, feature_shift_decoder=None,
        class_shift_method=None, n_classes=3, random_state=13,
    )
    ours_cfgs = EnsembleConfig.generate_for_classification(
        preprocessor_configs=default_classifier_preprocessor_configs(), **kw
    )
    ref_cfgs = ref_preproc.EnsembleConfig.generate_for_classification(
        preprocessor_configs=ref_preproc.default_classifier_preprocessor_configs(), **kw
    )
    for a, b in zip(ours_cfgs, ref_cfgs):
        np.testing.assert_array_equal(a.subsample_ix, b.subsample_ix)
    ours = fit_preprocessing(ours_cfgs, X_train, y_train, random_state=13, cat_ix=[])
    theirs = list(
        ref_preproc.fit_preprocessing(
            ref_cfgs, X_train, y_train, random_state=13, cat_ix=[],
            n_workers=1, parallel_mode="block",
        )
    )
    _compare_members(ours, theirs, X[80:])
